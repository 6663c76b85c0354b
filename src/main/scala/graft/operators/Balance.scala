package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for compute-dense operators (sketching, shingling,
  * scoring): a small-file source can arrive as a single split (one task), and
  * per-row CPU work then serializes on one core. If the input is small enough
  * to under-split, spread it; if it's big (the 100 TB case — thousands of
  * parquet row groups), leave it alone so no gratuitous shuffle is added.
  *
  * The check is intentionally plan-free: `df.rdd.getNumPartitions` would
  * trigger full physical planning and RDD materialization per call, only to
  * throw the result away. Logical size stats (`optimizedPlan.stats` — file
  * lengths for scans, propagated estimates elsewhere) divided by
  * `spark.sql.files.maxPartitionBytes` estimate the split count Spark's file
  * scan would produce, which is exactly the quantity being guarded.
  */
private[operators] object Balance {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxPartitionBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estSplits = (estBytes / maxPartitionBytes).toLong + 1
    if (estSplits < target) df.repartition(target) else df
  }
}
