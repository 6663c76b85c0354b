package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for compute-dense operators (sketching, shingling,
  * scoring): a small-file source can arrive as a single split (one task), and
  * per-row CPU work then serializes on one core. If the input has fewer
  * partitions than the cluster's parallelism, spread it; if it's already
  * well-split (the 100 TB case — thousands of parquet row groups), leave it
  * alone so no gratuitous shuffle is added.
  */
private[operators] object Balance {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
