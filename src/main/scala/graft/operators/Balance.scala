package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for compute-dense operators (sketching, shingling,
  * scoring): a small-file source can arrive as a single split (one task), and
  * per-row CPU work then serializes on one core. If the input is small enough
  * to under-split, spread it; if it's big (the 100 TB case — thousands of
  * parquet row groups), leave it alone so no gratuitous shuffle is added.
  *
  * The common case is plan-free: logical size stats (`optimizedPlan.stats` —
  * file lengths for scans) divided by `spark.sql.files.maxPartitionBytes`
  * estimate the split count Spark's file scan would produce. When the stats
  * are NOT real sizes — unstatted relations (LogicalRDD, some views) default
  * to `spark.sql.defaultSizeInBytes` = Long.MaxValue, and joins multiply
  * estimates past it — the estimate would wrongly report "huge" and skip the
  * guard for exactly the small in-memory inputs that need it most, so those
  * plans fall back to the accurate (physical-planning) partition count.
  */
private[operators] object Balance {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxPartitionBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val statsUsable =
      estBytes >= 0 && estBytes < BigInt(spark.sessionState.conf.defaultSizeInBytes)
    val underSplit =
      if (statsUsable)
        (estBytes / maxPartitionBytes).min(BigInt(Long.MaxValue)).toLong + 1 < target
      else df.rdd.getNumPartitions < target
    if (underSplit) df.repartition(target) else df
  }
}
