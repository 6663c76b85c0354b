package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global ranking.
  *
  * `rank()/dense_rank() over (order by …)` with no PARTITION BY executes in
  * Spark as a SINGLE task — every row moves to one partition (WindowExec
  * warns "No Partition Defined"). Fine at 600k rows, a non-starter at 100 TB.
  *
  * [[globalRank]] keeps every stage distributed, using the same two-job
  * shape as Spark's own `zipWithIndex`:
  *
  *   1. range-partition on the sort keys and sort within partitions (the
  *      global-sort machinery; equal keys always land in one partition, so
  *      no tie group ever spans a boundary);
  *   2. a stats job counts rows and tie-groups per partition — a
  *      partition-count-sized array to the driver, nothing more;
  *   3. a second job over the SAME shuffled RDD (map outputs are reused,
  *      nothing recomputes) turns local ranks into global ones by adding
  *      the prefix-summed offsets: earlier-partition row counts for `rank`,
  *      tie-group counts for `dense_rank`.
  *
  * Both jobs must see one physical partitioning — deriving them from two
  * DataFrame branches would plan two independently *sampled* range
  * exchanges with different boundaries (wrong offsets); sharing one RDD
  * makes the boundaries identical by construction.
  *
  * Remaining skew caveat: a huge single-key tie group concentrates in one
  * range partition (for `rank` ties could be split — all rows share one
  * rank value — not for `dense_rank`).
  *
  * Results are identical to the built-in window functions.
  */
object Ranks {

  /** [[globalRank]] with the default single-task cutoff. 500k is the
    * measured local[32] crossover at sf0.1 (distributed 1.6s vs
    * single-task window 2.2s steady-state at 600k lineitem rows); below
    * it the built-in window's lack of extra jobs/Row conversion wins. */
  def globalRank(
      df: DataFrame,
      rankCol: String,
      dense: Boolean,
      order: Column*): DataFrame =
    globalRank(df, rankCol, dense, maxSingleTaskRows = 500000L, order: _*)

  /** Append `rankCol` (bigint) holding the global rank (`dense = false`) or
    * dense rank (`dense = true`) of each row under `order`.
    *
    * Strategy selection (one cheap count — parquet-footer metadata for bare
    * scans): at or below `maxSingleTaskRows` the input fits one task
    * comfortably and Spark's built-in window is optimal (no extra jobs, no
    * Row conversion); above it, the distributed two-job path takes over.
    * The same shape of choice Spark itself makes for broadcast vs shuffle
    * joins. Pass `maxSingleTaskRows = 0` to force the distributed path
    * (and skip the stats action). */
  def globalRank(
      df: DataFrame,
      rankCol: String,
      dense: Boolean,
      maxSingleTaskRows: Long,
      order: Column*): DataFrame = {
    if (maxSingleTaskRows > 0 && df.count() <= maxSingleTaskRows) {
      val w = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
      val r = if (dense) dense_rank() else rank()
      return df.withColumn(rankCol, r.over(w).cast("long"))
    }
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions

    // Sort-key values without direction, for tie detection between
    // consecutive sorted rows.
    val keyCols = order.map(GraftBridge.sortChild)
    val prepared = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__graft_key", struct(keyCols: _*))
    val keyIdx = prepared.schema.fieldIndex("__graft_key")
    val rdd = prepared.rdd // one RDD → one set of range boundaries, reused

    // Job 1: (rows, tieGroups) per partition.
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var rows = 0L
      var groups = 0L
      var prev: Row = null
      it.foreach { r =>
        val k = r.getStruct(keyIdx)
        if (rows == 0L || k != prev) { groups += 1; prev = k }
        rows += 1
      }
      Iterator.single((pid, rows, groups))
    }.collect().sortBy(_._1)

    val rowOffsets = stats.scanLeft(0L)(_ + _._2).init
    val groupOffsets = stats.scanLeft(0L)(_ + _._3).init
    val offsets = spark.sparkContext.broadcast(
      if (dense) groupOffsets else rowOffsets)

    // Job 2: local rank + broadcast offset, streaming per partition.
    val isDense = dense
    val ranked = rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = offsets.value(pid)
      var pos = 0L
      var localRank = 0L
      var localGroup = 0L
      var prev: Row = null
      it.map { r =>
        pos += 1
        val k = r.getStruct(keyIdx)
        if (pos == 1L || k != prev) { localRank = pos; localGroup += 1; prev = k }
        val rank = off + (if (isDense) localGroup else localRank)
        Row.fromSeq(r.toSeq.patch(keyIdx, Nil, 1) :+ rank)
      }
    }

    val outSchema = StructType(
      prepared.schema.fields.patch(keyIdx, Nil, 1) :+
        StructField(rankCol, LongType, nullable = false))
    spark.createDataFrame(ranked, outSchema)
  }
}
