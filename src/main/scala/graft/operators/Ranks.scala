package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

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
    globalRank(df, rankCol, dense, maxSingleTaskRows = 500000L, -1L, order: _*)

  def globalRank(
      df: DataFrame,
      rankCol: String,
      dense: Boolean,
      maxSingleTaskRows: Long,
      order: Column*): DataFrame =
    globalRank(df, rankCol, dense, maxSingleTaskRows, -1L, order: _*)

  /** Append `rankCol` (bigint) holding the global rank (`dense = false`) or
    * dense rank (`dense = true`) of each row under `order`.
    *
    * Strategy selection (one cheap count — parquet-footer metadata for bare
    * scans): at or below `maxSingleTaskRows` the input fits one task
    * comfortably and Spark's built-in window is optimal (no extra jobs, no
    * Row conversion); above it, the distributed two-job path takes over.
    * The same shape of choice Spark itself makes for broadcast vs shuffle
    * joins. Pass `maxSingleTaskRows = 0` to force the distributed path
    * (and skip the stats action). Callers that already know the input
    * cardinality pass it as `knownCount` (>= 0) so no count job runs over a
    * computed input; -1 means unknown. The hint is trusted only when the
    * optimized plan provably can't multiply rows beyond its single leaf
    * ([[InputStats.routeRows]]) — a replicating view gets an honest count,
    * never the single-task cliff. */
  def globalRank(
      df: DataFrame,
      rankCol: String,
      dense: Boolean,
      maxSingleTaskRows: Long,
      knownCount: Long,
      order: Column*): DataFrame = {
    def rows = InputStats.routeRows(df, knownCount)
    if (maxSingleTaskRows > 0 && rows <= maxSingleTaskRows) {
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

  /** [[groupedRunningSum]] with the default single-task-per-group cutoff
    * (the [[globalRank]] crossover measured at sf0.1). */
  def groupedRunningSum(
      df: DataFrame,
      group: Column,
      value: Column,
      sumCol: String,
      order: Column*): DataFrame =
    groupedRunningSum(df, group, value, sumCol, 500000L, -1L, order: _*)

  def groupedRunningSum(
      df: DataFrame,
      group: Column,
      value: Column,
      sumCol: String,
      maxSingleTaskRows: Long,
      knownCount: Long,
      order: Column*): DataFrame =
    groupedRunningSum(df, group, value, sumCol, maxSingleTaskRows,
      knownCount, -1L, order: _*)

  /** Append `sumCol` (bigint) = the EXCLUSIVE running sum of `value` within
    * each `group` under a global per-group `order` — what budget-fill
    * sampling and per-domain token accounting need ("take documents in
    * this order until the domain's token budget is spent").
    *
    * `sum(...) over (partition by group order by ...)` serializes each
    * GROUP into one task in Spark — fine for many balanced groups (tasks
    * are hash buckets of many groups, parallelism = shuffle partitions), a
    * scale cliff for the few huge groups a training mixture actually has
    * (a handful of languages/domains over 100 TB). The distributed path
    * keeps every stage parallel with [[globalRank]]'s two-job shape:
    * range-partition on (group, order) — one group spans many partitions,
    * sorted — then a stats job collects per-(partition, group) value
    * totals (at most groups + partitions − 1 entries: a sorted sequence
    * cut into `parts` chunks), and a second job over the SAME RDD adds
    * each group's earlier-partition totals to its local running sum.
    *
    * Routing consults BOTH dimensions, because each path's failure mode
    * is the other's sweet spot: at or below `maxSingleTaskRows` total rows
    * the built-in window wins outright; above it, the group cardinality
    * prices the distributed path's driver-held stats frame, and when
    * groups exceed `maxDriverGroups` (≤ 0 = auto: max(8 × shuffle
    * partitions, 65536), a few MB of driver frame at most) the built-in
    * window is used instead — many-small groups parallelize fine there,
    * and the stats collect would be group-cardinality-sized, the
    * driver-OOM shape. The cardinality read is FOLDED INTO the
    * distributed path's own shuffle (after the range partition + sort,
    * groups are contiguous, so one O(1)-memory boundary count per
    * partition over the shuffle output bounds the group count) — the
    * input is scanned ONCE either way; the round-14
    * `approx_count_distinct` probe cost a full extra source pass per
    * call, a real price at 100 TB. Pass `maxDriverGroups =
    * Long.MaxValue` to pin the distributed path (specs, probes). Null
    * values count as 0; results are identical to the built-in window on
    * every route. */
  def groupedRunningSum(
      df: DataFrame,
      group: Column,
      value: Column,
      sumCol: String,
      maxSingleTaskRows: Long,
      knownCount: Long,
      maxDriverGroups: Long,
      order: Column*): DataFrame = {
    def rows = InputStats.routeRows(df, knownCount)
    val safeVal = coalesce(value.cast("long"), lit(0L))
    def windowPath: DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(group).orderBy(order: _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      df.withColumn(sumCol,
        (sum(safeVal).over(w) - safeVal).cast("long"))
    }
    if (maxSingleTaskRows > 0 && rows <= maxSingleTaskRows)
      return windowPath
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val groupCap =
      if (maxDriverGroups > 0) maxDriverGroups
      else math.max(8L * parts, 65536L)
    val prepared = df
      .withColumn("__graft_grp", group.cast("string"))
      .withColumn("__graft_val", safeVal)
      .repartitionByRange(parts, col("__graft_grp") +: order: _*)
      .sortWithinPartitions(col("__graft_grp") +: order: _*)
    val grpIdx = prepared.schema.fieldIndex("__graft_grp")
    val valIdx = prepared.schema.fieldIndex("__graft_val")
    val rdd = prepared.rdd // one RDD → one set of range boundaries, reused
    if (groupCap != Long.MaxValue) {
      // Job 0 (router): per-partition distinct-group counts over the
      // SHUFFLE OUTPUT — groups are contiguous after the range partition
      // + sort, so counting group boundaries is one O(1)-memory streaming
      // pass per partition, and Σ over partitions bounds the stats frame
      // (exact group count ≤ Σ ≤ groups + partitions − 1). Costs one
      // shuffle-read, never a second source scan; the rare fail-open to
      // the window path re-shuffles, the price of not OOMing the driver.
      val statsBound = rdd.mapPartitions { it =>
        var cur: String = null
        var started = false
        var n = 0L
        it.foreach { r =>
          val g = r.getString(grpIdx)
          if (!started || g != cur) { cur = g; started = true; n += 1 }
        }
        Iterator.single(n)
      }.collect().sum
      if (statsBound > groupCap) {
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"groupedRunningSum: ≥${statsBound - parts + 1} distinct groups " +
            s"(stats bound $statsBound) > cap $groupCap — routing to the " +
            "built-in per-group window (many small groups parallelize " +
            "across hash buckets; the distributed path's stats collect " +
            "would be group-cardinality-sized on the driver).")
        return windowPath
      }
    }

    // Job 1: per-(partition, group) totals — tiny when groups are few.
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { r =>
        val g = r.getString(grpIdx)
        m.update(g, m.getOrElse(g, 0L) + r.getLong(valIdx))
      }
      m.iterator.map { case (g, s) => (pid, g, s) }
    }.collect()
    val offsets: Map[(Int, String), Long] =
      stats.groupBy(_._2).flatMap { case (g, arr) =>
        val sorted = arr.sortBy(_._1)
        sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._3).init)
          .map { case (pid, off) => (pid, g) -> off }
      }
    val bOff = spark.sparkContext.broadcast(offsets)

    // Job 2: local running sum + the group's earlier-partition offset.
    val summed = rdd.mapPartitionsWithIndex { (pid, it) =>
      val offs = bOff.value
      var cur: String = null
      var started = false
      var run = 0L
      it.map { r =>
        val g = r.getString(grpIdx)
        if (!started || g != cur) {
          cur = g; started = true
          run = offs.getOrElse((pid, g), 0L)
        }
        val start = run
        run += r.getLong(valIdx)
        Row.fromSeq(r.toSeq.patch(valIdx, Nil, 1).patch(grpIdx, Nil, 1)
          :+ start)
      }
    }
    val outSchema = StructType(
      prepared.schema.fields.patch(valIdx, Nil, 1).patch(grpIdx, Nil, 1) :+
        StructField(sumCol, LongType, nullable = false))
    spark.createDataFrame(summed, outSchema)
  }

  /** Append the distribution analytics — `percent_rank()` (`prCol`, double),
    * `cume_dist()` (`cdCol`, double) and `ntile(ntileN)` (`ntileCol`,
    * bigint) — over a GLOBAL `order` (no PARTITION BY), distributed.
    *
    * Spark's built-in path for these is a one-task WindowExec ("No Partition
    * Defined" warning) — the same scale cliff [[globalRank]] avoids, so this
    * reuses its exact two-job shape (range partition → per-partition stats →
    * prefix-summed offsets on one shared RDD). All three analytics are
    * derivable from what that machinery already knows:
    *
    *   - `percent_rank = (rank − 1) / (N − 1)` (0 when N = 1), where rank is
    *     the tie-group's first global row position;
    *   - `cume_dist = tieGroupEnd / N`, where tieGroupEnd is the global
    *     position of the group's last row;
    *   - `ntile(n)`: Spark/ANSI bucketing from the global row position alone
    *     — the first `N mod n` buckets get `⌊N/n⌋+1` rows, the rest `⌊N/n⌋`.
    *
    * N rides the closure (a scalar from the stats job). Within a partition
    * rows stream one TIE GROUP at a time (cume_dist needs the group end
    * before the first row of the group can emit); only a giant single-key
    * tie group would buffer — the same skew caveat as dense_rank above.
    *
    * Default cutoff 100k — deliberately BELOW the raw-speed crossover
    * (measured at sf0.1/150k orders rows the distributed path costs
    * ~0.8–2.1 s vs ~0.8 s single-task; the two-job shape amortizes only
    * above ~1M rows, reaching 7.4 s at 6M where one task would be the
    * cliff). The cutoff buys cliff-free behavior, not peak small-input
    * speed: above 100k rows no stage is ever one task, which is the
    * property that survives a 100× scale-up. Callers that know their
    * input stays small can raise it. Results are identical to the
    * built-in window functions. */
  def globalAnalytics(
      df: DataFrame,
      order: Seq[Column],
      ntileN: Int,
      prCol: String = "pr",
      cdCol: String = "cd",
      ntileCol: String = "tile",
      maxSingleTaskRows: Long = 100000L,
      knownCount: Long = -1L): DataFrame = {
    require(ntileN > 0, s"ntile bucket count must be positive, got $ntileN")
    def rows = InputStats.routeRows(df, knownCount)
    if (maxSingleTaskRows > 0 && rows <= maxSingleTaskRows) {
      val w = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
      return df
        .withColumn(prCol, percent_rank().over(w))
        .withColumn(cdCol, cume_dist().over(w))
        .withColumn(ntileCol, ntile(ntileN).over(w).cast("long"))
    }
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions

    val keyCols = order.map(GraftBridge.sortChild)
    val prepared = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__graft_key", struct(keyCols: _*))
    val keyIdx = prepared.schema.fieldIndex("__graft_key")
    val rdd = prepared.rdd // one RDD → one set of range boundaries, reused

    // Job 1: row count per partition → prefix offsets + total N.
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      Iterator.single((pid, it.size.toLong))
    }.collect().sortBy(_._1)
    val rowOffsets = stats.scanLeft(0L)(_ + _._2).init
    val total = stats.map(_._2).sum
    val offsets = spark.sparkContext.broadcast(rowOffsets)

    // ntile bucket layout from N alone (ANSI): first `rem` buckets one wider.
    val n = ntileN.toLong
    val bucketSize = total / n
    val rem = total % n
    val wideSpan = rem * (bucketSize + 1) // rows covered by the wide buckets

    // Job 2: stream tie groups; emit each group once its end is known.
    val analyzed = rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = offsets.value(pid)
      val buf = it.buffered
      var pos = 0L // local position of the last consumed row
      val groups = new Iterator[(Long, Array[Row])] {
        def hasNext: Boolean = buf.hasNext
        def next(): (Long, Array[Row]) = {
          val start = pos + 1
          val first = buf.next(); pos += 1
          val key = first.getStruct(keyIdx)
          val acc = scala.collection.mutable.ArrayBuffer(first)
          while (buf.hasNext && buf.head.getStruct(keyIdx) == key) {
            acc += buf.next(); pos += 1
          }
          (start, acc.toArray)
        }
      }
      groups.flatMap { case (startLocal, group) =>
        val rank = off + startLocal // global rank shared by the tie group
        val end = rank - 1 + group.length // global position of the group end
        val pr = if (total <= 1L) 0.0 else (rank - 1).toDouble / (total - 1)
        val cd = end.toDouble / total
        group.iterator.zipWithIndex.map { case (r, i) =>
          val p = rank + i // global row position (1-based)
          val tile =
            if (p <= wideSpan) (p - 1) / (bucketSize + 1) + 1
            else rem + (p - wideSpan - 1) / bucketSize + 1
          // Seq[Any], not Seq(...): weak conformance would silently widen
          // the Long tile to Double to unify with pr/cd.
          Row.fromSeq(r.toSeq.patch(keyIdx, Nil, 1) ++ Seq[Any](pr, cd, tile))
        }
      }
    }

    val outSchema = StructType(
      prepared.schema.fields.patch(keyIdx, Nil, 1) ++ Seq(
        StructField(prCol, DoubleType, nullable = false),
        StructField(cdCol, DoubleType, nullable = false),
        StructField(ntileCol, LongType, nullable = false)))
    spark.createDataFrame(analyzed, outSchema)
  }
}
