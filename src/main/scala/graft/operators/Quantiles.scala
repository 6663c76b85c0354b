package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT interpolated quantiles (percentile_cont semantics)
  * with bounded memory.
  *
  * Spark's built-in `percentile()` buffers every value of a group inside
  * the aggregation buffer (an ObjectHashAggregate holding an OpenHashMap
  * per group) — fine at 60k rows, a memory cliff when one group holds
  * billions. This operator never materializes a group:
  *
  *   1. aggregate to DISTINCT (group, value) counts — the only corpus-sized
  *      shuffle, map-side partial-combined, sized by distinct values, not
  *      rows;
  *   2. running `sum(cnt)` window per group over the sorted distinct
  *      values: value v covers global 1-based ranks
  *      `(cum − cnt, cum]` within its group — WindowExec sort/spill is
  *      bounded by distinct values per group;
  *   3. per-group totals are the running sum's final value — a second
  *      window over the same partition (no extra scan, exchange or sort);
  *   4. the quantile at fraction p needs only the values at ranks
  *      `⌊p·(n−1)⌋+1` and `⌊p·(n−1)⌋+2`: a conditional-min aggregate over
  *      the ranked distinct values picks both in one pass (cum is
  *      nondecreasing in v, so "value at rank r" = min v with cum ≥ r);
  *   5. linear interpolation, with Spark's own coefficient form
  *      `(hi_idx − pos)·lo + (pos − lo_idx)·hi` so results are
  *      bit-identical to the built-in `percentile()` (QuantilesSpec
  *      asserts exact equality, not rounded closeness).
  *
  * At 100 TB the plan is: scan → partial-agg → one shuffle on
  * (group, value) → per-group distinct-value window → final agg. Nothing
  * buffers a raw group; a single-key skew lands on
  * the distinct-value window, which spills and is bounded by CARDINALITY,
  * not row count.
  */
object Quantiles {

  /** Append one exact interpolated quantile column per (prob, outCol) pair,
    * grouped by `groupCols`, over `valueCol` (cast to double; NULLs are
    * excluded, matching `percentile()` / `quantile_cont`). Returns one row
    * per group: groupCols ++ outCols. */
  def exactGroupQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      probs: Seq[Double],
      outCols: Seq[String]): DataFrame = {
    require(probs.nonEmpty && probs.length == outCols.length,
      s"probs (${probs.length}) and outCols (${outCols.length}) must pair up")
    require(probs.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions must be in [0, 1], got $probs")
    val g = groupCols.map(col)
    val vals = df
      .select((g :+ col(valueCol).cast("double").as("__v")): _*)
      .where(col("__v").isNotNull)

    // (1) distinct-value counts; (2) running rank coverage per group.
    val cnts = vals.groupBy((g :+ col("__v")): _*).agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // (3) per-group total = the running sum's final value — a second
    // window over the SAME partition keys (sort-order prefix of the first,
    // so no extra exchange or sort) instead of a separate
    // count-scan + broadcast join: the source is scanned ONCE. NULL group
    // keys are ordinary window partitions, so they survive without the
    // null-safe join the totals frame used to need.
    val joined = cnts.withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__n", max(col("__cum")).over(Window.partitionBy(g: _*)))

    // (4) conditional-min picks the two bracketing values per prob.
    def pos(p: Double) = (col("__n") - 1) * lit(p)
    def loRank(p: Double) = floor(pos(p)) + 1
    def hiRank(p: Double) = least(floor(pos(p)) + 2, col("__n"))
    val picks = probs.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        min(when(col("__cum") >= loRank(p), col("__v"))).as(s"__lo$i"),
        min(when(col("__cum") >= hiRank(p), col("__v"))).as(s"__hi$i"))
    }
    val grouped = joined
      .groupBy((g :+ col("__n")): _*)
      .agg(picks.head, picks.tail: _*)

    // (5) interpolate with the built-in percentile()'s coefficient form.
    val outs = probs.zipWithIndex.map { case (p, i) =>
      val position = pos(p)
      val lower = floor(position)
      when(position === lower, col(s"__lo$i"))
        .otherwise(col(s"__lo$i") * (lower + 1 - position) +
          col(s"__hi$i") * (position - lower))
        .as(outCols(i))
    }
    grouped.select((g ++ outs): _*)
  }

  /** Multi-value-column variant of [[exactGroupQuantiles]] in ONE source
    * scan: each row explodes into (column-tag, value) entries, so the
    * distinct-count shuffle, rank window and pick aggregate all run once
    * keyed by (group, column) instead of once PER value column. Arithmetic
    * per (group, column) partition is the single-column pipeline's exactly
    * (same counts, same running sums, same conditional-min picks, same
    * interpolation ops), so results stay bit-identical to it — and to the
    * built-in `percentile()` (QuantilesSpec).
    *
    * `specs` maps each value column to its (fractions, output names).
    * Returns one row per group that has at least one non-NULL value in at
    * least one spec column: groupCols ++ all outCols; a spec column with
    * no values in a group yields NULL outputs for that group (callers
    * needing every group anchor on the distinct key set, as
    * [[groupPercentiles]] does). */
  def exactGroupQuantilesMulti(
      df: DataFrame,
      groupCols: Seq[String],
      specs: Seq[(String, Seq[Double], Seq[String])]): DataFrame = {
    require(specs.nonEmpty, "at least one value-column spec required")
    specs.foreach { case (v, probs, outs) =>
      require(probs.nonEmpty && probs.length == outs.length,
        s"$v: probs (${probs.length}) and outCols (${outs.length}) must pair up")
      require(probs.forall(p => p >= 0.0 && p <= 1.0),
        s"$v: quantile fractions must be in [0, 1], got $probs")
    }
    if (specs.length == 1) {
      val (v, probs, outs) = specs.head
      return exactGroupQuantiles(df, groupCols, v, probs, outs)
    }
    val g = groupCols.map(col)
    val tagged = df
      .select((g :+ explode(array(specs.zipWithIndex.map {
        case ((v, _, _), i) =>
          struct(lit(i).as("c"), col(v).cast("double").as("v"))
      }: _*)).as("__e")): _*)
      .select((g :+ col("__e.c").as("__qc") :+ col("__e.v").as("__v")): _*)
      .where(col("__v").isNotNull)

    val keys = g :+ col("__qc")
    val cnts = tagged.groupBy((keys :+ col("__v")): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(keys: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = cnts.withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__n", max(col("__cum")).over(Window.partitionBy(keys: _*)))

    def pos(p: Double) = (col("__n") - 1) * lit(p)
    def loRank(p: Double) = floor(pos(p)) + 1
    def hiRank(p: Double) = least(floor(pos(p)) + 2, col("__n"))
    // Picks for every (column, prob) run in one aggregate; a (group,
    // column) row only ever reads its own column's picks downstream, so
    // the cross-column ones it also computes are dead (and cheap: one
    // conditional min each over the group's distinct values).
    val picks = specs.zipWithIndex.flatMap { case ((_, probs, _), i) =>
      probs.zipWithIndex.flatMap { case (p, j) => Seq(
        min(when(col("__cum") >= loRank(p), col("__v"))).as(s"__lo_${i}_$j"),
        min(when(col("__cum") >= hiRank(p), col("__v"))).as(s"__hi_${i}_$j"))
      }
    }
    val perCol = ranked.groupBy((keys :+ col("__n")): _*)
      .agg(picks.head, picks.tail: _*)

    // Interpolate each column's probs on its own (group, column) row,
    // then collapse the ≤ specs.length rows per group into one: exactly
    // one row carries each column's outputs, so a guarded min() lifts it.
    val outs = specs.zipWithIndex.flatMap { case ((_, probs, onames), i) =>
      probs.zipWithIndex.map { case (p, j) =>
        val position = pos(p)
        val lower = floor(position)
        val interp = when(position === lower, col(s"__lo_${i}_$j"))
          .otherwise(col(s"__lo_${i}_$j") * (lower + 1 - position) +
            col(s"__hi_${i}_$j") * (position - lower))
        min(when(col("__qc") === i, interp)).as(onames(j))
      }
    }
    perCol.groupBy(g: _*).agg(outs.head, outs.tail: _*)
  }

  /** Group percentiles with the cliff-free AUTO-ROUTE (the
    * `Ranks.globalRank` pattern): at or below `maxBufferedRows` input rows
    * the group-buffering built-in `percentile()` runs (cheapest plan —
    * one aggregate, no window); above it every value column routes through
    * [[exactGroupQuantiles]], which is bit-identical (QuantilesSpec) and
    * never materializes a group. The proxy is total input rows, like
    * Ranks: the true hazard is the largest GROUP's row count, but that
    * costs a pre-aggregation to learn, and a total under the cutoff
    * bounds every group under it too. Default 2M — comfortably past the
    * built-in's small-input speed win, far under the buffer cliff.
    *
    * `specs` maps each value column to its (fractions, output names);
    * multi-column requests join per-column results on the group key
    * (broadcast-sized: one row per group). `knownCount` skips the count
    * scan when the caller already knows the size. */
  def groupPercentiles(
      df: DataFrame,
      groupCols: Seq[String],
      specs: Seq[(String, Seq[Double], Seq[String])],
      maxBufferedRows: Long = 2000000L,
      knownCount: Long = -1L): DataFrame = {
    require(specs.nonEmpty, "at least one value-column spec required")
    // Hint trusted only when the plan can't multiply rows beyond its leaf
    // (InputStats.routeRows) — same cliff-guard as Ranks.globalRank.
    val rows = InputStats.routeRows(df, knownCount)
    if (maxBufferedRows > 0 && rows <= maxBufferedRows) {
      val aggs = specs.flatMap { case (v, probs, outs) =>
        probs.zip(outs).map { case (p, o) => expr(s"percentile($v, $p)").as(o) }
      }
      df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    } else {
      // Route parity around NULLs (both routes must return the same
      // rows, not just the same numbers): the quantile pipeline drops a
      // group whose values are ALL NULL in every spec column (the
      // built-in returns the group with NULL percentiles), and a plain
      // USING join would drop NULL group keys (equi-join null
      // semantics). Anchor on the full distinct key set and left-join
      // the ONE multi-column result (round 17: all value columns share a
      // single scan/shuffle/window pipeline instead of one per column)
      // with null-safe key equality; a column with no values in a group
      // already reads NULL from the multi pipeline itself.
      val base = df.select(groupCols.map(col): _*).distinct()
      val r = exactGroupQuantilesMulti(
          df.select((groupCols ++ specs.map(_._1)).distinct.map(col): _*),
          groupCols, specs)
        .select(groupCols.map(c => col(c).as(s"__gq_$c")) ++
          specs.flatMap(_._3).map(col): _*)
      val cond = groupCols.map(c => base(c) <=> r(s"__gq_$c"))
        .reduce(_ && _)
      base.join(r, cond, "left")
        .drop(groupCols.map(c => s"__gq_$c"): _*)
    }
  }
}
