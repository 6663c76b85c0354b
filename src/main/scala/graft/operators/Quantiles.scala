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
  *   3. per-group totals join back (broadcast — one row per group);
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
  * (group, value) → per-group distinct-value window → tiny broadcast join
  * → final agg. Nothing buffers a raw group; a single-key skew lands on
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
    val ranked = cnts.withColumn("__cum", sum(col("__cnt")).over(w))

    // (3) per-group totals — one row per group, broadcast. Null-safe key
    // equality: a NULL group key is a real group (the built-in keeps it),
    // and a plain equi-join would silently drop it.
    val totals = vals.groupBy(g: _*).agg(count(lit(1)).as("__n"))
      .select(groupCols.map(c => col(c).as(s"__gqt_$c")) :+ col("__n"): _*)
    val joined = ranked.join(broadcast(totals),
        groupCols.map(c => ranked(c) <=> totals(s"__gqt_$c")).reduce(_ && _))
      .drop(groupCols.map(c => s"__gqt_$c"): _*)

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
      // rows, not just the same numbers): exactGroupQuantiles drops a
      // group whose values are ALL NULL (the built-in returns the group
      // with NULL percentiles), and a plain USING join would drop NULL
      // group keys (equi-join null semantics). Anchor on the full
      // distinct key set and left-join each column's result with
      // null-safe key equality.
      val base = df.select(groupCols.map(col): _*).distinct()
      specs.foldLeft(base) { case (acc, (v, probs, outs)) =>
        val r = exactGroupQuantiles(
            df.select((groupCols :+ v).map(col): _*),
            groupCols, v, probs, outs)
          .select(groupCols.map(c => col(c).as(s"__gq_$c")) ++
            outs.map(col): _*)
        val cond = groupCols.map(c => acc(c) <=> r(s"__gq_$c"))
          .reduce(_ && _)
        acc.join(r, cond, "left")
          .drop(groupCols.map(c => s"__gq_$c"): _*)
      }
    }
  }
}
