package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyless point-in-interval range join.
  *
  * Spark plans a pure range predicate (`p.ts between i.start and i.end`,
  * no equality) as a broadcast-nested-loop join — O(|points|·|intervals|)
  * comparisons and a full broadcast of one side, which stops working the
  * moment neither side is tiny. Chunk-bucketing restores an equi-join:
  * quantize time into fixed chunks, explode each interval onto every chunk
  * it overlaps (`sequence` — map-side, no shuffle), map each point to its
  * single chunk, hash-join on the chunk id, then re-check the exact range
  * predicate. Each (point, interval) match surfaces exactly once because a
  * point lives in exactly one chunk. Work becomes O(matches + chunks
  * touched) and the shuffle is an ordinary hash exchange on chunk id —
  * skew only if many intervals stack on one time chunk, which
  * `chunkSeconds` tunes (pick it near the median interval length).
  *
  * Equi+range joins (key AND time band) don't need this — Spark's
  * sort-merge join on the key with the range as residual filter is already
  * the right plan; see e2's sessionize or [[AsOf.join]] for those shapes.
  */
object RangeJoin {

  /** Inner join of `points` (timestamp `pointTs`) with `intervals`
    * ([`startTs`, `endTs`), end-exclusive): every (point, interval) pair
    * with start ≤ p < end. Column sets must be disjoint. */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String,
      startTs: String,
      endTs: String,
      chunkSeconds: Long = 3600L): DataFrame = {
    require(chunkSeconds > 0, "chunkSeconds must be positive")
    val chunkOf = (t: org.apache.spark.sql.Column) =>
      floor(unix_timestamp(t) / chunkSeconds)
    val p = points.withColumn("__chunk", chunkOf(col(pointTs)))
    // End-exclusive: an interval touching a chunk boundary exactly at its
    // end contributes no point there, but the extra chunk row is harmless
    // (filtered by the exact predicate).
    val i = intervals.withColumn("__chunk",
      explode(sequence(chunkOf(col(startTs)), chunkOf(col(endTs)))))
    p.join(i, "__chunk")
      .where(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("__chunk")
  }
}
