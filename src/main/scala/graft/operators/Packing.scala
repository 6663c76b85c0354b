package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-window sequence packing over per-doc token-id arrays — the
  * context-window assembly step of a training-data export (x7's core,
  * factored out so the streaming arrival twin packs through the exact same
  * machinery).
  *
  * Scale shape: shuffle volume is docs + packs, never tokens. Cumulative
  * per-shard offsets run over DOC rows (one window exchange keyed by
  * shard), then one exploded row per (doc, pack it overlaps) carries its
  * token-id SLICE as an array payload into the pack groupBy — whose groups
  * are bounded at the window size by construction. */
object Packing {

  /** Pack `ids` — (doc_id long, shard long, tids array<long>) — into
    * windows of `window` tokens per shard, docs ordered by `orderCols`
    * (doc_id by default) within their shard. Returns (shard, pack_id,
    * n_tokens, tids) with pack ids relative to position 0 of each shard's
    * stream; every pack except each shard's last is exactly `window`
    * tokens.
    *
    * The cumulative-offset window runs with an explicit ROWS frame and a
    * content-hash tiebreak appended to `orderCols`: with the default RANGE
    * frame, two rows tying on the sort key would both receive the full
    * tie-group sum and their slices would overlap (silently duplicating
    * and dropping tokens) — and a ROWS frame alone would order ties
    * nondeterministically, breaking the bit-identical-replay contract.
    * With the tiebreak, ties are either distinct-content (hash-ordered,
    * deterministic) or identical rows (interchangeable, so any order packs
    * the same bytes). */
  def packWindows(ids: DataFrame, window: Int = 1024,
      orderCols: Seq[String] = Seq("doc_id")): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val withN = ids
      .select((orderCols.filterNot(_ == "doc_id").map(col) ++
        Seq(col("doc_id"), col("shard"), col("tids"))): _*)
      .withColumn("n_tokens", size(col("tids")).cast("long"))
      .where(col("n_tokens") > 0)
    val ord = orderCols.map(col) :+ xxhash64(col("tids"))
    val offs = withN.withColumn("start_tok",
      sum("n_tokens").over(
        Window.partitionBy("shard").orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - col("n_tokens"))
    val slices = offs
      .select(col("shard"), col("tids"), col("n_tokens"), col("start_tok"),
        explode(sequence(expr(s"start_tok div $window"),
          expr(s"(start_tok + n_tokens - 1) div $window"))).as("pack_id"))
      .withColumn("lo", greatest(
        col("pack_id") * window - col("start_tok"), lit(0L)))
      .withColumn("hi", least(
        (col("pack_id") + 1) * window - col("start_tok"), col("n_tokens")))
      .select(col("shard"), col("pack_id"),
        (col("start_tok") + col("lo") - col("pack_id") * window).as("off"),
        slice(col("tids"), (col("lo") + 1).cast("int"),
          (col("hi") - col("lo")).cast("int")).as("seg"))
    slices
      .groupBy("shard", "pack_id")
      .agg(sum(size(col("seg"))).cast("long").as("n_tokens"),
        flatten(transform(
          array_sort(collect_list(struct(
            col("off").as("o"), col("seg").as("seg")))),
          x => x.getField("seg"))).as("tids"))
  }
}
