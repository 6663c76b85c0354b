package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Streaming ingest curation over a document stream
  * `(doc_id, ts, text, lang)` — the arrival-time twin of the batch
  * `x1_curation_pipeline` stages that are streaming-expressible:
  *
  *   stateless quality gate → watermark-bounded exact dedup →
  *   windowed per-language acceptance stats.
  *
  * Every stage runs identically on a batch DataFrame (backfill), so a
  * corpus can be bootstrapped in batch and kept current by the stream with
  * one code path.
  */
object Curate {

  /** Stateless quality gate — the same predicate as the batch pipeline's
    * first stage (token count + lexical diversity). A narrow map+filter:
    * trivially streaming-safe, no state, no shuffle. */
  def qualityGate(docs: DataFrame, minTokens: Int = 10,
      minDistinctRatio: Double = 0.3): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .withColumn("n_tokens", size(toks))
      .withColumn("n_distinct", size(array_distinct(toks)))
      .where(col("n_tokens") >= minTokens &&
        col("n_distinct") / col("n_tokens") >= minDistinctRatio)
      .drop("n_distinct")
  }

  /** Watermark-bounded exact dedup: the first document per content
    * fingerprint survives; re-arrivals within `watermark` of the watermark
    * front are dropped. State per fingerprint is EVICTED once the watermark
    * passes it (`dropDuplicatesWithinWatermark`), so state size tracks the
    * dedup horizon, not stream history — the property that makes this
    * runnable forever; unbounded-history dedup belongs in the batch layer
    * (d1/d8), with this operator absorbing the near-real-time window.
    * On a batch frame it degrades to plain fingerprint dropDuplicates. */
  def dedupWithinWatermark(docs: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val fp = docs.withColumn("fp", TextOps.fingerprint(col("text")))
    if (docs.isStreaming)
      fp.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("fp")
    else fp.dropDuplicates("fp")
  }

  /** Per-(window, lang) accepted-doc counts and mean token length over
    * tumbling windows — the monitoring tail of the curation stream. */
  def langWindowStats(docs: DataFrame, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val src =
      if (docs.isStreaming) docs.withWatermark("ts", watermark) else docs
    src
      .groupBy(window(col("ts"), width).as("w"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_tokens")), 2).as("avg_tokens"))
      .select(col("w.start").as("window_start"), col("lang"),
        col("n_docs"), col("avg_tokens"))
  }

  /** The full stream: gate → dedup → (doc rows out). Stats are a separate
    * sink on the same deduped stream. */
  def curated(docs: DataFrame, minTokens: Int = 10,
      minDistinctRatio: Double = 0.3, watermark: String = "1 hour"): DataFrame =
    dedupWithinWatermark(
      qualityGate(docs, minTokens, minDistinctRatio), watermark)
}
