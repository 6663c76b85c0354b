package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation over the `events` schema — the
  * canonical Structured Streaming shape (`readStream` → watermark →
  * `window()` groupBy → `writeStream`), usable identically on a batch
  * DataFrame for backfill. The watermark bounds state: windows older than
  * it are finalized and evicted, so state size tracks the late-data
  * horizon, not the stream's history — this is what makes the operator
  * runnable forever on an unbounded stream.
  */
object Windowed {

  /** Per-(window, event_type) count and value sum over tumbling windows of
    * `width`. Late rows beyond `watermark` are dropped (streaming) /
    * included (batch backfill — batch has no lateness). */
  def typeCounts(events: DataFrame, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
  }
}
