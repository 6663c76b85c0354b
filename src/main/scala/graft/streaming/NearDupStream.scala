package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup
import graft.operators.Dedup.NearDupIndex

/** Streaming incremental NEAR-dup dedup — the arrival-time twin of the
  * batch `d10_dedup_incremental_near` path: a document stream is probed
  * micro-batch by micro-batch against a [[NearDupIndex]] that starts from
  * the bootstrapped corpus and is extended with each arriving batch, so
  * later arrivals dedup against everything that came before — corpus AND
  * stream history — without ever re-reading or re-sketching a corpus
  * document.
  *
  * Semantics match the batch operator exactly (first-arrival-wins at
  * word-shingle Jaccard ≥ the index threshold; within a micro-batch,
  * smaller id = earlier arrival), so a corpus can be bootstrapped with
  * `buildNearDupIndex` + one batch `probeNearDups` pass and then kept
  * current by this stream — one semantic contract, two execution modes,
  * the same structure Curate uses for exact-fingerprint dedup.
  *
  * Why foreachBatch and not `dropDuplicatesWithinWatermark`: near-dup
  * matching needs candidate JOINS against an evolving index (two equi-joins
  * + a verification kernel per batch), which is not expressible as a keyed
  * state lookup — the key set of a near-dup match is unbounded. The
  * watermark-state route stays the right one for EXACT dedup (Curate);
  * this operator is the near-dup escalation of it.
  *
  * State discipline at 100 TB: the index lives in executor storage
  * (MEMORY_AND_DISK sketch layers, ~1 KB/doc), NOT in the streaming state
  * store — state-store entries are per-key and checkpointed every batch,
  * which would re-write the whole sketch set each commit. The index is
  * instead rebuilt (or loaded from a bucketed parquet sink) on restart,
  * exactly like a table-statistics cache. Probe cost per batch scales with
  * the batch, not the accumulated corpus (IncrementalDedupSpec asserts the
  * probe plan never re-scans corpus files).
  */
object NearDupStream {

  /** Mutable handle on the evolving index. The streaming engine runs
    * foreachBatch callbacks sequentially, so the only concurrency is
    * readers of [[index]] from other threads — volatile is sufficient for
    * visibility. A reader's handle stays PROBE-SAFE until the second
    * compaction after it was taken: [[run]] releases a compaction's
    * superseded layers one compaction LATE, and `Dedup.saveIndex` retains
    * one previous checkpoint generation, so both the cached layers and
    * the backing files of the previous index survive a full compaction
    * interval. Handles held across two compactions are out of contract.
    *
    * [[lastIndexedBatch]] is the newest batch durably folded into the
    * restored index (generation or write-ahead delta) — [[run]] uses it
    * to recognize engine-replayed batches that the index already
    * contains. */
  final class IndexState(initial: NearDupIndex,
      private[streaming] val restoredBatch: Long = -1L) {
    @volatile private var current: NearDupIndex = initial
    def index: NearDupIndex = current
    def lastIndexedBatch: Long = restoredBatch
    private[streaming] def adopt(next: NearDupIndex): Unit = current = next
  }

  /** Load-or-bootstrap the stream's index state — the restart story in one
    * call: if a `Dedup.saveIndex` checkpoint exists at `path`, restore the
    * newest committed generation PLUS every newer write-ahead delta (so
    * nothing a prior run durably folded is lost, even batches after its
    * last compaction); otherwise build the index from `corpus`, save the
    * bootstrap checkpoint, and reload THROUGH the saved artifact, so first
    * run and restart probe the identical layout. Pass the returned state
    * plus the same `path` as [[run]]'s `checkpointPath` — and give the
    * STREAMING ENGINE a checkpoint too (`queryCheckpointLocation`), so its
    * offset replay window and the index's durability line up. */
  def resume(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 2,
      threshold: Double = 0.6): IndexState =
    Dedup.loadIndexWithDeltas(spark, path) match {
      case Some((idx, lastBatch)) => new IndexState(idx, lastBatch)
      case None if Dedup.hasLegacyIndex(spark, path) =>
        // Pre-generational flat-layout checkpoint: load it rather than
        // silently rebuilding from `corpus` (which would drop every doc a
        // prior run folded). No batch-id metadata exists in that layout.
        new IndexState(Dedup.loadIndex(spark, path))
      case None =>
        val built =
          Dedup.buildNearDupIndex(corpus, idCol, textCol, shingleN, threshold)
        Dedup.saveIndex(built, path)
        // The bootstrap copy is superseded by the loaded artifact below;
        // releasing it keeps the long-lived stream at ONE resident index,
        // not two.
        Dedup.releaseIndex(built)
        new IndexState(Dedup.loadIndex(spark, path))
    }

  /** Start the dedup stream: each micro-batch is probed against the
    * current index, the kept (novel) rows are handed to `sink`, and the
    * FULL batch — kept and dropped alike — is folded into the index
    * (matching the batch contract: a doc that duplicates an already-
    * dropped earlier arrival is still a duplicate). One sketch pass per
    * batch serves both probe and extension; the state adopts the extended
    * index only after `sink` returns, so a sink failure never leaves docs
    * indexed-but-unsunk.
    *
    * Durability, when `checkpointPath` is set: the batch's new sketch
    * layer + kept-set are appended to a write-ahead delta log BEFORE the
    * sink runs, and every `compactEvery` batches the index is compacted
    * (flat-lineage checkpointed frames; plan depth and executor storage
    * stay bounded over an unbounded stream) and saved as a fresh
    * crash-safe generation, after which the folded deltas are dropped. A
    * batch the engine re-delivers after a crash (its offsets uncommitted,
    * but its fold already durable) is recognized via
    * `state.lastIndexedBatch`: its RECORDED kept-set is sunk and nothing
    * is re-folded — re-probing would find every doc already in the index
    * and silently emit zero kept rows. Superseded layer caches are
    * released one compaction late (see [[IndexState]]'s reader contract).
    *
    * `queryCheckpointLocation` is handed to the engine as its own
    * checkpoint so offset tracking survives restarts alongside the index
    * checkpoint. `compactEvery <= 0` disables compaction. */
  def run(
      docs: DataFrame,
      state: IndexState,
      idCol: String,
      textCol: String,
      compactEvery: Long = 100,
      checkpointPath: Option[String] = None,
      queryCheckpointLocation: Option[String] = None)(
      sink: DataFrame => Unit): StreamingQuery = {
    // Reader grace: layers retired at compaction N are unpersisted at
    // compaction N+1.
    var retired: Seq[DataFrame] = Nil
    // Batch-id rebase, engaged when the engine restarts WITHOUT its own
    // checkpoint: fresh queries renumber batches from 0, so new data can
    // arrive under an id the WAL already used. Once a collision is
    // detected, every subsequent batch's WAL bookkeeping uses
    // batchId + offset — a fresh id namespace above the restored
    // high-water mark, so a superseding entry never overwrites files the
    // restored index still reads.
    var idOffset = -1L
    val writer = docs.writeStream
    queryCheckpointLocation.fold(writer)(p =>
        writer.option("checkpointLocation", p))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // A batch id at-or-below the restored high-water mark is a genuine
        // engine replay ONLY if the write-ahead record covers exactly this
        // batch's docs; otherwise this is NEW data under a reused id that
        // must be folded normally — treating it as a replay would silently
        // drop it from the index and sink stale rows.
        val isReplay = idOffset < 0 && batchId <= state.lastIndexedBatch &&
          checkpointPath.exists(p =>
            Dedup.deltaMatchesBatch(spark, p, batchId, batch, idCol))
        if (isReplay) {
          checkpointPath.flatMap(p =>
              Dedup.checkpointKept(spark, p, batchId)) match {
            case Some(keptIds) =>
              sink(batch.join(keptIds.withColumnRenamed("doc_id", idCol),
                Seq(idCol), "left_semi"))
            case None =>
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"NearDupStream: batch $batchId replayed but its kept " +
                  s"record is gone from the checkpoint — emitting nothing " +
                  s"(the batch's docs are already in the index).")
          }
        } else {
          if (idOffset < 0 && batchId <= state.lastIndexedBatch) {
            idOffset = state.lastIndexedBatch + 1 - batchId
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"NearDupStream: batch $batchId reuses an already-folded id " +
                s"with different documents — engine restarted without its " +
                s"checkpoint (pass queryCheckpointLocation). Rebasing WAL " +
                s"ids by +$idOffset and folding as new data.")
          }
          val walId = batchId + math.max(0L, idOffset)
          val (keptIds, psets, ppref, extended) =
            Dedup.probeAndExtendParts(state.index, batch, idCol, textCol)
          checkpointPath.foreach(p =>
            Dedup.appendIndexDelta(p, walId, psets, ppref,
              batch.select(col(idCol).cast("long").as("doc_id")), keptIds))
          sink(batch.join(keptIds.withColumnRenamed("doc_id", idCol),
            Seq(idCol), "left_semi"))
          val next =
            if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
              val toRelease = retired
              retired = extended.layers
              val compacted = Dedup.compactIndex(extended, releaseOld = false)
              checkpointPath.foreach { p =>
                Dedup.saveIndex(compacted, p, batchId = walId,
                  kept = Some(keptIds))
                // Keep this batch's own delta: its id-list is what future
                // replay detection for the generation batch checks.
                Dedup.clearIndexDeltas(spark, p, upTo = walId - 1)
              }
              toRelease.foreach(_.unpersist(false))
              compacted
            } else extended
          state.adopt(next)
        }
      }
      .start()
  }
}
