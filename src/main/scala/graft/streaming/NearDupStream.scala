package graft.streaming

import org.apache.spark.sql.DataFrame
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
    * readers of [[index]] from other threads — volatile is sufficient. */
  final class IndexState(initial: NearDupIndex) {
    @volatile private var current: NearDupIndex = initial
    def index: NearDupIndex = current
    private[streaming] def adopt(next: NearDupIndex): Unit = current = next
  }

  /** Load-or-bootstrap the stream's index state — the restart story in one
    * call: if a `Dedup.saveIndex` checkpoint exists at `path`, load it (no
    * corpus re-read; the bucketed probe layout comes back via the catalog
    * re-registration in `Dedup.loadIndex`); otherwise build the index from
    * `corpus`, save the bootstrap checkpoint, and reload THROUGH the saved
    * artifact, so first run and restart probe the identical layout. Pass
    * the returned state plus the same `path` as [[run]]'s `checkpointPath`
    * and the stream keeps its own checkpoint current at each compaction. */
  def resume(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 2,
      threshold: Double = 0.6): IndexState = {
    val params = new org.apache.hadoop.fs.Path(s"$path/params")
    val fs = params.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(params))
      Dedup.saveIndex(
        Dedup.buildNearDupIndex(corpus, idCol, textCol, shingleN, threshold),
        path)
    new IndexState(Dedup.loadIndex(spark, path))
  }

  /** Start the dedup stream: each micro-batch is probed against the
    * current index, the kept (novel) rows are handed to `sink`, and the
    * FULL batch — kept and dropped alike — is folded into the index
    * (matching the batch contract: a doc that duplicates an already-
    * dropped earlier arrival is still a duplicate). One sketch pass per
    * batch serves both probe and extension (Dedup.probeAndExtend); the
    * state adopts the extended index only after `sink` returns, so a sink
    * failure never leaves docs indexed-but-unsunk.
    *
    * Every `compactEvery` micro-batches the index is compacted
    * (Dedup.compactIndex): the per-batch union layers are rebuilt into
    * flat-lineage checkpointed frames and the superseded layer persists
    * are released, so both plan depth and executor storage stay bounded
    * over an UNBOUNDED stream — without compaction each batch adds a
    * union node that every later probe re-plans. When `checkpointPath` is
    * set, each compacted index is also saved there (Dedup.saveIndex, the
    * bucketed restart artifact) — compaction-then-save order matters: the
    * compacted frames have no file lineage, so saving over the path the
    * index was originally loaded from is safe. `compactEvery <= 0`
    * disables compaction (and checkpointing). */
  def run(
      docs: DataFrame,
      state: IndexState,
      idCol: String,
      textCol: String,
      compactEvery: Long = 100,
      checkpointPath: Option[String] = None)(
      sink: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (keptIds, extended) =
          Dedup.probeAndExtend(state.index, batch, idCol, textCol)
        sink(batch.join(keptIds.withColumnRenamed("doc_id", idCol),
          Seq(idCol), "left_semi"))
        val next =
          if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
            val compacted = Dedup.compactIndex(extended)
            checkpointPath.foreach(p => Dedup.saveIndex(compacted, p))
            compacted
          } else extended
        state.adopt(next)
      }
      .start()
}
