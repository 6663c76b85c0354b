package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The continuous training-data pipeline END TO END — the composition the
  * individual arrival streams exist for:
  *
  *   arrivals → stateless quality gate ([[Curate.qualityGate]])
  *            → exact dedup vs corpus + stream history ([[FpDedupStream]])
  *            → tokenize-and-pack into context windows ([[PackStream]])
  *            → batch-id-keyed idempotent pack shards on disk.
  *
  * Nothing new is invented here — the composition IS the design: the dedup
  * loop's per-batch sink slot takes `PackStream.processBatch` directly, so
  * the two stages share one batch id and the crash story composes without
  * new machinery. A replayed batch (crash anywhere between the WAL delta
  * and the engine's offsets commit) sinks the dedup stage's RECORDED
  * kept-set under its original id; that kept-set is a pure function of the
  * recorded ids, so the pack stage's recompute from its retained base
  * generation is bit-identical and its idempotent per-batch sink overwrites
  * rather than appends — exactly-once landed packs through a two-stage,
  * two-checkpoint pipeline. Both stages rebase independently on id reuse
  * (engine restarted without its checkpoint) and arrive at the same
  * effective numbering because they see the same batch sequence.
  *
  * Bootstrap trains/builds BOTH stages from the same curated corpus view —
  * gate, then content-fingerprint dedup — because the index must represent
  * "what already entered the export" (a low-quality corpus doc never
  * exported should NOT suppress a clean arrival twin), and the tokenizer
  * must be trained on the distribution the stream will actually pack.
  *
  * Scale: the gate is a narrow filter; the dedup probe is one
  * fingerprint-equi join against a content-sized index; packing shuffles
  * docs + packs, never tokens. State across an unbounded stream is the
  * fingerprint set (32 B / distinct doc, compacted generationally) plus
  * window−1 carried token ids per shard. */
object ExportPipeline {

  /** Both stages' restored state under one root: the fingerprint index at
    * `$path/fp`, the frozen tokenizer + packing state at `$path/pack`. */
  final class Handles(
      val dedup: FpDedupStream.IndexState,
      val pack: PackStream.Handle,
      val fpCheckpoint: String)

  /** The curated view of a batch frame: the arrival gate plus (batch-mode)
    * content-fingerprint dedup — what the BOOTSTRAP corpus must pass
    * through so stream and corpus meet the same bar. */
  private def curatedCorpus(corpus: DataFrame, idCol: String,
      textCol: String, minTokens: Int, minDistinctRatio: Double): DataFrame = {
    import org.apache.spark.sql.functions.col
    Curate.dedupWithinWatermark(
      Curate.qualityGate(corpus, minTokens, minDistinctRatio))
      .select(col(idCol), col(textCol))
  }

  /** Load-or-bootstrap both stages ([[FpDedupStream.resume]] contract each):
    * on first run the corpus is gated + deduped ONCE and feeds both the
    * fingerprint-index build and the tokenizer training; on restart both
    * stages restore their newest committed generation (plus the dedup
    * stage's outstanding WAL deltas) and the corpus frame is not read. */
  def resume(
      spark: SparkSession,
      path: String,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Long = 8L,
      nMerges: Int = 24,
      window: Int = 1024,
      minTokens: Int = 10,
      minDistinctRatio: Double = 0.3): Handles = {
    // Materialize the curated corpus once if EITHER stage needs to
    // bootstrap — both consume it, and recomputing the gate + dedup per
    // stage would double the corpus scan.
    lazy val curated = {
      val c = curatedCorpus(corpus, idCol, textCol, minTokens,
        minDistinctRatio)
      c.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    var usedCurated = false
    // Existence probe only — FpDedupStream.resume does the actual load, and
    // loadFpIndexWithDeltas persists index layers, so calling IT twice
    // would leave a duplicate resident copy.
    val fpBootstrapped = {
      val root = new org.apache.hadoop.fs.Path(s"$path/fp")
      val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.exists(root) && f.listStatus(root).exists(st => st.isDirectory &&
        st.getPath.getName.matches("g\\d+") &&
        f.exists(new org.apache.hadoop.fs.Path(
          s"$path/fp/${st.getPath.getName}/params/_SUCCESS")))
    }
    val dedup =
      if (!fpBootstrapped) {
        usedCurated = true
        FpDedupStream.resume(spark, s"$path/fp", curated, idCol, textCol)
      } else FpDedupStream.resume(spark, s"$path/fp", corpus.limit(0),
        idCol, textCol)
    val packBootstrapped = {
      val f = new org.apache.hadoop.fs.Path(s"$path/pack/model/params/_SUCCESS")
      f.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(f)
    }
    val pack =
      if (!packBootstrapped) {
        usedCurated = true
        PackStream.resume(spark, s"$path/pack", curated, idCol, textCol,
          nShards, nMerges, window)
      } else PackStream.resume(spark, s"$path/pack", corpus.limit(0),
        idCol, textCol)
    if (usedCurated) curated.unpersist(false)
    new Handles(dedup, pack, s"$path/fp")
  }

  /** Start the pipeline: gated novel-content docs pack into
    * `outPath/b<id>/` shards; everything else drops. `keptSink`, when
    * given, additionally receives each batch's kept DOC rows (the audit
    * tap — what entered the export and under which batch id). */
  def run(
      docs: DataFrame,
      handles: Handles,
      idCol: String,
      textCol: String,
      outPath: String,
      compactEvery: Long = 100,
      queryCheckpointLocation: Option[String] = None,
      // Must match the values resume() curated the corpus with — the gate
      // is stateless, so the contract is the caller's to keep (the same
      // way the watermark is on Curate's stream).
      minTokens: Int = 10,
      minDistinctRatio: Double = 0.3,
      keptSink: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery =
    FpDedupStream.runBatches(
      Curate.qualityGate(docs, minTokens, minDistinctRatio)
        .select(docs.columns.map(org.apache.spark.sql.functions.col)
          .toIndexedSeq: _*),
      handles.dedup, idCol, textCol, compactEvery,
      checkpointPath = Some(handles.fpCheckpoint),
      queryCheckpointLocation = queryCheckpointLocation) { (kept, walId) =>
      PackStream.processBatch(handles.pack, kept, walId, idCol, textCol,
        outPath)
      keptSink(kept, walId)
    }
}
