package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The continuous training-data pipeline END TO END — the composition the
  * individual arrival streams exist for:
  *
  *   arrivals → stateless quality gate ([[Curate.qualityGate]])
  *            → exact dedup vs corpus + stream history ([[FpDedupStream]])
  *            → NEAR-dup (fuzzy) dedup vs corpus + stream history
  *              ([[NearDupStream]] as a mid-pipeline batch loop)
  *            → OPTIONAL boilerplate gate: ExactSubstr duplicated-window
  *              ratio vs corpus + stream history ([[SubstringStream]] as
  *              a fourth batch-loop stage — the C4/RefinedWeb shape's
  *              recycled-content strip, enabled at bootstrap)
  *            → tokenize-and-pack into context windows ([[PackStream]])
  *            → batch-id-keyed idempotent pack shards on disk.
  *
  * Nothing new is invented here — the composition IS the design: the exact
  * stage's per-batch sink slot calls the near-dup stage's
  * [[DedupLoop.BatchLoop.processBatch]], whose sink slot calls
  * `PackStream.processBatch`, so all three stages share one batch id and
  * the crash story composes without new machinery. A replayed batch (crash
  * anywhere between a WAL delta and the engine's offsets commit) sinks
  * each dedup stage's RECORDED kept-set under its original id; those
  * kept-sets are pure functions of the recorded ids, so the pack stage's
  * recompute from its retained base generation is bit-identical and its
  * idempotent per-batch sink overwrites rather than appends —
  * exactly-once landed packs through a three-stage, three-checkpoint
  * pipeline. All stages rebase independently on id reuse (engine
  * restarted without its checkpoint) and arrive at the same effective
  * numbering because they see the same batch sequence.
  *
  * Why fuzzy dedup is IN the flagship path: exact fingerprints only stop
  * byte-identical re-posts — a re-posted doc with one edited sentence
  * sails through an exact gate into the training export, which is exactly
  * the contamination near-dup dedup exists for (the C4/RefinedWeb
  * curation shape: gate → exact → fuzzy → pack). Exact runs FIRST because
  * its probe is one fingerprint-equi join (cheap) and every doc it drops
  * is one the near-dup stage neither probes nor sketches.
  *
  * Bootstrap trains/builds ALL stages from the same curated corpus view —
  * gate, then content-fingerprint dedup — because the indexes must
  * represent "what already entered the export" (a low-quality corpus doc
  * never exported should NOT suppress a clean arrival twin), and the
  * tokenizer must be trained on the distribution the stream will actually
  * pack. The gate thresholds are PERSISTED at bootstrap and re-adopted on
  * every resume: the stream's gate can never silently diverge from the
  * bar the corpus was curated with.
  *
  * Scale: the gate is a narrow filter; the exact probe is one
  * fingerprint-equi join against a content-sized index; the near-dup
  * probe is the prefix-filtered candidate join over exact-novel docs
  * only; packing shuffles docs + packs, never tokens. State across an
  * unbounded stream is the fingerprint set (32 B / distinct doc) plus the
  * near-dup sketch layers (~1 KB / distinct doc), both compacted
  * generationally, plus window−1 carried token ids per shard. */
object ExportPipeline {

  /** All stages' restored state under one root: the fingerprint index at
    * `$path/fp`, the near-dup index at `$path/nd`, the OPTIONAL substring
    * gate at `$path/ss`, the frozen tokenizer + packing state at
    * `$path/pack`, and the bootstrap gate thresholds (persisted at
    * `$path/gate`, carried here so [[run]] uses exactly the values the
    * corpus was curated with). */
  final class Handles(
      val dedup: FpDedupStream.IndexState,
      val near: NearDupStream.IndexState,
      val pack: PackStream.Handle,
      val fpCheckpoint: String,
      val ndCheckpoint: String,
      val minTokens: Int,
      val minDistinctRatio: Double,
      /** Fourth stage when enabled at bootstrap: (state, checkpoint,
        * minOccurrences, maxDupRatio) of the ExactSubstr boilerplate
        * gate. */
      val substr: Option[(SubstringStream.IndexState, String, Int, Double)]
        = None)

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

  /** Load-or-bootstrap every stage ([[FpDedupStream.resume]] contract
    * each): on first run the corpus is gated + deduped ONCE and feeds the
    * fingerprint-index build, the near-dup index build, and the tokenizer
    * training, and the gate thresholds are committed to
    * `$path/gate/params`; on restart every stage restores its newest
    * committed generation (plus the dedup stages' outstanding WAL deltas),
    * the corpus frame is not read, and the PERSISTED gate thresholds are
    * adopted — caller-passed values that disagree with them are rejected
    * loudly rather than silently re-gating the stream at a different bar
    * than the index contents were curated with. */
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
      minDistinctRatio: Double = 0.3,
      shingleN: Int = 2,
      threshold: Double = 0.6,
      /** Enable the fourth stage (ExactSubstr boilerplate gate) — decided
        * at BOOTSTRAP and persisted: a resume that disagrees with the
        * persisted choice fails loudly (an index that missed part of the
        * stream history can't be enabled retroactively, and silently
        * dropping a configured gate would un-curate the export). */
      substringGate: Boolean = false,
      ssWindowTokens: Int = 8,
      ssMinOccurrences: Int = 2,
      ssMaxDupRatio: Double = 0.5,
      /** Tokenizer FAMILY for the pack stage ("bpe" | "unigram" | "" =
        * inherit): frozen at bootstrap inside PackStream's own params —
        * an explicit value that disagrees with the persisted family
        * fails loudly there (the gate-params pattern). */
      tokenizer: String = ""): Handles = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gateDir = s"$path/gate/params"
    val gateCommitted = fs.exists(
      new org.apache.hadoop.fs.Path(s"$gateDir/_SUCCESS"))
    // Adopt-or-verify the persisted gate thresholds FIRST — every
    // bootstrap-vs-restart decision below must use the effective values.
    val (gMinTokens, gMinDistinct) =
      if (gateCommitted) {
        val p = spark.read.parquet(gateDir).head()
        val stored = (p.getAs[Int]("min_tokens"),
          p.getAs[Double]("min_distinct_ratio"))
        require(stored == ((minTokens, minDistinctRatio)),
          s"ExportPipeline.resume: caller gate params ($minTokens, " +
            s"$minDistinctRatio) disagree with the thresholds this export " +
            s"was bootstrapped with $stored at $gateDir — pass the stored " +
            "values (or the defaults they equal) rather than silently " +
            "re-gating the stream at a different bar.")
        stored
      } else {
        // Gate params commit FIRST, before any stage bootstraps: a crash
        // after a stage's generation committed but before the thresholds
        // were recorded would let a restart with different caller values
        // silently curate the remaining stages at a different bar than
        // the committed one — the exact divergence this persistence
        // exists to reject. Committed-params-but-no-stages after a crash
        // here just means the next resume adopts (or explicitly rejects)
        // these values before building anything.
        import spark.implicits._
        Seq((minTokens, minDistinctRatio))
          .toDF("min_tokens", "min_distinct_ratio")
          .coalesce(1).write.mode("overwrite").parquet(gateDir)
        (minTokens, minDistinctRatio)
      }
    // Materialize the curated corpus once if ANY stage needs to
    // bootstrap — all consume it, and recomputing the gate + dedup per
    // stage would multiply the corpus scan.
    lazy val curated = {
      val c = curatedCorpus(corpus, idCol, textCol, gMinTokens, gMinDistinct)
      c.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    var usedCurated = false
    def hasGen(sub: String): Boolean = {
      val root = new org.apache.hadoop.fs.Path(s"$path/$sub")
      fs.exists(root) && fs.listStatus(root).exists(st => st.isDirectory &&
        st.getPath.getName.matches("g\\d+") &&
        fs.exists(new org.apache.hadoop.fs.Path(
          s"$path/$sub/${st.getPath.getName}/params/_SUCCESS")))
    }
    // Substring-gate enablement is a BOOTSTRAP decision, persisted like
    // the quality-gate thresholds: its index must have seen every batch
    // that ever folded, so it can neither be enabled retroactively nor
    // silently dropped on a later resume.
    val ssCfgDir = s"$path/ss/params_cfg"
    val ssCommitted = fs.exists(
      new org.apache.hadoop.fs.Path(s"$ssCfgDir/_SUCCESS"))
    val ssCfg: Option[(Int, Int, Double)] =
      if (ssCommitted) {
        require(substringGate,
          "ExportPipeline.resume: this export was bootstrapped WITH the " +
            s"substring gate (config at $ssCfgDir) but the caller " +
            "disabled it — resuming without a configured stage would " +
            "un-curate the stream.")
        val p = spark.read.parquet(ssCfgDir).head()
        val stored = (p.getAs[Int]("window_tokens"),
          p.getAs[Int]("min_occurrences"), p.getAs[Double]("max_dup_ratio"))
        require(stored ==
            ((ssWindowTokens, ssMinOccurrences, ssMaxDupRatio)),
          s"ExportPipeline.resume: caller substring-gate params " +
            s"($ssWindowTokens, $ssMinOccurrences, $ssMaxDupRatio) " +
            s"disagree with the persisted $stored at $ssCfgDir.")
        Some(stored)
      } else if (substringGate) {
        require(!hasGen("fp"),
          "ExportPipeline.resume: cannot enable the substring gate on an " +
            "already-bootstrapped export — its index would have missed " +
            "the stream history the other stages folded. Start a new " +
            "export root (or replay the corpus through a fresh one).")
        import spark.implicits._
        Seq((ssWindowTokens, ssMinOccurrences, ssMaxDupRatio))
          .toDF("window_tokens", "min_occurrences", "max_dup_ratio")
          .coalesce(1).write.mode("overwrite").parquet(ssCfgDir)
        Some((ssWindowTokens, ssMinOccurrences, ssMaxDupRatio))
      } else None
    // Existence probes only — each stage's resume does the actual load,
    // and the loaders persist index layers, so calling THEM twice would
    // leave duplicate resident copies.
    val dedup =
      if (!hasGen("fp")) {
        usedCurated = true
        FpDedupStream.resume(spark, s"$path/fp", curated, idCol, textCol)
      } else FpDedupStream.resume(spark, s"$path/fp", corpus.limit(0),
        idCol, textCol)
    val near =
      if (!hasGen("nd")) {
        usedCurated = true
        NearDupStream.resume(spark, s"$path/nd", curated, idCol, textCol,
          shingleN, threshold)
      } else NearDupStream.resume(spark, s"$path/nd", corpus.limit(0),
        idCol, textCol, shingleN, threshold)
    val substr = ssCfg.map { case (wt, mo, mr) =>
      val st =
        if (!hasGen("ss")) {
          usedCurated = true
          SubstringStream.resume(spark, s"$path/ss", curated, idCol,
            textCol, wt)
        } else SubstringStream.resume(spark, s"$path/ss", corpus.limit(0),
          idCol, textCol, wt)
      (st, s"$path/ss", mo, mr)
    }
    val packBootstrapped = fs.exists(
      new org.apache.hadoop.fs.Path(s"$path/pack/model/params/_SUCCESS"))
    val pack =
      if (!packBootstrapped) {
        usedCurated = true
        PackStream.resume(spark, s"$path/pack", curated, idCol, textCol,
          nShards, nMerges, window, tokenizer)
      } else PackStream.resume(spark, s"$path/pack", corpus.limit(0),
        idCol, textCol, tokenizer = tokenizer)
    if (usedCurated) curated.unpersist(false)
    new Handles(dedup, near, pack, s"$path/fp", s"$path/nd",
      gMinTokens, gMinDistinct, substr)
  }

  /** The pipeline's own dedup indexes as [[TakedownStream.Targets]] — the
    * GDPR composition: a takedown feed pointed here withdraws content
    * from BOTH the exact and the fuzzy gate, so a future re-post of
    * withdrawn content (or a near-variant of it) re-enters the export.
    * Safe alongside the RUNNING pipeline: every per-batch mutation of an
    * index state is serialized through the state's own exclusive section
    * ([[DedupLoop.IndexState.withExclusive]]).
    *
    * Pass `exportOut` (the same `outPath` given to [[run]]) to ALSO
    * register the landed packs: a `family=export` event then erases the
    * doc's tokens from the already-written shards — full erasure is the
    * PAIR of events (fp/nd withdraw the gates so re-posts re-enter,
    * export erases what already left). The takedown batch holds the
    * exact-dedup stage's state lock for its whole application, so the
    * retraction never interleaves with an in-flight pipeline fold. */
  def takedownTargets(handles: Handles,
      exportOut: Option[String] = None): TakedownStream.Targets =
    TakedownStream.Targets(
      fp = Some((handles.dedup, handles.fpCheckpoint)),
      nd = Some((handles.near, handles.ndCheckpoint)),
      ss = handles.substr.map { case (st, ckpt, _, _) => (st, ckpt) },
      export = exportOut.map(p => (handles.pack, p)))

  /** Start the pipeline: gated, exact-novel, NEAR-novel docs pack into
    * `outPath/b<id>/` shards; everything else drops. `keptSink`, when
    * given, additionally receives each batch's surviving DOC rows after
    * ALL dedup stages (the audit tap — what entered the export and under
    * which batch id). The gate runs with the thresholds persisted at
    * bootstrap ([[Handles.minTokens]]/[[Handles.minDistinctRatio]]) — not
    * caller-supplied, so it cannot diverge from the corpus curation.
    *
    * `compactEvery` drives the INDEX families' generational compaction;
    * `compactPacksEvery` drives the LANDED pack layout's small-files
    * compaction ([[PackStream.compactPacks]], 0 disables) — without it a
    * forever-running export fragments one directory per batch per shard
    * without bound. The sweep fires inside the pack stage's slot of the
    * per-batch fold, after the batch's sink and state commit, so it is
    * serialized against every pack-layout writer the pipeline owns (the
    * single-writer contract `Sink.compact` requires). */
  def run(
      docs: DataFrame,
      handles: Handles,
      idCol: String,
      textCol: String,
      outPath: String,
      compactEvery: Long = 100,
      queryCheckpointLocation: Option[String] = None,
      keptSink: (DataFrame, Long) => Unit = (_, _) => (),
      compactPacksEvery: Long = 100,
      packTargetBytesPerFile: Long = 128L << 20): StreamingQuery = {
    // Finish/roll back any leaf swap a mid-compaction crash left behind
    // BEFORE the stream (and its readers) start.
    if (compactPacksEvery > 0)
      graft.sources.Sink.compactRecover(docs.sparkSession, outPath)
    val nd = NearDupStream.batchLoop(handles.near, idCol, textCol,
      compactEvery, checkpointPath = Some(handles.ndCheckpoint))
    // Optional fourth stage: the ExactSubstr boilerplate gate, between
    // the near-dup stage and packing, on the same shared batch id (its
    // own WAL/replay/compaction via the common BatchLoop — the crash
    // story composes unchanged, now across four checkpoints). Runs LAST
    // of the gates: every doc the cheaper content gates drop is one whose
    // windows are never counted.
    val ss = handles.substr.map { case (st, ckpt, minOcc, maxRatio) =>
      SubstringStream.batchLoop(st, idCol, textCol, minOcc, maxRatio,
        compactEvery, checkpointPath = Some(ckpt))
    }
    def packStage(batch: DataFrame, id: Long): Unit = {
      val eff = PackStream.processBatch(handles.pack, batch, id, idCol,
        textCol, outPath)
      if (compactPacksEvery > 0 && (eff + 1) % compactPacksEvery == 0)
        PackStream.compactPacks(batch.sparkSession, handles.pack, outPath,
          upTo = eff, targetBytesPerFile = packTargetBytesPerFile): Unit
      keptSink(batch, id)
    }
    FpDedupStream.runBatches(
      Curate.qualityGate(docs, handles.minTokens, handles.minDistinctRatio)
        .select(docs.columns.map(org.apache.spark.sql.functions.col)
          .toIndexedSeq: _*),
      handles.dedup, idCol, textCol, compactEvery,
      checkpointPath = Some(handles.fpCheckpoint),
      queryCheckpointLocation = queryCheckpointLocation) { (kept, walId) =>
      nd.processBatch(kept, walId) { (ndKept, ndId) =>
        ss match {
          case Some(loop) =>
            loop.processBatch(ndKept, ndId) { (ssKept, ssId) =>
              packStage(ssKept, ssId)
            }
          case None => packStage(ndKept, ndId)
        }
      }
    }
  }
}
