package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.NearDupStream

/** Child-JVM harness for the kill -9 crash-restart test (CrashRestartSpec).
  * Runs the NearDupStream arrival path against a file source and — when
  * `killAfter >= 0` — dies via `Runtime.halt` (the in-process equivalent of
  * SIGKILL: no shutdown hooks, no finally blocks, no checkpoint flush) at a
  * precisely chosen crash point: AFTER the batch's write-ahead delta is
  * durable, BEFORE its kept rows reach the sink and before the engine
  * commits offsets. That is the crash the WAL replay contract exists for.
  *
  * args: idxCkpt queryCkpt srcDir sinkDir killAfterBatches [mode] [killPoint]
  *   - srcDir/corpus : bootstrap corpus parquet
  *   - srcDir/stream : arrival files (one micro-batch each via
  *     maxFilesPerTrigger=1, ordered by file modification time)
  *   - killAfter < 0 : run to completion, exit 0.
  *   - mode: "near" (default, NearDupStream), "exact" (FpDedupStream),
  *     "winnow" (WinnowStream), "substring" (SubstringStream) or
  *     "semantic" (SemDedupStream, embedding source) — all five index
  *     families ride the same DedupLoop, crashed at the same point;
  *     winnow/substring additionally exercise their family's own delta
  *     append/restore (layered freq tables) across the kill. "pack"
  *     crashes the PackStream tokenize-and-pack export instead (its own
  *     kill points — see the mode's comment below). "export" crashes the
  *     full three-stage ExportPipeline (gate → exact → near-dup → pack)
  *     after a batch fully landed, before offsets commit.
  *   - killPoint: "pre" (default — die before the Nth sink write: WAL
  *     durable, output unsunk) or "post" (die AFTER the Nth sink write,
  *     before offsets commit — the replay re-runs a sink that already
  *     wrote, which is why the post mode lands output through the
  *     idempotent per-batch sink: the duplicate attempt must overwrite,
  *     not append).
  */
object CrashStreamMain {
  def main(args: Array[String]): Unit = {
    val (idxCkpt, qCkpt, srcDir, sinkDir, killAfterS) =
      (args(0), args(1), args(2), args(3), args(4))
    val mode = if (args.length > 5) args(5) else "near"
    val killPoint = if (args.length > 6) args(6) else "pre"
    val killAfter = killAfterS.toInt
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("crash-stream-child")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("crash_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = spark.read.parquet(s"$srcDir/corpus")
    if (mode == "retract") {
      // Not a stream: build the export once via standalone batch calls
      // (skipped when its final state generation is already committed —
      // rerunning past a pruned replay cover would rebase-and-duplicate),
      // then RETRACT the ids in srcDir/withdraw with a kill seam inside
      // the retraction itself. killPoint "plan" dies after the
      // retraction WAL committed and before any apply leg; "packs" dies
      // after the pack-shard rewrites, before the deletes / manifest /
      // state legs — the two halves of the crash window the WAL-then-
      // idempotent-apply contract covers.
      val batchDirs = new java.io.File(s"$srcDir/stream")
        .listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
      val h = graft.streaming.PackStream.resume(spark, idxCkpt, corpus,
        "doc_id", "text", nShards = 4L, nMerges = 8, window = 32)
      val stateDir = new java.io.File(s"$idxCkpt/state")
      val built = stateDir.exists() && stateDir.listFiles()
        .exists(_.getName.matches(s"g${batchDirs.length}(r\\d+)?"))
      if (!built) batchDirs.zipWithIndex.foreach { case (name, i) =>
        graft.streaming.PackStream.processBatch(h,
          spark.read.parquet(s"$srcDir/stream/$name"), i.toLong,
          "doc_id", "text", sinkDir): Unit
      }
      def seam(p: String): () => Unit = () =>
        if (killAfter >= 0 && killPoint == p) Runtime.getRuntime.halt(137)
      graft.streaming.PackStream.retract(spark, h, sinkDir,
        spark.read.parquet(s"$srcDir/withdraw"),
        requestKey = Some("crash1"),
        afterPlan = seam("plan"), afterPacks = seam("packs")): Unit
      spark.stop()
      sys.exit(0)
    }
    // The semantic family streams embeddings, not text.
    val srcSchema =
      if (mode == "semantic") "doc_id long, embedding array<double>"
      else "doc_id long, text string"
    val src = spark.readStream.schema(srcSchema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$srcDir/stream")
    val sunk = new java.util.concurrent.atomic.AtomicInteger(0)
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = {
      (kept, batchId) =>
        if (killPoint == "pre" && killAfter >= 0 && sunk.get() >= killAfter)
          Runtime.getRuntime.halt(137) // simulated SIGKILL — see scaladoc
        // post mode writes idempotently (per-batch overwrite) — the replay
        // after the crash re-runs this write against the same directory.
        if (killPoint == "post")
          graft.sources.Sink.idempotentBatch(
            kept.select("doc_id"), sinkDir, batchId)
        else
          kept.select("doc_id").write.mode("append").parquet(sinkDir)
        if (killPoint == "post" && killAfter >= 0 && sunk.get() >= killAfter)
          Runtime.getRuntime.halt(137) // SIGKILL after the write landed
        sunk.incrementAndGet()
    }
    val q = mode match {
      case "exact" =>
        val state = graft.streaming.FpDedupStream.resume(
          spark, idxCkpt, corpus, "doc_id", "text")
        graft.streaming.FpDedupStream.runBatches(src, state, "doc_id", "text",
          compactEvery = 2, checkpointPath = Some(idxCkpt),
          queryCheckpointLocation = Some(qCkpt))(sink)
      case "winnow" =>
        val state = graft.streaming.WinnowStream.resume(
          spark, idxCkpt, corpus, "doc_id", "text")
        graft.streaming.WinnowStream.runBatches(src, state, "doc_id", "text",
          minShared = 3, compactEvery = 2, checkpointPath = Some(idxCkpt),
          queryCheckpointLocation = Some(qCkpt))(sink)
      case "substring" =>
        val state = graft.streaming.SubstringStream.resume(
          spark, idxCkpt, corpus, "doc_id", "text")
        graft.streaming.SubstringStream.runBatches(src, state,
          "doc_id", "text", minOccurrences = 2, maxDupRatio = 0.5,
          compactEvery = 2, checkpointPath = Some(idxCkpt),
          queryCheckpointLocation = Some(qCkpt))(sink)
      case "semantic" =>
        val state = graft.streaming.SemDedupStream.resume(
          spark, idxCkpt, corpus, "doc_id", "embedding", eps = 0.9)
        graft.streaming.SemDedupStream.runBatches(src, state,
          "doc_id", "embedding", compactEvery = 2,
          checkpointPath = Some(idxCkpt),
          queryCheckpointLocation = Some(qCkpt))(sink)
      case "export" | "export4" =>
        // The full pipeline (gate → exact fp → NEAR-dup → [substring
        // gate, export4 mode] → pack). Kill point: AFTER the batch fully
        // landed (packs via the pack stage's own idempotent sink, kept
        // audit log written here), BEFORE the engine commits offsets —
        // the restart replays the batch through every stage: each dedup
        // stage must recognize it from its WAL and re-sink its recorded
        // kept-set, and the pack recompute must overwrite bit-identically.
        val h = graft.streaming.ExportPipeline.resume(
          spark, idxCkpt, corpus, "doc_id", "text",
          nShards = 2L, nMerges = 8, window = 32,
          substringGate = mode == "export4",
          // One recycled 8-token window above the threshold must gate:
          // with maxDupRatio 0.35, a 20-token doc carrying a 13-token
          // recycled run (6 duplicated windows of 13 total) is dropped.
          ssMinOccurrences = 2, ssMaxDupRatio = 0.35)
        graft.streaming.ExportPipeline.run(src, h, "doc_id", "text",
          s"$sinkDir/packs", compactEvery = 2,
          queryCheckpointLocation = Some(qCkpt),
          keptSink = { (kept, id) =>
            graft.sources.Sink.idempotentBatch(
              kept.select("doc_id"), s"$sinkDir/kept", id)
            if (killAfter >= 0 && sunk.get() >= killAfter)
              Runtime.getRuntime.halt(137)
            sunk.incrementAndGet(): Unit
          })
      case "takedown" =>
        // Seventh family: the takedown stream. Events (family, cid, text)
        // delete content from the fp index and ids from a saved IVF
        // index. Kill point: inside the crash window — the batch's WAL
        // committed and its keyed tombstones are down, the applied marker
        // is not — so the restart must RE-APPLY idempotently (same
        // tombstones at the same recorded positions, no duplicates).
        import org.apache.spark.sql.functions.{col, expr}
        val fpState = graft.streaming.FpDedupStream.resume(
          spark, s"$idxCkpt/fp", corpus, "doc_id", "text")
        val ivfDir = s"$idxCkpt/ivf"
        if (!new java.io.File(s"$ivfDir/centroids/_SUCCESS").exists()) {
          // Deterministic synthetic embeddings; built ONCE (a rebuild on
          // restart would reset the tombstones the crash left behind).
          val emb = spark.range(10, 300).select(col("id").as("vec_id"),
            expr("array(cast(id % 7 as double), cast((id div 7) % 5 " +
              "as double), cast(id % 3 as double), 1.0d)").as("embedding"))
          graft.operators.Similarity.saveIvfIndex(
            graft.operators.Similarity.buildIvfIndex(
              emb, "vec_id", "embedding"), ivfDir)
        }
        val td = graft.streaming.TakedownStream.resume(spark, s"$idxCkpt/td")
        val targets = graft.streaming.TakedownStream.Targets(
          fp = Some((fpState, s"$idxCkpt/fp")), ivf = Seq(ivfDir))
        val evSrc = spark.readStream
          .schema("family string, cid long, text string")
          .option("maxFilesPerTrigger", "1")
          .option("recursiveFileLookup", "true")
          .parquet(s"$srcDir/stream")
        evSrc.writeStream.option("checkpointLocation", qCkpt)
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            val afterApply: () => Unit = () =>
              if (killAfter >= 0 && sunk.get() >= killAfter)
                Runtime.getRuntime.halt(137)
            graft.streaming.TakedownStream.processBatch(
              td, targets, batch, id, afterApply)
            sunk.incrementAndGet(): Unit
          }
          .start()
      case "pack" =>
        // The packing stream sinks INSIDE processBatch (batch-id-keyed
        // idempotent pack output), so its kill points differ: "mid" dies
        // between the pack sink and the state-generation commit (the
        // window the deterministic-recompute contract covers), "post"
        // dies after the whole batch, before the engine commits offsets.
        val h = graft.streaming.PackStream.resume(
          spark, idxCkpt, corpus, "doc_id", "text",
          nShards = 2L, nMerges = 8, window = 32)
        // In-loop landed-layout compaction as PackStream.run wires it
        // (recover at start, sweep after every batch) — the kill points
        // below therefore exercise replay ACROSS a compacted layout.
        graft.sources.Sink.compactRecover(spark, sinkDir)
        src.writeStream.option("checkpointLocation", qCkpt)
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            val afterSink: () => Unit = () =>
              if (killPoint == "mid" && killAfter >= 0 &&
                  sunk.get() >= killAfter)
                Runtime.getRuntime.halt(137)
            val eff = graft.streaming.PackStream.processBatch(
              h, batch, id, "doc_id", "text", sinkDir, afterSink)
            graft.streaming.PackStream.compactPacks(
              spark, h, sinkDir, upTo = eff)
            if (killPoint == "post" && killAfter >= 0 &&
                sunk.get() >= killAfter)
              Runtime.getRuntime.halt(137)
            sunk.incrementAndGet(): Unit
          }
          .start()
      case _ =>
        val state = NearDupStream.resume(
          spark, idxCkpt, corpus, "doc_id", "text")
        NearDupStream.runBatches(src, state, "doc_id", "text",
          compactEvery = 2, checkpointPath = Some(idxCkpt),
          queryCheckpointLocation = Some(qCkpt))(sink)
    }
    q.processAllAvailable()
    q.stop()
    spark.stop()
    sys.exit(0)
  }
}
