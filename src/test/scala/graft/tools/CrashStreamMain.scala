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
  * args: idxCkpt queryCkpt srcDir sinkDir killAfterBatches [mode]
  *   - srcDir/corpus : bootstrap corpus parquet
  *   - srcDir/stream : arrival files (one micro-batch each via
  *     maxFilesPerTrigger=1, ordered by file modification time)
  *   - killAfter < 0 : run to completion, exit 0.
  *   - mode: "near" (default, NearDupStream) or "exact" (FpDedupStream) —
  *     both ride the same DedupLoop, crashed at the same point.
  */
object CrashStreamMain {
  def main(args: Array[String]): Unit = {
    val (idxCkpt, qCkpt, srcDir, sinkDir, killAfterS) =
      (args(0), args(1), args(2), args(3), args(4))
    val mode = if (args.length > 5) args(5) else "near"
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
    val src = spark.readStream.schema("doc_id long, text string")
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$srcDir/stream")
    val sunk = new java.util.concurrent.atomic.AtomicInteger(0)
    val sink: org.apache.spark.sql.DataFrame => Unit = { kept =>
      if (killAfter >= 0 && sunk.get() >= killAfter)
        Runtime.getRuntime.halt(137) // simulated SIGKILL — see scaladoc
      kept.select("doc_id").write.mode("append").parquet(sinkDir)
      sunk.incrementAndGet()
    }
    val q = mode match {
      case "exact" =>
        val state = graft.streaming.FpDedupStream.resume(
          spark, idxCkpt, corpus, "doc_id", "text")
        graft.streaming.FpDedupStream.run(src, state, "doc_id", "text",
          compactEvery = 2, checkpointPath = Some(idxCkpt),
          queryCheckpointLocation = Some(qCkpt))(sink)
      case _ =>
        val state = NearDupStream.resume(
          spark, idxCkpt, corpus, "doc_id", "text")
        NearDupStream.run(src, state, "doc_id", "text",
          compactEvery = 2, checkpointPath = Some(idxCkpt),
          queryCheckpointLocation = Some(qCkpt))(sink)
    }
    q.processAllAvailable()
    q.stop()
    spark.stop()
    sys.exit(0)
  }
}
