package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE merge training + encoding against an obviously-correct local
  * reference: training is deterministic (lexicographic tie-break), so the
  * engine must reproduce the reference's merge table and encodings EXACTLY
  * on the real documents table — the strongest check available for an
  * iterative op no SQL oracle can express. */
class BpeSpec extends SparkSpecBase {

  // ── local reference implementation ──────────────────────────────────────

  private def refTokens(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  private def refInit(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Bpe.EndOfWord

  private def refMergeWord(syms: Vector[String], a: String,
      b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(hist: Seq[(String, Long)], nMerges: Int,
      minPair: Long = 2L): Seq[(String, String)] = {
    var dict = hist.map { case (w, c) => (refInit(w), c) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < nMerges && !done) {
      val pc = mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- dict; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        pc(k) = pc.getOrElse(k, 0L) + c
      }
      val cands = pc.toSeq.filter(_._2 >= minPair)
      if (cands.isEmpty) done = true
      else {
        val ((a, b), _) = cands.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((a, b))
        dict = dict.map { case (s, c) => (refMergeWord(s, a, b), c) }
      }
    }
    merges.toSeq
  }

  private def refEncode(text: String,
      merges: Seq[(String, String)]): Seq[String] =
    refTokens(text).flatMap { w =>
      merges.foldLeft(refInit(w)) { case (s, (a, b)) => refMergeWord(s, a, b) }
    }

  // ── specs ───────────────────────────────────────────────────────────────

  test("mergeStep: greedy leftmost-first fold, overlap + boundary semantics") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "a", "a"), // overlap: leftmost pair wins
      Seq("a", "b", "a", "b"), // two disjoint matches
      Seq("x", "y"), // no match
      Seq("a"), // single symbol
      Seq.empty[String] // empty
    ).toDF("syms")
    val got = df.select(Bpe.mergeStep(col("syms"), "a", "a")
      .as("m")).collect().map(_.getSeq[String](0).toList)
    assert(got(0) == List("aa", "a"))
    assert(got(2) == List("x", "y") && got(3) == List("a") && got(4) == Nil)
    val ab = df.select(Bpe.mergeStep(col("syms"), "a", "b"))
      .collect().map(_.getSeq[String](0).toList)
    assert(ab(1) == List("ab", "ab"))
  }

  test("training reproduces the local reference merge table exactly") {
    val docs = spark.table("documents")
    val hist = Bpe.wordHistogram(docs, "text")
    // Reference histogram from the raw text — also cross-checks the
    // engine-side tokenize+count pass itself.
    val refHist = docs.select("text").collect().map(_.getString(0))
      .flatMap(refTokens)
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }
      .toSeq
    val engineHist = hist.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(engineHist == refHist.toSet, "word histogram mismatch")

    val want = refTrain(refHist, nMerges = 24)
    val got = Bpe.train(hist, nMerges = 24, checkpointEvery = 5)
      .map(m => (m.left, m.right))
    assert(got == want, s"merge tables diverge:\n got=$got\nwant=$want")
    assert(got.size == 24, "sf0.001 corpus should support 24 merges")
  }

  test("encode reproduces the local reference on real documents") {
    val docs = spark.table("documents").where(col("doc_id") < 40)
    val hist = Bpe.wordHistogram(spark.table("documents"), "text")
    val merges = Bpe.train(hist, nMerges = 12)
    val refM = merges.map(m => (m.left, m.right))
    val got = docs
      .select(col("doc_id"), Bpe.encode(col("text"), merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val want = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> refEncode(r.getString(1), refM).toList).toMap
    assert(got == want)
    // Merges must actually fire: some token shorter than its char count.
    assert(got.values.exists(toks => toks.exists(_.length > 2)))
  }

  test("x7 tokenized export: packs match the full local-reference replay") {
    val out = SparkEntry.queries("x7_tokenized_export")(spark, sfDir)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    // Full reference replay: train → encode → vocab → offsets → packs.
    val docsRows = spark.table("documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val hist = docsRows.flatMap(d => refTokens(d._2))
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }.toSeq
    val merges = refTrain(hist, 24)
    val encoded = docsRows.map { case (id, t) => (id, refEncode(t, merges)) }
    val vocab = encoded.flatMap(_._2)
      .groupBy(identity).map { case (t, ts) => (t, ts.length.toLong) }.toSeq
      .sortBy { case (t, c) => (-c, t) }
      .zipWithIndex.map { case ((t, _), i) => t -> i.toLong }.toMap
    val packs = mutable.Map.empty[(Long, Long),
      mutable.ArrayBuffer[(Long, Long)]]
    for (shard <- 0L until 8L) {
      var pos = 0L
      for ((id, toks) <- encoded if id % 8 == shard; t <- toks) {
        packs.getOrElseUpdate((shard, pos / 1024),
          mutable.ArrayBuffer.empty) += ((pos % 1024, vocab(t)))
        pos += 1
      }
    }
    val want = packs.toSeq.map { case ((s, p), xs) =>
      (s, p, xs.size.toLong, xs.sortBy(_._1).map(_._2).mkString(","))
    }.toSet
    assert(got.nonEmpty && got.toSet == want)
    // Every pack except each shard's last is exactly the context window.
    val lastPerShard = got.groupBy(_._1).view.mapValues(_.map(_._2).max)
    assert(got.filter(r => r._2 != lastPerShard(r._1)).forall(_._3 == 1024))

    // Export leg: the sharded sink lands the packs as bounded files.
    val dir = java.nio.file.Files.createTempDirectory("x7exp").toString
    graft.sources.Sink.sharded(out, dir, rowsPerFile = 16)
    val files = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files > 1, "export should shard into multiple files")
    assert(spark.read.parquet(dir).count() == got.length)
  }

  test("local-route training ≡ distributed rounds (round-17 adaptive path)") {
    // Bpe.train now runs the whole loop on the driver when the dictionary
    // fits localWordCap (the components() localEdgeCap pattern). The two
    // routes must learn the IDENTICAL merge table — same counts, same
    // (pc desc, a asc, b asc) argmax, same greedy leftmost application.
    val hist = Bpe.wordHistogram(spark.table("documents"), "text")
    val local = Bpe.train(hist, nMerges = 24)
    val distributed = Bpe.train(hist, nMerges = 24, localWordCap = 0)
    assert(local == distributed,
      s"local/distributed merge tables diverge:\n local=$local\n dist=$distributed")
  }

  test("training stops early when no pair reaches minPairCount") {
    import spark.implicits._
    // Every word distinct chars, each word once → all pair counts are 1.
    val hist = Seq(("ab", 1L), ("cd", 1L), ("ef", 1L)).toDF("word", "cnt")
    assert(Bpe.train(hist, nMerges = 10).isEmpty)
    // With weight 2 the top pair clears the floor and training proceeds
    // deterministically: ties break lexicographically.
    val hist2 = Seq(("ab", 2L), ("cd", 2L)).toDF("word", "cnt")
    val m = Bpe.train(hist2, nMerges = 1)
    assert(m.map(x => (x.left, x.right)) == Seq(("a", "b")))
  }
}
