package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.{Dedup, Similarity}
import graft.streaming.SemDedupStream

/** Round-13: the identical-vector collapse — the remedy the round-12 sem
  * saturation latch could only NAME is now an automatic action. At every
  * compaction the [[Dedup.SemIndex]] regroups each inverted list's rows by
  * their full vector and flags ONE probed representative per group
  * (`rep`); exact copies stay as rows (per-id takedown semantics are
  * untouched) but stop being scanned, so an exact-copy flood self-heals
  * instead of tripping the quantizer-rebuild bar. A takedown that removes
  * a group's representative PROMOTES a surviving twin — live and on
  * crash-replay — so the "exact copies are ALWAYS caught" guarantee
  * survives erasure of any subset of the copies. */
class SemCollapseSpec extends SparkSpecBase {

  private def admits(state: SemDedupStream.IndexState, d: SemDoc): Boolean = {
    import spark.implicits._
    Dedup.probeAndExtendSemParts(state.index,
      Seq(d).toDF("doc_id", "embedding"), "doc_id", "embedding")
      ._1.count() == 1
  }

  test("exact-copy flood collapses at compaction: decisions unchanged, " +
      "one probed row per distinct vector, no rebuild fires") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // The SemDedupStream fixture contract: 2 orthogonal corpus directions,
    // eps 0.9, so only near-parallel vectors dedup and every vector is a
    // candidate (nprobe clamps to the 2 trained lists).
    val corpus = Seq(SemDoc(1, Seq(1, 0, 0, 0)), SemDoc(2, Seq(0, 1, 0, 0)))
      .toDF("doc_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("semcollapse").toString
    val st = SemDedupStream.resume(spark, dir, corpus, "doc_id", "embedding",
      eps = 0.9)
    val centsBefore = st.index.centroids

    val in = MemoryStream[SemDoc]
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    // compactEvery = 1: the flood batch compacts (and collapses)
    // immediately.
    val q = SemDedupStream.run(in.toDF(), st, "doc_id", "embedding",
        compactEvery = 1, checkpointPath = Some(dir)) { kept =>
      got ++= kept.select("doc_id").as[Long].collect()
    }
    // 20 exact copies of one direction (in-batch twins: min id 100 wins)
    // plus one novel direction.
    in.addData((100L until 120L).map(i => SemDoc(i, Seq(0, 0, 1, 0))) :+
      SemDoc(200, Seq(0, 0, 0, 1)): _*)
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == Set(100L, 200L))

    // Collapse accounting: 23 indexed ids (2 corpus + 21 batch) × 2 lists
    // of rows, but only 4 distinct vectors × 2 lists probe.
    val a = st.index.assigned
    assert(a.count() == 46, "copies stay as rows (takedown state)")
    assert(a.where(col("rep")).count() == 8,
      "one probed representative per (list, distinct vector)")

    // Decisions unchanged: an exact copy of the flood still drops, the
    // flood's near-parallels still drop, a novel direction is admitted.
    assert(!admits(st, SemDoc(300, Seq(0, 0, 1, 0))))
    assert(!admits(st, SemDoc(301, Seq(0, 0, 1, 0.05))))
    assert(admits(st, SemDoc(302, Seq(1, -1, 1, -1))))

    // The flood never reaches the rebuild decision: representative-row
    // imbalance is flat, so the compaction kept the frozen quantizer.
    assert(st.index.centroids == centsBefore,
      "exact-copy mass must self-heal by collapse, not trigger a retrain")
    val rawImb = Similarity.listImbalance(a)
    val repImb = Similarity.listImbalance(a.where(col("rep")))
    assert(repImb <= rawImb && repImb <= 2.0,
      s"rep-row imbalance should be flat, got $repImb (raw $rawImb)")
    Dedup.releaseSketchCaches()
  }

  test("takedown of a representative promotes a surviving twin — live, " +
      "on crash-replay, and until the last copy is erased") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = Seq(SemDoc(1, Seq(1, 0, 0, 0)), SemDoc(2, Seq(0, 1, 0, 0)))
      .toDF("doc_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("sempromote").toString
    val st = SemDedupStream.resume(spark, dir, corpus, "doc_id", "embedding",
      eps = 0.9)
    val in = MemoryStream[SemDoc]
    val q = SemDedupStream.run(in.toDF(), st, "doc_id", "embedding",
        compactEvery = 1, checkpointPath = Some(dir)) { _ => () }
    // Three exact copies of one direction; the compaction collapses them
    // to representative 100.
    in.addData(SemDoc(100, Seq(0, 0, 1, 0)), SemDoc(101, Seq(0, 0, 1, 0)),
      SemDoc(102, Seq(0, 0, 1, 0)))
    q.processAllAvailable()
    q.stop()
    assert(!admits(st, SemDoc(300, Seq(0, 0, 1, 0))))

    // Erase the REPRESENTATIVE: its surviving twins must keep gating.
    SemDedupStream.delete(st, Some(dir),
      Seq(100L).toDF("doc_id"), "doc_id")
    assert(!admits(st, SemDoc(301, Seq(0, 0, 1, 0))),
      "a surviving identical twin must be promoted to representative")
    assert(st.index.assigned
      .where(col("id") === 101L && col("rep")).count() == 2,
      "the min surviving id probes in both of its lists")

    // Crash before the next snapshot: the tombstone replays through
    // restore and the SAME promotion happens there.
    val st2 = SemDedupStream.resume(spark, dir, corpus.limit(0),
      "doc_id", "embedding", eps = 0.9)
    assert(!admits(st2, SemDoc(302, Seq(0, 0, 1, 0))),
      "crash-replay must promote, not silently stop catching copies")

    // Erasing every copy re-admits the direction (on the live state).
    SemDedupStream.delete(st, Some(dir),
      Seq(101L, 102L).toDF("doc_id"), "doc_id")
    assert(admits(st, SemDoc(303, Seq(0, 0, 1, 0))),
      "after the last copy is erased the direction is novel again")
    // Unrelated suppression holds throughout.
    assert(!admits(st, SemDoc(304, Seq(1, 0.05, 0, 0))))
    Dedup.releaseSketchCaches()
  }

  test("pre-collapse checkpoint compatibility: a legacy generation " +
      "without vh/rep columns loads all-rep, probes, folds, and the next " +
      "compaction collapses it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // A legacy-shaped index: build fresh, then strip the round-13 columns
    // and save — the on-disk shape every pre-upgrade checkpoint has.
    val corpus = Seq(SemDoc(1, Seq(1, 0, 0, 0)), SemDoc(2, Seq(0, 1, 0, 0)),
      SemDoc(3, Seq(0, 1, 0, 0))).toDF("doc_id", "embedding")
    val built = Dedup.buildSemIndex(corpus, "doc_id", "embedding", eps = 0.9)
    val legacy = built.copy(assigned = built.assigned.drop("vh", "rep"))
    val dir = java.nio.file.Files.createTempDirectory("semlegacy").toString
    Dedup.saveSemIndex(legacy, dir, batchId = 0L)

    val st = SemDedupStream.resume(spark, dir, corpus.limit(0),
      "doc_id", "embedding", eps = 0.9)
    // Loaded all-rep: every legacy row probes (over-scan, never under).
    assert(st.index.assigned.where(col("rep")).count() ==
      st.index.assigned.count())
    assert(!admits(st, SemDoc(90, Seq(1, 0.05, 0, 0))),
      "legacy rows must still gate")
    // A new batch folds (union of legacy-wrapped + fresh columns) and the
    // compaction collapses the legacy exact copies (docs 2 and 3).
    val in = MemoryStream[SemDoc]
    val q = SemDedupStream.run(in.toDF(), st, "doc_id", "embedding",
        compactEvery = 1, checkpointPath = Some(dir)) { _ => () }
    in.addData(SemDoc(100, Seq(0, 0, 1, 0)))
    q.processAllAvailable()
    q.stop()
    val a = st.index.assigned
    assert(a.count() > a.where(col("rep")).count(),
      "post-compaction, one of the legacy exact copies must stop probing")
    assert(!admits(st, SemDoc(91, Seq(0, 1, 0.05, 0))),
      "collapsed legacy content still gates")
    assert(!admits(st, SemDoc(92, Seq(0, 0, 1, 0.05))),
      "newly folded content gates")
    Dedup.releaseSketchCaches()
  }

  test("bootstrap collapse: a corpus with exact-copy mass reads a flat " +
      "representative imbalance where the raw rows read saturated") {
    import spark.implicits._

    // 16 balanced orthogonal directions + a 300-copy flood of the first
    // (max/mean imbalance is bounded by nlist, so 16 lists leave room
    // above the bar of 8): raw list rows are dominated by the flood,
    // representative rows are not — the rebuild signal must see the
    // latter.
    val docs = ((0 until 16).map { i =>
      SemDoc(i.toLong, Seq.tabulate(16)(j => if (j == i) 1.0 else 0.0))
    } ++ (100 until 400).map { i =>
      SemDoc(i.toLong, Seq.tabulate(16)(j => if (j == 0) 1.0 else 0.0))
    }).toDF("doc_id", "embedding")
    val idx = Dedup.buildSemIndex(docs, "doc_id", "embedding", eps = 0.9,
      nlist = 16, nprobe = 1)
    val rawImb = Similarity.listImbalance(idx.assigned)
    val repImb = Similarity.listImbalance(idx.assigned.where(col("rep")))
    assert(rawImb > Similarity.IvfImbalanceRebuildThreshold,
      s"fixture must read saturated on raw rows, got $rawImb")
    assert(repImb < Similarity.IvfImbalanceRebuildThreshold,
      s"representatives must read healthy, got $repImb")
    Dedup.releaseSemIndex(idx)
    Dedup.releaseSketchCaches()
  }
}
