package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round-14: the identical-vector collapse applied to the SERVING IVF/PQ
  * indexes (the sem dedup family's round-13 regroup, re-derived for top-k
  * semantics). A dup-dense serving corpus stores every re-posted copy as a
  * row; compaction groups each identical-vector (IVF) / identical-
  * (cn, codes) (PQ) group under a `repid` representative, the probe pays
  * the expensive distance once per rep and fans the score out to the
  * twins through a narrow join — every stored id still competes for the
  * top-k, at distinct-size distance cost. Deleting a group's rep falls
  * back to self-rep until the next compaction, which promotes the min
  * SURVIVING twin physically. Dup-free artifacts never leave the legacy
  * schema or plan. */
class IvfPqCollapseSpec extends SparkSpecBase {

  // 12 distinct 4-dim directions (injective in the first component).
  private def vec(i: Int): Seq[Double] =
    Seq(1.0 + i, 2.0, (i % 3) + 1.0, (i % 5) + 2.0)

  private def corpusRows: Seq[(Long, Seq[Double])] =
    (0 until 12).map(i => (i.toLong, vec(i))) ++
      (0 until 30).map(k => (100L + k, vec(k % 3)))

  private def probeIvf(idx: Similarity.IvfIndex,
      qs: org.apache.spark.sql.DataFrame, k: Int = 40)
      : Set[(Long, Long, Double, Long)] =
    Similarity.ivfProbe(idx, qs, "id", "emb", k, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet

  test("IVF serving collapse: compaction groups exact copies under a " +
      "rep, probe results are twin-complete and identical to the " +
      "uncollapsed scan, takedown promotes the min surviving twin") {
    import spark.implicits._
    val corpus = corpusRows.toDF("id", "emb")
    val dir = java.nio.file.Files.createTempDirectory("ivfcol").toString +
      "/ivf"
    Similarity.saveIvfIndex(
      Similarity.buildIvfIndex(corpus, "id", "emb", nlist = 4), dir)
    // Self-rep arrivals: 10 more copies of vec(0)/vec(1).
    Similarity.appendIvfIndex(spark, dir,
      (0 until 10).map(k => (200L + k, vec(k % 2))).toDF("id", "emb"),
      "id", "emb")
    val before = Similarity.loadIvfIndex(spark, dir)
    assert(!before.assigned.columns.contains("repid"),
      "fresh build + appends stay on the legacy schema until a compaction")
    val qs = Seq((900L, vec(0)), (901L, vec(5))).toDF("id", "emb")
    val resBefore = probeIvf(before, qs)

    val after = Similarity.compactIvfIndex(spark, dir)
    assert(after.assigned.columns.contains("repid"),
      "a dup-dense artifact must compact to the collapsed schema")
    // Rep accounting: one probed row per distinct (list, vector); every
    // stored id still a row.
    val reps = after.assigned.where(col("cid") === col("repid"))
    assert(reps.count() ==
      after.assigned.select("list", "cv").distinct().count())
    assert(after.assigned.count() == corpusRows.size + 10)
    // Probe parity: the collapsed plan returns exactly the uncollapsed
    // results (same multiset of (qid, cid, cos) → same deterministic
    // top-k).
    assert(probeIvf(after, qs) == resBefore,
      "collapse must not change a single probe result")
    // Twin completeness: every exact copy of vec(0) competes and lands
    // with cosine 1.0 (ids 0, 100+3k, 200+2k).
    val twin0 = (Seq(0L) ++ (0 until 30).filter(_ % 3 == 0).map(100L + _)
      ++ (0 until 10).filter(_ % 2 == 0).map(200L + _)).toSet
    val got0 = probeIvf(after, qs).filter(r => r._1 == 900L && r._3 == 1.0)
      .map(_._2)
    assert(got0 == twin0, s"expected all twins $twin0, got $got0")

    // Takedown of the group's REPRESENTATIVE (min cid = 0): unapplied
    // tombstone → self-rep fallback, twins still served.
    val masked = Similarity.deleteFromIvfIndex(spark, dir,
      Seq(0L).toDF("id"), "id")
    val gotMasked = probeIvf(masked, qs)
      .filter(r => r._1 == 900L && r._3 == 1.0).map(_._2)
    assert(gotMasked == twin0 - 0L,
      "a deleted rep must not silence its surviving twins")
    // The next compaction applies the delete physically and PROMOTES the
    // min surviving twin.
    val promoted = Similarity.compactIvfIndex(spark, dir)
    assert(promoted.assigned.where(col("cid") === 0L).isEmpty)
    val newRep = promoted.assigned
      .where(col("cid").isin(twin0.toSeq.map(Long.box): _*))
      .select("repid").distinct().as[Long].collect()
    assert(newRep.toSeq == Seq((twin0 - 0L).min),
      s"promotion must elect the min surviving twin, got ${newRep.toSeq}")
    val gotPromoted = probeIvf(promoted, qs)
      .filter(r => r._1 == 900L && r._3 == 1.0).map(_._2)
    assert(gotPromoted == twin0 - 0L)
    // Probe parity against the SAME artifact forced to self-rep (the
    // uncollapsed scan of identical data).
    val selfRepView = Similarity.IvfIndex(promoted.centroids,
      promoted.assigned.withColumn("repid", col("cid")))
    assert(probeIvf(promoted, qs) == probeIvf(selfRepView, qs))

    // The COLLAPSED probe plan still partition-prunes the list layout:
    // both the rep-scoring side and the twin fan-out side read the
    // hive-partitioned lists through the probe-list filter.
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val scans = Similarity.ivfProbe(promoted, qs, "id", "emb", 5,
          nprobe = 2)
        .queryExecution.executedPlan.collectLeaves().collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths
                .exists(_.toString.contains("lists")) => f
        }
      assert(scans.nonEmpty, "collapsed probe lost the partitioned scan")
      assert(scans.forall(_.partitionFilters.nonEmpty),
        "probe-list filter must prune EVERY list scan of the collapsed " +
          "plan (rep scoring and twin fan-out)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
  }

  private def probePq(idx: Similarity.PqIndex,
      corpus: org.apache.spark.sql.DataFrame,
      qs: org.apache.spark.sql.DataFrame, k: Int = 40)
      : Set[(Long, Long, Double, Long)] =
    Similarity.pqProbe(idx, qs, corpus, "id", "emb", k, rerankFactor = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet

  test("PQ serving collapse: compaction groups identical (cn, codes) " +
      "under a rep, ADC scans rep rows only, rerank and takedown " +
      "semantics unchanged") {
    import spark.implicits._
    val corpus = corpusRows.toDF("id", "emb")
    val dir = java.nio.file.Files.createTempDirectory("pqcol").toString +
      "/pq"
    Similarity.savePqIndex(
      Similarity.buildPqIndex(corpus, "id", "emb", m = 2, ksub = 8), dir)
    Similarity.appendPqIndex(spark, dir,
      (0 until 10).map(k => (200L + k, vec(k % 2))).toDF("id", "emb"),
      "id", "emb")
    // The rerank corpus must cover the appended ids too.
    val fullCorpus = (corpusRows ++
      (0 until 10).map(k => (200L + k, vec(k % 2)))).toDF("id", "emb")
    val before = Similarity.loadPqIndex(spark, dir)
    assert(!before.codes.columns.contains("repid"))
    val qs = Seq((900L, vec(0)), (901L, vec(7))).toDF("id", "emb")
    val resBefore = probePq(before, fullCorpus, qs)

    val after = Similarity.compactPqIndex(spark, dir)
    assert(after.codes.columns.contains("repid"))
    val reps = after.codes.where(col("cid") === col("repid"))
    assert(reps.count() == after.codes.select("cn", "codes").distinct()
      .count())
    assert(after.codes.count() == corpusRows.size + 10)
    assert(probePq(after, fullCorpus, qs) == resBefore,
      "PQ collapse must not change a single probe result")

    // Delete the rep of the vec(0) group; twins must keep serving, and
    // the next compaction must promote the min surviving twin.
    val twin0 = (Seq(0L) ++ (0 until 30).filter(_ % 3 == 0).map(100L + _)
      ++ (0 until 10).filter(_ % 2 == 0).map(200L + _)).toSet
    val masked = Similarity.deleteFromPqIndex(spark, dir,
      Seq(0L).toDF("id"), "id")
    val gotMasked = probePq(masked, fullCorpus, qs)
      .filter(r => r._1 == 900L && r._3 == 1.0).map(_._2)
    assert(gotMasked == twin0 - 0L)
    val promoted = Similarity.compactPqIndex(spark, dir)
    assert(promoted.codes.where(col("cid") === 0L).isEmpty)
    val newRep = promoted.codes
      .where(col("cid").isin(twin0.toSeq.map(Long.box): _*))
      .select("repid").distinct().as[Long].collect()
    assert(newRep.toSeq == Seq((twin0 - 0L).min))
  }

  test("dup-free artifacts never leave the legacy schema (the collapse " +
      "costs nothing until duplicates exist)") {
    import spark.implicits._
    val corpus = (0 until 12).map(i => (i.toLong, vec(i))).toDF("id", "emb")
    val ivfDir = java.nio.file.Files.createTempDirectory("ivfleg").toString
    Similarity.saveIvfIndex(
      Similarity.buildIvfIndex(corpus, "id", "emb", nlist = 4), ivfDir)
    assert(!Similarity.compactIvfIndex(spark, ivfDir)
      .assigned.columns.contains("repid"))
    val pqDir = java.nio.file.Files.createTempDirectory("pqleg").toString
    Similarity.savePqIndex(
      Similarity.buildPqIndex(corpus, "id", "emb", m = 2, ksub = 8), pqDir)
    assert(!Similarity.compactPqIndex(spark, pqDir)
      .codes.columns.contains("repid"))
  }
}
