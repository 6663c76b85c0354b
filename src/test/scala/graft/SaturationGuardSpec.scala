package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The batch pre-flight saturation guard (round-12): the exact-pair family
  * (exactJaccard / buildNearDupIndex) must FAIL FAST on a vocabulary-
  * saturated corpus instead of running its quadratic candidate join, route
  * to the capped shape when the caller opts in, and stay silent (and
  * byte-identical) on healthy corpora. simhashFold auto-routes on the same
  * class of signal. The bar is a scale calibration (default tuned to the
  * native-sf1 outage measurement), so the spec lowers it via conf to pin
  * the MECHANISM on small fixtures. */
class SaturationGuardSpec extends SparkSpecBase {

  /** Saturated fixture: every doc draws 6 tokens from a 5-token vocabulary,
    * so the bigram universe is bounded (≤ 25) and every posting list grows
    * linearly with the corpus — Heaps' law deliberately broken. All texts
    * distinct except one exact-copy pair (ids 1 and 2). */
  private def saturated(n: Int): DataFrame = {
    import spark.implicits._
    val vocab = Array("aa", "bb", "cc", "dd", "ee")
    (1 to n).map { i =>
      val t =
        if (i == 2) (0 until 6).map(k => vocab((7 + k * 4) % 5)) // ≡ doc 1
        else (0 until 6).map(k => vocab((i * 7 + k * 3 + i * k) % 5))
      (i.toLong, t.mkString(" "))
    }.toDF("doc_id", "text")
  }

  /** Healthy fixture: per-doc-unique tokens — posting lists of length ~1. */
  private def healthy(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"w${i}a w${i}b w${i}c w${i}d w${i}e"))
      .toDF("doc_id", "text")
  }

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("exactJaccard fails fast on a saturated corpus, naming the capped families") {
    val docs = saturated(120)
    val ex = intercept[Dedup.SaturatedCorpusException] {
      withConf(Dedup.SaturationBarKey -> "2.0") {
        // maxAllPairsDocs = 0 forces the prefix path (the guarded one).
        Dedup.exactJaccard(docs, "doc_id", "text", threshold = 0.6,
          maxAllPairsDocs = 0).count()
      }
    }
    assert(ex.getMessage.contains("minhashLsh"))
    assert(ex.getMessage.contains(Dedup.SaturationModeKey))
  }

  test("exactJaccard route mode: capped candidates, exact verification, exact-copy pairs kept") {
    val docs = saturated(120)
    val exact = Dedup.exactJaccard(docs, "doc_id", "text", threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val routed = withConf(Dedup.SaturationBarKey -> "2.0",
        Dedup.SaturationModeKey -> "route") {
      Dedup.exactJaccard(docs, "doc_id", "text", threshold = 0.6,
          maxAllPairsDocs = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }
    // Routed pairs ⊆ exact pairs, every score identical (verification is
    // exact Jaccard either way — only candidate RECALL is capped).
    routed.foreach { case (k, j) =>
      assert(exact.contains(k), s"routed pair $k not in exact set")
      assert(math.abs(exact(k) - j) < 1e-9)
    }
    // The identical-text pair survives ANY route: collapse precedes the
    // candidate search, so (1,2) is a within-group expansion at 1.0.
    assert(routed.get((1L, 2L)).contains(1.0))
  }

  test("exactJaccard guard is silent and result-identical on a healthy corpus") {
    val docs = healthy(60)
    // Default mode (fail), prefix path forced: a healthy corpus must pass
    // the guard and produce the exact pair set unchanged vs mode=off.
    val guarded = Dedup.exactJaccard(docs, "doc_id", "text", threshold = 0.6,
        maxAllPairsDocs = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val off = withConf(Dedup.SaturationModeKey -> "off") {
      Dedup.exactJaccard(docs, "doc_id", "text", threshold = 0.6,
          maxAllPairsDocs = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    }
    assert(guarded.toSeq == off.toSeq)
  }

  test("buildNearDupIndex fails fast on a saturated corpus; route caps postings but keeps rare-key recall") {
    import spark.implicits._
    // Saturated boilerplate plus one RARE shared bigram between corpus doc
    // 201 and (later) a probe doc: the capped index must still find it.
    val rare = Seq((201L, "zz yy zz yy zz yy aa bb"))
    val corpus = saturated(200).unionByName(rare.toDF("doc_id", "text"))
    intercept[Dedup.SaturatedCorpusException] {
      withConf(Dedup.SaturationBarKey -> "2.0") {
        Dedup.buildNearDupIndex(corpus, "doc_id", "text", threshold = 0.6)
      }
    }
    withConf(Dedup.SaturationBarKey -> "2.0",
        Dedup.SaturationModeKey -> "route",
        Dedup.SaturationMaxPostingsKey -> "5") {
      val idx = Dedup.buildNearDupIndex(corpus, "doc_id", "text",
        threshold = 0.6)
      // Every surviving prefix key's posting list is within the cap.
      val maxPosting = idx.prefixes.groupBy("h").agg(count(lit(1)).as("c"))
        .agg(max("c")).head().getLong(0)
      assert(maxPosting <= 5L)
      // A probe near-duplicating doc 201 through the RARE bigrams is still
      // caught (dropped from the kept set); a probe of fresh content is kept.
      val batch = Seq(
        (301L, "zz yy zz yy zz yy aa bb"),  // exact copy of 201 → near-dup
        (302L, "qq rr ss tt uu vv")          // novel vocabulary → kept
      ).toDF("doc_id", "text")
      val kept = Dedup.probeNearDups(idx, batch, "doc_id", "text")
        .collect().map(_.getLong(0)).toSet
      assert(!kept.contains(301L), "capped index lost the rare-key near-dup")
      assert(kept.contains(302L))
    }
  }

  test("simhashFold auto-routes on chunk saturation; kept-set invariant holds; dup-dense unchanged") {
    import spark.implicits._
    // Near-identical texts (one token varies) → signatures cluster →
    // chunk buckets concentrate. Each text twice under shifted ids.
    val base = (1 to 80).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog number$i"))
    val docs = (base ++ base.map { case (i, t) => (i + (1L << 40), t) })
      .toDF("doc_id", "text")
    val keptCapped = withConf(Dedup.SaturationBarKey -> "2.0",
        Dedup.SaturationFoldMaxBucketKey -> "8") {
      Dedup.simhashFold(docs, "doc_id", "text", maxHamming = 6)
        .collect().map(_.getLong(0)).toSet
    }
    // Invariant under ANY cap: no two kept docs share identical text —
    // every shifted twin folded into its original.
    assert(keptCapped.forall(_ < (1L << 40)),
      "a shifted exact copy survived the capped fold")
    // Dup-dense design case: few distinct texts, many copies — the
    // collapse does the work and capping must not change the answer.
    val dupDense = (1 to 90).map(i => (i.toLong, s"text number ${i % 3}"))
      .toDF("doc_id", "text")
    val cappedDense = withConf(Dedup.SaturationBarKey -> "2.0",
        Dedup.SaturationFoldMaxBucketKey -> "8") {
      Dedup.simhashFold(dupDense, "doc_id", "text").collect()
        .map(_.getLong(0)).toSet
    }
    val uncappedDense = withConf(Dedup.SaturationModeKey -> "off") {
      Dedup.simhashFold(dupDense, "doc_id", "text").collect()
        .map(_.getLong(0)).toSet
    }
    assert(cappedDense == uncappedDense)
  }

  test("hammingSaturation separates concentrated from spread signature sets") {
    import spark.implicits._
    val spread = (1 to 64).map(i => (i.toLong, i.toLong * 0x9E3779B97F4A7C15L))
      .toDF("id", "sim")
    val concentrated = (1 to 64).map(i => (i.toLong, 42L))
      .toDF("id", "sim")
    assert(Dedup.hammingSaturation(spread) < Dedup.hammingSaturation(concentrated))
    // All-identical signatures: every doc is a candidate of every other in
    // all 4 chunks → 4·n²/n = 4n.
    assert(math.abs(Dedup.hammingSaturation(concentrated) - 256.0) < 1e-9)
  }
}
