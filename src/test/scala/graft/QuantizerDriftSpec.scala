package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.{Dedup, Similarity}

/** Round-12: the frozen-quantizer serving families (IVF / PQ / sem) get the
  * nd family's drift loop — a SIGNAL (list/code imbalance, logged at every
  * compaction) and its ACTION (quantizer rebuild with the same
  * generation-save durability as a plain compaction). Mirrors the nd spec
  * contract: in-place rebuild ≡ from-scratch over the same stored rows,
  * probe parity after restore from the rebuilt generation, imbalance
  * sawtooth (climbs under drifted extends, restored by rebuild). */
class QuantizerDriftSpec extends SparkSpecBase {

  /** dim-8 vectors clustered around basis direction `dirIdx` with
    * deterministic per-id jitter (so a retrained quantizer CAN split a
    * dense region — identical points cannot be partitioned). */
  private def vecs(ids: Range, dirIdx: Int, jitter: Double) = {
    import spark.implicits._
    ids.map { i =>
      val v = (0 until 8).map(d =>
        (if (d == dirIdx) 1.0 else 0.0) +
          jitter * (((i * 31 + d * 7) % 13) - 6) / 6.0)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("IVF: drifted appends raise imbalance; compaction auto-escalates to " +
      "rebuild; content, self-consistency, and restore all hold") {
    val corpus = vecs(0 until 160, 0, 0.6)
    val drifted = vecs(1000 until 3000, 5, 0.05)
    val dir = java.nio.file.Files.createTempDirectory("ivfdrift").toString
    Similarity.saveIvfIndex(
      Similarity.buildIvfIndex(corpus, "vec_id", "embedding", nlist = 16),
      dir)
    val fresh = Similarity.listImbalance(
      Similarity.loadIvfIndex(spark, dir).assigned)
    assert(fresh < Similarity.IvfImbalanceRebuildThreshold,
      s"fresh build already past the bar: $fresh")

    Similarity.appendIvfIndex(spark, dir, drifted, "vec_id", "embedding")
    val driftedIdx = Similarity.loadIvfIndex(spark, dir)
    val imb = Similarity.listImbalance(driftedIdx.assigned)
    assert(imb > Similarity.IvfImbalanceRebuildThreshold,
      s"drifted appends should exceed the bar, got $imb (fresh $fresh)")
    val preIds = driftedIdx.assigned.select("cid").collect()
      .map(_.getLong(0)).sorted.toSeq

    // compactIvfIndex sees the imbalance and escalates to rebuildIvfIndex.
    val rebuilt = Similarity.compactIvfIndex(spark, dir)
    assert(rebuilt.centroids != driftedIdx.centroids,
      "escalated compaction must retrain the quantizer")
    // Content parity: exactly the live rows, nothing lost or duplicated.
    val postIds = rebuilt.assigned.select("cid").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(postIds == preIds)
    // Self-consistency: every stored row sits in its argmax list under the
    // REBUILT centroids.
    val bad = rebuilt.assigned.where(col("list") =!=
        GraftFunctions.nearestCentroid(col("cv"), rebuilt.centroids))
      .count()
    assert(bad == 0L, s"$bad rows assigned off their rebuilt argmax list")
    // The sawtooth: rebuild restores balance.
    val post = Similarity.listImbalance(rebuilt.assigned)
    assert(post < imb, s"rebuild did not reduce imbalance: $imb -> $post")
    assert(post < Similarity.IvfImbalanceRebuildThreshold,
      s"rebuilt index still past the bar: $post")

    // Restore from the rebuilt generation: a fresh load carries the
    // retrained quantizer and probes identically.
    val reloaded = Similarity.loadIvfIndex(spark, dir)
    assert(reloaded.centroids == rebuilt.centroids,
      "generation restore lost the rebuilt quantizer")
    val q = drifted.limit(5)
    def top(idx: Similarity.IvfIndex) =
      Similarity.ivfProbe(idx, q, "vec_id", "embedding", 3)
        .select("qid", "cid", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = top(rebuilt)
    assert(a.nonEmpty && a == top(reloaded))

    // A further PLAIN compaction (now balanced) must carry the rebuilt
    // quantizer forward with its lists, not resurrect the stale
    // build-time centroids.
    val compacted = Similarity.compactIvfIndex(spark, dir)
    assert(compacted.centroids == rebuilt.centroids,
      "plain compaction dropped the rebuilt generation's quantizer")
    assert(top(compacted) == a)
  }

  test("IVF rebuild ≡ from-scratch build over the same stored rows") {
    val corpus = vecs(0 until 160, 0, 0.6)
    val drifted = vecs(1000 until 1800, 5, 0.05)
    val dir = java.nio.file.Files.createTempDirectory("ivfscratch").toString
    Similarity.saveIvfIndex(
      Similarity.buildIvfIndex(corpus, "vec_id", "embedding", nlist = 16),
      dir)
    Similarity.appendIvfIndex(spark, dir, drifted, "vec_id", "embedding")
    // From-scratch comparator over the SAME stored frame (same files, same
    // layout → the seeded training sample draws identically, like the nd
    // spec's in-place-rebuilt ≡ from-scratch prefix parity).
    val stored = spark.read.parquet(s"$dir/lists")
    val scratch = Similarity.buildIvfIndex(stored, "cid", "cv")
    val rebuilt = Similarity.rebuildIvfIndex(spark, dir)
    assert(rebuilt.centroids == scratch.centroids,
      "in-place rebuild diverged from a from-scratch build on the same rows")
  }

  test("PQ: code imbalance signals drift; corpus-supplied compaction " +
      "rebuilds codebooks; probes and generation restore survive") {
    val corpus = vecs(0 until 200, 0, 0.8)
    val drifted = vecs(1000 until 1600, 4, 0.05)
    val full = corpus.unionByName(drifted)
    val dir = java.nio.file.Files.createTempDirectory("pqdrift").toString
    Similarity.savePqIndex(
      Similarity.buildPqIndex(corpus, "vec_id", "embedding", m = 2,
        ksub = 16, trainCap = 250), dir)
    val fresh = Similarity.pqCodeImbalance(
      Similarity.loadPqIndex(spark, dir).codes)
    Similarity.appendPqIndex(spark, dir, drifted, "vec_id", "embedding")
    val pre = Similarity.loadPqIndex(spark, dir)
    val imb = Similarity.pqCodeImbalance(pre.codes)
    assert(imb > Similarity.IvfImbalanceRebuildThreshold,
      s"drifted appends should exceed the bar, got $imb (fresh $fresh)")

    // Compaction with the corpus supplied escalates to the rebuild.
    val rebuilt = Similarity.compactPqIndex(spark, dir,
      rebuildFrom = Some((full, "vec_id", "embedding")))
    assert(rebuilt.codebooks != pre.codebooks,
      "escalated compaction must retrain the codebooks")
    val post = Similarity.pqCodeImbalance(rebuilt.codes)
    assert(post < imb, s"rebuild did not reduce code imbalance: $imb -> $post")
    // Content parity on the id set.
    assert(rebuilt.codes.select("cid").collect().map(_.getLong(0)).sorted.toSeq
      == pre.codes.select("cid").collect().map(_.getLong(0)).sorted.toSeq)
    // Probe quality on the SPREAD corpus vectors: self-queries rank
    // themselves first (exact rerank on top of the retrained ADC scan).
    // Drifted vectors are deliberately near-identical — their ADC scores
    // tie and no PQ (rebuilt or not) can guarantee self lands in the
    // rerank candidate set, so quality asserts use the corpus side.
    val q = corpus.limit(3)
    val top1 = Similarity.pqProbe(rebuilt, q, full, "vec_id", "embedding", 1)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top1.nonEmpty && top1.forall { case (x, y) => x == y })
    // Restore: fresh load prefers the rebuilt generation's codebooks and
    // probes identically; a further plain compaction carries them forward.
    val reloaded = Similarity.loadPqIndex(spark, dir)
    assert(reloaded.codebooks == rebuilt.codebooks)
    assert(Similarity.pqProbe(reloaded, q, full, "vec_id", "embedding", 1)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq == top1.toSeq)
    assert(Similarity.compactPqIndex(spark, dir).codebooks
      == rebuilt.codebooks)
  }

  test("sem family: imbalance sawtooth under drifted extends; rebuild " +
      "restores balance, preserves ids, stays self-consistent") {
    val corpus = vecs(0 until 150, 0, 0.6)
    var idx = Dedup.buildSemIndex(corpus, "vec_id", "embedding", eps = 0.2,
      nlist = 12, nprobe = 2)
    val series = scala.collection.mutable.ArrayBuffer(
      Similarity.listImbalance(idx.assigned))
    for (r <- 1 to 4) {
      val batch = vecs((1000 * r) until (1000 * r + 400), 5, 0.05)
      val (_, _, extended) =
        Dedup.probeAndExtendSemParts(idx, batch, "vec_id", "embedding")
      idx = extended
      series += Similarity.listImbalance(idx.assigned)
    }
    // Drifted extends climb monotonically-ish: the last reading far above
    // the fresh one (the rising edge of the sawtooth).
    assert(series.last > series.head * 2,
      s"drift did not register: ${series.toSeq}")
    val preIds = idx.assigned.select("id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq
    val rebuilt = Dedup.rebuildSemIndex(idx, releaseOld = false)
    // Falling edge: rebuild restores balance below the drifted peak.
    val post = Similarity.listImbalance(rebuilt.assigned)
    assert(post < series.last, s"rebuild did not drop imbalance: " +
      s"${series.toSeq} -> $post")
    // Id preservation and self-consistency under the retrained quantizer:
    // every row's list is one of its nprobe nearest rebuilt centroids.
    assert(rebuilt.assigned.select("id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == preIds)
    val bad = rebuilt.assigned.where(!array_contains(
        GraftFunctions.nearestCentroids(col("cv"), rebuilt.centroids,
          rebuilt.nprobe), col("list")))
      .count()
    assert(bad == 0L, s"$bad rows off their nprobe nearest rebuilt lists")
    Dedup.releaseSketchCaches()
  }
}
