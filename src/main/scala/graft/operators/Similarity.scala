package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - [[bruteTopK]]: exact cosine top-k — broadcast the (small) query set,
  *     score every candidate partition-locally, per-query top-k via window.
  *     No shuffle of the corpus; the only shuffle is the final per-query
  *     top-k (tiny). This is the correct baseline even at 100 TB when the
  *     query set is small: it's one scan.
  *   - [[lshTopK]]: random-hyperplane LSH — subcodes of sign-bits; a
  *     candidate must share at least one subcode with the query. The corpus
  *     is scored only inside matching buckets, trading exact recall for a
  *     bucket-joined plan that avoids scoring the full corpus per query.
  *
  * The inner product is [[graft.functions.DotProduct]] — a codegen'd native
  * expression. Norms are computed once per vector, not per pair; cosine =
  * dot / (norm_a · norm_b) keeps the arithmetic bit-identical to computing
  * both inline (sqrt once per vector is the same double), so results stay
  * oracle-comparable.
  */
object Similarity {

  def toDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column = GraftFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k of `corpus` for each row of `queries`.
    * Output: (qid, cid, cos_sim, rnk), rnk 1..k per qid. */
  def bruteTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"),
        toDoubleVec(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).as("cid"),
        toDoubleVec(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.crossJoin(broadcast(q))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("cid"), round(col("cos"), 4).as("cos_sim"),
        col("rnk"))
  }

  /** All pairs (a_id < b_id) with cosine ≥ threshold. Norms precomputed per
    * row; the pair loop is just the codegen'd dot. */
  def cosinePairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val e = emb.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    e.as("x").join(e.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        (dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos_sim"))
  }

  /** Deterministic pseudo-random unit-ish hyperplanes (seeded — identical on
    * every executor and every run). */
  private def hyperplanes(dim: Int, n: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit subcodes: `groups` subcodes of `bitsPerGroup` hyperplane signs
    * each, as (group, code) structs. */
  private def subcodes(v: Column, planes: Seq[Seq[Double]], groups: Int,
      bitsPerGroup: Int): Column =
    array((0 until groups).map { g =>
      val code = (0 until bitsPerGroup).foldLeft(lit(0L)) { (acc, b) =>
        val plane = planes(g * bitsPerGroup + b)
        acc + when(dot(v, typedlit(plane)) > 0, lit(1L << b)).otherwise(lit(0L))
      }
      struct(lit(g).as("g"), code.as("code"))
    }: _*)

  /** Spherical k-means (Lloyd, cosine assignment) on an in-memory sample.
    * Training on a bounded sample is the standard IVF recipe: the sample
    * size is fixed regardless of corpus size, so quantizer training never
    * becomes the scale bottleneck — only the (distributed, codegen'd)
    * assignment pass touches the full corpus. Deterministic: seeded init
    * from hash-ordered rows, fixed iteration count. */
  private def trainCentroids(sample: Array[Array[Double]], nlist: Int,
      maxIter: Int): Seq[Seq[Double]] = {
    val dim = sample.head.length
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val unit = sample.map(normalize)
    var cents = unit.take(nlist).map(_.clone)
    var it = 0
    while (it < maxIter) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val cnt = new Array[Int](nlist)
      unit.foreach { u =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var i = 0
        while (i < nlist) {
          var d = 0.0; var j = 0
          while (j < dim) { d += u(j) * cents(i)(j); j += 1 }
          if (d > bestDot) { bestDot = d; best = i }
          i += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += u(j); j += 1 }
        cnt(best) += 1
      }
      cents = Array.tabulate(nlist) { i =>
        if (cnt(i) == 0) cents(i) // empty list keeps its centroid
        else normalize(sums(i))
      }
      it += 1
    }
    cents.map(_.toSeq).toSeq
  }

  /** (1 − u·c_i, i) structs for every centroid — struct ordering makes
    * array_min/array_sort pick the highest-cosine lists. */
  private def centroidDistances(u: Column, cents: Seq[Seq[Double]]): Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      struct((lit(1.0) - dot(u, typedlit(c))).as("d"), lit(i).as("i"))
    }: _*)

  /** IVF approximate cosine top-k (the faiss `IVFFlat` layout, Spark-first):
    * a spherical-k-means coarse quantizer partitions the corpus into `nlist`
    * inverted lists; each query exactly scores only its `nprobe`
    * nearest-centroid lists. Expected scored fraction ≈ nprobe/nlist of the
    * corpus per query — at 100 TB this is the difference between one scan
    * per query batch and nlist/nprobe× less compute, while the corpus-side
    * plan stays a single scan + one broadcast-hash join on `list` (no
    * corpus shuffle; list assignment is a codegen'd argmin over `nlist`
    * native dot products). Quantizer trains on a driver-side sample capped
    * at `trainCap` rows (scale-independent, faiss practice). */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      maxIter: Int = 8,
      trainCap: Int = 20000): DataFrame = {
    val c = corpus.select(col(idCol).as("cid"),
        toDoubleVec(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val sample = c.orderBy(xxhash64(col("cid"))).limit(trainCap)
      .select(col("cv")).collect()
      .map(_.getSeq[Double](0).toArray)
    val cents = trainCentroids(sample, nlist, maxIter)

    // Corpus-side assignment is the per-row hot loop: a fused codegen'd
    // argmax over the baked centroid matrix (centroids are unit vectors, so
    // the un-normalized dot picks the same list as the cosine).
    val unit = (v: Column, n: Column) => transform(v, x => x / n)
    val assigned = c.withColumn("list",
      GraftFunctions.nearestCentroid(col("cv"), cents))

    val q = queries.select(col(idCol).as("qid"),
        toDoubleVec(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .withColumn("probe", slice(array_sort(
        centroidDistances(unit(col("qv"), col("qn")), cents)), 1, nprobe))
      .withColumn("list", explode(transform(col("probe"), p => p.getField("i"))))
      .drop("probe")

    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    assigned.join(broadcast(q), Seq("list"))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("cid"), round(col("cos"), 4).as("cos_sim"),
        col("rnk"))
  }

  /** Approximate cosine top-k: candidates = corpus rows sharing ≥1 subcode
    * with the query, scored exactly, per-query top-k. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int = 64,
      groups: Int = 4,
      bitsPerGroup: Int = 4,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, groups * bitsPerGroup, seed)

    def coded(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), toDoubleVec(col(vecCol)).as(vec))
        .withColumn(s"${id}_n", norm(col(vec)))
        .select(col(id), col(vec), col(s"${id}_n"),
          explode(subcodes(col(vec), planes, groups, bitsPerGroup)).as("sc"))
        .select(col(id), col(vec), col(s"${id}_n"),
          col("sc.g").as("g"), col("sc.code").as("code"))

    val q = coded(queries, "qid", "qv")
    val c = coded(corpus, "cid", "cv")

    val candidates = c.join(broadcast(q), Seq("g", "code"))
      .select(col("qid"), col("cid"), col("qv"), col("cv"),
        col("qid_n"), col("cid_n"))
      .groupBy("qid", "cid").agg(first("qv").as("qv"), first("cv").as("cv"),
        first("qid_n").as("qn"), first("cid_n").as("cn"))

    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    candidates
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("cid"), round(col("cos"), 4).as("cos_sim"),
        col("rnk"))
  }
}
