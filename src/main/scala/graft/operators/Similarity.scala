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
