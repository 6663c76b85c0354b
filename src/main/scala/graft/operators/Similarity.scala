package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - [[bruteTopK]]: exact cosine top-k — broadcast the (small) query set,
  *     score every candidate partition-locally, per-query top-k via window.
  *     No shuffle of the corpus; the only shuffle is the final per-query
  *     top-k (tiny). This is the correct baseline even at 100 TB when the
  *     query set is small: it's one scan.
  *   - [[lshTopK]]: random-hyperplane LSH — 4 subcodes of 4 sign-bits each;
  *     a candidate must share at least one subcode with the query. The
  *     corpus is scored only inside matching buckets, trading exact recall
  *     for a corpus-scan-free (bucket-joined) plan that scales to corpora
  *     where even one full scan per query batch is too expensive.
  *
  * All arithmetic is double-precision, sequential per vector — deterministic
  * and oracle-comparable.
  */
object Similarity {

  def toDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

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
    val c = corpus.select(col(idCol).as("cid"),
      toDoubleVec(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("qid"), col("cid"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("cid"), round(col("cos"), 4).as("cos_sim"),
        col("rnk"))
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
        .select(col(id), col(vec),
          explode(subcodes(col(vec), planes, groups, bitsPerGroup)).as("sc"))
        .select(col(id), col(vec),
          col("sc.g").as("g"), col("sc.code").as("code"))

    val q = coded(queries, "qid", "qv")
    val c = coded(corpus, "cid", "cv")

    val candidates = c.join(broadcast(q), Seq("g", "code"))
      .select(col("qid"), col("cid"), col("qv"), col("cv"))
      .groupBy("qid", "cid").agg(first("qv").as("qv"), first("cv").as("cv"))

    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    candidates
      .select(col("qid"), col("cid"), cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("cid"), round(col("cos"), 4).as("cos_sim"),
        col("rnk"))
  }
}
