package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed document-deduplication operators.
  *
  * Scale design (the point of these over a naive O(n²) pass): every variant
  * turns "compare all pairs" into "group by a locality key, compare within
  * groups" — the shuffle is on the locality key, candidate verification is
  * confined to buckets, and nothing ever collects to the driver. At 100 TB
  * the bucket join is the only shuffle-heavy step; bucket-size capping
  * (`maxBucket`) bounds the quadratic blowup a skewed/degenerate key would
  * cause (the dropped buckets are boilerplate-like content better handled by
  * an exact-hash pre-pass anyway).
  */
object Dedup {

  /** Exact dedup: group by a content fingerprint, keep the smallest id.
    * One hash-shuffle; map-side partial aggregation makes the shuffle size
    * proportional to the number of DISTINCT documents, not rows. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash + LSH near-dedup: shingle → minhash signature (map-side) →
    * band buckets → candidate pairs via bucket self-join → exact-Jaccard
    * verification of candidates only. Returns (a_id, b_id, jaccard) pairs
    * with jaccard ≥ threshold, a_id < b_id.
    *
    * With `numHashes = bands * rowsPerBand`, the LSH s-curve's inflection is
    * ≈ (1/bands)^(1/rowsPerBand); defaults (16×4) put it at ~0.5 so pairs at
    * ≥ 0.6 are caught with high probability while distant pairs rarely
    * collide. Probabilistic recall is the price of never materializing the
    * O(n²) pair space.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 2,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.6,
      maxBucket: Int = 10000): DataFrame = {
    val numHashes = bands * rowsPerBand

    val sh = docs
      .select(col(idCol).as("id"),
        TextOps.wordShingles(col(textCol), shingleN).as("sh"))
      .where(size(col("sh")) > 0)

    // (id, band, bucket) — signature stays inside this projection; only the
    // 3-column exploded form is shuffled.
    val buckets = sh
      .select(col("id"),
        TextOps.minhashSignature(col("sh"), numHashes).as("sig"))
      .select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b)
              .as("bucket")))).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    // Skew guard: drop degenerate buckets before the quadratic self-join.
    val sized = buckets
      .withColumn("bsize",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band", "bucket")))
      .where(col("bsize") <= maxBucket)
      .drop("bsize")

    val candidates = sized.as("x")
      .join(sized.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .distinct()

    // Verify candidates with exact Jaccard over the shingle sets.
    candidates
      .join(sh.select(col("id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(sh.select(col("id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .withColumn("common",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("bigint"))
      .withColumn("jaccard",
        col("common") / (size(col("a_sh")) + size(col("b_sh")) - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-dedup: 64-bit simhash per doc (map-side), bucket by 16-bit
    * chunks (a pair within Hamming distance ≤ 16/4·... — by pigeonhole, any
    * pair with ≤ 3 chunk-mismatches shares at least one exact chunk), then
    * verify Hamming distance on candidates. Returns (a_id, b_id, hamming)
    * with hamming ≤ maxHamming, a_id < b_id. Guaranteed recall for
    * maxHamming < 16/4·4 = pairs differing in at most 3 of 4 chunks — i.e.
    * exact for maxHamming ≤ 16 as long as mismatched bits don't cover all
    * four chunks; in practice maxHamming ≪ 16 so recall is total. */
  def simhash(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 12): DataFrame = {
    val sim = docs.select(col(idCol).as("id"),
      TextOps.simhash64(s"split($textCol, ' ')").as("sim"))

    val chunks = sim.select(col("id"), col("sim"),
      explode(expr(
        "transform(sequence(0, 3), c -> named_struct(" +
          "'c', c, 'chunk', shiftright(sim, c * 16) & 65535))")).as("cc"))
      .select(col("id"), col("sim"),
        col("cc.c").as("c"), col("cc.chunk").as("chunk"))

    chunks.as("x")
      .join(chunks.as("y"),
        col("x.c") === col("y.c") && col("x.chunk") === col("y.chunk") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming").cast("bigint").as("hamming"))
  }

  /** Embedding near-dedup: pairs with cosine ≥ threshold. Delegates to
    * [[Similarity]] — brute pairs for verification-scale inputs; at corpus
    * scale use [[Similarity.lshTopK]]'s bucketing instead. */
  def embedding(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val e = emb.select(col(idCol).as("id"),
      Similarity.toDoubleVec(col(vecCol)).as("v"))
    e.as("x").join(e.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        Similarity.cosine(col("x.v"), col("y.v")).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos_sim"))
  }
}
