package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  *
  * Sketch computation (minhash signatures, simhash bit-sums) is shaped as
  * explode → codegen'd hash aggregates rather than per-row higher-order
  * array expressions: HOFs evaluate interpreted (outside whole-stage
  * codegen) and rebuild intermediate arrays per hash function, which
  * measured ~25× slower at sf0.1. The aggregate form is all codegen, does
  * map-side partial aggregation, and shuffles only (id, 64 longs).
  */
object Dedup {

  /** Exact dedup: group by a content fingerprint, keep the smallest id.
    * One hash-shuffle; map-side partial aggregation makes the shuffle size
    * proportional to the number of DISTINCT documents, not rows. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Balance(docs).groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** (id, shingle-set) pairs used by the LSH and verification stages. */
  private def shingled(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame =
    Balance(docs).select(col(idCol).as("id"),
        TextOps.wordShingles(col(textCol), shingleN).as("sh"))
      .where(size(col("sh")) > 0)

  /** MinHash signature as 64 codegen'd min-aggregates over exploded shingle
    * hashes: each shingle is hashed once to a long, the k hash functions are
    * xxhash64(h, j). Returns (id, sig array<bigint>). */
  private def minhashSig(sh: DataFrame, numHashes: Int): DataFrame = {
    val hashed = sh.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), xxhash64(col("s")).as("h"))
    val aggs = (0 until numHashes).map(j =>
      min(xxhash64(col("h"), lit(j))).as(s"m$j"))
    hashed.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(j => col(s"m$j")): _*).as("sig"))
  }

  /** MinHash + LSH near-dedup: shingle → minhash signature → band buckets →
    * candidate pairs via bucket self-join → exact-Jaccard verification of
    * candidates only. Returns (a_id, b_id, jaccard) pairs with jaccard ≥
    * threshold, a_id < b_id.
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
    val sh = shingled(docs, idCol, textCol, shingleN)

    // (id, band, bucket) — only this 3-column form is shuffled.
    val buckets = minhashSig(sh, numHashes)
      .select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b)
              .as("bucket")))).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    // Skew guard: drop degenerate buckets before the quadratic self-join.
    val sized = buckets
      .withColumn("bsize",
        count(lit(1)).over(Window.partitionBy("band", "bucket")))
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

  /** Exact all-pairs n-gram Jaccard (the ground truth [[minhashLsh]]
    * approximates). Adaptive physical strategy, chosen from the shingle
    * dictionary's cardinality (one scalar aggregate — the operator's own
    * CBO-style stats lookup):
    *
    *   - small dictionary (≤ `maxBitsetDict` distinct shingles): encode each
    *     document's shingle set as a dense bitset (`array<bigint>` words) and
    *     score ALL pairs with the codegen'd popcount kernel
    *     [[graft.functions.GraftFunctions.bitsetCommon]]. A degenerate/tiny
    *     vocabulary makes every pair collide on some shingle anyway, so the
    *     shingle join degrades to Θ(pairs × avg common) rows — the bitset
    *     form does the same Θ(pairs) work at ~15 longs per pair with zero
    *     join-row blowup (measured ~4× faster than the join at sf0.1, and
    *     DuckDB-parity).
    *   - large dictionary: classic shingle self-join → per-pair common
    *     counts → Jaccard. Sparse overlap makes the join output ≪ pairs;
    *     this is the form that scales to a 100 TB corpus where bitsets
    *     can't.
    *
    * Output: (a_id, b_id, jaccard ≥ threshold), a_id < b_id — identical for
    * both paths (and to the DuckDB oracle).
    */
  def exactJaccard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 2,
      threshold: Double = 0.6,
      maxBitsetDict: Long = 65536): DataFrame = {
    val sh = shingled(docs, idCol, textCol, shingleN)
    val flat = sh.select(col("id"), explode(col("sh")).as("s"))
    // The dictionary is both the stats source (cardinality → strategy) and
    // the id assignment; cache it so the stats action doesn't recompute the
    // shingling pipeline.
    val dict = flat.select("s").distinct()
      .withColumn("sid",
        (row_number().over(Window.orderBy("s")) - 1).cast("int"))
      .cache()
    val dictSize = dict.count()

    val common =
      if (dictSize <= maxBitsetDict) {
        val words = (dictSize / 64 + 1).toInt
        val masks = flat.join(broadcast(dict), "s")
          .groupBy("id").agg(collect_list(col("sid")).as("sids"))
          .select(col("id"),
            expr(s"transform(sequence(0, ${words - 1}), w -> " +
              "aggregate(filter(sids, i -> i div 64 = w), cast(0 as bigint), " +
              "(acc, i) -> acc | shiftleft(cast(1 as bigint), cast(i % 64 as int))))")
              .as("mask"),
            size(col("sids")).cast("bigint").as("n"))
        masks.as("x").join(masks.as("y"), col("x.id") < col("y.id"))
          .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
            graft.functions.GraftFunctions
              .bitsetCommon(col("x.mask"), col("y.mask")).as("common"),
            col("x.n").as("na"), col("y.n").as("nb"))
      } else {
        val sizes = sh.select(col("id"), size(col("sh")).cast("bigint").as("n"))
        flat.as("a").join(flat.as("b"),
            col("a.s") === col("b.s") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"))
          .agg(count(lit(1)).as("common"))
          .join(sizes.select(col("id").as("a_id"), col("n").as("na")), "a_id")
          .join(sizes.select(col("id").as("b_id"), col("n").as("nb")), "b_id")
      }

    common
      .withColumn("jaccard",
        col("common") / (col("na") + col("nb") - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash as 64 codegen'd sign-sum aggregates over exploded
    * distinct-token hashes. Returns (id, sim bigint). */
  private def simhashSig(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = Balance(docs)
      .select(col(idCol).as("id"),
        explode(array_distinct(split(col(textCol), " "))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$b"))
    val combined = (0 until 64).foldLeft(lit(0L)) { (acc, b) =>
      acc + when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }
    toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), combined.as("sim"))
  }

  /** SimHash near-dedup: 64-bit simhash per doc, bucket by the four 16-bit
    * chunks (pigeonhole: any pair with ≤ 3 chunk-mismatches shares an exact
    * chunk, so recall is total for maxHamming ≤ 3·16 in the worst case and
    * for any realistic maxHamming ≪ 16), then verify Hamming distance on
    * candidates. Returns (a_id, b_id, hamming) with hamming ≤ maxHamming,
    * a_id < b_id. */
  def simhash(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 6): DataFrame = {
    val sim = simhashSig(docs, idCol, textCol)

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

  /** Embedding near-dedup: pairs with cosine ≥ threshold (exact, codegen'd
    * dot product — see [[Similarity.cosinePairs]]); at corpus scale prefer
    * [[Similarity.lshTopK]]'s bucketing. */
  def embedding(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame =
    Similarity.cosinePairs(emb, idCol, vecCol, threshold)
}
