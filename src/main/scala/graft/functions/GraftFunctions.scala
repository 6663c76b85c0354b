package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.{BitsetIntersectCount, ByteBlockHash, DotProduct, GraftBridge, MinHashSig, RollingHashes, ShingleHashSet, SimHash64, SortedIntersectCount, WinnowFingerprints}

/** Public registration + Column-API access for graft's native Catalyst
  * expressions (see org.apache.spark.sql.graft for the implementations). */
object GraftFunctions {

  /** Make the graft expressions callable from SQL in this session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bitset_common",
      exprs => BitsetIntersectCount(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_common",
      exprs => SortedIntersectCount(exprs.head, exprs(1)), "built-in")
  }

  /** Codegen'd dot product over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Codegen'd popcount of the AND of two array<bigint> bitsets. */
  def bitsetCommon(a: Column, b: Column): Column =
    GraftBridge.column(BitsetIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Codegen'd merge-intersection size of two sorted array<bigint> sets. */
  def sortedCommon(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Sorted distinct xxhash64 set of the n-token shingles of a token array. */
  def shingleHashes(tokens: Column, n: Int): Column =
    GraftBridge.column(ShingleHashSet(GraftBridge.expression(tokens), n))

  /** k-long MinHash signature of an array<bigint> element-hash set. */
  def minhashSig(hashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(hashes), k))

  /** 64-bit SimHash of an array<bigint> element-hash set. */
  def simhash(hashes: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(hashes)))

  /** Sorted distinct winnowing fingerprints (rolling-hash byte k-grams,
    * rightmost-min per w-window) of a string column. */
  def winnow(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFingerprints(GraftBridge.expression(text), k, w))

  /** Per-position rolling k-gram hash sequence — the sequence [[winnow]]
    * selects from, for in-plan attestation of its coverage guarantee. */
  def rollingHashes(text: Column, k: Int): Column =
    GraftBridge.column(RollingHashes(GraftBridge.expression(text), k))

  /** 64-bit byte-block average-hash of a binary column — the perceptual-
    * hash voting step, locality-sensitive in the byte domain. */
  def byteBlockHash(content: Column): Column =
    GraftBridge.column(ByteBlockHash(GraftBridge.expression(content)))

  /** Bloom-filter membership test of a string column against a baked
    * filter (false = definitely absent) — the probe-side sidecar kernel. */
  def bloomMightContain(c: Column,
      bf: org.apache.spark.util.sketch.BloomFilter): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.BloomMightContain(
        GraftBridge.expression(c), bf))

  /** Index of the centroid (rows of `cents`) with the highest dot product
    * against an array<double> column — fused codegen'd argmax. */
  def nearestCentroid(v: Column, cents: Seq[Seq[Double]]): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.NearestCentroid(GraftBridge.expression(v), cents))

  /** Top-k centroid indices by dot product, descending (array<int>) — the
    * IVF multi-assignment kernel. */
  def nearestCentroids(v: Column, cents: Seq[Seq[Double]], k: Int): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.NearestCentroids(
        GraftBridge.expression(v), cents, k))

  /** Product-quantization code words (array<int>, one per subspace) of an
    * array<double> vector against baked codebooks cb(subspace)(centroid). */
  def pqEncode(v: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.PqEncode(GraftBridge.expression(v), cb))

  /** Flattened PQ asymmetric-distance lookup table (m·ksub doubles) of a
    * query vector against the baked codebooks. */
  def pqLut(v: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(
      org.apache.spark.sql.graft.PqLut(GraftBridge.expression(v), cb))

  /** PQ asymmetric score Σ_j lut(j·ksub + codes(j)) ≈ the raw dot product. */
  def pqScore(codes: Column, lut: Column): Column =
    GraftBridge.column(org.apache.spark.sql.graft.PqScore(
      GraftBridge.expression(codes), GraftBridge.expression(lut)))

  /** One greedy left-to-right BPE merge of (a, b) over an array<string>
    * symbol column — the training round's map step. */
  def bpeMergePair(syms: Column, a: String, b: String): Column =
    GraftBridge.column(org.apache.spark.sql.graft.BpeMergePair(
      GraftBridge.expression(syms), a, b))

  /** Full BPE encode of an array<string> word column under a baked merge
    * table (rank order = seq order). */
  def bpeEncodeWords(words: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(org.apache.spark.sql.graft.BpeEncodeWords(
      GraftBridge.expression(words), merges))

  /** Sequential regex replace-and-count chain in one kernel pass per
    * pattern: struct(redacted string, matches bigint). */
  def regexScrub(text: Column, patterns: Seq[(String, String)]): Column =
    GraftBridge.column(org.apache.spark.sql.graft.RegexScrub(
      GraftBridge.expression(text), patterns))

  /** Z-order (Morton) value of an array<double> of clustering values
    * under baked per-dimension equi-depth boundaries — the clustering key
    * [[graft.sources.Sink.zordered]] lays files out by. */
  def zValue(vals: Column, boundaries: Seq[Seq[Double]], bits: Int): Column =
    GraftBridge.column(org.apache.spark.sql.graft.ZValue(
      GraftBridge.expression(vals), boundaries, bits))

  /** Unigram-LM (SentencePiece-style) Viterbi encode of an array<string>
    * word column under a baked piece→logprob table (the model — vocab
    *-bounded, corpus-size-constant). */
  def unigramEncodeWords(words: Column, pieces: Map[String, Double],
      maxPieceLen: Int): Column =
    GraftBridge.column(org.apache.spark.sql.graft.UnigramEncodeWords(
      GraftBridge.expression(words), pieces, maxPieceLen))
}
