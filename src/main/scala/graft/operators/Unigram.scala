package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed unigram-LM tokenizer TRAINING (SentencePiece's unigram
  * model, Kudo 2018) — the OTHER tokenizer family real pipelines train
  * next to BPE (reference scope: the survey's north-star extension; the
  * reference has no tokenizer surface). Where BPE grows a vocabulary
  * bottom-up by merging, the unigram model starts from an over-complete
  * seed of candidate pieces and SHRINKS it: EM rounds re-estimate each
  * piece's probability from how often the Viterbi segmentation of the
  * corpus actually uses it, then the least-useful pieces are pruned until
  * the target vocabulary size holds.
  *
  * Scale shape ([[Bpe]]'s discipline, point for point):
  *   - The corpus is touched ONCE: the same tokenize→histogram pass
  *     reduces it to the weighted distinct-word dictionary; everything
  *     after runs over the dictionary, corpus-size-independent.
  *   - The SEED pass is one dictionary-sized substring explode (bounded:
  *     ≤ maxPieceLen entries per word position) aggregated map-side, with
  *     only the top-`seedSize` pieces reaching the driver (one bounded
  *     collect — the centroids discipline).
  *   - Each EM round is one dictionary-sized pass: the piece table
  *     broadcasts (it is the model, vocab-bounded), every word segments
  *     via the native Viterbi kernel ([[UnigramKernels]]), and the
  *     per-piece usage counts — at most vocab-size rows — reduce back to
  *     the driver. No token-level row ever shuffles.
  *   - Hard (Viterbi) EM, not full forward-backward: counts come from the
  *     single best segmentation. Deterministic by construction — no
  *     sampling, ties broken on (count desc, piece asc) everywhere — so a
  *     retrain from a fresh histogram reproduces the identical model
  *     (t22b attests this on the official record, the [[Bpe.train]]
  *     determinism contract).
  *
  * Coverage: every single code point seen in the corpus is seeded and is
  * never pruned, so any training-corpus string segments without the
  * unknown-character fallback firing (t22b's zero-OOV invariant). */
object Unigram {

  /** A trained model: piece → log probability, the DP's piece-length
    * bound, and the final Viterbi usage counts (exact integers — what t22
    * exposes; log probs are derivable but float-typed). */
  final case class Model(pieces: Map[String, Double], maxPieceLen: Int,
      usage: Seq[(String, Long)])

  private def jmap(pieces: Map[String, Double])
      : java.util.HashMap[String, java.lang.Double] =
    org.apache.spark.sql.graft.UnigramKernels.toJavaMap(pieces)

  /** Candidate seed: every single code point (kept unconditionally —
    * coverage) plus the top multi-code-point substrings by count·length
    * (the standard make-suffix-array-scores-cheap approximation), capped
    * at `seedSize` total. Returns (piece, weight, isChar) with weights =
    * raw counts. */
  private def seedCandidates(hist: DataFrame, seedSize: Int,
      maxPieceLen: Int, minSeedCount: Long): Seq[(String, Long, Boolean)] = {
    val spark = hist.sparkSession
    import spark.implicits._
    val subs = hist.select(col("word"), col("cnt").cast("long").as("cnt"))
      .as[(String, Long)]
      .flatMap { case (w, c) =>
        val b = org.apache.spark.sql.graft.UnigramKernels.codepointBounds(w)
        val n = b.length - 1
        // Single code points enumerate over the WHOLE word (coverage is
        // unconditional); multi-piece candidates cap at the first 256
        // positions so one pathological mega-token cannot explode the
        // seed pass (SentencePiece's sentence-length cap, per word).
        val capN = math.min(n, 256)
        val singles = (0 until n).iterator
          .map(i => (w.substring(b(i), b(i + 1)), c, true))
        val multis = for {
          i <- (0 until capN).iterator
          l <- (2 to math.min(maxPieceLen, n - i)).iterator
        } yield (w.substring(b(i), b(i + l)), c, false)
        singles ++ multis
      }
      .toDF("piece", "cnt", "is_char")
      .groupBy("piece").agg(sum("cnt").as("cnt"), max("is_char").as("is_char"))
    val chars = subs.where(col("is_char"))
      .select(col("piece"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), true)).toSeq
      .sortBy { case (p, c, _) => (-c, p) }
    val multiBudget = math.max(0, seedSize - chars.size)
    val multi = subs.where(!col("is_char") && col("cnt") >= minSeedCount)
      .select(col("piece"), col("cnt"),
        (col("cnt") * length(col("piece"))).as("score"))
      .orderBy(desc("score"), asc("piece"))
      .limit(multiBudget)
      .collect().map(r => (r.getString(0), r.getLong(1), false)).toSeq
    chars ++ multi
  }

  /** One hard-EM expectation pass: Viterbi-segment the dictionary under
    * `pieces`, reduce per-piece usage weighted by word count. Vocab-bounded
    * result (every emission is in `pieces` when coverage holds). */
  private def viterbiUsage(hist: DataFrame, pieces: Map[String, Double],
      maxPieceLen: Int): Map[String, Long] = {
    val spark = hist.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(jmap(pieces))
    val maxLen = maxPieceLen
    try {
      hist.select(col("word"), col("cnt").cast("long").as("cnt"))
        .as[(String, Long)]
        .rdd
        .mapPartitions { it =>
          val m = bc.value
          val acc = scala.collection.mutable.HashMap.empty[String, Long]
          it.foreach { case (w, c) =>
            val segs = org.apache.spark.sql.graft.UnigramKernels
              .segmentWord(w, m, maxLen)
            var i = 0
            while (i < segs.size) {
              val p = segs.get(i)
              acc.update(p, acc.getOrElse(p, 0L) + c)
              i += 1
            }
          }
          acc.iterator
        }
        .reduceByKey(_ + _)
        .collect().toMap
    } finally bc.unpersist(false)
  }

  /** Normalize usage counts into log probabilities; zero-usage survivors
    * (protected characters the Viterbi never picked) get a half-count
    * floor so they stay finite and strictly below every used piece. */
  private def toLogProbs(usage: Map[String, Long],
      keep: Iterable[String]): Map[String, Double] = {
    val total = math.max(1L, usage.values.sum).toDouble
    keep.map { p =>
      val u = usage.getOrElse(p, 0L)
      p -> math.log(if (u > 0L) u / total else 0.5 / total)
    }.toMap
  }

  /** Train a unigram-LM tokenizer over a word histogram (`word`, `cnt`).
    * `vocabSize` is the FINAL piece count (characters always survive, so
    * the effective floor is the corpus alphabet size); `seedSize` bounds
    * the over-complete candidate set; each of the `emRounds` rounds
    * re-estimates usage and prunes the weakest multi-code-point pieces by
    * `pruneFrac` until the target holds (the SentencePiece shrink
    * schedule, deterministic tie-breaks). */
  def train(hist: DataFrame, vocabSize: Int = 512, seedSize: Int = 2048,
      maxPieceLen: Int = 8, emRounds: Int = 4,
      pruneFrac: Double = 0.3, minSeedCount: Long = 2L): Model = {
    require(vocabSize >= 1 && seedSize >= vocabSize,
      s"need seedSize ≥ vocabSize ≥ 1, got seed=$seedSize vocab=$vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    // The histogram feeds emRounds + 1 Viterbi passes and the seed pass
    // (round 17): without a persist each pass recomputed the caller's
    // corpus tokenize + aggregate upstream — 5-6 full corpus scans per
    // train for a vocabulary-sized frame. Unpersisted before return
    // (every consumer below collects eagerly).
    val h = hist.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try trainOn(h, vocabSize, seedSize, maxPieceLen, emRounds, pruneFrac,
      minSeedCount)
    finally h.unpersist(false)
  }

  private def trainOn(hist: DataFrame, vocabSize: Int, seedSize: Int,
      maxPieceLen: Int, emRounds: Int,
      pruneFrac: Double, minSeedCount: Long): Model = {
    val cand = seedCandidates(hist, seedSize, maxPieceLen, minSeedCount)
    val chars = cand.filter(_._3).map(_._1).toSet
    // Seed probabilities ∝ count·length (the score that ranked them).
    // Length in CODE POINTS — the trainer's unit everywhere else
    // (maxPieceLen, substring bounds; Spark's `length()` in the seed
    // ranking is code-point-based too). `p.length` would be UTF-16
    // units, inflating supplementary-plane pieces 2× in the seed
    // distribution.
    val seedScores = cand.map { case (p, c, isChar) =>
      p -> c * (if (isChar) 1L else p.codePointCount(0, p.length).toLong)
    }.toMap
    val seedTotal = math.max(1L, seedScores.values.sum).toDouble
    var probs = seedScores.map { case (p, s) =>
      p -> math.log(math.max(1L, s) / seedTotal)
    }
    var usage: Map[String, Long] = Map.empty
    var round = 0
    while (round < emRounds) {
      usage = viterbiUsage(hist, probs, maxPieceLen)
      val multi = probs.keysIterator.filterNot(chars).toSeq
      val multiTarget =
        if (round == emRounds - 1) math.max(0, vocabSize - chars.size)
        else math.max(math.max(0, vocabSize - chars.size),
          math.ceil(multi.size * (1.0 - pruneFrac)).toInt)
      val keptMulti = multi
        .sortBy(p => (-usage.getOrElse(p, 0L), p))
        .take(multiTarget)
      probs = toLogProbs(usage, chars ++ keptMulti)
      round += 1
    }
    // Final usage under the FINAL vocabulary — the distribution encode
    // actually produces (and what t22 exposes as exact integers).
    usage = viterbiUsage(hist, probs, maxPieceLen)
    Model(probs, maxPieceLen,
      usage.toSeq.sortBy { case (p, u) => (-u, p) })
  }

  /** The trained vocabulary as a frame — `(piece, usage, is_char)` in
    * (usage desc, piece) order, exact-integer columns only. EVERY piece
    * of the model appears, including protected characters the final
    * Viterbi pass never used (usage 0) — the frame IS the vocabulary, not
    * just its active subset. */
  def vocabFrame(spark: org.apache.spark.sql.SparkSession,
      model: Model): DataFrame = {
    import spark.implicits._
    val used = model.usage.toMap
    model.pieces.keysIterator.toSeq
      .map(p => (p, used.getOrElse(p, 0L),
        p.codePointCount(0, p.length) == 1))
      .sortBy { case (p, u, _) => (-u, p) }
      .toDF("piece", "usage", "is_char")
  }

  /** Apply a trained model to text: tokenize with the training convention
    * (lowercase alnum — [[Bpe.encode]]'s shared rule), then per-word
    * Viterbi through the native kernel with the piece table baked in: one
    * narrow codegen'd expression, zero shuffle, linear in executors. */
  def encode(text: Column, model: Model): Column =
    graft.functions.GraftFunctions.unigramEncodeWords(
      filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0),
      model.pieces, model.maxPieceLen)

  /** Persist a trained model (vocab-bounded — KB scale): `pieces`
    * (piece, logp), `usage` (piece, usage), then `params` LAST as the
    * commit marker (the WAL discipline — a crash mid-save leaves no
    * `params`, and [[load]] fails loudly instead of reading a torn
    * model). Re-saving over an existing model RETRACTS the old marker
    * first: without that delete, the old `params` would survive as a
    * valid marker while pieces/usage were mid-overwrite, and a crash
    * there would hand [[load]] a torn model (old maxPieceLen over new
    * pieces) it has no way to detect. Doubles round-trip exactly through
    * parquet, so a loaded model Viterbi-segments bit-identically to the
    * trained one (t23b attests this on the official record). */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
      dir: String): Unit = {
    import spark.implicits._
    val marker = new org.apache.hadoop.fs.Path(s"$dir/params")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker))
      require(fs.delete(marker, true),
        s"failed to retract old commit marker $marker before re-save")
    model.pieces.toSeq.sortBy(_._1).toDF("piece", "logp")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/pieces")
    model.usage.toDF("piece", "usage")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/usage")
    Seq(model.maxPieceLen).toDF("max_piece_len")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
  }

  /** Load a model persisted by [[save]] — three tiny reads, all
    * vocab-bounded collects (the model IS driver-sized by design). */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    val maxLen = spark.read.parquet(s"$dir/params")
      .head().getInt(0)
    val pieces = spark.read.parquet(s"$dir/pieces")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val usage = spark.read.parquet(s"$dir/usage")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy { case (p, u) => (-u, p) }
    Model(pieces, maxLen, usage)
  }
}
