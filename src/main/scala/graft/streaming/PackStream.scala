package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Bpe, Packing}

/** Streaming tokenized-dataset EXPORT — the arrival-time twin of
  * `x7_tokenized_export`, completing the pipeline's streaming story: the
  * dedup families gate arrivals, this stage TOKENIZES AND PACKS what
  * survives into fixed context windows, continuously.
  *
  * The tokenizer (BPE merges + vocab) is FROZEN at bootstrap — the
  * production contract: a training run's token ids must mean the same
  * thing on day 90 as on day 1, so arrivals encode through the saved
  * model (unseen characters map to the OOV id −1) and a model change is a
  * new export, never an in-place mutation. Packing state is tiny by
  * construction — per shard, the next pack id and at most window−1
  * carried-over token ids — and is checkpointed as a COMMITTED GENERATION
  * per batch (params written last as the marker, previous generation
  * retained), so every batch's packs are a pure function of
  * (previous committed state, batch):
  *   - crash anywhere between sink and commit → the engine replays the
  *     batch, the recompute from the previous generation is bit-identical,
  *     and the batch-id-keyed idempotent sink overwrites its earlier
  *     attempt — exactly-once landed packs;
  *   - engine restart WITHOUT its checkpoint (batch ids reset) → the
  *     replay fingerprint recorded in each generation's params
  *     distinguishes a genuine replay (same ids + content → recompute and
  *     overwrite under the original id) from id reuse with different docs
  *     (→ rebase above the committed high-water mark and fold as new).
  * Within a batch, docs pack in doc_id order; across batches, in arrival
  * order — the honest streaming semantics (a batch-mode x7 over the same
  * arrival sequence packs identically, spec-asserted). */
object PackStream {

  /** The frozen tokenizer + layout parameters, loaded once per resume. */
  final case class Model(merges: Seq[Bpe.Merge], vocab: Map[String, Long],
      nShards: Long, window: Int)

  final class Handle(val path: String, val model: Model)

  private def modelDir(path: String) = s"$path/model"
  private def stateRoot(path: String) = s"$path/state"

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed state generations (params marker present), ascending. */
  private def committedGens(spark: SparkSession, path: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(stateRoot(path))
    val f = fs(spark, path)
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.matches("g\\d+") => n.drop(1).toLong }
      .filter(g => f.exists(new org.apache.hadoop.fs.Path(
        s"${stateRoot(path)}/g$g/params/_SUCCESS")))
      .sorted
  }

  private def genDir(path: String, g: Long) = s"${stateRoot(path)}/g$g"

  /** Bootstrap-or-load ([[FpDedupStream.resume]] contract): train the
    * tokenizer on `corpus` and write the initial empty packing state, or
    * restore the committed model + newest state so a restarted stream
    * continues the same pack numbering and carried tokens. */
  def resume(
      spark: SparkSession,
      path: String,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Long = 8L,
      nMerges: Int = 24,
      window: Int = 1024): Handle = {
    val mdir = modelDir(path)
    val f = fs(spark, path)
    val committed = new org.apache.hadoop.fs.Path(s"$mdir/params/_SUCCESS")
    if (!f.exists(committed)) {
      val merges = Bpe.train(
        Bpe.wordHistogram(corpus.select(col(textCol).as("text")), "text"),
        nMerges)
      // Vocab from the corpus ENCODE — bounded by the model (base symbols
      // + one per merge), the centroids discipline.
      val vocabToks = corpus
        .select(explode(Bpe.encode(col(textCol), merges)).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("token"))
        .collect().map(_.getString(0))
      import spark.implicits._
      Bpe.mergesFrame(spark, merges).coalesce(1)
        .write.mode("overwrite").parquet(s"$mdir/merges")
      vocabToks.zipWithIndex.map { case (t, i) => (t, i.toLong) }.toSeq
        .toDF("token", "tid").coalesce(1)
        .write.mode("overwrite").parquet(s"$mdir/vocab")
      // Initial state: every shard at pack 0 with nothing carried. Written
      // before the model params marker — an interrupted bootstrap reruns
      // whole.
      (0L until nShards).map(sh => (sh, 0L, Array.empty[Long])).toSeq
        .toDF("shard", "next_pack", "pending").coalesce(1)
        .write.mode("overwrite").parquet(s"${genDir(path, 0L)}/pending")
      Seq((0L, 0L, 0L)).toDF("batch_fp", "batch_n", "batch_id").coalesce(1)
        .write.mode("overwrite").parquet(s"${genDir(path, 0L)}/params")
      Seq((nShards, window, nMerges)).toDF("n_shards", "window", "n_merges")
        .coalesce(1).write.mode("overwrite").parquet(s"$mdir/params")
    }
    val p = spark.read.parquet(s"$mdir/params").head()
    val merges = spark.read.parquet(s"$mdir/merges").orderBy("rank")
      .collect().map(r => Bpe.Merge(r.getInt(0), r.getString(1),
        r.getString(2))).toSeq
    val vocab = spark.read.parquet(s"$mdir/vocab")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    new Handle(path, Model(merges, vocab, p.getLong(0), p.getInt(1)))
  }

  /** Order-independent replay fingerprint of a batch: (XOR of
    * xxhash64(id, text), row count) — XOR instead of a sum because ANSI
    * mode makes a long sum of 64-bit hashes an overflow error. */
  private def fingerprint(batch: DataFrame, idCol: String,
      textCol: String): (Long, Long) = {
    val r = batch.select(
      xxhash64(col(idCol).cast("string"), col(textCol)).as("h"))
      .agg(coalesce(expr("bit_xor(h)"), lit(0L)), count(lit(1))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** One micro-batch, runnable standalone for backfill and specs: pack the
    * batch from the newest committed state strictly BELOW the effective
    * id, land full packs via the batch-id-keyed idempotent sink, commit
    * the successor state generation. Returns the effective batch id. */
  def processBatch(
      handle: Handle,
      batch: DataFrame,
      engineBatchId: Long,
      idCol: String,
      textCol: String,
      outPath: String,
      // Test seam: runs between the pack sink and the state commit — the
      // crash window CrashRestartSpec's kill -9 child aims at.
      afterSink: () => Unit = () => ()): Long = {
    val spark = batch.sparkSession
    val m = handle.model
    val gens = committedGens(spark, handle.path)
    val fp = fingerprint(batch, idCol, textCol)
    val hwm = gens.max // ≥ 0: bootstrap wrote generation 0
    // Engine ids start at 0; committed generation g holds the state AFTER
    // batch g-1 (generation 0 = bootstrap), so batch B reads the newest
    // generation ≤ B and commits generation B+1.
    def isReplay(gen: Long): Boolean = gens.contains(gen) && {
      val p = spark.read.parquet(s"${genDir(handle.path, gen)}/params").head()
      (p.getLong(0), p.getLong(1)) == fp
    }
    val candidate: Long =
      if (engineBatchId + 1 > hwm) engineBatchId
      else if (isReplay(engineBatchId + 1)) {
        // Genuine replay (crash after commit, before offsets): recompute
        // from the same base — bit-identical packs overwrite the sink.
        engineBatchId
      } else {
        // Id reuse with different docs: engine restarted without its
        // checkpoint. Rebase above the committed high-water mark.
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"PackStream: batch $engineBatchId reuses a committed id with " +
            s"different documents — rebasing to $hwm and folding as " +
            "new data (pass queryCheckpointLocation to avoid this).")
        hwm
      }
    // A replay whose base generation was already pruned (only possible
    // after an exotic multi-rebase) has nothing to recompute from — fold
    // as new data from the newest state instead of failing the stream.
    val effectiveId: Long =
      if (gens.exists(_ <= candidate)) candidate else hwm
    val baseGen = gens.filter(_ <= effectiveId).max
    val state = spark.read.parquet(s"${genDir(handle.path, baseGen)}/pending")

    val vmap = typedlit(m.vocab)
    val ids = batch.select(
      lit(1).as("pack_ord"),
      col(idCol).cast("long").as("doc_id"),
      pmod(col(idCol).cast("long"), lit(m.nShards)).as("shard"),
      transform(Bpe.encode(col(textCol), m.merges),
        t => coalesce(element_at(vmap, t), lit(-1L))).as("tids"))
    // Carried tokens ride under an explicit ordering rank that sorts
    // before every real arrival — not a sentinel doc_id, which a real
    // arrival could collide with and corrupt that shard's pack bytes.
    val pend = state.select(lit(0).as("pack_ord"), lit(-1L).as("doc_id"),
      col("shard"), col("pending").as("tids"))
    val packed = Packing.packWindows(pend.unionByName(ids), m.window,
        orderCols = Seq("pack_ord", "doc_id"))
      .join(state.select(col("shard"), col("next_pack")), Seq("shard"))

    val full = packed.where(col("n_tokens") === m.window)
      .select(col("shard"), (col("next_pack") + col("pack_id")).as("pack_id"),
        col("n_tokens"),
        concat_ws(",", transform(col("tids"), t => t.cast("string")))
          .as("token_ids"))
    graft.sources.Sink.idempotentBatch(full, outPath, effectiveId)
    afterSink()

    // Successor state: only a shard's LAST pack can be partial, so the
    // carried remainder is the (at most one) under-window pack.
    val touched = packed.groupBy("shard", "next_pack")
      .agg(sum(when(col("n_tokens") === m.window, 1L).otherwise(0L))
          .as("nf"),
        coalesce(first(when(col("n_tokens") < m.window, col("tids")),
          ignoreNulls = true), typedlit(Array.empty[Long])).as("pending"))
      .select(col("shard"), (col("next_pack") + col("nf")).as("next_pack"),
        col("pending"))
    val nextState = touched.unionByName(
      state.join(touched, Seq("shard"), "left_anti")
        .select("shard", "next_pack", "pending"))

    val nextGen = effectiveId + 1
    val gdir = genDir(handle.path, nextGen)
    val f = fs(spark, handle.path)
    // A crashed earlier attempt may have left a partial target.
    if (f.exists(new org.apache.hadoop.fs.Path(gdir)) &&
        !f.exists(new org.apache.hadoop.fs.Path(s"$gdir/params/_SUCCESS")))
      f.delete(new org.apache.hadoop.fs.Path(gdir), true)
    nextState.coalesce(1).write.mode("overwrite").parquet(s"$gdir/pending")
    locally {
      import spark.implicits._
      Seq((fp._1, fp._2, effectiveId)).toDF("batch_fp", "batch_n", "batch_id")
        .coalesce(1).write.mode("overwrite").parquet(s"$gdir/params")
    }
    // Keep the new generation and its base (one cycle of replay cover);
    // prune everything older.
    committedGens(spark, handle.path)
      .filterNot(g => g == nextGen || g == baseGen)
      .filter(_ < nextGen)
      .foreach(g => f.delete(
        new org.apache.hadoop.fs.Path(genDir(handle.path, g)), true))
    effectiveId
  }

  /** Start the packing stream: full context windows land under
    * `outPath/b<batchId>/` (the idempotent per-batch layout), partial
    * windows carry forward in the committed state. */
  def run(
      docs: DataFrame,
      handle: Handle,
      idCol: String,
      textCol: String,
      outPath: String,
      queryCheckpointLocation: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream
    queryCheckpointLocation.fold(writer)(p =>
        writer.option("checkpointLocation", p))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(handle, batch, batchId, idCol, textCol, outPath): Unit
      }
      .start()
  }
}
