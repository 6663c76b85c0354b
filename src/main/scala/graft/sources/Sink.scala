package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write-side data layout. The reference has no writers at all (results stay
  * in memory, reference `sql_select_query.py:96`); at 100 TB the write
  * layout IS the read performance, so the engine ships one:
  *
  *   - [[partitioned]]: hive-style directory partitioning on low-cardinality
  *     columns — downstream filters on those columns become partition
  *     PRUNING (directories never listed, files never opened), verified in
  *     SourcesSpec by asserting the read-back plan's partition filters.
  *   - [[sorted]]: within-file ordering on a high-cardinality column so
  *     parquet row-group min/max statistics make point/range predicates
  *     skip row groups (the same idea one level down).
  *
  * Partition-count discipline: directory partitioning is for columns with
  * tens-to-thousands of values (date, category, tenant); partitioning on a
  * high-cardinality key explodes into millions of small files — that's what
  * [[sorted]] + row-group stats are for instead.
  */
object Sink {

  /** Hive-style partitioned parquet. */
  def partitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Parquet sorted within partitions for row-group statistics pruning. */
  def sorted(df: DataFrame, path: String, orderCols: String*): Unit =
    df.sortWithinPartitions(orderCols.head, orderCols.tail: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Bucketed (and optionally bucket-sorted) managed table: pays the
    * shuffle ONCE at write time so every later equi-join or aggregation on
    * `bucketCol` between tables sharing the bucketing is EXCHANGE-FREE —
    * the co-located-join layout for fact tables joined on the same key
    * query after query (at 100 TB, re-shuffling the fact table per query is
    * the single largest avoidable cost). Bucket count is a layout contract:
    * both sides of a co-located join need the same `numBuckets`. */
  def bucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCols: String*): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Size-capped training-export shards: parquet part-files holding at
    * most `rowsPerFile` rows each (`maxRecordsPerFile` — the writer rolls
    * files without an extra shuffle). The layout a training job's data
    * loader wants: uniformly-sized shards it can assign to workers,
    * produced in one pass from however many partitions the pipeline ended
    * with. Combine with a preceding `repartition(n)` only when the
    * partition COUNT must change too; the row cap alone never shuffles. */
  def sharded(df: DataFrame, path: String, rowsPerFile: Long): Unit = {
    require(rowsPerFile >= 1, s"rowsPerFile must be >= 1, got $rowsPerFile")
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", rowsPerFile).parquet(path)
  }

  /** Idempotent per-batch landing zone for at-least-once streams: batch
    * `batchId` overwrites its OWN directory (`$path/b<batchId>/`), so a
    * re-delivered batch — a crash after the sink wrote but before the
    * engine committed offsets — replaces its earlier attempt instead of
    * appending a duplicate. Reading `path` recursively yields each
    * batch's rows exactly once. This is the foreachBatch idempotence
    * recipe from the Structured Streaming guide, packaged. */
  def idempotentBatch(df: DataFrame, path: String, batchId: Long): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$path/b$batchId")

  /** [[idempotentBatch]] with a physical per-key directory split INSIDE
    * the batch directory (`$path/b<id>/sh=<key>/…`), rows sorted by
    * `sortCol` within files. The split is addressable maintenance
    * granularity: a later selective rewrite (retraction, compaction)
    * overwrites `b<id>/sh=<k>` alone instead of the whole batch — at
    * export scale the difference between a key-sized and a batch-sized
    * rewrite. `keyCol` is DUPLICATED into the directory column (`sh`)
    * rather than moved, so readers that list files recursively (and
    * therefore never see hive partition columns) still get every data
    * column. The batch directory as a whole keeps [[idempotentBatch]]'s
    * overwrite-on-replay semantics. */
  def idempotentBatchSharded(df: DataFrame, path: String, batchId: Long,
      keyCol: String, sortCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("sh", col(keyCol))
      .sortWithinPartitions(col("sh"), col(sortCol))
      .write.mode(SaveMode.Overwrite).partitionBy("sh")
      .parquet(s"$path/b$batchId")
  }

  /** [[partitioned]] on ORC, for lakes standardized on it — identical
    * pruning semantics, different columnar container. */
  def partitionedOrc(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).orc(path)

  /** How a [[compact]] run ended: partition leaves examined/rewritten, the
    * visible data-file count before/after, and how many rewrites were
    * ABORTED because a concurrent writer changed the leaf between the
    * snapshot and the swap (their leaves keep the writer's files plus the
    * originals; the next compact pass retries them). */
  final case class CompactStats(leavesSeen: Int, leavesRewritten: Int,
      filesBefore: Long, filesAfter: Long, leavesAborted: Int = 0)

  private def isVisible(name: String): Boolean =
    !name.startsWith(".") && !name.startsWith("_")

  private def children(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
    try fs.listStatus(dir).toSeq
    catch { case _: java.io.FileNotFoundException => Nil }

  /** Leaf data directories under `root`: every directory whose visible
    * children include at least one FILE and NO visible subdirectory (hive
    * partition dirs, or the root itself for an unpartitioned dataset). A
    * mixed directory — visible files AND visible subdirectories — is never
    * a rewrite target: rewriting it would read the whole subtree (partition
    * inference pulls k=v children in) and the delete+rename swap would
    * flatten the nested dirs, changing layout for readers of the root; and
    * under parallelism > 1 the parent and child leaves would rewrite
    * concurrently over the same files. Its files are left alone; recursion
    * still descends into the subdirectories. */
  private def dataLeaves(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
    val kids = children(fs, root).filter(s => isVisible(s.getPath.getName))
    val subdirs = kids.filter(_.isDirectory)
    val here =
      if (kids.exists(_.isFile) && subdirs.isEmpty) Seq(root) else Nil
    here ++ subdirs.flatMap(d => dataLeaves(fs, d.getPath))
  }

  /** Filesystem schemes whose rename is a COPY, not a metadata operation —
    * [[compact]]'s delete+rename swap is not atomic there and the
    * reader-visible gap between the two ops stretches from microseconds to
    * data-sized copy time. Compaction still works (crash states recover),
    * but the caller should know. */
  private val nonAtomicRenameSchemes = Set(
    "s3", "s3a", "s3n", "gs", "wasb", "wasbs", "oss", "cos", "swift")

  @volatile private var warnedNonAtomic = false

  /** Small-files compaction — rewrite each partition leaf whose visible
    * data files outnumber `ceil(bytes / targetBytesPerFile)` down to that
    * count. THE recurring operational job of a streaming lake: per-batch
    * idempotent sinks and frequent checkpoints land thousands of KB-sized
    * files per partition, and at 100 TB the resulting listing + open cost
    * (and parquet footer overhead) dominates scan time long before the
    * bytes do.
    *
    * Mechanics, per leaf (only leaves that NEED rewriting are touched —
    * an already-compact partition's files and mtimes are left alone):
    *   1. the leaf's visible files are SNAPSHOT by name+length and the
    *      rewrite reads exactly that file list (not the directory), so a
    *      file landing mid-rewrite is neither silently folded in nor
    *      silently dropped;
    *   2. the compacted copy lands in a dot-prefixed sibling
    *      (`.cmp_tmp_<leaf>`), which parquet/ORC readers never list;
    *   3. once the copy's `_SUCCESS` marker exists the leaf is RE-LISTED:
    *      if the visible file set no longer matches the snapshot (a
    *      concurrent writer landed or removed files), the swap ABORTS —
    *      the copy is discarded, the leaf keeps everything, and the next
    *      compact pass retries ([[CompactStats.leavesAborted]] counts it);
    *   4. otherwise the old leaf is deleted and the copy renames into
    *      place (two metadata ops, both return-checked — Hadoop
    *      FileSystems report many failures as `false`, not exceptions).
    * A crash anywhere leaves either the old leaf, or a complete copy the
    * next [[compact]] (or [[compactRecover]]) finishes swapping in — data
    * is never in only-partially-deleted state. Readers racing the swap see
    * the leaf atomically old or new, modulo the instant between the two
    * metadata ops; partition VALUES (directory names) are preserved
    * exactly, so pruning and schema are unchanged.
    *
    * Concurrency contract: the re-list-before-delete guard shrinks the
    * lost-write window from rewrite-job duration to the milliseconds
    * between the re-list and the delete — it does NOT close it. A writer
    * that may land files into a leaf at any instant needs the layout's own
    * lock held around compact (the streaming export loop does exactly
    * that, see `ExportPipeline`); treat unsynchronized concurrent writers
    * as unsupported. On object stores whose rename is a copy
    * (s3a/gs/wasb/…), the swap additionally stops being two metadata ops —
    * compact warns once and proceeds (crash states still recover).
    *
    * NOT for bucketed layouts ([[bucketed]]/[[bucketedExternal]]): bucket
    * ids live in the file NAMES, which a rewrite regenerates — compact
    * those by re-bucketing. Each leaf's rewrite is itself a distributed
    * job; `parallelism > 1` drives that many leaves concurrently (Spark
    * schedules concurrent jobs fairly from multiple threads), which is
    * what turns a million-leaf backfill from a day of sequential
    * tiny-job latency into a cluster-bound sweep. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytesPerFile: Long = 128L << 20,
      format: String = "parquet",
      parallelism: Int = 1,
      // Test seam: runs per rewritten leaf after its copy completes and
      // before the re-list guard — the window a concurrent writer's file
      // would otherwise be lost in.
      afterCopy: org.apache.hadoop.fs.Path => Unit = _ => ()): CompactStats = {
    require(targetBytesPerFile >= 1,
      s"targetBytesPerFile must be >= 1, got $targetBytesPerFile")
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scheme = Option(root.toUri.getScheme).getOrElse(fs.getScheme)
    if (scheme != null && nonAtomicRenameSchemes(scheme.toLowerCase) &&
        !warnedNonAtomic) {
      warnedNonAtomic = true
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"Sink.compact on '$scheme': rename is a copy on this store, so " +
        "the leaf swap is not atomic — readers racing a swap can see a " +
        "leaf mid-copy. Crash states still recover via compactRecover.")
    }
    compactRecover(spark, path)
    val seen = new java.util.concurrent.atomic.AtomicInteger
    val rewritten = new java.util.concurrent.atomic.AtomicInteger
    val abortedN = new java.util.concurrent.atomic.AtomicInteger
    val before = new java.util.concurrent.atomic.AtomicLong
    val after = new java.util.concurrent.atomic.AtomicLong
    def visibleFiles(dir: org.apache.hadoop.fs.Path) =
      children(fs, dir).filter(s => s.isFile && isVisible(s.getPath.getName))
    def oneLeaf(leaf: org.apache.hadoop.fs.Path): Unit = {
      seen.incrementAndGet()
      val files = visibleFiles(leaf)
      val bytes = files.map(_.getLen).sum
      val want = math.max(1L,
        (bytes + targetBytesPerFile - 1) / targetBytesPerFile).toInt
      before.addAndGet(files.size.toLong)
      if (files.size > want) {
        val snapshot = files.map(s => (s.getPath.getName, s.getLen)).toSet
        val tmp = new org.apache.hadoop.fs.Path(leaf.getParent,
          s".cmp_tmp_${leaf.getName}")
        // Read the SNAPSHOT file list, not the directory: the rewrite's
        // content is pinned to what was priced, independent of what lands
        // in the leaf while the job runs.
        spark.read.format(format)
          .load(files.map(_.getPath.toString): _*)
          .coalesce(want)
          .write.mode(SaveMode.Overwrite).format(format).save(tmp.toString)
        require(fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")),
          s"compacted copy at $tmp has no _SUCCESS marker — aborting swap")
        afterCopy(leaf)
        // Concurrent-writer guard: a file that landed (or vanished) since
        // the snapshot would be deleted without having been copied — abort
        // this leaf's swap and let the next pass retry on the new set.
        val now = visibleFiles(leaf)
          .map(s => (s.getPath.getName, s.getLen)).toSet
        if (now != snapshot) {
          abortedN.incrementAndGet()
          require(fs.delete(tmp, true),
            s"failed to delete aborted compaction copy $tmp")
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"Sink.compact: leaf $leaf changed during rewrite " +
            s"(${snapshot.size} -> ${now.size} files) — swap aborted, " +
            "leaf left untouched for the next pass")
          after.addAndGet(now.size.toLong)
        } else {
          rewritten.incrementAndGet()
          require(fs.delete(leaf, true),
            s"failed to delete old leaf $leaf (copy intact at $tmp; " +
            "compactRecover will finish the swap)")
          require(fs.rename(tmp, leaf),
            s"failed to rename $tmp into place at $leaf (old leaf already " +
            "deleted; compactRecover will finish the swap)")
          after.addAndGet(visibleFiles(leaf).size.toLong)
        }
      } else after.addAndGet(files.size.toLong)
    }
    val leaves = dataLeaves(fs, root)
    if (parallelism <= 1) leaves.foreach(oneLeaf)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
      try {
        import scala.jdk.CollectionConverters._
        val futures = pool.invokeAll(leaves.map { l =>
          new java.util.concurrent.Callable[Unit] { def call(): Unit = oneLeaf(l) }
        }.asJava)
        futures.asScala.foreach(_.get()) // surface the first failure
      } finally pool.shutdown()
    }
    CompactStats(seen.get, rewritten.get, before.get, after.get,
      abortedN.get)
  }

  /** Finish or roll back [[compact]] swaps a crash interrupted: a complete
    * copy (`.cmp_tmp_<leaf>/_SUCCESS`) whose leaf is gone renames into
    * place; every other `.cmp_tmp_` remnant (incomplete copy, or the old
    * leaf still present) is deleted — the old leaf stays authoritative.
    * [[compact]] runs this first, so simply re-running compact after a
    * crash is the recovery procedure. */
  def compactRecover(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(dir: org.apache.hadoop.fs.Path): Unit = {
      val kids = children(fs, dir)
      kids.filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(".cmp_tmp_")).foreach { t =>
        val leaf = new org.apache.hadoop.fs.Path(dir,
          t.getPath.getName.stripPrefix(".cmp_tmp_"))
        val complete =
          fs.exists(new org.apache.hadoop.fs.Path(t.getPath, "_SUCCESS"))
        if (complete && !fs.exists(leaf)) fs.rename(t.getPath, leaf)
        else fs.delete(t.getPath, true)
      }
      kids.filter(s => s.isDirectory && isVisible(s.getPath.getName))
        .foreach(d => walk(d.getPath))
    }
    walk(root)
  }

  /** [[bucketed]] with the files at an explicit `path` (external table):
    * the bucketing metadata lives in the catalog entry, the data lives
    * where the caller says — the layout an index checkpoint needs, where
    * the path (not the warehouse) is the durable artifact and a later
    * session re-registers the same files under a fresh catalog. */
  def bucketedExternal(df: DataFrame, table: String, path: String,
      bucketCol: String, numBuckets: Int, sortCols: String*): Unit = {
    val spark = df.sparkSession
    // Dropping an EXTERNAL table leaves its files; clear the location
    // explicitly so a re-save never mixes stale part-files into the new
    // table (overwrite semantics must hold at the path, not just the
    // catalog entry).
    spark.sql(s"drop table if exists $table")
    val hpath = new org.apache.hadoop.fs.Path(path)
    val fs = hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hpath)) fs.delete(hpath, true)
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path).bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
