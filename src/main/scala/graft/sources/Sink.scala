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
