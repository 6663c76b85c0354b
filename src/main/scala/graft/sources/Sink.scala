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
}
