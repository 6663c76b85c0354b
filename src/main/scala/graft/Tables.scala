package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registers the driver testdata parquet tables (TESTDATA.md) as temp views,
  * once per (session, sfDir). Registration is metadata-only (a parquet
  * relation's schema read) — scans stay lazy, so filters/projections from the
  * queries are pushed down into the parquet reader by Catalyst.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val registered = new ConcurrentHashMap[SparkSession, String]()

  def ensure(spark: SparkSession, dir: String): Unit =
    if (registered.get(spark) != dir) synchronized {
      if (registered.get(spark) != dir) {
        // Session-level extensions: graft's native SQL functions.
        graft.functions.GraftFunctions.register(spark)
        // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
        // default; read it as a long and truncate ns → µs. DuckDB's native
        // timestamp is also µs (it truncates NANOS on read), so the two
        // engines see identical values.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        all.foreach { t =>
          val p = s"$dir/$t.parquet"
          if (new java.io.File(p).exists()) {
            val raw = spark.read.parquet(p)
            val df =
              if (t == "events")
                raw.withColumn("ts",
                  org.apache.spark.sql.functions.timestamp_micros(
                    org.apache.spark.sql.functions.expr("ts div 1000")))
              else raw
            Engine.registerTempTable(df, t)
          }
        }
        registered.put(spark, dir)
      }
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensure(spark, dir)
    spark.table(name)
  }

  private val counts = new ConcurrentHashMap[(SparkSession, String, String), java.lang.Long]()

  /** Memoized row count of a registered base table: one count job per
    * (session, sfDir, table) — parquet-footer metadata, no scan — then a
    * map lookup. Rank/analytics callers pass this as `knownCount` so their
    * adaptive strategy choice never adds a per-query job. */
  def rowCount(spark: SparkSession, dir: String, name: String): Long = {
    ensure(spark, dir)
    counts.computeIfAbsent((spark, dir, name),
      _ => java.lang.Long.valueOf(spark.table(name).count())).longValue()
  }
}
