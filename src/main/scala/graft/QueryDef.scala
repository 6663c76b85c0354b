package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator query for the driver harness: a Spark-side program and
  * (when SQL-expressible) an equivalent ANSI SQL string the driver runs in
  * DuckDB over the same parquet tables (BASELINE.md t2). Column names/aliases
  * must match between the two — the driver sorts columns by name then hashes
  * values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {

  /** Same SQL text runs on Spark (through the Engine dialect pre-pass) and on
    * DuckDB. */
  def sql(name: String, text: String): QueryDef =
    QueryDef(name, (s, dir) => { Tables.ensure(s, dir); Engine.query(s, text) },
      Some(text))

  /** Dialect-diverging SQL: `spark` text runs through Engine; `duck` is the
    * DuckDB oracle. */
  def sql(name: String, spark: String, duck: String): QueryDef =
    QueryDef(name, (s, dir) => { Tables.ensure(s, dir); Engine.query(s, spark) },
      Some(duck))

  /** DataFrame-API query with an optional DuckDB oracle; `None` → the driver
    * records a weaker rows-only check. */
  def df(name: String, oracle: Option[String])(
      f: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, (s, dir) => { Tables.ensure(s, dir); f(s, dir) }, oracle)
}
