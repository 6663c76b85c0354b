package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Public API mirroring the reference's three-call surface (reference
  * `dataframe_sql/__init__.py:3`, `dataframe_sql/sql_select_query.py:15-96`):
  * register/remove named tables and run SQL against them.
  *
  * Spark-first design: tables live in the session temp-view catalog (an
  * analyzed LogicalPlan each — nothing is materialized at registration), and
  * `query` is a Dialect pre-pass followed by `spark.sql`, so every statement
  * gets Catalyst analysis/optimization (predicate pushdown, column pruning,
  * join selection, AQE) and Tungsten codegen for free. The returned DataFrame
  * is lazy; callers choose the action/sink — unlike the reference, which
  * eagerly materializes a pandas frame per query.
  */
object Engine {

  /** Bind a DataFrame to a SQL-visible name.
    * Reference: `register_temp_table` (`sql_select_query.py:15-39`). */
  def registerTempTable(df: DataFrame, name: String): Unit =
    df.createOrReplaceTempView(name)

  /** Unbind a previously registered name.
    * Reference: `remove_temp_table` (`sql_select_query.py:42-61`). */
  def removeTempTable(spark: SparkSession, name: String): Unit =
    spark.catalog.dropTempView(name)

  /** Parse + plan a SELECT against the registered tables; lazy result.
    * Reference: `query` (`sql_select_query.py:64-96`). */
  def query(spark: SparkSession, sql: String): DataFrame =
    spark.sql(Dialect.rewrite(sql))
}
