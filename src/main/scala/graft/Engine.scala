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
    namingParity(spark.sql(Dialect.rewrite(sql)))

  private val identifierRe = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Reference output-naming conventions, applied as a zero-cost projection
    * rename on the analyzed plan (no extra plan nodes — `toDF` rewrites the
    * top-level aliases):
    *
    *   - un-aliased select expressions are auto-named `_col0`, `_col1`, …
    *     positionally (reference
    *     `tests/pandas_sql_functionality_test.py:206-213`, `:271-277`,
    *     `:1012-1014`). Detection: Spark auto-names such columns with the
    *     expression's pretty SQL (`avg(temp)`, `(x + 1)`, `1`), which is
    *     never a bare identifier; user aliases must be bare identifiers (or
    *     they chose the quoted form deliberately and keep it).
    *   - name-clashing output columns (e.g. `select *` over a join of tables
    *     sharing a non-key column) are disambiguated as `<table>.<col>` from
    *     the attribute's qualifier (reference `tests/utils.py:48-90`,
    *     `tests/pandas_sql_functionality_test.py:434-453`). Columns that are
    *     unique stay unprefixed, matching the reference.
    */
  private def namingParity(df: DataFrame): DataFrame = {
    val out = df.queryExecution.analyzed.output
    val names = out.map(_.name)
    val clashing = names.groupBy(_.toLowerCase).collect {
      case (k, vs) if vs.size > 1 => k
    }.toSet
    var n = -1
    val renamed = out.map { a =>
      if (!identifierRe.pattern.matcher(a.name).matches()) {
        n += 1
        s"_col$n"
      } else if (clashing(a.name.toLowerCase) && a.qualifier.nonEmpty) {
        s"${a.qualifier.last}.${a.name}"
      } else a.name
    }
    if (renamed == names) df else df.toDF(renamed: _*)
  }
}
