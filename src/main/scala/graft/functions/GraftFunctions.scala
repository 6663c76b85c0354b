package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.{DotProduct, GraftBridge}

/** Public registration + Column-API access for graft's native Catalyst
  * expressions (see org.apache.spark.sql.graft for the implementations). */
object GraftFunctions {

  /** Make `graft_dot(a, b)` callable from SQL in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")

  /** Codegen'd dot product over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
