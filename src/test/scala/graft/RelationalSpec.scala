package graft

import org.apache.spark.sql.functions._

/** Differential checks of the SQL surface: each query's semantics verified
  * against an independently-built DataFrame-API program or a hand-derivable
  * invariant (the reference's oracle-test methodology, SURVEY.md §5, with
  * Spark itself as the second implementation; DuckDB cross-checking runs in
  * the driver harness / tools/check_oracle.py).
  */
class RelationalSpec extends SparkSpecBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("driver contract: entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("driver contract: every oracleSql key exists in queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("p2: alias renames preserve values") {
    val got = run("p2_alias").collect()
    val exp = spark.table("nation")
      .select(col("n_nationkey").as("key"), col("n_name").as("nation_name"))
      .orderBy("key").collect()
    assert(got.toSeq == exp.toSeq)
  }

  test("p7: dialect casts yield expected Spark types") {
    val schema = run("p7_cast_types").schema
    val types = schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("ln_small") == "smallint")
    assert(types("ok_str") == "string")
    assert(types("qty_f") == "float")
    assert(types("ln_d") == "double")
    assert(types("ok_big") == "bigint")
    assert(types("rf_cat") == "string")
  }

  test("p8: case-when bands partition all rows") {
    val counts = run("p8_case_when").groupBy("qty_band").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = spark.table("lineitem")
    assert(counts.getOrElse("high", 0L) == li.where(col("l_quantity") > 40).count())
    assert(counts.values.sum == li.count())
  }

  test("f3: between is inclusive on both ends") {
    val viaSql = run("f3_between").count()
    val viaDf = spark.table("orders")
      .where(col("o_totalprice") >= 50000 && col("o_totalprice") <= 100000)
      .count()
    assert(viaSql == viaDf)
  }

  test("j2/j3: left and right joins are mirror images") {
    val left = run("j2_left").collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sorted
    val right = run("j3_right").collect().map(r =>
      (r.getLong(1), if (r.isNullAt(0)) -1L else r.getLong(0))).sorted
    assert(left.toSeq == right.toSeq)
  }

  test("j5/j7: cross join cardinalities") {
    assert(run("j5_cross").count() ==
      spark.table("region").count() * spark.table("nation").count())
    val n = spark.table("nation").count()
    assert(run("j7_self_cross").count() == n * n)
  }

  test("a5 vs a4: count(*) equals count(col) on null-free column") {
    assert(run("a5_count_star").head().getLong(0) ==
      run("a4_count_col").head().getLong(0))
  }

  test("a7: bare group-by equals distinct") {
    val bare = run("a7_groupby_bare").collect().toSeq
    val dist = run("a11_distinct").collect().toSeq
    assert(bare == dist)
  }

  test("a10: global HAVING filters the single aggregate row") {
    assert(run("a10_having_global").count() == 1)
  }

  test("w1: rank has gaps, dense_rank does not") {
    val ranks = run("w1_rank").select("rnk").distinct().count()
    val dense = run("w3_dense_rank").select("drnk").distinct().count()
    val distinctPrices = spark.table("orders")
      .select("o_totalprice").distinct().count()
    assert(dense == distinctPrices)
    assert(ranks == distinctPrices) // distinct rank values = distinct keys
    val maxDense = run("w3_dense_rank").agg(max("drnk")).head().getLong(0)
    assert(maxDense == distinctPrices)
  }

  test("w4: partitioned rank restarts at 1 per partition") {
    val perPart = run("w4_rank_partition")
      .groupBy("o_custkey").agg(min("rnk").as("m"))
      .where(col("m") =!= 1).count()
    assert(perPart == 0)
  }

  test("o3: top-k equals sort-then-take") {
    val topk = run("o3_topk").collect().map(_.getLong(0)).toSeq
    val manual = spark.table("orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10).collect().map(_.getLong(0)).toSeq
    assert(topk == manual)
  }

  test("u5: ANSI except = left minus right (not symmetric difference)") {
    // SURVEY.md §2.8 U5: the reference's pandas oracle computed symmetric
    // difference; we deliberately implement ANSI EXCEPT.
    val got = run("u5_except").collect().map(_.getInt(0)).toSet
    val p = spark.table("part").select(col("p_size")).distinct()
      .collect().map(_.getInt(0)).toSet
    val n = spark.table("nation").select(col("n_nationkey")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(got == (p -- n))
  }

  test("e2: sessionization counts cover all events") {
    val total = run("e2_sessionize").agg(sum("n_events")).head().getLong(0)
    assert(total == spark.table("events").count())
  }

  test("engine api: register/query/remove round-trip") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Engine.registerTempTable(df, "api_rt")
    assert(Engine.query(spark, "select sum(id) as s from api_rt")
      .head().getLong(0) == 3)
    Engine.removeTempTable(spark, "api_rt")
    intercept[Exception](spark.table("api_rt").collect())
  }
}
