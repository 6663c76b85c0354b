package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantiles

/** The distributed exact-quantile operator must be BIT-identical to Spark's
  * built-in percentile() (which in turn hash-matches DuckDB quantile_cont
  * in the driver gate) — no rounding slack anywhere. */
class QuantilesSpec extends SparkSpecBase {

  test("grouped quantiles bit-match built-in percentile() on real data") {
    val li = spark.table("lineitem")
    val got = Quantiles.exactGroupQuantiles(li, Seq("l_returnflag"),
        "l_quantity", Seq(0.0, 0.25, 0.5, 0.9, 1.0),
        Seq("q0", "q25", "q50", "q90", "q100"))
    val want = li.groupBy("l_returnflag").agg(
      expr("percentile(l_quantity, 0.0)").as("q0"),
      expr("percentile(l_quantity, 0.25)").as("q25"),
      expr("percentile(l_quantity, 0.5)").as("q50"),
      expr("percentile(l_quantity, 0.9)").as("q90"),
      expr("percentile(l_quantity, 1.0)").as("q100"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("continuous values (no ties) bit-match too") {
    val li = spark.table("lineitem")
    val got = Quantiles.exactGroupQuantiles(li, Seq("l_linestatus"),
      "l_extendedprice", Seq(0.01, 0.5, 0.99), Seq("p1", "p50", "p99"))
    val want = li.groupBy("l_linestatus").agg(
      expr("percentile(l_extendedprice, 0.01)").as("p1"),
      expr("percentile(l_extendedprice, 0.5)").as("p50"),
      expr("percentile(l_extendedprice, 0.99)").as("p99"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("multi-column single-pass variant bit-matches built-in percentile() per column") {
    val li = spark.table("lineitem")
    val multi = Quantiles.exactGroupQuantilesMulti(li, Seq("l_returnflag"),
      Seq(("l_quantity", Seq(0.5, 0.9), Seq("p50", "p90")),
        ("l_extendedprice", Seq(0.99), Seq("p99"))))
    val want = li.groupBy("l_returnflag").agg(
      expr("percentile(l_quantity, 0.5)").as("p50"),
      expr("percentile(l_quantity, 0.9)").as("p90"),
      expr("percentile(l_extendedprice, 0.99)").as("p99"))
    assert(multi.exceptAll(want).isEmpty && want.exceptAll(multi).isEmpty,
      "one-scan multi-column pipeline must stay bit-identical per column")
  }

  test("groupPercentiles auto-route: both sides of the cutoff agree, big side has no group buffer") {
    val li = spark.table("lineitem")
    val specs = Seq(
      ("l_quantity", Seq(0.5, 0.9), Seq("p50", "p90")),
      ("l_extendedprice", Seq(0.99), Seq("p99")))
    val small = Quantiles.groupPercentiles(li, Seq("l_returnflag"), specs,
      maxBufferedRows = Long.MaxValue) // force built-in route
    val big = Quantiles.groupPercentiles(li, Seq("l_returnflag"), specs,
      maxBufferedRows = 1) // force distributed route
    assert(small.exceptAll(big).isEmpty && big.exceptAll(small).isEmpty,
      "routes must be bit-identical")
    // The distributed route must not plan the group-buffering built-in
    // (ObjectHashAggregate with percentile): only hash aggregates, windows
    // and joins.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = big.queryExecution.executedPlan.toString
      assert(!plan.contains("percentile("),
        s"distributed route still plans percentile():\n$plan")
      assert(plan.contains("Window"), "distinct-value window shape expected")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("groupPercentiles routes agree on NULL group keys and all-NULL-value groups") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), Some(1.0), Some(10.0)),
      (Some("a"), Some(3.0), None),
      (Some("allnull"), None, Some(5.0)), // v1 all NULL in this group
      (None, Some(7.0), Some(8.0)),       // NULL group key
      (None, Some(9.0), None)
    ).toDF("g", "v1", "v2")
    val specs = Seq(
      ("v1", Seq(0.5), Seq("m1")), ("v2", Seq(0.5), Seq("m2")))
    val small = Quantiles.groupPercentiles(df, Seq("g"), specs,
      maxBufferedRows = Long.MaxValue)
    val big = Quantiles.groupPercentiles(df, Seq("g"), specs,
      maxBufferedRows = 1)
    assert(small.count() == 3 && big.count() == 3,
      "all three groups (incl. NULL key and all-NULL-value) must survive both routes")
    assert(small.exceptAll(big).isEmpty && big.exceptAll(small).isEmpty,
      s"routes diverge:\nsmall=${small.collect().toSeq}\nbig=${big.collect().toSeq}")
  }

  test("edge shapes: single-row group, all-equal group, nulls excluded") {
    import spark.implicits._
    val df = Seq(
      ("solo", Some(7.0)),
      ("flat", Some(3.0)), ("flat", Some(3.0)), ("flat", Some(3.0)),
      ("mixed", Some(1.0)), ("mixed", None), ("mixed", Some(2.0))
    ).toDF("g", "v")
    val got = Quantiles.exactGroupQuantiles(df, Seq("g"), "v",
        Seq(0.5), Seq("med"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    // solo → its value; flat → 3.0; mixed → median of {1,2} = 1.5 (null out).
    assert(got.toSeq == Seq(("flat", 3.0), ("mixed", 1.5), ("solo", 7.0)))
  }

  test("plan never buffers a group: no built-in Percentile aggregate") {
    val plan = Quantiles.exactGroupQuantiles(spark.table("lineitem"),
        Seq("l_returnflag"), "l_quantity", Seq(0.5), Seq("p50"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"), "built-in percentile leaked in")
    assert(!plan.contains("ObjectHashAggregate"),
      "object-buffering aggregate in the quantile plan")
  }
}
