package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Ingest

/** Parity on the reference's REAL fixture data — the actual CSVs its test
  * suite runs on (reference `dataframe_sql/tests/utils.py:11-23`:
  * forestfires 518 rows, DigiDB digimon/move lists, avocado 50 rows) —
  * not the 6-row inline fixtures of [[ReferenceParitySpec]]. Each case runs
  * the reference's SQL shape through `Engine.query` and checks it against an
  * independent DataFrame-API formulation of the same semantics (the Spark
  * analog of the reference's hand-written-pandas oracles).
  */
class ReferenceCsvParitySpec extends SparkSpecBase {

  private val dataDir = "/root/reference/dataframe_sql/data"

  private def available: Boolean = new java.io.File(dataDir).isDirectory

  private lazy val ff: DataFrame =
    Ingest.csv(spark, s"$dataDir/forestfires.csv")

  // Reference `tests/utils.py:22-23`: derived join-key columns added so
  // unqualified `on mon_attribute = move_attribute` resolves.
  private lazy val mons: DataFrame =
    Ingest.csv(spark, s"$dataDir/DigiDB_digimonlist.csv")
      .withColumn("mon_attribute", col("Attribute"))

  private lazy val moves: DataFrame =
    Ingest.csv(spark, s"$dataDir/DigiDB_movelist.csv")
      .withColumn("move_attribute", col("Attribute"))

  /** avocado.csv is written the pandas way: 14 header names over 15-field
    * rows, the extra leading field being an unnamed positional index that
    * `read_csv` absorbs as the index (dropped by the reference's tests).
    * Spark has no index concept, so materialize the pandas interpretation:
    * name the index column, then drop it. */
  private lazy val avocado: DataFrame = {
    val src = java.nio.file.Paths.get(s"$dataDir/avocado.csv")
    val lines = java.nio.file.Files.readAllLines(src).asScala.toSeq
    val fixed = (s"__idx,${lines.head}" +: lines.tail).asJava
    val tmp = java.nio.file.Files.createTempFile("avocado_reheader", ".csv")
    java.nio.file.Files.write(tmp, fixed)
    tmp.toFile.deleteOnExit()
    Ingest.csv(spark, tmp.toString).drop("__idx")
  }

  private def withTables[T](f: => T): T = {
    Engine.registerTempTable(ff, "forest_fires")
    Engine.registerTempTable(mons, "digimon_mon_list")
    Engine.registerTempTable(moves, "digimon_move_list")
    Engine.registerTempTable(avocado, "avocado")
    try f finally Seq("forest_fires", "digimon_mon_list", "digimon_move_list",
      "avocado").foreach(Engine.removeTempTable(spark, _))
  }

  private def q(sql: String): DataFrame = Engine.query(spark, sql)

  /** Order-insensitive frame compare with numeric canonicalization. */
  private def sameRows(got: DataFrame, expected: DataFrame): Unit = {
    def canon(df: DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map {
        case null => "∅"
        case d: java.lang.Double => f"$d%.9f"
        case f: java.lang.Float => f"${f.toDouble}%.9f"
        case b: java.math.BigDecimal => f"${b.doubleValue()}%.9f"
        case x => x.toString
      }.mkString("|")).sorted.toSeq
    val (g, e) = (canon(got), canon(expected))
    assert(g.size == e.size, s"row count ${g.size} != ${e.size}")
    assert(g == e, {
      val firstDiff = g.zip(e).indexWhere { case (a, b) => a != b }
      s"first differing row #$firstDiff:\n  got      ${g.lift(firstDiff)}\n" +
        s"  expected ${e.lift(firstDiff)}"
    })
  }

  test("select star over the real 518-row forestfires") {
    assume(available)
    withTables {
      sameRows(q("select * from forest_fires"), ff)
      assert(q("select * from FOREST_fires").count() == ff.count())
    }
  }

  test("projection, alias, arithmetic with precedence on real data") {
    assume(available)
    withTables {
      // Reference `:53-62` and `:418-431`.
      sameRows(
        q("select temp, RH, wind, rain as water from forest_fires"),
        ff.select(col("temp"), col("RH"), col("wind"),
          col("rain").as("water")))
      sameRows(
        q("select temp * wind + rain / DMC + 37 as res from forest_fires"),
        ff.select((col("temp") * col("wind") +
          col("rain") / col("DMC") + 37).as("res")))
    }
  }

  test("filters: comparisons, and/or, between, in, not in on real data") {
    assume(available)
    withTables {
      // Reference `:301-332`, `:641-705`.
      sameRows(
        q("select * from forest_fires where (wind > 1 and rain = 0) " +
          "or temp > 30"),
        ff.where((col("wind") > 1 && col("rain") === 0) || col("temp") > 30))
      sameRows(
        q("select * from forest_fires where wind between 5 and 6"),
        ff.where(col("wind") >= 5 && col("wind") <= 6))
      sameRows(
        q("select * from forest_fires where day in ('fri','sun')"),
        ff.where(col("day").isin("fri", "sun")))
      sameRows(
        q("select * from forest_fires where day not in ('fri','sun')"),
        ff.where(!col("day").isin("fri", "sun")))
    }
  }

  test("aggregates, bare group by, having — reference shapes on real data") {
    assume(available)
    withTables {
      // Global multi-agg auto-names _col0.._col3 (reference `:262-279`).
      val multi = q("select min(temp), max(temp), avg(temp), max(wind) " +
        "from forest_fires")
      assert(multi.columns.toSeq == Seq("_col0", "_col1", "_col2", "_col3"))
      sameRows(multi, ff.agg(min("temp"), max("temp"), avg("temp"),
        max("wind")))
      // Bare GROUP BY = distinct keys (reference `:189-198`).
      sameRows(q("select month, day from forest_fires group by month, day"),
        ff.select("month", "day").distinct())
      // GROUP BY + aggs + HAVING (reference `:282-298`, `:401-415`).
      sameRows(
        q("select month, avg(temp) as mean_t, sum(rain) as rain_sum " +
          "from forest_fires group by month having count(*) > 30"),
        ff.groupBy("month")
          .agg(avg("temp").as("mean_t"), sum("rain").as("rain_sum"),
            count(lit(1)).as("cnt"))
          .where(col("cnt") > 30).drop("cnt"))
      // Global HAVING without GROUP BY — reference declares it but xfails
      // (`:361-398`); it must work here.
      assert(q("select max(temp) from forest_fires having max(temp) > 20")
        .count() == 1)
    }
  }

  test("case when with real branches (reference :708-769)") {
    assume(available)
    withTables {
      sameRows(
        q("select case when wind > 5 then 'strong' " +
          "when wind = 5 then 'mid' else 'weak' end as wind_strength " +
          "from forest_fires"),
        ff.select(when(col("wind") > 5, "strong")
          .when(col("wind") === 5, "mid").otherwise("weak")
          .as("wind_strength")))
    }
  }

  test("joins on the real digimon lists, all five types + cross") {
    assume(available)
    withTables {
      val sqlInner = q("select * from digimon_mon_list join " +
        "digimon_move_list on mon_attribute = move_attribute")
      val dfInner = mons.join(moves,
        mons("mon_attribute") === moves("move_attribute"))
      assert(sqlInner.count() == dfInner.count())
      for (jt <- Seq("left", "right", "full")) {
        val got = q(s"select * from digimon_mon_list $jt join " +
          "digimon_move_list on mon_attribute = move_attribute").count()
        val exp = mons.join(moves,
          mons("mon_attribute") === moves("move_attribute"), jt).count()
        assert(got == exp, s"join type $jt")
      }
      assert(q("select * from digimon_mon_list cross join digimon_move_list")
        .count() == mons.count() * moves.count())
      // Self cross join with aliases — reference xfail `:456-459`, works here.
      assert(q("select t1.temp from forest_fires t1, forest_fires t2 " +
        "where t2.temp = 30.2 and t1.month = 'aug'").count() ==
        ff.where(col("temp") === 30.2).count() *
          ff.where(col("month") === "aug").count())
    }
  }

  test("windows on real data — reference declares, xfails; works here") {
    assume(available)
    withTables {
      // rank over multi-key mixed directions (reference `:789-825`).
      sameRows(
        q("select wind, rain, month, rank() over " +
          "(order by wind desc, rain asc, month) as rnk from forest_fires"),
        ff.select(col("wind"), col("rain"), col("month"),
          rank().over(Window.orderBy(desc("wind"), asc("rain"),
            asc("month"))).as("rnk")))
      // dense_rank partitioned (reference `:921-967`).
      sameRows(
        q("select day, wind, dense_rank() over " +
          "(partition by day order by wind) as rnk from forest_fires"),
        ff.select(col("day"), col("wind"), dense_rank()
          .over(Window.partitionBy("day").orderBy("wind")).as("rnk")))
    }
  }

  test("set ops with per-branch order by/limit (reference :529-638)") {
    assume(available)
    withTables {
      val top5 = ff.orderBy(desc("wind")).limit(5)
      val bottom5 = ff.orderBy(asc("wind")).limit(5)
      sameRows(
        q("select * from forest_fires order by wind desc limit 5 " +
          "union select * from forest_fires order by wind asc limit 5"),
        top5.union(bottom5).distinct())
      sameRows(
        q("select * from forest_fires order by wind desc limit 5 " +
          "union all select * from forest_fires order by wind desc limit 5"),
        top5.union(top5))
      sameRows(
        q("select month from forest_fires intersect " +
          "select month from forest_fires where month like 'a%'"),
        ff.select("month").intersect(
          ff.where(col("month").startsWith("a")).select("month")))
    }
  }

  test("order by / limit / offset and derived tables on real data") {
    assume(available)
    withTables {
      val got = q("select temp, wind from forest_fires " +
        "order by temp desc, wind asc limit 10")
      sameRows(got, ff.select("temp", "wind")
        .orderBy(desc("temp"), asc("wind")).limit(10))
      // The reference-grammar comma form `LIMIT offset, n`
      // (`sql_select_query.py:78`) through the dialect rewrite.
      assert(q("select temp from forest_fires order by temp desc limit 5, 10")
        .count() == 10)
      sameRows(q("select * from (select area, rain from forest_fires) ra"),
        ff.select("area", "rain"))
    }
  }

  test("pandas-dialect casts on real data (reference :1061-1111)") {
    assume(available)
    withTables {
      sameRows(
        q("select cast(temp as int64) as t, cast(wind as object) as w, " +
          "cast(RH as float64) as r from forest_fires"),
        ff.select(col("temp").cast("bigint").as("t"),
          col("wind").cast("string").as("w"),
          col("RH").cast("double").as("r")))
    }
  }

  test("avocado with pandas index-column absorbed, real aggregation") {
    assume(available)
    withTables {
      assert(avocado.columns.head == "avocado_id")
      sameRows(
        q("select type, avg(AveragePrice) as mean_price from avocado " +
          "group by type"),
        avocado.groupBy("type").agg(avg("AveragePrice").as("mean_price")))
      // 20 * (avocado_id + 3) / (20 + avocado_id) — reference `:1130-1147`.
      sameRows(
        q("select 20 * (avocado_id + 3) / (20 + avocado_id) as calc " +
          "from avocado"),
        avocado.select((lit(20) * (col("avocado_id") + 3) /
          (lit(20) + col("avocado_id"))).as("calc")))
    }
  }
}
