package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Ingest

class SourcesSpec extends SparkSpecBase {

  test("csv ingest: header + inferred schema like the reference's read_csv") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "t.csv")
    Files.writeString(f.toPath,
      "id,name,price\n1,widget,9.5\n2,gadget,12.25\n3,doohickey,0.5\n")
    val df = Ingest.csv(spark, f.getPath)
    assert(df.columns.toSeq == Seq("id", "name", "price"))
    assert(df.schema("id").dataType.simpleString == "int")
    assert(df.schema("price").dataType.simpleString == "double")
    // registered + queryable through the Engine surface
    Engine.registerTempTable(df, "csv_t")
    assert(Engine.query(spark, "select sum(price) as s from csv_t")
      .head().getDouble(0) == 22.25)
    Engine.removeTempTable(spark, "csv_t")
  }

  test("partitioned sink: filters on partition columns become pruning") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toFile.getPath + "/t"
    val df = (1 to 100).map(i => (i.toLong, s"flag${i % 4}", i * 1.5))
      .toDF("id", "flag", "v")
    graft.sources.Sink.partitioned(df, dir, "flag")

    val back = spark.read.parquet(dir).where(col("flag") === "flag1")
    assert(back.count() == 25)
    // The partition filter must be applied at file-listing time, not as a
    // row-level data filter.
    val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("flag"))
    // Only the matching directory's files are read.
    val files = back.queryExecution.executedPlan.collectLeaves().head match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .flatMap(_.files).map(_.getPath.toString)
    }
    assert(files.nonEmpty && files.forall(_.contains("flag=flag1")))
  }

  test("bucketed sink: co-located equi-join plans with no Exchange") {
    import spark.implicits._
    val facts = (1 to 2000).map(i => (i.toLong % 97, i.toLong, i * 2.0))
      .toDF("k", "fid", "v")
    val dims = (0 to 96).map(i => (i.toLong, s"name$i")).toDF("k", "name")
    graft.sources.Sink.bucketed(facts, "bkt_facts", "k", 8, "k")
    graft.sources.Sink.bucketed(dims, "bkt_dims", "k", 8, "k")
    // Disable broadcast so the join actually exercises the bucketing (a
    // broadcast join would hide a missing co-location).
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bkt_facts").join(spark.table("bkt_dims"), "k")
      assert(j.count() == 2000)
      val plan = j.queryExecution.executedPlan.toString
      // The write-time shuffle is the only one: the join reads both sides
      // bucket-aligned.
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("drop table if exists bkt_facts")
      spark.sql("drop table if exists bkt_dims")
    }
  }

  test("json ingest round-trips") {
    val dir = Files.createTempDirectory("graft_json").toFile
    val f = new java.io.File(dir, "t.json")
    Files.writeString(f.toPath,
      """{"id":1,"v":"a"}
        |{"id":2,"v":"b"}
        |""".stripMargin)
    val df = Ingest.json(spark, f.getPath)
    assert(df.count() == 2)
    assert(df.select(max("id")).head().getLong(0) == 2)
  }

  test("registerDir binds every parquet table in a directory") {
    // Own directory — re-registering the shared testdata views here would
    // clobber Tables.ensure's converted `events` view for other suites.
    val dir = Files.createTempDirectory("graft_regdir").toFile
    Files.copy(new java.io.File(s"$sfDir/region.parquet").toPath,
      new java.io.File(dir, "region_copy.parquet").toPath)
    val names = Ingest.registerDir(spark, dir.getPath)
    assert(names == Seq("region_copy"))
    assert(spark.table("region_copy").count() == 5)
    Engine.removeTempTable(spark, "region_copy")
  }

  test("graft_dot is callable from SQL after registration") {
    Tables.ensure(spark, sfDir) // registers functions
    val got = Engine.query(spark,
      "select graft_dot(array(cast(1 as double), cast(2 as double)), " +
        "array(cast(3 as double), cast(4 as double))) as d")
      .head().getDouble(0)
    assert(got == 11.0)
  }

  test("sharded sink: every shard holds at most rowsPerFile rows, nothing lost") {
    import spark.implicits._
    val df = spark.range(1000).select(col("id"))
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    graft.sources.Sink.sharded(df.repartition(2), dir, rowsPerFile = 100)
    val parts = Option(new java.io.File(dir).listFiles()).getOrElse(Array())
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.length >= 10, s"expected >= 10 shards, got ${parts.length}")
    val counts = parts.map(p =>
      spark.read.parquet(p.getPath).count())
    assert(counts.forall(_ <= 100), s"oversized shard: ${counts.toSeq}")
    assert(counts.sum == 1000)
    assert(spark.read.parquet(dir).as[Long].collect().toSet ==
      (0L until 1000L).toSet)
  }
}
