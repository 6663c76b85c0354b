package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Schema-drift guard for testdata registration. Round 7's only red signal
  * was a registration assumption: events.ts flipped from parquet
  * TIMESTAMP(NANOS) to timestamp[us] between driver testdata generations and
  * the unconditional nanos conversion failed analysis for every query.
  * Tables.ensure now branches on the read schema; this spec pins every
  * layout the driver has shipped (plus the adjusted-to-UTC variant) to
  * identical query results, so the next silent regeneration breaks a test
  * instead of a round.
  */
class TablesSpec extends SparkSpecBase {

  /** Writes a copy of sf0.001 events with a transformed ts column into a
    * fresh temp dir laid out like a testdata sfDir. */
  private def eventsVariant(tag: String)(f: DataFrame => DataFrame): String = {
    val dir = Files.createTempDirectory(s"graft_events_$tag").toFile.getPath
    val base = spark.read.parquet(s"$sfDir/events.parquet")
    f(base).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events registration adapts to every shipped ts layout") {
    val probes = Set("e1_hourly_agg", "e2_sessionize", "e4_asof_join")
    val defs = graft.queries.Relational.defs.filter(d => probes(d.name))
    assert(defs.map(_.name).toSet == probes)

    // Baseline: the real sf0.001 layout through the shared session.
    val baseline = defs.map(d =>
      d.name -> d.fn(spark, sfDir).collect().map(_.toString).toSeq).toMap

    val layouts = Seq(
      // Current driver layout: timestamp[us], isAdjustedToUTC=false — Spark
      // reads it back as TIMESTAMP_NTZ (inferTimestampNTZ), hitting the
      // cast("timestamp") branch.
      "ntz" -> eventsVariant("ntz")(
        _.withColumn("ts", col("ts").cast("timestamp_ntz"))),
      // Adjusted-to-UTC micros: reads back as TimestampType, no-op branch.
      "ltz" -> eventsVariant("ltz")(identity[DataFrame]),
      // Legacy layout: TIMESTAMP(NANOS) under nanosAsLong surfaces as int64
      // nanoseconds — a plain int64 ns column reads identically, hitting the
      // LongType → timestamp_micros(ns div 1000) branch.
      "nanos" -> eventsVariant("nanos")(
        _.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000"))))

    for ((tag, dir) <- layouts) {
      // Fresh session per layout: Tables.ensure memoizes per (session, dir),
      // and the shared session must stay registered on the real sfDir.
      val s = spark.newSession()
      for (d <- defs) {
        val got = d.fn(s, dir).collect().map(_.toString).toSeq
        assert(got == baseline(d.name),
          s"${d.name} drifted under the $tag ts layout")
      }
    }
  }
}
