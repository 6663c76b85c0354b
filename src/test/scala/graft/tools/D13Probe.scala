package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev stage profiler for the d13 winnow-index probe — not shipped. */
object D13Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.ensure(spark, sfDir)
    val docs = spark.table("documents")
    docs.write.format("noop").mode("overwrite").save() // warmup

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d13probe] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val corpus = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val built = time("build")(Dedup.buildWinnowIndex(corpus, "doc_id", "text",
      k = 16, w = 30, maxFreq = 100))
    val dir = java.nio.file.Files.createTempDirectory("d13p").toString
    time("save")(Dedup.saveWinnowIndex(built, dir))
    val idx = time("load")(Dedup.loadWinnowIndex(spark, dir))

    val bflat = batch.select(col("doc_id").cast("long").as("b_id"),
      explode(graft.functions.GraftFunctions.winnow(col("text"), 16, 30)).as("fp"))
    (1 to 2).foreach(i => time(s"batch-winnow-only r$i")(
      bflat.write.format("noop").mode("overwrite").save()))
    (1 to 2).foreach(i => time(s"index-scan-only r$i")(
      idx.fps.write.format("noop").mode("overwrite").save()))
    (1 to 2).foreach(i => time(s"freq-filter-only r$i")(
      idx.freq.where(col("f") <= 100).write.format("noop").mode("overwrite").save()))
    (1 to 3).foreach(i => time(s"full-probe r$i")(
      Dedup.probeWinnow(idx, batch, "doc_id", "text", minShared = 3)
        .orderBy("a_id", "b_id")
        .write.format("noop").mode("overwrite").save()))
    spark.stop()
  }
}
