package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev stage profiler for the d10 incremental near-dup path — not shipped.
  * Lives in graft.operators so it can see the probe internals.
  *
  *   sbt "Test/runMain graft.operators.D10Probe"
  */
object D10Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // Saturation-guard passthrough (the Bench builder's setting) so the
      // probe runs on native-scale fixtures that read saturated.
      .config("spark.graft.dedup.saturation.mode",
        sys.env.getOrElse("SPARK_GRAFT_SATURATION_MODE", "fail"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.ensure(spark, sfDir)
    val docs = spark.table("documents")
    docs.write.format("noop").mode("overwrite").save() // warmup

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d10] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      System.out.flush()
      r
    }

    val corpus = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val idx = Dedup.buildNearDupIndex(corpus, "doc_id", "text")
    time("index materialize") { idx.materialize() }

    val t = idx.threshold
    val bsets = time("bsets materialize") {
      val b = Dedup.docHashSets(batch, "doc_id", "text", idx.shingleN)
        .select(col("id").cast("long").as("id"), col("hs"), col("n"))
        .persist()
      b.count(); b
    }
    val bpref = time("bpref materialize") {
      val p = Dedup.prefixKeys(bsets, idx.freq, t).persist()
      println(s"[d10] bpref rows = ${p.count()}")
      p
    }
    println(s"[d10] index.prefixes rows = ${idx.prefixes.count()}")

    val prune = {
      val (an, bn) = (col("a.n"), col("b.n"))
      col("b.h") === col("a.h") &&
        an * t <= bn + 0.5 && bn * t <= an + 0.5 &&
        lit(1) + least(an - col("a.r"), bn - col("b.r")) >=
          (an + bn) * (t / (1 + t)) - 0.5
    }
    val corpusCands = time("corpus candidates") {
      val c = bpref.as("b").join(idx.prefixes.as("a"), prune)
        .select(col("b.id").as("b_id"), col("a.id").as("a_id")).distinct()
        .persist()
      println(s"[d10] corpus candidate pairs = ${c.count()}")
      c
    }
    val earlierCands = time("earlier candidates") {
      val c = bpref.as("b").join(bpref.as("a"),
          prune && col("a.id") < col("b.id"))
        .select(col("b.id").as("b_id"), col("a.id").as("a_id")).distinct()
        .persist()
      println(s"[d10] earlier candidate pairs = ${c.count()}")
      c
    }
    def verified(cands: org.apache.spark.sql.DataFrame,
        right: org.apache.spark.sql.DataFrame) =
      cands
        .join(bsets.select(col("id").as("b_id"), col("hs").as("b_hs"),
          col("n").as("nb")), "b_id")
        .join(right.select(col("id").as("a_id"), col("hs").as("a_hs"),
          col("n").as("na")), "a_id")
        .withColumn("common", graft.functions.GraftFunctions
          .sortedCommon(col("b_hs"), col("a_hs")))
        .where(col("common") / (col("nb") + col("na") - col("common")) >= t)
        .select(col("b_id").as("doc_id"))
    time("verify corpus hits") {
      println(s"[d10] corpus hits = ${verified(corpusCands, idx.docsets).distinct().count()}")
    }
    time("verify earlier hits") {
      println(s"[d10] earlier hits = ${verified(earlierCands, bsets).distinct().count()}")
    }
    spark.stop()
  }
}
