package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for m11's native-sf1 scaling: split the audio query into
  * synth / decode legs and sweep the codec-slot partition count. */
object M11Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.ensure(spark, sfDir)
    val docs = spark.table("documents").select(col("doc_id"))
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[m11probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println(s"[m11probe] input partitions: ${docs.rdd.getNumPartitions}")
    // warmup
    graft.operators.Multimodal.decodeAudioBatched(
      graft.operators.Multimodal.syntheticWavPayloads(docs.limit(2000), "doc_id"))
      .write.format("noop").mode("overwrite").save()
    for (rep <- Seq(0, 8, 32, 128)) {
      val d = if (rep == 0) docs else docs.repartition(rep)
      time(s"synth rep=$rep") {
        graft.operators.Multimodal.syntheticWavPayloads(d, "doc_id")
          .select("doc_id", "content")
          .write.format("noop").mode("overwrite").save()
      }
      time(s"synth+decode rep=$rep") {
        graft.operators.Multimodal.decodeAudioBatched(
          graft.operators.Multimodal.syntheticWavPayloads(d, "doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
