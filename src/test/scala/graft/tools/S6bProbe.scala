package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scratch decomposition of the s6b companion's cost. Not shipped. */
object S6bProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.ensure(spark, sfDir)
    val emb = spark.table("embeddings")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s6b] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val path = java.nio.file.Files.createTempDirectory("s6bprobe").toString
    val built = time("build+save") {
      Similarity.savePqIndex(
        Similarity.buildPqIndex(emb.where(col("vec_id") >= 10),
          "vec_id", "embedding"), path)
      Similarity.loadPqIndex(spark, path)
    }
    (1 to 3).foreach { i =>
      time(s"probe construct+materialize $i") {
        Similarity.pqProbe(built, emb.where(col("vec_id") < 10),
          emb.where(col("vec_id") >= 10), "vec_id", "embedding", k = 5)
          .select("qid", "rnk", "cid")
          .write.format("noop").mode("overwrite").save()
      }
    }
    val inline = time("inline build+persist") {
      val df = Similarity.pqTopK(emb.where(col("vec_id") < 10),
        emb.where(col("vec_id") >= 10), "vec_id", "embedding", k = 5)
        .select("qid", "rnk", "cid")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count(); df
    }
    (1 to 2).foreach { i =>
      time(s"parity full-outer $i") {
        val probed = Similarity.pqProbe(built, emb.where(col("vec_id") < 10),
          emb.where(col("vec_id") >= 10), "vec_id", "embedding", k = 5)
          .select("qid", "rnk", "cid")
        val pc = probed.groupBy("qid", "rnk", "cid").agg(count(lit(1)).as("pc"))
        val ic = inline.groupBy("qid", "rnk", "cid").agg(count(lit(1)).as("ic"))
        pc.join(ic, Seq("qid", "rnk", "cid"), "full_outer")
          .agg(coalesce(sum(abs(coalesce(col("pc"), lit(0L)) -
            coalesce(col("ic"), lit(0L)))), lit(0L)).as("parity_violations"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 2).foreach { i =>
      time(s"parity exceptAll $i") {
        val probed = Similarity.pqProbe(built, emb.where(col("vec_id") < 10),
          emb.where(col("vec_id") >= 10), "vec_id", "embedding", k = 5)
          .select("qid", "rnk", "cid")
        probed.exceptAll(inline).unionAll(inline.exceptAll(probed))
          .agg(count(lit(1)).as("parity_violations"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
