package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.ensure(spark, sfDir)
    val docs = spark.table("documents")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    docs.write.format("noop").mode("overwrite").save() // warmup

    time("d1 exact") {
      graft.operators.Dedup.exact(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("d2 minhash 1st") {
      graft.operators.Dedup.minhashLsh(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("d2 minhash 2nd") {
      graft.operators.Dedup.minhashLsh(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("d3 jaccard 1st") {
      graft.operators.Dedup.exactJaccard(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("d3 jaccard 2nd") {
      graft.operators.Dedup.exactJaccard(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("d4 simhash") {
      graft.operators.Dedup.simhash(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
