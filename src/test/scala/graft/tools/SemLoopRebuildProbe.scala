package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.{Dedup, Similarity}

/** Scratch: does the sem stream loop's compaction still REBUILD past the
  * bar after the round-13 collapse-first change? Not shipped. */
object SemLoopRebuildProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    org.apache.log4j.Logger.getLogger("org.apache.spark")
      .setLevel(org.apache.log4j.Level.WARN)
    org.apache.log4j.Logger.getLogger("org.apache.hadoop")
      .setLevel(org.apache.log4j.Level.WARN)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set(Similarity.ImbalanceRebuildBarKey, "4.0")

    val dim = 16
    val corpus = (0 until 16).map { i =>
      graft.SemDoc(i.toLong, Seq.tabulate(dim)(j => if (j == i) 1.0 else 0.0))
    }.toDF("doc_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("semloop").toString
    val st = graft.streaming.SemDedupStream.resume(spark, dir, corpus,
      "doc_id", "embedding", eps = 0.95, nlist = 16, nprobe = 1)
    val cents0 = st.index.centroids
    val in = MemoryStream[graft.SemDoc]
    val q = graft.streaming.SemDedupStream.run(in.toDF(), st,
      "doc_id", "embedding", compactEvery = 2,
      checkpointPath = Some(dir))(k => { k.count(); () })
    // Distinct vectors concentrated near e_0 — a broad-enough cone a
    // 16-list retrain CAN spread, and certainly enough mass to push
    // rep-row imbalance over 4.0.
    (0 until 4).foreach { b =>
      val batch = (0 until 200).map { j =>
        val id = 10000L + b * 1000L + j
        def u(d: Int): Double =
          ((id * 2654435761L + d * 40503L) % 1009L) / 1009.0 - 0.5
        val v = Seq.tabulate(dim)(d => (if (d < 4) 1.0 else 0.0) + 0.8 * u(d))
        graft.SemDoc(id, v)
      }
      in.addData(batch: _*)
      q.processAllAvailable()
      val a = st.index.assigned
      val raw = Similarity.listImbalance(a)
      val rep = Similarity.listImbalance(
        a.where(col("rep")))
      println(f"[slr] batch$b raw=$raw%.2f rep=$rep%.2f " +
        s"centroidsChanged=${st.index.centroids != cents0} " +
        s"nlist=${st.index.centroids.length}")
    }
    q.stop()
    spark.stop()
  }
}
