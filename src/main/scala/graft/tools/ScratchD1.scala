package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: winnowing recall vs minhash ground truth at sf0.1. */
object ScratchD1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.ensure(spark, "/root/testdata/sf0.1")
    val docs = spark.table("documents")
    val mh = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text",
      shingleN = 2, bands = 16, rowsPerBand = 4, threshold = 0.6)
      .select("a_id", "b_id").cache()
    println("[d1] minhash pairs: " + mh.count())
    for ((k, w, ms) <- Seq((16, 30, 2), (16, 30, 3), (12, 40, 3))) {
      val wn = graft.operators.Dedup.winnowing(docs, "doc_id", "text",
        k = k, w = w, minShared = ms, maxFreq = 100).select("a_id", "b_id")
      val covered = mh.intersect(wn).count()
      println(s"[d1] winnow k=$k w=$w minShared=$ms: total=" + wn.count() +
        s" covers $covered of minhash")
    }
    spark.stop()
  }
}
