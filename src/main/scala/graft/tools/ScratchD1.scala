package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: winnowing exact vs min-K-indexed path at 200k docs. */
object ScratchD1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs40 = spark.read.parquet("/tmp/scale_docs")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[d1] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n pairs")
    }
    time("winnow exact @200k") {
      graft.operators.Dedup.winnowing(docs40, "doc_id", "text",
        k = 16, w = 30, minShared = 3, maxFreq = 400).count()
    }
    time("winnow indexK=6 @200k") {
      graft.operators.Dedup.winnowing(docs40, "doc_id", "text",
        k = 16, w = 30, minShared = 3, maxFreq = 400, indexK = 6).count()
    }
    spark.stop()
  }
}
