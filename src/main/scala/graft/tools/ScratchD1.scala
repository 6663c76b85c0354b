package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: single-task window vs distributed globalRank at sf0.1. */
object ScratchD1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensure(spark, "/root/testdata/sf0.1")
    val li = spark.table("lineitem")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[d1] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    li.write.format("noop").mode("overwrite").save() // warm
    for (round <- 1 to 2) {
      time(s"r$round single-task window") {
        graft.operators.Ranks.globalRank(li, "rnk", dense = false,
            maxSingleTaskRows = Long.MaxValue,
            col("l_quantity").desc, col("l_extendedprice").asc, col("l_orderkey").asc)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"r$round distributed globalRank") {
        graft.operators.Ranks.globalRank(li, "rnk", dense = false,
            maxSingleTaskRows = 0L,
            col("l_quantity").desc, col("l_extendedprice").asc, col("l_orderkey").asc)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
