package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch: w7 plan — confirm WindowGroupLimit pushdown. */
object ScratchD1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val plan = graft.SparkEntry.queries("w7_topk_per_group")(
      spark, "/root/testdata/sf0.01").queryExecution.executedPlan.toString
    println("[d1] has WindowGroupLimit: " + plan.contains("WindowGroupLimit"))
    spark.stop()
  }
}
