package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch: isolate j10/h5 bench timings. */
object ScratchD1 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.Tables.ensure(spark, dir)
    def time(name: String): Unit = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[d1] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("j1_inner") // warm
    for (_ <- 1 to 2) { time("j10_salted_join"); time("h5_local_supplier"); time("h4_order_priority") }
    spark.stop()
  }
}
