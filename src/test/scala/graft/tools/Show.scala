package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print the first rows of named SparkEntry queries — value
  * checks without a full Verify sweep. Test-tree only.
  *
  *   sbt "Test/runMain graft.tools.Show t18b_bpe_train_invariants"
  */
object Show {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.ensure(spark, sfDir)
    args.foreach { n =>
      println(s"=== $n ===")
      graft.SparkEntry.queries(n)(spark, sfDir).show(10, truncate = false)
    }
    spark.stop()
  }
}
