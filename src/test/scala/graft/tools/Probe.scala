package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time named SparkEntry queries (and print their plans with
  * -explain) without a full Bench sweep. Test-tree only — not shipped.
  *
  *   sbt "Test/runMain graft.tools.Probe w2_rank_multi w5_dense_rank_partition"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("-explain")
    val names = args.filterNot(_.startsWith("-"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.ensure(spark, sfDir)
    // Warmup to pay JVM/codegen once.
    graft.SparkEntry.queries("j1_inner")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      if (explain)
        graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      // Construction INSIDE the timer — Bench.materialize semantics, so
      // queries whose cost lives in eager construction (resident-memo
      // builds, localCheckpoints) price the same here as in the bench.
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[probe] $n run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
