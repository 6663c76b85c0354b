package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: IVF cost breakdown at 200k vectors. */
object ScratchD1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.Tables.ensure(spark, "/root/testdata/sf0.1")
    val emb = spark.table("embeddings")
    val big = Seq.tabulate(40)(k => emb.withColumn("vec_id",
        col("vec_id") + lit(k.toLong * 1000000L)))
      .reduce(_ unionByName _).cache()
    println("[d1] corpus: " + big.count())
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[d1] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // training sample collect only
    time("train sample collect + lloyd") {
      val c = big.select(col("vec_id").as("cid"),
          graft.operators.Similarity.toDoubleVec(col("embedding")).as("cv"))
        .orderBy(xxhash64(col("cid"))).limit(20000)
        .select(col("cv")).collect()
      println("[d1]   sample n=" + c.length)
    }
    time("full ivfTopK") {
      graft.operators.Similarity.ivfTopK(
          emb.where(col("vec_id") < 10), big, "vec_id", "embedding",
          k = 5, nlist = 32, nprobe = 4)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
