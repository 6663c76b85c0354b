package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: empirical scale-up — lineitem ×10 (6M rows), documents ×40
  * (200k docs), re-run the heavy operators and record wall times. */
object ScratchD1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.ensure(spark, "/root/testdata/sf0.1")
    import spark.implicits._

    val liPath = "/tmp/scale_li"
    val docPath = "/tmp/scale_docs"
    if (!new java.io.File(liPath).exists()) {
      val li = spark.table("lineitem")
      Seq.tabulate(10)(k => li.withColumn("l_orderkey",
          col("l_orderkey") + lit(k.toLong * 10000000L)))
        .reduce(_ unionByName _)
        .repartition(64).write.mode("overwrite").parquet(liPath)
      val docs = spark.table("documents")
      Seq.tabulate(40)(k => docs.withColumn("doc_id",
          col("doc_id") + lit(k.toLong * 1000000L)))
        .reduce(_ unionByName _)
        .repartition(64).write.mode("overwrite").parquet(docPath)
    }
    val li10 = spark.read.parquet(liPath)
    val docs40 = spark.read.parquet(docPath)
    println(s"[d1] lineitem rows: ${li10.count()}, docs: ${docs40.count()}")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[d1] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("h1-style agg @6M") {
      li10.where(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("global rank @6M") {
      graft.operators.Ranks.globalRank(li10, "rnk", dense = false,
          col("l_quantity").desc, col("l_extendedprice").asc, col("l_orderkey").asc)
        .write.format("noop").mode("overwrite").save()
    }
    time("minhash dedup @200k docs") {
      graft.operators.Dedup.minhashLsh(docs40, "doc_id", "text",
          shingleN = 2, bands = 16, rowsPerBand = 4, threshold = 0.6)
        .write.format("noop").mode("overwrite").save()
    }
    time("winnow dedup @200k docs") {
      graft.operators.Dedup.winnowing(docs40, "doc_id", "text",
          k = 16, w = 30, minShared = 3, maxFreq = 400)
        .write.format("noop").mode("overwrite").save()
    }
    time("components over minhash pairs @200k docs") {
      val pairs = graft.operators.Dedup.minhashLsh(docs40, "doc_id", "text",
        shingleN = 2, bands = 16, rowsPerBand = 4, threshold = 0.6)
      graft.operators.Dedup.components(pairs, "a_id", "b_id")
        .write.format("noop").mode("overwrite").save()
    }
    time("ivf ann @200k corpus (needs embeddings x N)") {
      val emb = spark.table("embeddings")
      val big = Seq.tabulate(40)(k => emb.withColumn("vec_id",
          col("vec_id") + lit(k.toLong * 1000000L)))
        .reduce(_ unionByName _)
      graft.operators.Similarity.ivfTopK(
          emb.where(col("vec_id") < 10), big, "vec_id", "embedding",
          k = 5, nlist = 32, nprobe = 4)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
