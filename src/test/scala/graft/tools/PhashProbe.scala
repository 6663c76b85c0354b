package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: hamming-distance distribution of the byte-block hash across
  * the synthetic corpus's true near-dup pairs — picks m6's budget. */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.ensure(spark, sfDir)
    val docs = spark.table("documents")
    val sig = docs.select(col("doc_id").as("id"),
      graft.functions.GraftFunctions.byteBlockHash(col("text").cast("binary"))
        .as("sim"))
    // True near-dup pairs (exact jaccard) vs their payload-hash hamming.
    val pairs = graft.operators.Dedup.exactJaccard(docs, "doc_id", "text",
      shingleN = 2, threshold = 0.6)
    val joined = pairs
      .join(sig.select(col("id").as("a_id"), col("sim").as("sa")), "a_id")
      .join(sig.select(col("id").as("b_id"), col("sim").as("sb")), "b_id")
      .select(bit_count(col("sa").bitwiseXOR(col("sb"))).as("h"))
    joined.groupBy("h").count().orderBy("h").show(70)
    // And the background: random non-dup pairs' hamming.
    val bg = sig.as("x").join(sig.as("y"),
        col("x.id") + 1 === col("y.id"))
      .select(bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).as("h"))
    bg.groupBy("h").count().orderBy("h").show(70)
    spark.stop()
  }
}
