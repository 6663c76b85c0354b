package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: debug d7 components at sf0.01. */
object ScratchD1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.ensure(spark, "/root/testdata/sf0.01")
    val docs = spark.table("documents")
    val fp = docs.select(col("doc_id"),
      graft.operators.TextOps.fingerprint(col("text")).as("fp"))
    val edges = fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    println("[d1] edges: " + edges.count())
    edges.printSchema()
    val comp = graft.operators.Dedup.components(edges, "a_id", "b_id")
    println("[d1] comp rows: " + comp.count())
    spark.stop()
  }
}
