package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: why does rebuildSemIndex not restore balance on the
  * endurance fixture? Prints list-count histograms before/after rebuild
  * and where the drift vectors land. */
object SemRebuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    var idx = graft.operators.Dedup.buildSemIndex(corpus, "doc_id",
      "embedding", eps = 0.95)
    println(s"[srp] bootstrap nlist=${idx.centroids.length} " +
      f"imbalance=${graft.operators.Similarity.listImbalance(idx.assigned)}%.2f")
    val dim = 64
    val drift = (0 until 6000).map { j =>
      val id = 1000000L + j
      def u(d: Int): Double =
        ((id * 2654435761L + d * 40503L) % 1009L) / 1009.0 - 0.5
      // BROAD cone: strong common component over dims 40-47 plus
      // full-strength jitter on every dim (~53 deg internal spread) —
      // concentrated under the frozen quantizer, splittable by retrain.
      val v = (0 until dim).map(d =>
        (if (d >= 40 && d < 48) 1.0 else 0.0) + u(d))  // broad cone
      graft.SemDoc(id, v)
    }.toDF("doc_id", "embedding")
    val (_, _, ext) = graft.operators.Dedup.probeAndExtendSemParts(
      idx, drift, "doc_id", "embedding")
    idx = ext
    def primaryImbalance(i: graft.operators.Dedup.SemIndex): Double = {
      val prim = i.assigned.groupBy("id")
        .agg(first(col("cv")).as("cv"))
        .select(graft.functions.GraftFunctions.nearestCentroid(col("cv"),
          i.centroids).as("list"))
      graft.operators.Similarity.listImbalance(prim)
    }
    def stats(tag: String, i: graft.operators.Dedup.SemIndex): Unit = {
      val counts = i.assigned.groupBy("list").count()
        .orderBy(desc("count")).collect()
      val total = counts.map(_.getLong(1)).sum
      println(s"[srp] $tag nlist=${i.centroids.length} " +
        s"nonempty=${counts.length} total=$total " +
        f"imbalance=${graft.operators.Similarity.listImbalance(i.assigned)}%.2f " +
        s"top5=${counts.take(5).map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(",")}")
      val driftLists = i.assigned.where(col("id") >= 1000000L)
        .groupBy("list").count().orderBy(desc("count")).collect()
      println(s"[srp] $tag driftLists=${driftLists.length} " +
        s"top5=${driftLists.take(5).map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(",")}")
      println(f"[srp] $tag primaryImbalance=${primaryImbalance(i)}%.2f")
    }
    stats("extended", idx)
    locally {
      val rows = idx.assigned.where(col("id") >= 1000000L)
        .groupBy("id").agg(first(col("cv")).as("cv"))
        .select("cv").collect().map(_.getSeq[Double](0))
      def norm(v: Seq[Double]) = { val n = math.sqrt(v.map(x => x*x).sum); v.map(_/n) }
      println(s"[srp] drift ids=${rows.length} distinctRaw=${rows.map(_.toVector).distinct.length} " +
        s"distinctNorm=${rows.map(norm).map(_.toVector).distinct.length}")
      val sample = rows.take(3).map(_.take(8).map(x => f"$x%.3f").mkString(","))
      sample.foreach(s => println(s"[srp] cv head: $s"))
    }
    val rebuilt = graft.operators.Dedup.rebuildSemIndex(idx,
      releaseOld = false)
    stats("rebuilt", rebuilt)
    spark.stop()
  }
}
