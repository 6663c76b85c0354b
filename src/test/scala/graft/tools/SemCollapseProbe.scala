package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Scratch probe: price the identical-vector collapse (round 13). An
  * exact-copy flood folds into a bootstrapped sem index; the same probe
  * batch is then timed against the index compacted WITHOUT the collapse
  * (every copy scanned) and WITH it (one representative per distinct
  * vector per list). Prints raw/representative row counts, imbalance both
  * ways, and warm probe wall-clock. */
object SemCollapseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_FLOOD_COPIES", "400").toInt
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val base = Dedup.buildSemIndex(emb, "doc_id", "embedding", eps = 0.95)
    println(s"[scp] bootstrap nlist=${base.centroids.length} " +
      s"rows=${base.assigned.count()}")

    // Flood: `copies` exact copies of each of 50 real corpus vectors —
    // the re-post / boilerplate-embedding regime. All fold (kept or
    // dropped) per the stream contract.
    val seeds: Seq[Seq[Double]] = emb.limit(50).collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val flood = seeds.zipWithIndex.flatMap { case (v, i) =>
      (0 until copies).map(c =>
        ((1L << 41) + i.toLong * copies + c, v))
    }.toDF("doc_id", "embedding")
    val (_, _, ext) =
      Dedup.probeAndExtendSemParts(base, flood, "doc_id", "embedding")

    val plain = Dedup.compactSemIndex(ext, releaseOld = false)
    val collapsed = Dedup.collapseSemIndex(ext, releaseOld = false)
    val plainProbed = plain.assigned.count()
    val repProbed = collapsed.assigned.where(col("rep")).count()
    println(s"[scp] flood=${50 * copies} rows: plain probes $plainProbed " +
      s"rows, collapsed probes $repProbed")
    println(f"[scp] imbalance plain=${
      Similarity.listImbalance(plain.assigned)}%.2f collapsedReps=${
      Similarity.listImbalance(collapsed.assigned.where(col("rep")))}%.2f")

    val queries = emb.where(col("doc_id") % 97 === 0).limit(100)
      .select((col("doc_id") + (1L << 42)).as("doc_id"), col("embedding"))
      .cache()
    queries.count()
    def probeSec(idx: Dedup.SemIndex, tag: String): Unit = {
      // warm + 3 timed probes (decision outputs identical by contract)
      Dedup.probeAndExtendSemParts(idx, queries, "doc_id", "embedding")
        ._1.count()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val kept = Dedup.probeAndExtendSemParts(idx, queries,
          "doc_id", "embedding")._1.count()
        ((System.nanoTime() - t0) / 1e9, kept)
      }
      println(f"[scp] $tag probe sec=${times.map(_._1).min}%.3f " +
        s"kept=${times.head._2}")
    }
    probeSec(plain, "plain    ")
    probeSec(collapsed, "collapsed")
    spark.stop()
  }
}
