package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source ingestion mirroring the reference's table-arrival path (reference
  * `dataframe_sql/tests/utils.py:11-19`: `pandas.read_csv` with header +
  * inferred dtypes) plus the formats a Spark pipeline actually uses.
  * Everything returns a lazy DataFrame ready for `Engine.registerTempTable`;
  * scans stay pushdown/prune-capable.
  *
  * At scale: prefer parquet (self-describing, splittable, column-pruned).
  * For CSV/JSON give an explicit schema when possible — `inferSchema` costs
  * an extra full read of the input, which is fine at test scale and wrong at
  * 100 TB.
  */
object Ingest {

  /** Header + inferred dtypes, like the reference's read_csv. */
  def csv(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema match {
      case Some(s) => r.schema(s).csv(path)
      case None => r.option("inferSchema", "true").csv(path)
    }
  }

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def json(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame =
    schema match {
      case Some(s) => spark.read.schema(s).json(path)
      case None => spark.read.json(path)
    }

  /** Register a whole directory of `<name>.parquet` tables, like the
    * reference's module-level fixture loop (`tests/utils.py:26-34`). */
  def registerDir(spark: SparkSession, dir: String): Seq[String] = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array())
    files.toSeq
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val name = f.getName.stripSuffix(".parquet")
        graft.Engine.registerTempTable(parquet(spark, f.getPath), name)
        name
      }
  }
}
