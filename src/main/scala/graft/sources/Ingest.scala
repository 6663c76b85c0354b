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

  /** ORC — the other columnar format Spark ships a vectorized,
    * predicate-pushdown reader for; same pruning/pushdown properties as
    * parquet, for lakes that standardized on it. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw text, one row per LINE (`value` string) — the ingestion shape for
    * line-delimited corpora (one document per line). Splittable, so a
    * single 100 GB file still fans out across executors. */
  def textLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Raw text, one row per FILE (`doc_path`, `text`) — the ingestion shape
    * for file-per-document corpora. NOT splittable (each file is one
    * record): right for many small-to-medium documents, wrong for one
    * giant file — use [[textLines]] there. */
  def textFiles(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("doc_path"), col("value").as("text"))
  }

  /** Opaque binary payloads — (`path`, `modificationTime`, `length`,
    * `content: binary`), the multimodal ingestion shape the m-series
    * codecs ([[graft.operators.Multimodal]]) consume. `glob` filters at
    * the LISTING (files never opened), and `maxBytes` guards executor
    * memory: binaryFile materializes each file as ONE row, so cap it at
    * what a task can hold and route larger payloads to a chunked path. */
  def binaryFiles(spark: SparkSession, path: String,
      glob: Option[String] = None,
      maxBytes: Option[Long] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    val g = glob.fold(r)(p => r.option("pathGlobFilter", p))
    val df = g.load(path)
    maxBytes.fold(df)(b =>
      df.where(org.apache.spark.sql.functions.col("length") <= b))
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
