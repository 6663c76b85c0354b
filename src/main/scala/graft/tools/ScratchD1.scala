package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch: end-to-end GraftExtensions integration — a fresh session built
  * with the extension must accept the reference dialect in plain
  * spark.sql() and expose the native functions. */
object ScratchD1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq((1L, 2.5), (2L, 7.5)).toDF("id", "v").createOrReplaceTempView("t")
    val r1 = spark.sql(
      "select cast(v as int64) as x, today() as d from t order by x").collect()
    assert(r1.map(_.getLong(0)).toSeq == Seq(2L, 7L), "dialect cast failed")
    println("[d1] dialect through plain spark.sql: OK " + r1(0).getDate(1))
    val r2 = spark.sql(
      "select graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) as d").head()
    assert(r2.getDouble(0) == 11.0, "injected function failed")
    println("[d1] injected graft_dot: OK")
    val r3 = spark.sql(
      "select id from t order by v desc limit 1 union select id from t order by v asc limit 1")
      .collect().map(_.getLong(0)).toSet
    assert(r3 == Set(1L, 2L), "set-op parenthesization failed")
    println("[d1] set-op dialect: OK")
    spark.stop()
  }
}
