package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Both physical strategies of exactJaccard must produce identical results —
  * to each other and to hand-computed values. */
class JaccardSpec extends SparkSpecBase {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e"),          // bigrams: ab bc cd de
      (2L, "a b c d x"),          // bigrams: ab bc cd dx → common 3, union 5
      (3L, "p q r s t"),
      (4L, "a b c d e")           // identical to 1
    ).toDF("doc_id", "text")
  }

  test("bitset and join paths agree with each other and with hand math") {
    val viaBitset = Dedup.exactJaccard(docs, "doc_id", "text",
      threshold = 0.5, maxBitsetDict = 65536)
      .orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val viaJoin = Dedup.exactJaccard(docs, "doc_id", "text",
      threshold = 0.5, maxBitsetDict = 0) // force the join path
      .orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(viaBitset.toSeq == viaJoin.toSeq)
    // hand-checked: (1,2) = 3/5 = 0.6, (1,4) = 1.0, (2,4) = 0.6, 3 isolated
    assert(viaBitset.toSeq == Seq((1L, 2L, 0.6), (1L, 4L, 1.0), (2L, 4L, 0.6)))
  }

  test("bitset kernel counts common bits exactly") {
    import spark.implicits._
    val df = Seq(
      (Seq(5L, 0L), Seq(1L, 0L)),   // 101 & 001 → 1 bit
      (Seq(-1L, -1L), Seq(-1L, -1L)) // all 128 bits
    ).toDF("a", "b")
    val got = df.select(
      graft.functions.GraftFunctions.bitsetCommon(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 128L))
  }
}
