/** Native unigram-LM tokenizer kernel (see graft.operators.Unigram for the
  * trainer and the scale story).
  *
  * Why an expression: segmentation is a per-word Viterbi DP — a nested
  * per-position loop with a hash probe per candidate piece. Expressed in
  * Catalyst lambdas that evaluates interpreted per element (the measured
  * failure mode BpeExpressions documents); as a native expression the whole
  * encode is one codegen-visible call into a tight JVM loop — a map-side
  * projection, zero shuffle, linear in splits. The piece table rides along
  * as a reference object (it is the MODEL — bounded by vocab size, constant
  * in corpus size; the BPE merge-table discipline).
  *
  * Semantics: per word, the max-log-probability segmentation under a
  * unigram LM over the piece vocabulary (Kudo 2018's inference step), ties
  * broken deterministically toward the LONGER final piece. Single
  * code-points absent from the vocabulary carry a large fixed penalty
  * instead of −∞, so every string is segmentable (full coverage fallback);
  * the trainer seeds all corpus characters, so on its own corpus the
  * fallback never fires (spec + t22b attest this).
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Loop bodies shared by interpreted eval and generated code (top-level
  * object → static forwarders callable from Janino). */
object UnigramKernels {

  /** Log-probability charged to a single code point absent from the
    * vocabulary: large enough that any in-vocab path wins, finite so every
    * string segments. */
  val UnkLogProb: Double = -1e4

  /** Shared piece-table conversion (the trainer's broadcast payload and
    * the expression's reference object must be the SAME shape — one
    * converter so a change cannot silently miss its twin). */
  def toJavaMap(pieces: Map[String, Double])
      : java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, lp) => m.put(p, java.lang.Double.valueOf(lp)) }
    m
  }

  /** Code-point boundary CHAR offsets of `w`: length n+1 for n code
    * points. */
  def codepointBounds(w: String): Array[Int] = {
    val out = new Array[Int](w.codePointCount(0, w.length) + 1)
    var i = 0
    var k = 0
    while (i < w.length) {
      out(k) = i
      i += Character.charCount(w.codePointAt(i))
      k += 1
    }
    out(k) = w.length
    out
  }

  /** Viterbi segmentation of ONE word under the piece table — returns the
    * max-log-prob piece sequence (ties → longer final piece, then the DP
    * order makes the full path deterministic). */
  def segmentWord(w: String, logp: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): java.util.ArrayList[String] = {
    // maxLen < 1 would leave every backpointer at 0 and spin the
    // backtrack forever — clamp; callers also validate.
    val ml = if (maxLen < 1) 1 else maxLen
    val bounds = codepointBounds(w)
    val n = bounds.length - 1
    val best = new Array[Double](n + 1)
    val bpLen = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var pos = 1
    while (pos <= n) {
      val lmax = if (pos < ml) pos else ml
      var l = 1
      while (l <= lmax) {
        if (best(pos - l) != Double.NegativeInfinity) {
          val piece = w.substring(bounds(pos - l), bounds(pos))
          val lp = logp.get(piece)
          val lpd: Double =
            if (lp != null) lp.doubleValue
            else if (l == 1) UnkLogProb
            else Double.NegativeInfinity
          if (lpd != Double.NegativeInfinity) {
            val cand = best(pos - l) + lpd
            if (cand > best(pos) ||
                (cand == best(pos) && l > bpLen(pos))) {
              best(pos) = cand
              bpLen(pos) = l
            }
          }
        }
        l += 1
      }
      pos += 1
    }
    val out = new java.util.ArrayList[String]()
    var p = n
    while (p > 0) {
      val l = bpLen(p)
      out.add(w.substring(bounds(p - l), bounds(p)))
      p -= l
    }
    java.util.Collections.reverse(out)
    out
  }

  /** Encode an array<string> of words through the piece table: the
    * concatenated per-word Viterbi piece streams. */
  def encodeWords(words: ArrayData,
      logp: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): ArrayData = {
    val out = new java.util.ArrayList[Any]()
    val nw = words.numElements()
    var wi = 0
    while (wi < nw) {
      val segs = segmentWord(words.getUTF8String(wi).toString, logp, maxLen)
      var s = 0
      while (s < segs.size) {
        out.add(UTF8String.fromString(segs.get(s)))
        s += 1
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** array<string> words → the concatenated unigram-LM piece stream under a
  * baked piece table. */
case class UnigramEncodeWords(child: Expression,
    pieces: Map[String, Double], maxPieceLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_unigram_encode"

  @transient private lazy val jmap: java.util.HashMap[String, java.lang.Double] =
    UnigramKernels.toJavaMap(pieces)

  override protected def nullSafeEval(t: Any): Any =
    UnigramKernels.encodeWords(t.asInstanceOf[ArrayData], jmap, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mr = ctx.addReferenceObj("uniPieces", jmap, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.UnigramKernels.encodeWords($c, $mr, " +
        s"$maxPieceLen)")
  }

  override protected def withNewChildInternal(nc: Expression): Expression =
    copy(child = nc)
}
