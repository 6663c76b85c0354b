/** Native BPE kernels (see graft.operators.Bpe for the algorithm and the
  * scale story).
  *
  * Why expressions and not higher-order functions: a BPE fold is a
  * per-symbol loop, and encoding runs one fold PER LEARNED MERGE per word.
  * Expressed as nested `aggregate(...)` lambdas those loops evaluate
  * interpreted — per-element Catalyst dispatch times 24 nested merge
  * passes measured 72 s for 5k docs at sf0.1, ~100× the cost of the rest
  * of the text family combined. As native expressions the whole encode is
  * one codegen-visible call into tight JVM loops: a map-side projection,
  * zero shuffle, linear in splits — the same argument (and measurement)
  * that produced SketchExpressions.
  *
  * Semantics are EXACTLY graft.operators.Bpe's reference fold: per merge, a
  * single greedy left-to-right pass (leftmost overlap wins), merges applied
  * in rank order — BpeSpec pins kernel output to a local reference
  * implementation on real documents.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Loop bodies shared by interpreted eval and generated code (top-level
  * object → static forwarders callable from Janino). */
object BpeKernels {

  private val EndOfWord = "</w>"

  /** One greedy left-to-right merge of (a, b) over a symbol list, in
    * place-ish: returns `syms` untouched when the pair never occurs. */
  private def mergeOnce(syms: java.util.ArrayList[String], a: String,
      b: String): java.util.ArrayList[String] = {
    var merged: java.util.ArrayList[String] = null
    var j = 0
    val n = syms.size
    while (j < n) {
      if (j + 1 < n && syms.get(j) == a && syms.get(j + 1) == b) {
        if (merged == null) {
          merged = new java.util.ArrayList[String](n)
          var t = 0
          while (t < j) { merged.add(syms.get(t)); t += 1 }
        }
        merged.add(a + b)
        j += 2
      } else {
        if (merged != null) merged.add(syms.get(j))
        j += 1
      }
    }
    if (merged == null) syms else merged
  }

  /** Apply ONE merge to an array<string> symbol sequence — the training
    * round's map step. */
  def mergePair(syms: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = syms.numElements()
    val list = new java.util.ArrayList[String](n)
    var i = 0
    while (i < n) { list.add(syms.getUTF8String(i).toString); i += 1 }
    val out = mergeOnce(list, a.toString, b.toString)
    val arr = new Array[Any](out.size)
    var k = 0
    while (k < out.size) { arr(k) = UTF8String.fromString(out.get(k)); k += 1 }
    new GenericArrayData(arr)
  }

  /** Encode an array<string> of words through a full merge table: per word,
    * code-point symbols + the `</w>` sentinel, then every merge in rank
    * order; outputs the concatenated subword stream. */
  def encodeWords(words: ArrayData, lefts: Array[String],
      rights: Array[String]): ArrayData = {
    val out = new java.util.ArrayList[Any]()
    val nw = words.numElements()
    var wi = 0
    while (wi < nw) {
      val w = words.getUTF8String(wi).toString
      var syms = new java.util.ArrayList[String](w.length + 1)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        syms.add(new String(Character.toChars(cp)))
        i += Character.charCount(cp)
      }
      syms.add(EndOfWord)
      var m = 0
      while (m < lefts.length) {
        syms = mergeOnce(syms, lefts(m), rights(m))
        m += 1
      }
      var s = 0
      while (s < syms.size) {
        out.add(UTF8String.fromString(syms.get(s)))
        s += 1
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** array<string> symbols → array<string> with one (a, b) merge applied. */
case class BpeMergePair(child: Expression, a: String, b: String)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bpe_merge_pair"

  @transient private lazy val au = UTF8String.fromString(a)
  @transient private lazy val bu = UTF8String.fromString(b)

  override protected def nullSafeEval(t: Any): Any =
    BpeKernels.mergePair(t.asInstanceOf[ArrayData], au, bu)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ar = ctx.addReferenceObj("bpeLeft", au,
      "org.apache.spark.unsafe.types.UTF8String")
    val br = ctx.addReferenceObj("bpeRight", bu,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BpeKernels.mergePair($c, $ar, $br)")
  }

  override protected def withNewChildInternal(nc: Expression): Expression =
    copy(child = nc)
}

/** array<string> words → the concatenated BPE subword stream under a baked
  * merge table (rank order = array order). */
case class BpeEncodeWords(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val lefts: Array[String] = merges.map(_._1).toArray
  @transient private lazy val rights: Array[String] = merges.map(_._2).toArray

  override protected def nullSafeEval(t: Any): Any =
    BpeKernels.encodeWords(t.asInstanceOf[ArrayData], lefts, rights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lr = ctx.addReferenceObj("bpeLefts", lefts, "java.lang.String[]")
    val rr = ctx.addReferenceObj("bpeRights", rights, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BpeKernels.encodeWords($c, $lr, $rr)")
  }

  override protected def withNewChildInternal(nc: Expression): Expression =
    copy(child = nc)
}
