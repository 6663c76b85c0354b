/** Native text-scrub kernel.
  *
  * Why an expression: the PII scrub is a CHAIN — each pattern runs on the
  * previous pattern's output, and the audit count must be taken at each
  * step with the same sequencing. Composed from built-ins that is
  * `regexp_replace` × 4 PLUS `regexp_extract_all` × 4 = eight full regex
  * passes per row (the count passes re-scan text the replace passes
  * already walked). One kernel does each step's replace-and-count in a
  * single `Matcher` loop — four passes total, half the regex CPU — and
  * returns (redacted, matches) as one struct. Patterns compile once per
  * expression instance, not per row; semantics are byte-identical to the
  * composed form (spec-pinned), which is also exactly what the DuckDB
  * oracle replays.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared loop body (top-level object → static forwarder for Janino). */
object TextKernels {

  /** Apply `(pattern, tag)` replacements sequentially, counting matches at
    * each step; returns the final string and the total count as an
    * InternalRow-compatible pair. */
  def scrub(text: UTF8String, patterns: Array[java.util.regex.Pattern],
      tags: Array[String]): InternalRow = {
    var s = text.toString
    var total = 0L
    var i = 0
    while (i < patterns.length) {
      val m = patterns(i).matcher(s)
      if (m.find()) {
        val sb = new java.lang.StringBuilder(s.length)
        var n = 0L
        do {
          m.appendReplacement(sb, tags(i))
          n += 1
        } while (m.find())
        m.appendTail(sb)
        s = sb.toString
        total += n
      }
      i += 1
    }
    InternalRow(UTF8String.fromString(s), total)
  }
}

/** string → struct(redacted string, matches bigint) under a baked
  * sequential (pattern, tag) chain. */
case class RegexScrub(child: Expression, patterns: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  require(patterns.nonEmpty, "scrub needs at least one pattern")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("matches", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_regex_scrub"

  @transient private lazy val compiled: Array[java.util.regex.Pattern] =
    patterns.map(p => java.util.regex.Pattern.compile(p._1)).toArray
  // Matcher.appendReplacement treats '$' and '\' specially — quote the tags
  // so they land literally, like regexp_replace's literal replacement would
  // not (Spark's regexp_replace passes the replacement through the same
  // appendReplacement semantics; tags here contain neither, and the quoting
  // makes that a non-assumption).
  @transient private lazy val tags: Array[String] =
    patterns.map(p => java.util.regex.Matcher.quoteReplacement(p._2)).toArray

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.scrub(t.asInstanceOf[UTF8String], compiled, tags)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ps = ctx.addReferenceObj("scrubPatterns", compiled,
      "java.util.regex.Pattern[]")
    val ts = ctx.addReferenceObj("scrubTags", tags, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.scrub($c, $ps, $ts)")
  }

  override protected def withNewChildInternal(nc: Expression): Expression =
    copy(child = nc)
}
