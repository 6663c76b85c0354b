package graft

/** SQL dialect pre-pass: translates the reference dialect
  * (zbrookle/dataframe_sql, whose grammar is documented at reference
  * `dataframe_sql/sql_select_query.py:70-81`) into Spark ANSI SQL before the
  * string reaches Spark's ANTLR parser. Purely lexical — string literals and
  * quoted identifiers pass through untouched, so a literal `'float64'` is
  * never corrupted (SURVEY.md §7.3).
  *
  * Rewrites (SURVEY.md §2.2):
  *   - P7: pandas/ibis type names inside `CAST(x AS <t>)` → Spark SQL types
  *     (`object`/`category`/`varchar` → `string`, `int64` → `bigint`,
  *     `float16` → `float`, `float64` → `double`, `datetime64` → `timestamp`,
  *     reference `tests/pandas_sql_functionality_test.py:1061-1111`).
  *   - P10: `today()` → `current_date()`
  *     (reference `tests/pandas_sql_functionality_test.py:1008,1013`).
  *   - P11: two-arg `timestamp('YYYY-MM-DD','HH:MM:SS')` →
  *     `to_timestamp('YYYY-MM-DD HH:MM:SS')`; the ANSI literal form
  *     `timestamp '…'` and one-arg `timestamp(x)` are left alone
  *     (reference `tests/pandas_sql_functionality_test.py:1008,1014`).
  *   - U1-U6: the reference grammar lets each set-operation input carry its
  *     own ORDER BY / LIMIT without parentheses (reference
  *     `tests/pandas_sql_functionality_test.py:529-638`); Spark's parser
  *     requires such branches parenthesized, so they are wrapped here.
  *
  * Everything else in the reference's grammar is already valid Spark SQL, so
  * no further rewriting is needed — Catalyst does the real parsing/planning.
  */
object Dialect {

  /** Non-ANSI CAST target names accepted by the reference → Spark SQL type
    * names. ANSI names that Spark already accepts (int, bigint, smallint,
    * float, double, boolean, timestamp, string, date) are not rewritten.
    * Widenings (float16 → float, category → string) per SURVEY.md §7.3.
    */
  private val castTypes: Map[String, String] = Map(
    "object" -> "string",
    "category" -> "string",
    "varchar" -> "string",
    "int16" -> "smallint",
    "int32" -> "int",
    "int64" -> "bigint",
    "float16" -> "float",
    "float32" -> "float",
    "float64" -> "double",
    "bool" -> "boolean",
    "datetime64" -> "timestamp"
  )

  private sealed trait Tok { def text: String }
  /** Bare identifier or keyword. */
  private final case class Word(text: String) extends Tok
  /** 'string', "ident" or `ident` — including the quotes; never rewritten. */
  private final case class Quoted(text: String) extends Tok
  /** Any other single character (operators, parens, commas, digits…). */
  private final case class Sym(text: String) extends Tok
  private final case class Space(text: String) extends Tok

  private def lex(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql(i)
      if (c == '\'' || c == '"' || c == '`') {
        val start = i
        i += 1
        var done = false
        while (i < n && !done) {
          if (sql(i) == c) {
            // '' inside a single-quoted string is an escaped quote
            if (c == '\'' && i + 1 < n && sql(i + 1) == '\'') i += 2
            else { i += 1; done = true }
          } else i += 1
        }
        out += Quoted(sql.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (sql(i).isLetterOrDigit || sql(i) == '_')) i += 1
        out += Word(sql.substring(start, i))
      } else if (c.isWhitespace) {
        val start = i
        while (i < n && sql(i).isWhitespace) i += 1
        out += Space(sql.substring(start, i))
      } else {
        out += Sym(c.toString)
        i += 1
      }
    }
    out.result()
  }

  /** Wrap un-parenthesized set-op branches that carry their own ORDER BY /
    * LIMIT. Non-final depth-0 branches are wrapped when they contain a
    * depth-0 ORDER BY or LIMIT; the final branch only when it contains a
    * LIMIT AND `finalBranchLocal` is set (a trailing ORDER BY alone is the
    * ANSI whole-result sort and is always left in place). Set ops inside
    * subqueries (depth > 0) are untouched.
    *
    * `finalBranchLocal = true` is the reference's grammar (a trailing
    * ORDER BY + LIMIT belongs to the last input — reference
    * `tests/pandas_sql_functionality_test.py:529-638`); `false` preserves
    * ANSI whole-result semantics for the trailing clause. [[Engine.query]]
    * (the reference-dialect entry point) uses the former; the session-wide
    * injected parser ([[DialectParser]]) uses the latter, so it only ever
    * rewrites branch text that stock Spark would fail to parse — it can
    * never change the result of a valid Spark query.
    */
  private def parenthesizeSetOps(sql: String, finalBranchLocal: Boolean): String = {
    val toks = lex(sql)
    val setOps = Set("union", "intersect", "except")
    var depth = 0
    // Token ranges [start, end) of each depth-0 set-op keyword (+ ALL/DISTINCT).
    val ops = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case Sym("(") => depth += 1; i += 1
        case Sym(")") => depth -= 1; i += 1
        case Word(w) if depth == 0 && setOps(w.toLowerCase) =>
          var e = i + 1
          var j = e
          while (j < toks.length && toks(j).isInstanceOf[Space]) j += 1
          if (j < toks.length) toks(j) match {
            case Word(x) if x.equalsIgnoreCase("all") ||
                x.equalsIgnoreCase("distinct") => e = j + 1
            case _ =>
          }
          ops += ((i, e))
          i = e
        case _ => i += 1
      }
    }
    if (ops.isEmpty) return sql

    val starts = 0 +: ops.map(_._2).toVector
    val ends = ops.map(_._1).toVector :+ toks.length
    def hasTopLevel(from: Int, until: Int, words: Set[String]): Boolean = {
      var d = 0
      var k = from
      var found = false
      while (k < until) {
        toks(k) match {
          case Sym("(") => d += 1
          case Sym(")") => d -= 1
          case Word(w) if d == 0 && words(w.toLowerCase) => found = true
          case _ =>
        }
        k += 1
      }
      found
    }
    val sb = new StringBuilder
    for (b <- starts.indices) {
      val isLast = b == starts.length - 1
      val needs =
        if (isLast) finalBranchLocal &&
          hasTopLevel(starts(b), ends(b), Set("limit"))
        else hasTopLevel(starts(b), ends(b), Set("order", "limit"))
      var s = starts(b)
      var e = ends(b)
      while (s < e && toks(s).isInstanceOf[Space]) s += 1
      while (e > s && toks(e - 1).isInstanceOf[Space]) e -= 1
      if (b > 0) sb += ' '
      if (needs) sb += '('
      (s until e).foreach(k => sb ++= toks(k).text)
      if (needs) sb += ')'
      if (!isLast) {
        sb += ' '
        (ops(b)._1 until ops(b)._2).foreach(k => sb ++= toks(k).text)
      }
    }
    sb.result()
  }

  def rewrite(sql: String): String = rewrite(sql, finalSetOpBranchLocal = true)

  def rewrite(sql: String, finalSetOpBranchLocal: Boolean): String = {
    val toks = lex(sql)
    val out = new StringBuilder

    // Index of the next non-whitespace token at or after i, or -1.
    def skipWs(i: Int): Int = {
      var j = i
      while (j < toks.length && toks(j).isInstanceOf[Space]) j += 1
      if (j < toks.length) j else -1
    }

    var depth = 0
    // Paren depths of CAST(...) groups whose `AS <type>` we still expect.
    var castStack = List.empty[Int]
    // True when the next Word is a CAST target type to map.
    var mapNextType = false
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case Word(w) if mapNextType =>
          out ++= castTypes.getOrElse(w.toLowerCase, w)
          mapNextType = false
          i += 1

        case Word(w) if w.equalsIgnoreCase("cast") =>
          val p = skipWs(i + 1)
          out ++= w
          if (p >= 0 && toks(p).text == "(") castStack ::= (depth + 1)
          i += 1

        case Word(w)
            if w.equalsIgnoreCase("as") && castStack.nonEmpty &&
              castStack.head == depth =>
          castStack = castStack.tail
          mapNextType = true
          out ++= w
          i += 1

        case Word(w) if w.equalsIgnoreCase("limit") =>
          // Reference grammar `LIMIT offset, row_count` (sql_select_query
          // .py:78) → Spark `LIMIT row_count OFFSET offset`. Plain `LIMIT n`
          // passes through untouched.
          def digitRun(from: Int): Option[(String, Int)] = {
            var j = from
            val sb = new StringBuilder
            while (j < toks.length && (toks(j) match {
              case Sym(s) => s.length == 1 && s.charAt(0).isDigit
              case _ => false
            })) { sb ++= toks(j).text; j += 1 }
            if (sb.nonEmpty) Some((sb.result(), j)) else None
          }
          val r = for {
            p1 <- Option(skipWs(i + 1)).filter(_ >= 0)
            (off, a) <- digitRun(p1)
            p2 <- Option(skipWs(a)).filter(_ >= 0)
            if toks(p2).text == ","
            p3 <- Option(skipWs(p2 + 1)).filter(_ >= 0)
            (cnt, b) <- digitRun(p3)
          } yield (off, cnt, b)
          r match {
            case Some((off, cnt, next)) =>
              out ++= s"limit $cnt offset $off"
              i = next
            case None =>
              out ++= w
              i += 1
          }

        case Word(w) if w.equalsIgnoreCase("today") =>
          val p = skipWs(i + 1)
          val q = if (p >= 0) skipWs(p + 1) else -1
          if (p >= 0 && toks(p).text == "(" && q >= 0 && toks(q).text == ")") {
            out ++= "current_date()"
            i = q + 1
          } else { out ++= w; i += 1 }

        case Word(w) if w.equalsIgnoreCase("timestamp") =>
          // timestamp('d','t') → to_timestamp('d t'); anything else untouched.
          val p1 = skipWs(i + 1)
          val p2 = if (p1 >= 0) skipWs(p1 + 1) else -1
          val p3 = if (p2 >= 0) skipWs(p2 + 1) else -1
          val p4 = if (p3 >= 0) skipWs(p3 + 1) else -1
          val p5 = if (p4 >= 0) skipWs(p4 + 1) else -1
          val ok = p5 >= 0 &&
            toks(p1).text == "(" &&
            toks(p2).isInstanceOf[Quoted] && toks(p2).text.startsWith("'") &&
            toks(p3).text == "," &&
            toks(p4).isInstanceOf[Quoted] && toks(p4).text.startsWith("'") &&
            toks(p5).text == ")"
          if (ok) {
            val d = toks(p2).text.stripPrefix("'").stripSuffix("'")
            val t = toks(p4).text.stripPrefix("'").stripSuffix("'")
            out ++= s"to_timestamp('$d $t')"
            i = p5 + 1
          } else { out ++= w; i += 1 }

        case Sym("(") =>
          depth += 1
          out += '('
          i += 1

        case Sym(")") =>
          // A CAST whose AS never appeared at this depth (malformed) — drop it.
          if (castStack.nonEmpty && castStack.head == depth)
            castStack = castStack.tail
          depth -= 1
          out += ')'
          i += 1

        case t =>
          out ++= t.text
          i += 1
      }
    }
    parenthesizeSetOps(out.result(), finalSetOpBranchLocal)
  }
}
