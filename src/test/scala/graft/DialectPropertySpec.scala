package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions.col

import graft.operators.TextOps

/** Property-style invariants for the dialect pre-pass and text fingerprint,
  * over generated inputs (scalacheck Gen with a fixed seed — deterministic
  * CI, no scalatestplus bridge needed).
  */
class DialectPropertySpec extends SparkSpecBase {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val ident = Gen.oneOf("a", "b", "wind", "temp", "RH", "x1")
  private val pandasType = Gen.oneOf("int64", "int32", "int16", "float64",
    "float32", "object", "category", "bool", "datetime64")
  private val ansiType = Gen.oneOf("int", "bigint", "double", "string")

  private val dialectExpr: Gen[String] = Gen.oneOf(
    for { c <- ident; t <- pandasType } yield s"cast($c as $t)",
    Gen.const("today()"),
    Gen.const("now()"),
    Gen.const("timestamp('2020-01-02', '03:04:05')"),
    for { c <- ident } yield c)

  private val ansiExpr: Gen[String] = Gen.oneOf(
    for { c <- ident; t <- ansiType } yield s"cast($c as $t)",
    for { c <- ident } yield c,
    for { c <- ident } yield s"$c + 1",
    Gen.const("'a literal'"))

  private def queryOf(exprs: Gen[String]): Gen[String] = for {
    n <- Gen.choose(1, 4)
    es <- Gen.listOfN(n, exprs)
    tbl <- ident
    lim <- Gen.option(Gen.choose(1, 99))
  } yield s"select ${es.mkString(", ")} from $tbl" +
    lim.map(l => s" limit $l").getOrElse("")

  test("rewrite is idempotent over dialect-construct queries") {
    samples(queryOf(dialectExpr), 60).foreach { q =>
      val once = Dialect.rewrite(q)
      assert(Dialect.rewrite(once) == once, s"not idempotent for: $q")
    }
  }

  test("ANSI queries pass through the rewriter unchanged") {
    samples(queryOf(ansiExpr), 60).foreach { q =>
      assert(Dialect.rewrite(q, finalSetOpBranchLocal = false) == q,
        s"ANSI query altered: $q")
    }
  }

  test("dialect keywords inside string literals are never rewritten") {
    val tricky = Seq(
      "select 'cast(x as int64)' as s from t",
      "select 'today()' as s, a from t",
      "select 'timestamp(''a'', ''b'')' as s from t",
      "select 'limit 5, 10' as s from t")
    tricky.foreach { q =>
      assert(Dialect.rewrite(q, finalSetOpBranchLocal = false) == q,
        s"literal content altered: $q")
    }
  }

  test("adversarial quoting: literals keep dialect text verbatim at every position") {
    // Generated mixed queries: dialect constructs that MUST rewrite,
    // interleaved at random positions with string literals whose content
    // is exactly the dialect surface (including escaped-quote forms) and
    // MUST NOT. Each segment pairs with its expected rewrite, so the
    // whole-query expectation is exact, not just "unchanged somewhere".
    val segment: Gen[(String, String)] = Gen.oneOf(
      Gen.const("cast(a as int64)" -> "cast(a as bigint)"),
      Gen.const("today()" -> "current_date()"),
      Gen.const("'today()'" -> "'today()'"),
      Gen.const("'cast(x as int64)'" -> "'cast(x as int64)'"),
      Gen.const("'it''s today()'" -> "'it''s today()'"),
      Gen.const("''" -> "''"),
      Gen.const("'int64 '' cast('" -> "'int64 '' cast('"),
      Gen.const("'limit 5'" -> "'limit 5'"),
      for { c <- ident } yield c -> c)
    val mixed: Gen[(String, String)] = for {
      n <- Gen.choose(2, 6)
      segs <- Gen.listOfN(n, segment)
    } yield (s"select ${segs.map(_._1).mkString(", ")} from t",
      s"select ${segs.map(_._2).mkString(", ")} from t")
    samples(mixed, 120).foreach { case (q, want) =>
      val got = Dialect.rewrite(q, finalSetOpBranchLocal = false)
      assert(got == want, s"\nquery: $q\n want: $want\n  got: $got")
      assert(Dialect.rewrite(got, finalSetOpBranchLocal = false) == got,
        s"not idempotent after quoting mix: $q")
    }
  }

  test("fingerprint is invariant under internal-space runs and case") {
    import spark.implicits._
    val words = Gen.listOfN(5, Gen.oneOf("Data", "ROW", "x", "Yz", "q7"))
    val base = samples(words, 20).map(_.mkString(" "))
    val mangled = base.map { s =>
      s.toUpperCase.replace(" ", "   ")
    }
    val fps = (base ++ mangled).toDF("text")
      .select(TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0))
    val (a, b) = fps.splitAt(base.length)
    assert(a.toSeq == b.toSeq,
      "fingerprint changed under space-run/case mangling")
  }
}
