package graft

import org.scalatest.funsuite.AnyFunSuite

class DialectSpec extends AnyFunSuite {

  test("cast type names map to Spark types") {
    assert(Dialect.rewrite("select cast(a as int64) from t") ==
      "select cast(a as bigint) from t")
    assert(Dialect.rewrite("select cast(a as OBJECT) from t") ==
      "select cast(a as string) from t")
    assert(Dialect.rewrite("select cast(a as float16) from t") ==
      "select cast(a as float) from t")
    assert(Dialect.rewrite("select cast(a as category) from t") ==
      "select cast(a as string) from t")
    assert(Dialect.rewrite("select cast(a as datetime64) from t") ==
      "select cast(a as timestamp) from t")
  }

  test("ANSI type names pass through") {
    val q = "select cast(a as bigint), cast(b as timestamp) from t"
    assert(Dialect.rewrite(q) == q)
  }

  test("nested casts map at each level") {
    assert(Dialect.rewrite("select cast(cast(a as int64) as object) from t") ==
      "select cast(cast(a as bigint) as string) from t")
  }

  test("type names inside string literals are untouched") {
    val q = "select 'int64 and today()' as s, cast(a as int64) from t"
    assert(Dialect.rewrite(q) ==
      "select 'int64 and today()' as s, cast(a as bigint) from t")
  }

  test("column named like a type is not rewritten outside cast") {
    val q = "select int64, object from t where category = 1"
    assert(Dialect.rewrite(q) == q)
  }

  test("AS alias outside cast is not a type position") {
    val q = "select a as object from t"
    assert(Dialect.rewrite(q) == q)
  }

  test("today() becomes current_date()") {
    assert(Dialect.rewrite("select today(), x from t") ==
      "select current_date(), x from t")
    // not a zero-arg call → untouched
    assert(Dialect.rewrite("select today from t") == "select today from t")
  }

  test("two-arg timestamp() collapses to to_timestamp") {
    assert(Dialect.rewrite("select timestamp('2019-01-01', '08:05:30')") ==
      "select to_timestamp('2019-01-01 08:05:30')")
  }

  test("timestamp literal and one-arg timestamp() are untouched") {
    val lit = "select timestamp '2019-01-01 00:00:00' from t"
    assert(Dialect.rewrite(lit) == lit)
    val one = "select timestamp('2019-01-01') from t"
    assert(Dialect.rewrite(one) == one)
  }

  test("quoted identifiers pass through") {
    val q = "select `weird col`, \"Other Col\" from t"
    assert(Dialect.rewrite(q) == q)
  }

  test("escaped quotes in string literals survive") {
    val q = "select 'it''s int64' from t"
    assert(Dialect.rewrite(q) == q)
  }

  test("set-op branches with own order by/limit get parenthesized") {
    assert(Dialect.rewrite(
      "select * from t order by w desc limit 5 union select * from t order by w asc limit 3") ==
      "(select * from t order by w desc limit 5) union (select * from t order by w asc limit 3)")
    // plain set ops untouched
    assert(Dialect.rewrite("select a from t union all select a from u") ==
      "select a from t union all select a from u")
    // trailing whole-result ORDER BY stays global (last branch unwrapped)
    assert(Dialect.rewrite("select a from t union select a from u order by a") ==
      "select a from t union select a from u order by a")
    // subquery set ops (depth > 0) untouched
    val sub = "select * from (select a from t limit 2 union select a from u limit 2) s"
    assert(Dialect.rewrite(sub) ==
      "select * from (select a from t limit 2 union select a from u limit 2) s")
    // except/intersect spellings, middle branch of three
    assert(Dialect.rewrite(
      "select a from t limit 1 except select a from u limit 2 intersect select a from v") ==
      "(select a from t limit 1) except (select a from u limit 2) intersect select a from v")
  }
}
