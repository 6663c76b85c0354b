package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression tests: the scale properties the engine is
  * designed around, asserted on the real sf0.001 testdata so a refactor
  * that silently degrades a plan (lost pushdown, a cartesian fallback, a
  * single-task window) fails CI instead of surfacing at cluster scale.
  */
class PlanSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(FormattedMode)
  }

  test("global sweep: no query falls back to cartesian/nested-loop joins") {
    // Cross joins are the operator under test for j5/j6/j7 and the tiny
    // broadcast combo-grid drivers (blocked cosine/jaccard, s4's 1-row
    // query-vector broadcast) are cartesian BY DESIGN — bounded fan-out of
    // a broadcast side, not an O(n²) row blowup.
    val intentional = Set("j5_cross", "j6_implicit_cross", "j7_self_cross",
      "d5_dedup_embedding", "d3_dedup_jaccard", "d7_dedup_clusters",
      "s4_hybrid_search", "x5_leakage_safe_split")
    // BNLJ additionally tolerated where the broadcast side is BOUNDED by
    // design — a scalar subquery result (1×n "join" = a map) or brute ANN's
    // fixed query batch scored against every corpus row (the operator's
    // exactness contract).
    val scalarBroadcast = Set("q4_scalar_subquery", "h6_forecast_revenue",
      "t13_tfidf_search", "s1_ann_brute", "s5_ann_pq", "s6_ann_pq_index",
      // Oracle-invariant attestation queries (round-10 upgrades, split
      // into *b companions round 11): their result frame is a cross of
      // SINGLE-ROW aggregates (violation counters) — a 1×1 product, not
      // a row blowup.
      "a14_approx_distinct", "s9_ann_ivf_deleted",
      "s2_ann_lsh", "s3_ann_ivf", "x7b_export_invariants",
      "s6b_pq_index_parity", "d11b_ivf_pair_invariants",
      "a19b_approx_percentile_bounds", "t7b_rolling_fp_invariants",
      "t18b_bpe_train_invariants", "t22b_unigram_invariants")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(intentional)
      .flatMap { name =>
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(s"$name: CartesianProduct")
        else if (plan.contains("BroadcastNestedLoopJoin") &&
            !scalarBroadcast(name)) Some(s"$name: BroadcastNestedLoopJoin")
        else None
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("filters and projection reach the parquet scan") {
    val p = planOf("f1_compare")
    assert(p.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(p.contains("GreaterThan(l_quantity,10.0)"), "range filter not pushed")
    // Only the two projected + filtered columns are read, not all 11.
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_shipdate"), s"unpruned column read: $read")
  }

  test("dimension join broadcasts; no shuffle of both sides") {
    val p = planOf("j1_inner")
    assert(p.contains("BroadcastHashJoin"), "dimension join did not broadcast")
    assert(!p.contains("SortMergeJoin"), "unexpected sort-merge for dim join")
  }

  test("order by + limit lowers to TakeOrderedAndProject") {
    val p = planOf("o3_topk")
    assert(p.contains("TakeOrderedAndProject"), "top-k not lowered")
  }

  test("grouped top-k plans with WindowGroupLimit") {
    val p = planOf("w7_topk_per_group")
    assert(p.contains("WindowGroupLimit"), "rank filter not pushed into window")
  }

  test("aggregation partial-aggregates before the exchange") {
    val p = planOf("a8_groupby_agg")
    assert(p.contains("partial_sum") || p.contains("partial_avg") ||
      p.contains("partial_count"), "no map-side partial aggregation")
  }

  test("keyless range join never falls back to nested-loop/cartesian") {
    val p = planOf("e5_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join fell back to a non-equi plan")
  }

  test("as-of join is one window over a union, not a join explosion") {
    val p = planOf("e4_asof_join")
    assert(p.contains("Window"), "as-of join lost its window shape")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of join fell back to a non-equi plan")
  }

  test("repetition signals partial-aggregate at both levels") {
    val p = planOf("t14_repetition_signals")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "gram/doc aggregation lost its map-side combine")
  }

  test("domain mixture is a narrow map: bucket filter pushed to the scan") {
    val p = planOf("x3_domain_mixture")
    // No shuffle except the final presentation sort. FormattedMode prints
    // each node in the tree AND the details list — count detail headers.
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges <= 1, s"expected only the output sort exchange:\n$p")
  }

  test("pii scrub is a narrow map: no shuffle except the output sort") {
    val p = planOf("t21_pii_redact")
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges <= 1, s"expected only the output sort exchange:\n$p")
  }

  test("tokenized export shuffles docs and packs, never token rows") {
    val p = planOf("x7_tokenized_export")
    // Doc-level shard window + pack groupBy + presentation sort — three
    // exchanges, all carrying doc/pack rows with the token ids INSIDE
    // array payloads (the explode fans out one row per overlapped pack,
    // not per token).
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges <= 3, s"token-level rows leaked into a shuffle:\n$p")
    // The vocab is a model-bounded map LITERAL compiled into the
    // projection — the whole export plans without any join.
    assert(!p.contains("Join"), s"vocab mapping should not be a join:\n$p")
  }

  test("contamination check plans a left-semi gram join, no pair blowup") {
    val p = planOf("d9_contamination")
    assert(p.contains("LeftSemi"),
      "val-grams vs train-grams should be a left-semi join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "gram join fell back to a non-equi plan")
  }

  test("distributed percentile plans hash aggregates, not group buffers") {
    val plan = SparkEntry.queries("a17b_percentile_dist")(spark, dir)
      .queryExecution.executedPlan.toString
    // The whole point of a17b vs a17: no ObjectHashAggregate holding every
    // group value in its buffer — distinct-value HashAggregates + a
    // per-group window only.
    assert(!plan.contains("ObjectHashAggregate"),
      "group-buffering aggregate in the distributed percentile plan")
    assert(plan.contains("HashAggregate"), "expected hash aggregation")
  }

  test("sketch dedup computes map-side: no shuffle before the bucket join") {
    val p = planOf("d2_dedup_minhash")
    // The minhash signature expression must appear in a Project (map-side),
    // not after an Exchange-fed aggregate.
    assert(p.contains("graft_minhash") || p.contains("minhash"),
      "native minhash kernel missing from the plan")
  }

  test("h21 exists/not-exists pair decorrelates to one semi + one anti join") {
    val plan = SparkEntry.queries("h21_waiting_supplier")(spark, dir)
      .queryExecution.executedPlan.toString
    // Both correlated subqueries must plan as joins on l_orderkey — a
    // per-row re-execution (subquery inside a Filter) would scan lineitem
    // once per probe row at cluster scale.
    assert(plan.contains("LeftSemi"), "EXISTS did not plan as a left-semi join")
    assert(plan.contains("LeftAnti"), "NOT EXISTS did not plan as a left-anti join")
    assert(!plan.contains("CartesianProduct"), "correlation fell back to cartesian")
  }

  test("h17 correlated scalar aggregate decorrelates to an aggregate + join") {
    val plan = SparkEntry.queries("h17_small_quantity")(spark, dir)
      .queryExecution.executedPlan.toString
    // The per-part avg(l_quantity) threshold must be computed once by an
    // aggregate joined back on partkey, not re-evaluated per outer row.
    assert(plan.contains("HashAggregate"), "expected a decorrelated aggregate")
    assert(!plan.toLowerCase.contains("scalar-subquery"),
      "correlated subquery survived into the physical plan")
  }
}
