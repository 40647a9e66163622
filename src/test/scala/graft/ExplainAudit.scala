package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression suite: every registered query must keep the physical
  * plan properties that make it viable at scale — no cartesian products
  * (1-row broadcast NLJ excepted), pushed filters on selective scans, top-k
  * folded to TakeOrderedAndProject.
  */
class ExplainAudit extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("no query plans a CartesianProduct") {
    SparkEntry.queries.keys.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n${p.take(2000)}")
    }
  }

  test("selective scans push filters into parquet") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(!p.contains("l_comment"), "q02 reads columns it doesn't need")
  }

  test("top-k queries fold to TakeOrderedAndProject") {
    assert(plan("pipe_ann_brute").contains("TakeOrderedAndProject"))
    assert(plan("q03_shipping_priority").contains("TakeOrderedAndProject"))
  }

  test("JQL membership joins are hash joins, not nested loops") {
    val p = plan("jql_epic_members")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("broadcast NLJ appears only with a literal 1-row build side") {
    // pipe_ann_brute crossJoins a single query vector — the one sanctioned NLJ
    val p = plan("pipe_ann_brute")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("minhash signatures aggregate wide: no explode feeds the doc exchange") {
    // the 16 min-hashes come from ONE map-side-combinable HashAggregate —
    // a Generate (explode) between the shingle scan and the doc_id exchange
    // would mean the 16× row blowup is shuffled instead of combined
    val p = plan("pipe_dedup_minhash")
    val firstExchange = p.indexOf("Exchange hashpartitioning(doc_id")
    assert(firstExchange > 0, s"expected a doc_id exchange:\n${p.take(2000)}")
    val partialAgg = p.lastIndexOf("HashAggregate", firstExchange)
    assert(partialAgg > 0, "expected a partial aggregate below the exchange")
    assert(!p.substring(partialAgg).contains("Generate explode(sequence"),
      "per-seed explode leaked below the signature aggregation")
  }

  test("stateful CDC plans a grouped-state operator, enrichment is a hash join") {
    // batch mode lowers flatMapGroupsWithState to MapGroups (empty state);
    // the streaming plan's FlatMapGroupsWithStateExec is pinned by StreamSpec
    val sp = plan("stream_stateful_changes")
    assert(sp.contains("MapGroups") || sp.contains("FlatMapGroupsWithState"))
    val p = plan("cdc_state_enrich")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }
}
