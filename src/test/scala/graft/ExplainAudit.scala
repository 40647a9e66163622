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
}
