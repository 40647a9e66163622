package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Misc

/** Hygiene for the memoized footer-stats sessions (`Misc.statsSession`):
  * a long-lived driver can host several SparkSessions (one per tenant /
  * notebook), and each must get its OWN derived stats session — sharing one
  * would let a tenant's conf drift (or catalog state) leak into another's
  * metadata queries.
  */
class StatsSessionSpec extends AnyFunSuite {
  import TestSpark._

  test("two parent sessions get independent, memoized stats sessions") {
    val p1 = spark.newSession()
    val p2 = spark.newSession()

    val s1 = Misc.statsSession(p1)
    val s2 = Misc.statsSession(p2)
    assert(!(s1 eq s2), "parents must not share a stats session")
    assert(s1 eq Misc.statsSession(p1), "stats session must be memoized")
    assert(s2 eq Misc.statsSession(p2), "stats session must be memoized")
    // both carry the footer-pushdown profile
    assert(s1.conf.get("spark.sql.parquet.aggregatePushdown") == "true")
    assert(s2.conf.get("spark.sql.parquet.aggregatePushdown") == "true")
  }

  test("conf drift does not leak across stats sessions or back to parents") {
    val p1 = spark.newSession()
    val p2 = spark.newSession()
    val s1 = Misc.statsSession(p1)
    val s2 = Misc.statsSession(p2)

    // drift one stats session: its sibling and both parents must not move
    s1.conf.set("spark.sql.parquet.aggregatePushdown", "false")
    s1.conf.set("graft.test.drift", "s1")
    assert(s2.conf.get("spark.sql.parquet.aggregatePushdown") == "true")
    assert(s2.conf.getOption("graft.test.drift").isEmpty)
    assert(p1.conf.getOption("graft.test.drift").isEmpty)

    // the stats session's V2-reader override must not infect the parent:
    // the rest of the engine pins V1 plan shapes
    assert(p1.conf.get("spark.sql.sources.useV1SourceList") != "",
      "stats session's empty V1 list leaked into the parent")
    assert(p2.conf.get("spark.sql.sources.useV1SourceList") != "")

    // and parent drift after memoization must not reach the stats session
    p2.conf.set("graft.test.parent.drift", "p2")
    assert(s2.conf.getOption("graft.test.parent.drift").isEmpty)
  }

  test("stats queries through different parents agree on the data") {
    val p1 = spark.newSession()
    val p2 = spark.newSession()
    val a = Misc.tableStatsDf(p1, sf).orderBy("table_name").collect()
    val b = Misc.tableStatsDf(p2, sf).orderBy("table_name").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty && a.forall(_.getLong(1) > 0))
  }
}
