package graft

import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("driver contract: entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      "every registered query must have an oracle")
  }

  test("every registered query runs on sf0.001 and has stable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("q01 aggregates match hand-computed values on sf0.001") {
    val rows = SparkEntry.queries("q01_pricing_summary")(spark, sf).collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val li = Tables.t(spark, sf, "lineitem")
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <=
        org.apache.spark.sql.functions.lit("1998-09-02 00:00:00").cast("timestamp"))
    assert(total == li.count())
  }

  test("semi and anti joins partition the orders universe") {
    import org.apache.spark.sql.functions._
    val o = Tables.t(spark, sf, "orders")
    val big = Tables.t(spark, sf, "lineitem").filter(col("l_quantity") >= 49)
      .select("l_orderkey")
    val semi = o.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi").count()
    val anti = o.join(big, col("o_orderkey") === col("l_orderkey"), "left_anti").count()
    assert(semi + anti == o.count())
  }

  test("derived issues table keys match the reference issue-key regex") {
    import org.apache.spark.sql.functions._
    val iss = Tables.issues(spark, sf)
    val bad = iss.filter(!col("key").rlike("^[A-Z][A-Z0-9]*(-[A-Z0-9]+)*-\\d+$")).count()
    assert(bad == 0)
    assert(iss.count() == Tables.t(spark, sf, "orders").count())
  }

  test("hierarchy levels truncate at MaxDepth on a deep synthetic chain") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // chain K0 <- K1 <- ... <- K7 (7 levels below the root)
    val chain = (0 to 7).map(i =>
      (s"K-$i", if (i == 0) null else s"K-${i - 1}")).toDF("key", "parent_issue")
    val roots = chain.filter(col("parent_issue").isNull)
      .select(col("key"), lit(0).as("level"))
    var frontier = roots
    var all = roots
    for (d <- 1 to 5) { // the engine's MaxDepth bound (reference: pkg/epic/analyzer.go:99-108)
      frontier = chain
        .join(frontier.select(col("key").as("pkey")), col("parent_issue") === col("pkey"))
        .select(col("key"), lit(d).as("level"))
      all = all.union(frontier)
    }
    val levels = all.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(levels("K-0") == 0 && levels("K-5") == 5)
    assert(!levels.contains("K-6") && !levels.contains("K-7")) // truncated
  }

  test("links edge table joins back to issues (J2 semantics)") {
    import org.apache.spark.sql.functions._
    val links = Tables.links(spark, sf)
    val iss = Tables.issues(spark, sf)
    // every src edge must resolve to an existing issue
    val dangling = links.join(iss, links("src") === iss("key"), "left_anti").count()
    assert(dangling == 0)
  }

  test("as-of join: inclusive latest-preceding match, left-outer, single sweep") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      ("u1", t("2024-01-01 10:00:00"), "p1"),
      ("u1", t("2024-01-01 12:00:00"), "p2"),
      ("u2", t("2024-01-01 09:00:00"), "p3") // no preceding right row
    ).toDF("uid", "ts", "pid")
    val right = Seq(
      ("u1", t("2024-01-01 09:30:00"), "v1"),
      ("u1", t("2024-01-01 10:00:00"), "v2"), // equal ts: inclusive, wins over v1
      ("u1", t("2024-01-01 11:00:00"), "v3"),
      ("u2", t("2024-01-01 09:30:00"), "v4") // after p3 — must not match
    ).toDF("uid", "vts", "vid")
    val out = graft.operators.Asof
      .join(left, right, Seq("uid"), "ts", "vts", rightPrefix = "")
      .select("pid", "vid").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("p1" -> "v2", "p2" -> "v3", "p3" -> null))
    // plan shape: one window sweep over the union — no range/nested-loop join
    val p = graft.operators.Asof
      .join(left, right, Seq("uid"), "ts", "vts").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("RunningWindowFunction") || p.contains("Window"))
  }

  test("range join: exact interval membership incl. sub-second boundaries") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(("p1", t("2024-01-01 10:00:00.500")),
      ("p2", t("2024-01-01 12:00:00.0"))).toDF("pid", "ts")
    val right = Seq(
      ("r1", t("2024-01-01 09:55:00.500")), // exactly lower bound of p1 → in
      ("r2", t("2024-01-01 09:55:00.499")), // 1ms before the bound → out
      ("r3", t("2024-01-01 10:00:00.500")), // exactly upper bound of p1 → in
      ("r4", t("2024-01-01 10:00:00.501")), // just after → out
      ("r5", t("2024-01-01 11:59:00.0"))    // inside p2's window
    ).toDF("rid", "rts")
    val pairs = graft.operators.RangeJoin
      .intervalJoin(left, right, "ts", "rts", -300L, 0L)
      .select("pid", "rid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("p1", "r1"), ("p1", "r3"), ("p2", "r5")))
    val p = graft.operators.RangeJoin
      .intervalJoin(left, right, "ts", "rts", -300L, 0L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }
}
