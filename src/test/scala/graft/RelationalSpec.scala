package graft

import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

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

  test("links edge table joins back to issues (J2 semantics)") {
    import org.apache.spark.sql.functions._
    val links = Tables.links(spark, sf)
    val iss = Tables.issues(spark, sf)
    // every src edge must resolve to an existing issue
    val dangling = links.join(iss, links("src") === iss("key"), "left_anti").count()
    assert(dangling == 0)
  }
}
