package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Ingest

class SourceSpec extends AnyFunSuite {
  import TestSpark._

  private val fmt = "graft.sources.v2.JiraFixtureSource"

  private def writeFixture(n: Int): String = {
    val dir = Files.createTempDirectory("graft-fixture")
    val payloads = Ingest.toWire(Tables.issues(spark, sf).orderBy("key").limit(n))
      .collect().map(_.getString(0))
    val f = dir.resolve("issues.jsonl")
    Files.write(f, payloads.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("DSv2 source pages the fixture: one partition per page of pageSize") {
    val path = writeFixture(250)
    val df = spark.read.format(fmt)
      .option("path", path).option("token", "t").option("pageSize", "100")
      .load()
    assert(df.count() == 250)
    assert(df.rdd.getNumPartitions == 3) // ceil(250/100) pages
    // fromWire recovers the issue records
    val issues = Ingest.fromWire(df)
    assert(issues.select("key").distinct().count() == 250)
    assert(issues.filter(col("project_key").isNull).count() == 0)
  }

  test("auth probe: missing or empty token fails at planning") {
    val path = writeFixture(5)
    val noToken = intercept[Exception] {
      spark.read.format(fmt).option("path", path).load().count()
    }
    assert(noToken.getMessage.contains("token"))
    val empty = intercept[Exception] {
      spark.read.format(fmt).option("path", path).option("token", " ").load().count()
    }
    assert(empty.getMessage.contains("credentials"))
  }

  test("reader-side rate limit still yields every row") {
    val path = writeFixture(30)
    val df = spark.read.format(fmt)
      .option("path", path).option("token", "t")
      .option("pageSize", "10").option("maxPerSecond", "1000")
      .load()
    assert(df.count() == 30)
  }

  test("typed model: asIssues lifts flat rows into Dataset[Issue]") {
    val typed = Ingest.asIssues(Tables.issues(spark, sf).limit(200)).cache()
    val issues = typed.collect()
    assert(issues.length == 200)
    val withEpic = issues.filter(_.relationships.exists(_.epic_link.isDefined))
    assert(withEpic.nonEmpty)
    assert(issues.forall(i => i.status.name.nonEmpty && i.assignee.email.contains("@")))
    // no-relationship issues collapse to None, not an empty struct
    val epics = issues.filter(i => i.issuetype == "Epic" && i.relationships.isEmpty)
    assert(epics.nonEmpty)
    // typed state round-trip through the IssueState encoder
    import spark.implicits._
    val st = graft.state.StateStore.fromIssues(
      Tables.issues(spark, sf).limit(10),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      .as[graft.model.IssueState].collect()
    assert(st.length == 10 && st.forall(_.sync_count == 1))
  }

  test("wire round-trip preserves values end to end") {
    val orig = Tables.issues(spark, sf).orderBy("key").limit(100).cache()
    val back = Ingest.fromWire(Ingest.toWire(orig)).cache()
    val cols = Seq("key", "project_key", "summary", "status_name", "priority",
      "issuetype", "epic_link", "parent_issue")
    val a = orig.select(cols.map(col): _*).orderBy("key").collect().map(_.toString)
    val b = back.select(cols.map(col): _*).orderBy("key").collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
