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

  test("upsertEdges deletes changed issues' stale edges across all partitions") {
    import spark.implicits._
    val path = s"${Files.createTempDirectory("graft-edges")}/relationships"
    def edf(rows: (String, String, String, String, String)*) =
      rows.toDF("src", "link_type", "direction", "dst", "project_key")
    Ingest.writeEdges(edf(
      ("P1-1", "epic", "outward", "E-1", "P1"),
      ("P1-1", "blocks", "outward", "P1-9", "P1"),
      ("P1-2", "epic", "outward", "E-1", "P1"),
      ("P2-1", "epic", "outward", "E-2", "P2")), path)
    // P1-1's link changed type epic→parent (old rows live in partitions the
    // new batch doesn't touch); P1-2's links were ALL removed (absent from
    // the batch entirely) — both must lose their old rows
    Ingest.upsertEdges(
      edf(("P1-1", "parent", "outward", "E-1", "P1")),
      Seq(("P1-1", "P1"), ("P1-2", "P1")).toDF("key", "project_key"), path)
    val after = spark.read.parquet(path)
      .select("src", "link_type", "dst").as[(String, String, String)]
      .collect().toSet
    assert(after == Set(("P1-1", "parent", "E-1"), ("P2-1", "epic", "E-2")))
    // the partition the batch emptied is physically dropped
    assert(!new java.io.File(s"$path/project_key=P1/link_type=blocks").exists())
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
