package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof of the SCALING.md claim that the issues⨝state CDC merge can run
  * exchange-free when both sides are bucketed by the join key — the cluster
  * deployment shape for the state table.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed issues and state join without a shuffle exchange") {
    // tables land in the default warehouse dir (spark-warehouse/, gitignored);
    // clear catalog entries AND stray locations from aborted runs
    Seq("b_issues", "b_state").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc))
        java.nio.file.Files.walk(loc)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }

    val issues = Tables.issues(spark, sf)
    val n = issues.count()
    issues.write.bucketBy(8, "key").sortBy("key")
      .mode("overwrite").saveAsTable("b_issues")
    graft.state.StateStore
      .fromIssues(issues, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      .write.bucketBy(8, "key").sortBy("key")
      .mode("overwrite").saveAsTable("b_state")

    val joined = spark.table("b_issues").join(
      spark.table("b_state").select(col("key"), col("last_synced")), Seq("key"))
    val plan = joined.queryExecution.executedPlan.toString

    // co-located: the join consumes both bucketed scans with no repartition
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${plan.take(1500)}")
    assert(joined.count() == n)

    // control: the same join over non-bucketed data DOES shuffle (or
    // broadcasts at this size) — bucketing is what removed the exchange
    val unbucketed = issues.join(
      graft.state.StateStore
        .fromIssues(issues, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
        .select(col("key"), col("last_synced")), Seq("key"))
    val controlPlan = unbucketed.queryExecution.executedPlan.toString
    assert(controlPlan.contains("Exchange") || controlPlan.contains("Broadcast"))
  }

  test("meta_bucketed_join card consumes bucketed scans with no join-key exchange") {
    val df = SparkEntry.queries("meta_bucketed_join")(spark, sf)
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    // the downstream groupBy(c_mktsegment) may exchange on the GROUP key;
    // the JOIN keys must never be re-shuffled — bucketing already placed them
    assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
      !plan.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed card join still shuffles its keys:\n${plan.take(2000)}")
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      s"scan does not report bucket pruning metadata:\n${plan.take(2000)}")
  }

  test("bucketedJoin retirement: recent lazy frames survive, old runs reclaim disk") {
    import scala.jdk.CollectionConverters._
    val fn = SparkEntry.queries("meta_bucketed_join")
    // hold the frames LAZY across many executions — the realistic notebook /
    // retried-stage lifetime the old 2-run retirement window broke
    val frames = (1 to 10).map(_ => fn(spark, sf))
    // a frame from several runs back must still collect (depth >= 8 runs)
    assert(frames(5).collect().nonEmpty, "a 5-runs-old frame lost its tables")
    assert(frames.last.collect().nonEmpty)
    // retirement bounds BOTH the catalog and the disk: at most keep-depth+1
    // runs of 2 tables each stay registered, and retired runs' external
    // parquet dirs are deleted (dropping an external table alone leaks them)
    val live = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_bkt_"))
    assert(live.length <= 2 * 9, s"catalog holds ${live.length} bucketed tables")
    val dirs = java.nio.file.Files.list(graft.Caches.scratchRoot)
      .iterator().asScala.count(_.getFileName.toString.startsWith("bucketed-join"))
    assert(dirs <= 9, s"$dirs bucketed-join scratch dirs survived retirement")
  }
}
