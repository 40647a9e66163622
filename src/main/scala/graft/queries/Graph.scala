package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.Oracle

/** Graph analytics over the issue-link edge table: connected components by
  * iterative min-label propagation. The reference's graph is its symlink
  * forest (reference: pkg/links/links.go:31-95); component discovery is the
  * generalization of its broken-link/hierarchy walks to whole-graph
  * structure — the standard precursor to cluster-level dedup and blast-radius
  * analysis.
  *
  * The operator runs a FIXED number of propagation rounds (k = 5), which the
  * oracle replays exactly as k chained CTEs — bit-identical cross-engine
  * whether or not the graph has converged. Each round is one shuffle join
  * (labels re-keyed by neighbor) + one min-aggregate, i.e. O(k·|E|) total
  * work, never a transitive closure (which is O(Σ|component|²) rows and
  * infeasible on a 100 TB hub-dense graph). At real scale the same loop gets
  * a convergence check (count of changed labels per round — one extra
  * aggregate) or the large-star/small-star contraction; the bounded form is
  * what's hash-checkable.
  */
object Graph {

  private val rounds = 5

  /** Adjacency including self-loops, both directions, deduped. The
    * `blocks`-within-P1 slice keeps the demo graph bounded (both predicates
    * push into the scans); the plan shape is slice-independent.
    */
  private def adj(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.links(s, dir)
      .filter(col("link_type") === "blocks" && col("project_key") === "P1")
      .select(col("src").as("a"), col("dst").as("b"))
    val und = e.union(e.select(col("b").as("a"), col("a").as("b"))).distinct()
    und.union(und.select(col("a"), col("a").as("b")).distinct())
  }

  private val components = {
    val undSql =
      """und AS (
        |  SELECT DISTINCT src AS a, dst AS b FROM (
        |    SELECT src, dst FROM links
        |    WHERE link_type = 'blocks' AND project_key = 'P1'
        |    UNION ALL
        |    SELECT dst, src FROM links
        |    WHERE link_type = 'blocks' AND project_key = 'P1'))""".stripMargin
    val adjSql =
      """adj AS (
        |  SELECT a, b FROM und
        |  UNION ALL
        |  SELECT DISTINCT a, a AS b FROM und)""".stripMargin
    val l0 = "l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM und)"
    val steps = (1 to rounds).map { i =>
      s"""l$i AS (
         |  SELECT adj.a AS node, min(p.lbl) AS lbl
         |  FROM adj JOIN l${i - 1} p ON p.node = adj.b
         |  GROUP BY adj.a)""".stripMargin
    }.mkString(",\n")
    q("graph_components",
      s"""WITH ${Oracle.linksCte},
         |$undSql,
         |$adjSql,
         |$l0,
         |$steps
         |SELECT sz AS n_members, count(*) AS n_labels,
         |  min(lbl) AS sample_label
         |FROM (SELECT lbl, count(*) AS sz FROM l$rounds GROUP BY lbl)
         |GROUP BY sz ORDER BY sz""".stripMargin) { (s, dir) =>
      // cache() the adjacency: it feeds all 5 rounds (plus l0), and without
      // it each round re-derives the links join. Left cached for the session
      // like Epic's hierarchy seed — Spark evicts LRU under pressure.
      val a = adj(s, dir).cache()
      var labels = a.select(col("a").as("node")).distinct()
        .select(col("node"), col("node").as("lbl"))
      (1 to rounds).foreach { _ =>
        labels = a.join(labels.withColumnRenamed("node", "b"), Seq("b"))
          .groupBy(col("a").as("node"))
          .agg(min(col("lbl")).as("lbl"))
      }
      labels.groupBy("lbl").agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("n_members"))
        .agg(count(lit(1)).as("n_labels"), min(col("lbl")).as("sample_label"))
        .orderBy("n_members")
    }
  }

  val all: Seq[GQuery] = Seq(components)
}
