package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered queries, one per implemented operator (SURVEY.md §2). */
  private lazy val registry: Seq[GQuery] =
    Relational.all ++ Jql.all ++ Cdc.all ++ Epic.all ++ Sink.all ++
      Profiles.all ++ Misc.all ++ Graph.all ++
      pipeline.Dedup.all ++ pipeline.Similarity.all ++
      pipeline.TextAnalysis.all ++ pipeline.Multimodal.all ++
      pipeline.Curation.all ++ pipeline.Clustering.all ++
      pipeline.Tokenizer.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(g => g.name -> g.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  lazy val oracleSql: Map[String, String] =
    registry.flatMap(g => g.oracle.map(g.name -> _)).toMap
}
