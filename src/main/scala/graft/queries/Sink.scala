package graft.queries


import org.apache.spark.sql.functions._

import graft.{Oracle, Tables}
import graft.sink.Yaml

/** Sink round-trip operator (SURVEY.md §2.1 S6/S7): a bounded, deterministic
  * slice of the issues table is written out as one YAML file per issue and
  * read back through the YAML source; the oracle checks the surviving
  * projection against the original rows. The slice is capped by key suffix so
  * file count stays constant across scale factors.
  */
object Sink {

  /** Shared roundtrip body for the flat and range-block-sharded layouts —
    * the ORACLE is identical because the layout must be invisible to readers
    * (key identity lives in the document, not the path).
    */
  private def yamlRoundtrip(s: org.apache.spark.sql.SparkSession, dir: String,
      sharded: Boolean): org.apache.spark.sql.DataFrame = {
    // slice FIRST, then enrich: withRelationships semi-join-prunes both
    // aggregations to the slice's keys (subtask children still drawn from
    // the full table via allIssues), so the enrichment work is
    // slice-proportional instead of corpus-proportional
    val issues = Tables.issues(s, dir)
    val slice = Yaml.withRelationships(
      issues.filter(col("project_key") === "P1" &&
        expr("cast(element_at(split(key, '-'), 2) as int) < 2000")),
      Tables.links(s, dir), allIssues = issues)
    val repo = graft.Caches.scratchDir("yaml-rt").toString
    Yaml.writeIssues(slice, repo, sharded)
    Yaml.readIssues(s, repo)
      .select(col("key"), col("project_key"), col("summary"), col("status_name"),
        col("priority"), col("issuetype"),
        date_format(col("created"), "yyyy-MM-dd HH:mm:ss").as("created_s"),
        date_format(col("updated"), "yyyy-MM-dd HH:mm:ss").as("updated_s"),
        coalesce(col("epic_link"), lit("")).as("epic_link"),
        coalesce(col("parent_issue"), lit("")).as("parent_issue"),
        array_join(col("subtasks"), ",").as("subtasks_s"),
        array_join(expr(
          "transform(issue_links, l -> concat(l.link_type, '|', l.direction, '|', l.issue_key))"),
          ";").as("links_s"))
      .orderBy("key")
  }

  private val roundtripOracle: String = Oracle.withIssuesAndLinks(
      """, sub AS (
        |  SELECT parent_issue AS pkey, string_agg(key, ',' ORDER BY key) AS subtasks_s
        |  FROM issues WHERE parent_issue IS NOT NULL GROUP BY parent_issue),
        |lnk AS (
        |  SELECT src AS lkey,
        |    string_agg(link_type || '|' || direction || '|' || dst, ';'
        |      ORDER BY link_type, direction, dst) AS links_s
        |  FROM links GROUP BY src)
        |SELECT key, project_key, summary, status_name, priority, issuetype,
        |  strftime(created, '%Y-%m-%d %H:%M:%S') AS created_s,
        |  strftime(updated, '%Y-%m-%d %H:%M:%S') AS updated_s,
        |  coalesce(epic_link, '') AS epic_link,
        |  coalesce(parent_issue, '') AS parent_issue,
        |  coalesce(sub.subtasks_s, '') AS subtasks_s,
        |  coalesce(lnk.links_s, '') AS links_s
        |FROM issues
        |LEFT JOIN sub ON sub.pkey = issues.key
        |LEFT JOIN lnk ON lnk.lkey = issues.key
        |WHERE project_key = 'P1' AND string_split(key, '-')[2]::INT < 2000
        |ORDER BY key""".stripMargin)

  private val roundtrip = q("sink_yaml_roundtrip", roundtripOracle) {
    (s, dir) => yamlRoundtrip(s, dir, sharded = false)
  }

  /** The sharded layout through the SAME oracle: proves the tree-floor
    * lever ([[Yaml.shardSeg]], SCALING_MEASURED.md round 13) is invisible
    * to every reader — identical rows, hashes, and schema out of a corpus
    * fanned into `issues/{suffix div 8192}/` range-block directories
    * (md5[0:2] only as the non-numeric-key fallback).
    */
  private val roundtripSharded = q("sink_yaml_roundtrip_sharded",
    roundtripOracle) {
    (s, dir) => yamlRoundtrip(s, dir, sharded = true)
  }

  /** JSONL corpus round-trip — the interchange format every training
    * framework actually consumes: write the documents table as
    * newline-delimited JSON (AQE-rebalanced so file sizes track the
    * advisory target, same small-files discipline as the parquet corpus
    * writer), read it back through an EXPLICIT schema (inference on JSONL
    * is a second corpus pass and nondeterministic on empty slices), and
    * check full fidelity against the source rows. What this pins is the
    * escaping path: quotes, newlines, unicode, and backslashes in `text`
    * must survive write→read bit-for-bit, which is exactly where ad-hoc
    * JSONL writers corrupt a corpus.
    */
  private val jsonlRoundtrip = q("sink_jsonl_roundtrip",
    """SELECT doc_id, text, lang, source, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.t(s, dir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val path = graft.Caches.scratchDir("jsonl-rt").toString + "/docs"
    docs.hint("rebalance").write.mode("overwrite").json(path)
    s.read.schema(docs.schema).json(path).orderBy("doc_id")
  }

  /** Hive-partitioned corpus layout: write documents `partitionBy(source,
    * lang)`, read back with a predicate on both partition columns — the
    * layout every multi-source corpus store uses so that per-source reads
    * (mixing, drift, decontamination against one benchmark source) touch
    * only their directories. The oracle pins the surviving rows; the PLAN
    * proof that the scan touches only the matching partition directories
    * (partition pruning, not post-scan filtering) is SinkSpec's job — a
    * result can't show it.
    *
    * `partitionBy` moves the partition columns into directory names, so the
    * written files hold only the remaining columns and read-back
    * reconstructs source/lang from the path — the round trip also proves
    * that reconstruction.
    */
  private val partitionedPrune = q("sink_partitioned_prune",
    """SELECT doc_id, n_chars, lang, source
      |FROM documents WHERE source = 'src7' AND lang = 'en'
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.t(s, dir, "documents")
      .select("doc_id", "n_chars", "lang", "source")
    val path = graft.Caches.scratchDir("part-prune").toString + "/docs"
    // repartition BY THE PARTITION COLUMNS with a pinned partition count
    // (guide §6: cluster data by partition key before a partitioned write).
    // The previous keyless rebalance let AQE coalesce the sub-advisory
    // shuffle to ONE task, which then wrote every (source, lang) directory
    // serially — a 2.6 s single-task stage in the profile. Keyed, each task
    // writes its own few directories in parallel and still one file per
    // directory; the count stays the session's shuffle-partition setting
    // (conf-driven — the same value at cluster scale), pinned explicitly so
    // AQE cannot re-coalesce a deliberately CPU/IO-parallel exchange.
    docs.repartition(s.sessionState.conf.numShufflePartitions,
        col("source"), col("lang"))
      .write.mode("overwrite")
      .partitionBy("source", "lang").parquet(path)
    s.read.parquet(path)
      .filter(col("source") === "src7" && col("lang") === "en")
      .select("doc_id", "n_chars", "lang", "source")
      .orderBy("doc_id")
  }

  /** Schema evolution on the corpus store: an early batch written WITHOUT a
    * column, a later batch written WITH it, one `mergeSchema` read over
    * both — old rows surface the new column as NULL, new rows carry it, and
    * nothing is rewritten. This is how a 100 TB parquet corpus grows a
    * field in practice (a quality score added in month 6): rewriting
    * history is off the table, so the READ path must reconcile the
    * generations — and the NULL/value split must be exactly the write
    * boundary, which the oracle pins per row.
    */
  private val schemaEvolution = q("sink_schema_evolution",
    """SELECT doc_id, source, n_chars,
      |  CASE WHEN doc_id % 2 = 1 THEN lang END AS lang_v2
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.t(s, dir, "documents")
      .select("doc_id", "source", "n_chars", "lang")
    val path = graft.Caches.scratchDir("schema-evo").toString + "/docs"
    // generation 1: even doc_ids, no lang column yet
    docs.filter(col("doc_id") % 2 === 0).drop("lang")
      .hint("rebalance").write.mode("overwrite").parquet(path)
    // generation 2: odd doc_ids, schema grew a column — plain append
    docs.filter(col("doc_id") % 2 === 1)
      .withColumnRenamed("lang", "lang_v2")
      .hint("rebalance").write.mode("append").parquet(path)
    s.read.option("mergeSchema", "true").parquet(path)
      .select("doc_id", "source", "n_chars", "lang_v2")
      .orderBy("doc_id")
  }

  /** CSV corpus round-trip — the other interchange format that refuses to
    * die: write the documents table as quoted CSV (AQE-rebalanced like the
    * JSONL writer), read it back through an explicit schema with quote
    * handling on, and check full fidelity. What this pins is the CSV
    * quoting path: commas, double quotes (doubled per RFC 4180), and
    * leading/trailing spaces in `text` must survive write→read exactly —
    * the corruption class ad-hoc CSV writers ship.
    */
  private val csvRoundtrip = q("sink_csv_roundtrip",
    """SELECT doc_id, text, lang, source, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.t(s, dir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val path = graft.Caches.scratchDir("csv-rt").toString + "/docs"
    docs.hint("rebalance").write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(path)
    s.read.schema(docs.schema)
      .option("header", "true").option("escape", "\"")
      .csv(path).orderBy("doc_id")
  }

  val all: Seq[GQuery] = Seq(roundtrip, roundtripSharded, jsonlRoundtrip,
    partitionedPrune, schemaEvolution, csvRoundtrip)
}
