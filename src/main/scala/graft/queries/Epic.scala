package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{Oracle, Tables}

/** Epic-analysis operators (SURVEY.md §2.3 J4/J5, §2.4 A1/A2/A6/A9,
  * §2.7 F3): parent-child hierarchy by iterative self-join, broken-reference
  * detection, completeness reporting, epic grouping, preview breakdowns, and
  * the 6-format timestamp fallback parse.
  */
object Epic {

  /** Max hierarchy depth — the reference's bound
    * (reference: pkg/epic/analyzer.go:99-108).
    */
  private val MaxDepth = 5

  /** J4/A6: hierarchy levels by iterative self-join (Spark has no recursive
    * CTE; the loop is driver-side with a hard depth bound, each step a keyed
    * equi-join — the standard BFS-by-frontier shape that scales as
    * `MaxDepth × shuffle-join`). Orphans (dangling parent refs) get no level,
    * mirroring the reference's node map (pkg/epic/jira_analyzer.go:250-311).
    */
  private val hierarchy = q("epic_hierarchy_levels",
    Oracle.withIssues(
      s""", h AS (
         |  WITH RECURSIVE r AS (
         |    SELECT key, parent_issue, 0 AS level FROM issues WHERE parent_issue IS NULL
         |    UNION ALL
         |    SELECT i.key, i.parent_issue, r.level + 1
         |    FROM issues i JOIN r ON i.parent_issue = r.key
         |    WHERE r.level < $MaxDepth)
         |  SELECT * FROM r)
         |SELECT key, level FROM h ORDER BY key""".stripMargin)) { (s, dir) =>
    // read MaxDepth+1 times by the frontier loop — memoized fragment so the
    // cache entry is registered (and releasable) instead of a one-off leak
    val issues = graft.Caches.fragment(s, dir, "epic_hierarchy_issues") {
      Tables.issues(s, dir).select("key", "parent_issue")
    }
    val roots = issues.filter(col("parent_issue").isNull)
      .select(col("key"), lit(0).as("level"))
    var frontier = roots
    var all = roots
    for (d <- 1 to MaxDepth) {
      // deliberately NOT truncated, unlike the other frontier loops: depth
      // d's plan does replay the d-1 shallower joins (the dump shows 42
      // scans over 5 levels), but each replay is a broadcast probe over
      // the cached issues fragment whose BroadcastExchange is reused
      // across the union branches — per-depth localCheckpoints measured
      // SLOWER (0.69 -> 0.89 s best-of-4, r15): five serial checkpoint
      // jobs cost more than the nearly-free concurrent replays, the same
      // trade stressCensus's s2 and search_hybrid documented
      frontier = issues
        .join(frontier.select(col("key").as("pkey")),
          col("parent_issue") === col("pkey"))
        .select(col("key"), lit(d).as("level"))
      all = all.union(frontier)
    }
    all.orderBy("key")
  }

  /** J5: broken references — parent/epic refs whose target issue does not
    * exist, found by anti-join instead of a filesystem walk
    * (reference: pkg/epic/jira_analyzer.go:326-357, pkg/links/links.go:132-232).
    */
  private val brokenRefs = q("epic_broken_refs",
    Oracle.withIssues(
      """, refs AS (
        |  SELECT key AS src, 'parent' AS ref_type, parent_issue AS ref
        |  FROM issues WHERE parent_issue IS NOT NULL
        |  UNION ALL
        |  SELECT key AS src, 'epic' AS ref_type, epic_link AS ref
        |  FROM issues WHERE epic_link IS NOT NULL)
        |SELECT r.src, r.ref_type, r.ref
        |FROM refs r LEFT JOIN issues i ON i.key = r.ref
        |WHERE i.key IS NULL
        |ORDER BY src, ref_type""".stripMargin)) { (s, dir) =>
    val issues = Tables.issues(s, dir)
    val refs = issues.filter(col("parent_issue").isNotNull)
      .select(col("key").as("src"), lit("parent").as("ref_type"),
        col("parent_issue").as("ref"))
      .unionByName(issues.filter(col("epic_link").isNotNull)
        .select(col("key").as("src"), lit("epic").as("ref_type"),
          col("epic_link").as("ref")))
    refs.join(issues.select(col("key").as("tkey")),
        col("ref") === col("tkey"), "left_anti")
      .orderBy("src", "ref_type")
  }

  /** A9: per-epic completeness — members found vs dangling parent refs
    * (reference: pkg/epic/jira_analyzer.go:326-375 generateCompletenessReport).
    */
  private val completeness = q("epic_completeness",
    Oracle.withIssues(
      """, members AS (
        |  SELECT epic_link, key, parent_issue FROM issues WHERE epic_link IS NOT NULL),
        |broken AS (
        |  SELECT m.epic_link, count(*) AS n_broken
        |  FROM members m LEFT JOIN issues i ON i.key = m.parent_issue
        |  WHERE m.parent_issue IS NOT NULL AND i.key IS NULL
        |  GROUP BY m.epic_link)
        |SELECT m.epic_link, count(*) AS n_found,
        |  coalesce(any_value(b.n_broken), 0) AS n_broken,
        |  count(*)::DOUBLE / (count(*) + coalesce(any_value(b.n_broken), 0)) AS completeness
        |FROM members m LEFT JOIN broken b ON b.epic_link = m.epic_link
        |GROUP BY m.epic_link
        |ORDER BY m.epic_link""".stripMargin)) { (s, dir) =>
    val issues = Tables.issues(s, dir)
    val members = issues.filter(col("epic_link").isNotNull)
      .select("epic_link", "key", "parent_issue")
    val broken = members.filter(col("parent_issue").isNotNull)
      .join(issues.select(col("key").as("tkey")),
        col("parent_issue") === col("tkey"), "left_anti")
      .groupBy("epic_link").agg(count(lit(1)).as("n_broken"))
    members.groupBy("epic_link").agg(count(lit(1)).as("n_found"))
      .join(broken, Seq("epic_link"), "left")
      .select(col("epic_link"), col("n_found"),
        coalesce(col("n_broken"), lit(0L)).as("n_broken"),
        (col("n_found").cast("double") /
          (col("n_found") + coalesce(col("n_broken"), lit(0L)))).as("completeness"))
      .orderBy("epic_link")
  }

  /** A2: epic grouping — sorted key samples and counts per issue type
    * (reference: pkg/epic/jira_analyzer.go:223-247 analyzeIssues).
    */
  private val grouping = q("epic_grouping",
    Oracle.withIssues(
      """SELECT lower(issuetype) AS itype, count(*) AS n,
        |  array_to_string(list_sort(list(DISTINCT key))[1:20], ',') AS sample_keys
        |FROM issues GROUP BY lower(issuetype)
        |ORDER BY itype""".stripMargin)) { (s, dir) =>
    // "sorted distinct keys [1:20]" = the 20 smallest keys per type. The
    // bounded [[graft.functions.MinK]] aggregate computes that in the SAME
    // hash aggregate as the count: partial states are ≤ 20 strings, so the
    // exchange carries 20 keys per group regardless of group size. The
    // previous rank-then-collect shape range-shuffled and sorted the whole
    // corpus by (itype, key) and joined two aggregates back together —
    // two extra exchanges plus a corpus-sized sort that MinK deletes.
    Tables.issues(s, dir)
      .select(lower(col("issuetype")).as("itype"), col("key"))
      .groupBy("itype")
      .agg(count(lit(1)).as("n"),
        array_join(graft.functions.MinK(col("key"), 20), ",").as("sample_keys"))
      .orderBy("itype")
  }

  /** A1/O3: preview breakdowns — total plus counts by project/status/type for
    * a filtered query, one result set
    * (reference: pkg/jql/jira_builder.go:237-269 PreviewQuery).
    */
  private val preview = q("epic_preview_breakdown",
    Oracle.withIssues(
      """, f AS (
        |  SELECT * FROM issues
        |  WHERE lower(project_key) = 'p1' AND lower(status_name) IN ('to do', 'in progress'))
        |SELECT 'total' AS dimension, 'all' AS value, count(*) AS n FROM f
        |UNION ALL SELECT 'project', project_key, count(*) FROM f GROUP BY project_key
        |UNION ALL SELECT 'status', status_name, count(*) FROM f GROUP BY status_name
        |UNION ALL SELECT 'type', issuetype, count(*) FROM f GROUP BY issuetype
        |ORDER BY dimension, value""".stripMargin)) { (s, dir) =>
    // read four times (total + three breakdown dims) — memoized fragment
    val f = graft.Caches.fragment(s, dir, "epic_preview_filtered") {
      Tables.issues(s, dir)
        .filter(lower(col("project_key")) === "p1" &&
          lower(col("status_name")).isin("to do", "in progress"))
    }
    val total = f.agg(count(lit(1)).as("n"))
      .select(lit("total").as("dimension"), lit("all").as("value"), col("n"))
    def dim(name: String, c: String) = f.groupBy(col(c).as("value"))
      .agg(count(lit(1)).as("n"))
      .select(lit(name).as("dimension"), col("value"), col("n"))
    total.unionByName(dim("project", "project_key"))
      .unionByName(dim("status", "status_name"))
      .unionByName(dim("type", "issuetype"))
      .orderBy("dimension", "value")
  }

  /** F3: the 6-format timestamp fallback parse, exercised over strings
    * rendered in four different formats (reference: pkg/state/manager.go:679-702).
    */
  private val timeParse = q("epic_time_parse",
    Oracle.withIssues(
      """, rendered AS (
        |  SELECT key,
        |    CASE string_split(key, '-')[2]::INT % 4
        |      WHEN 0 THEN strftime(created, '%Y-%m-%dT%H:%M:%S.%g') || 'Z'
        |      WHEN 1 THEN strftime(created, '%Y-%m-%dT%H:%M:%S')
        |      WHEN 2 THEN strftime(created, '%Y-%m-%d %H:%M:%S')
        |      ELSE strftime(created, '%Y-%m-%d') END AS raw
        |  FROM issues)
        |SELECT key, raw,
        |  strftime(coalesce(
        |    try_strptime(raw, '%Y-%m-%dT%H:%M:%S.%gZ'),
        |    try_strptime(raw, '%Y-%m-%dT%H:%M:%S'),
        |    try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
        |    try_strptime(raw, '%Y-%m-%d')), '%Y-%m-%d %H:%M:%S') AS parsed
        |FROM rendered ORDER BY key LIMIT 2000""".stripMargin)) { (s, dir) =>
    import graft.functions.Time
    val rendered = Tables.issues(s, dir).select(col("key"),
      expr("""CASE cast(element_at(split(key, '-'), 2) as int) % 4
             | WHEN 0 THEN date_format(created, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
             | WHEN 1 THEN date_format(created, "yyyy-MM-dd'T'HH:mm:ss")
             | WHEN 2 THEN date_format(created, 'yyyy-MM-dd HH:mm:ss')
             | ELSE date_format(created, 'yyyy-MM-dd') END""".stripMargin).as("raw"))
    rendered.select(col("key"), col("raw"),
        date_format(Time.parseJiraTimestamp(col("raw")), "yyyy-MM-dd HH:mm:ss")
          .as("parsed"))
      .orderBy("key").limit(2000)
  }

  val all: Seq[GQuery] =
    Seq(hierarchy, brokenRefs, completeness, grouping, preview, timeParse)
}
