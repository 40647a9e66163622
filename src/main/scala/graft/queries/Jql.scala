package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{Oracle, Tables}
import graft.jql.{JqlCompiler, JqlContext}

/** Registered JQL queries — the compiler exercised end-to-end against DuckDB
  * oracles (SURVEY.md §2.2-P1, §2.3-J1/J2, §2.7-F4). Each query string is in
  * the dialect the reference's templates emit
  * (reference: pkg/jql/builder.go:126-246, pkg/epic/jira_analyzer.go:160-181)
  * and compiles to a declarative Catalyst plan over the derived `issues` /
  * `links` tables.
  *
  * `ctx` is pinned so relative dates (`-30d`), `now()`, `currentUser()` and
  * `openSprints()` are deterministic and expressible as DuckDB literals.
  */
object Jql {

  val ctx: JqlContext = JqlContext(
    now = Timestamp.valueOf("1998-08-01 00:00:00"),
    currentUser = "user5",
    openSprints = Seq("Sprint 1", "Sprint 2"))

  def run(spark: SparkSession, sfDir: String, jql: String): DataFrame =
    new JqlCompiler(
      Tables.issues(spark, sfDir),
      Tables.links(spark, sfDir),
      ctx,
      history = Tables.statusHistory(spark, sfDir)).compile(jql)

  /** JQL query whose oracle is `SELECT * FROM issues WHERE <where>`. */
  private def jq(name: String, jql: String, oracleWhere: String,
      withLinks: Boolean = false): GQuery = {
    val sql = s"SELECT * FROM issues WHERE $oracleWhere ORDER BY key"
    q(name, if (withLinks) Oracle.withIssuesAndLinks(sql) else Oracle.withIssues(sql)) {
      (s, dir) => run(s, dir, jql)
    }
  }

  /** Like [[jq]] but the oracle also sees the status-changelog CTE (the
    * history operators WAS / CHANGED).
    */
  private def jqh(name: String, jql: String, oracleWhere: String): GQuery = {
    val sql = s"SELECT * FROM issues WHERE $oracleWhere ORDER BY key"
    q(name, Oracle.withIssuesAndHistory(sql)) { (s, dir) => run(s, dir, jql) }
  }

  val all: Seq[GQuery] = Seq(

    // P1: equality + IN + ORDER BY updated DESC (O2) — the primary template
    // shape (reference: pkg/jql/builder.go:126-160)
    jq("jql_eq_and_in",
      """project = P1 AND status IN ("To Do", "In Progress") ORDER BY updated DESC""",
      "lower(project_key) = 'p1' AND lower(status_name) IN ('to do', 'in progress')"),

    // J1: epic membership via issuesInEpic subquery → semi-join lowering
    jq("jql_epic_members",
      """key in (issuesInEpic("E-7"))""",
      "lower(key) IN (SELECT lower(key) FROM issues WHERE lower(epic_link) = 'e-7')"),

    // U1: the reference's epic OR-union shape
    // (reference: pkg/jql/jira_builder.go:61-76)
    jq("jql_epic_union",
      """"Epic Link" = E-7 OR parent in (issuesInEpic("E-7")) ORDER BY key ASC""",
      """lower(epic_link) = 'e-7' OR
        | lower(parent_issue) IN (SELECT lower(key) FROM issues WHERE lower(epic_link) = 'e-7')""".stripMargin),

    // J2: linkedIssues as a bare function after IN (parser: no outer parens)
    jq("jql_linked",
      """issue in linkedIssues(P0-20)""",
      """lower(key) IN (SELECT lower(dst) FROM links WHERE lower(src) = 'p0-20'
        |  UNION SELECT lower(src) FROM links WHERE lower(dst) = 'p0-20')""".stripMargin,
      withLinks = true),

    // F4: relative date literal + now() scalar function, pinned ctx.now
    jq("jql_relative_date",
      """updated >= -30d AND created < now()""",
      """updated >= TIMESTAMP '1998-07-02 00:00:00'
        | AND created < TIMESTAMP '1998-08-01 00:00:00'""".stripMargin),

    // Null semantics: != on a nullable field excludes EMPTY rows (JIRA rule)
    jq("jql_negation",
      """parent != P0-4 AND type != Epic""",
      """parent_issue IS NOT NULL AND lower(parent_issue) <> 'p0-4'
        | AND lower(issuetype) <> 'epic'""".stripMargin),

    // Negated function membership (NOT IN issuesInEpic)
    jq("jql_not_in_epic",
      """project = P1 AND key not in (issuesInEpic("E-7"))""",
      """lower(project_key) = 'p1' AND lower(key) NOT IN
        | (SELECT lower(key) FROM issues WHERE lower(epic_link) = 'e-7')""".stripMargin),

    // NOT IN over a NULLABLE field: EMPTY parents are excluded (JIRA's
    // empty-exclusion applies to function membership like everything else)
    jq("jql_not_in_parent",
      """project = P2 AND parent not in (issuesInEpic("E-3"))""",
      """lower(project_key) = 'p2' AND parent_issue IS NOT NULL
        | AND lower(parent_issue) NOT IN
        | (SELECT lower(key) FROM issues WHERE lower(epic_link) = 'e-3')""".stripMargin),

    // Person fields: currentUser() and IN match name-or-email, case-insensitive
    jq("jql_person",
      """assignee = currentUser() OR reporter in (rep3, "rep5@example.com")""",
      """(lower(assignee_name) = 'user5' OR lower(assignee_email) = 'user5')
        | OR (lower(reporter_name) = 'rep3' OR lower(reporter_email) = 'rep3')
        | OR (lower(reporter_name) = 'rep5@example.com' OR lower(reporter_email) = 'rep5@example.com')""".stripMargin),

    // openSprints() session binding (reference: pkg/jql/builder.go:195)
    jq("jql_sprint",
      """sprint in openSprints() AND status != Done""",
      """lower(sprint) IN ('sprint 1', 'sprint 2')
        | AND lower(status_name) <> 'done'""".stripMargin),

    // ~ contains operator on text
    jq("jql_contains",
      """summary ~ "1-URGENT" AND type = Story""",
      "contains(lower(summary), '1-urgent') AND lower(issuetype) = 'story'"),

    // JIRA's EMPTY literal in comparisons: != EMPTY ≡ IS NOT EMPTY
    jq("jql_empty_literal",
      """"Epic Link" != EMPTY AND project = P3""",
      "epic_link IS NOT NULL AND lower(project_key) = 'p3'"),

    // cf[NNNNN] custom-field spelling of Epic Link + IS EMPTY
    jq("jql_cf_empty",
      """cf[12311140] = E-7 OR "Epic Link" IS EMPTY""",
      "lower(epic_link) = 'e-7' OR epic_link IS NULL"),

    // S1: point lookup by key — the degenerate-but-canonical single-issue
    // fetch (reference: pkg/client/client.go:129-146 GetIssue)
    jq("jql_point_lookup",
      """key = "P0-20"""",
      "lower(key) = 'p0-20'"),

    // multi-key ORDER BY (O6) over an IN filter
    jq("jql_order_multi",
      """project in (P2, P3) ORDER BY priority ASC, updated DESC""",
      "lower(project_key) IN ('p2', 'p3')"),

    // ---- history operators (public JQL the reference's dialect relies on
    // the server for; evaluated here against the SCD2 status changelog,
    // Tables.statusHistory) ----

    // WAS value BEFORE instant: a Done interval began before the date
    jqh("jql_was",
      """project = P1 AND status WAS "Done" BEFORE "1995-06-01"""",
      """lower(project_key) = 'p1' AND lower(key) IN (
        |  SELECT lower(key) FROM history
        |  WHERE lower(status_name) = 'done'
        |    AND changed_at < TIMESTAMP '1995-06-01 00:00:00')""".stripMargin),

    // WAS NOT IN + relative window: at NO instant since -400d (from pinned
    // ctx.now 1998-08-01 → 1997-06-27) was the status any of the listed —
    // ¬∃ over intervals still open after the cut
    jqh("jql_was_not",
      """status WAS NOT IN ("Done", "In Progress") AFTER -400d AND project = P2""",
      """lower(project_key) = 'p2' AND lower(key) NOT IN (
        |  SELECT lower(key) FROM history
        |  WHERE lower(status_name) IN ('done', 'in progress')
        |    AND (valid_to IS NULL OR valid_to > TIMESTAMP '1997-06-27 00:00:00'))""".stripMargin),

    // CHANGED FROM/TO + inclusive DURING window over transition events
    jqh("jql_changed",
      """status CHANGED FROM "To Do" TO "In Progress"
        | DURING ("1994-01-01", "1996-01-01") AND project IN (P2, P3)
        | ORDER BY updated DESC""".stripMargin,
      """lower(project_key) IN ('p2', 'p3') AND lower(key) IN (
        |  SELECT lower(key) FROM history
        |  WHERE prev_status IS NOT NULL
        |    AND lower(prev_status) = 'to do'
        |    AND lower(status_name) = 'in progress'
        |    AND changed_at >= TIMESTAMP '1994-01-01 00:00:00'
        |    AND changed_at <= TIMESTAMP '1996-01-01 00:00:00')""".stripMargin),

    // NOT CHANGED AFTER: the stale-issue sweep — no transition since the cut
    // (never-changed issues included; ¬∃ via the two-valued key marker)
    jqh("jql_changed_not",
      """project = P4 AND NOT status CHANGED AFTER "1998-01-01"""",
      """lower(project_key) = 'p4' AND lower(key) NOT IN (
        |  SELECT lower(key) FROM history
        |  WHERE prev_status IS NOT NULL
        |    AND changed_at > TIMESTAMP '1998-01-01 00:00:00')""".stripMargin)
  )
}
