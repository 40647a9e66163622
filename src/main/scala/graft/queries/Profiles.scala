package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables.t

/** Profile and job operators (SURVEY.md §2.2 P6/P7, §2.4 A5/A7/A8,
  * §2.5 O6/O8, §2.7 F6/F10), over deterministic `profiles` / `jobs` tables
  * derived from `part` / `orders` so every operator is oracle-checkable.
  *
  * The reference keeps profiles and jobs in driver-side maps
  * (pkg/profile/manager.go, pkg/jobs/scheduler.go); here they are plain
  * DataFrames so search/sort/similarity/stats run distributed.
  */
object Profiles {

  /** profiles derived from part: name, jql, repository, tags, usage stats. */
  private def profiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      concat(lit("profile-"), col("p_partkey").cast("string")).as("name"),
      col("p_type").as("description"),
      concat(lit("project = P"), (col("p_partkey") % 7).cast("string")).as("jql"),
      concat(lit("/repos/r"), (col("p_partkey") % 5).cast("string")).as("repository"),
      split(col("p_type"), " ").as("tags"),
      (col("p_partkey") % 100).cast("long").as("times_used"),
      (col("p_partkey") % 80).cast("long").as("success_count"),
      (col("p_partkey") * 13 % 10000).cast("long").as("total_duration_ms"))

  private val profilesCte: String =
    """profiles AS (
      |  SELECT 'profile-' || CAST(p_partkey AS STRING) AS name,
      |    p_type AS description,
      |    'project = P' || CAST(p_partkey % 7 AS STRING) AS jql,
      |    '/repos/r' || CAST(p_partkey % 5 AS STRING) AS repository,
      |    string_split(p_type, ' ') AS tags,
      |    CAST(p_partkey % 100 AS BIGINT) AS times_used,
      |    CAST(p_partkey % 80 AS BIGINT) AS success_count,
      |    CAST(p_partkey * 13 % 10000 AS BIGINT) AS total_duration_ms
      |  FROM part)""".stripMargin

  /** jobs derived from orders: id, type, status, namespace, created_at. */
  private def jobs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      concat(lit("job-"), col("o_orderkey").cast("string")).as("job_id"),
      expr("CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN 'single' WHEN 1 THEN 'batch' WHEN 2 THEN 'jql' ELSE 'incremental' END")
        .as("job_type"),
      expr("CASE o_orderstatus WHEN 'F' THEN 'completed' WHEN 'O' THEN 'running' ELSE 'pending' END")
        .as("status"),
      concat(lit("ns"), (col("o_custkey") % 3).cast("string")).as("namespace"),
      col("o_orderdate").as("created_at"))

  private val jobsCte: String =
    """jobs AS (
      |  SELECT 'job-' || CAST(o_orderkey AS STRING) AS job_id,
      |    CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN 'single' WHEN 1 THEN 'batch'
      |      WHEN 2 THEN 'jql' ELSE 'incremental' END AS job_type,
      |    CASE o_orderstatus WHEN 'F' THEN 'completed' WHEN 'O' THEN 'running'
      |      ELSE 'pending' END AS status,
      |    'ns' || CAST(o_custkey % 3 AS STRING) AS namespace,
      |    o_orderdate AS created_at
      |  FROM orders)""".stripMargin

  /** P6: profile search by exact|contains|regex across name/description/tags
    * (reference: pkg/profile/manager.go:699 profileMatches).
    */
  private val search = q("profile_search",
    s"""WITH $profilesCte
       |SELECT name, description, repository FROM profiles
       |WHERE contains(lower(description), 'green')
       |   OR len(list_filter(tags, x -> lower(x) = 'brass')) > 0
       |   OR regexp_matches(name, '^profile-1[0-9]{2}$$')
       |ORDER BY name""".stripMargin) { (s, dir) =>
    profiles(s, dir)
      .filter(lower(col("description")).contains("green") ||
        expr("size(filter(tags, x -> lower(x) = 'brass')) > 0") ||
        col("name").rlike("^profile-1[0-9]{2}$"))
      .select("name", "description", "repository")
      .orderBy("name")
  }

  /** O6: multi-key profile sort — most used first, name tiebreak
    * (reference: pkg/profile/manager.go:663 sortProfiles).
    */
  private val sortQ = q("profile_sort",
    s"""WITH $profilesCte
       |SELECT name, times_used, total_duration_ms FROM profiles
       |ORDER BY times_used DESC, name LIMIT 100""".stripMargin) { (s, dir) =>
    profiles(s, dir)
      .select("name", "times_used", "total_duration_ms")
      .orderBy(desc("times_used"), col("name")).limit(100)
  }

  /** A7/O8: top-k profiles most similar to a given one — the reference's
    * exact shape (score ONE profile against all, take top limit;
    * reference: pkg/profile/manager.go:517 GetSimilarProfiles, :757
    * calculateSimilarity). O(n) with a 1-row broadcast, then
    * TakeOrderedAndProject — never a pairwise join.
    */
  private val similar = q("profile_similar",
    s"""WITH $profilesCte,
       |target AS (SELECT jql, repository, tags FROM profiles WHERE name = 'profile-1')
       |SELECT p.name,
       |  CASE WHEN p.jql = t.jql THEN 0.3 ELSE 0.0 END
       |    + CASE WHEN p.repository = t.repository THEN 0.3 ELSE 0.0 END
       |    + 0.4 * (len(list_intersect(p.tags, t.tags))::DOUBLE /
       |             len(list_distinct(list_concat(p.tags, t.tags)))) AS score
       |FROM profiles p, target t WHERE p.name <> 'profile-1'
       |ORDER BY score DESC, name LIMIT 50""".stripMargin) { (s, dir) =>
    val p = profiles(s, dir)
    val target = p.filter(col("name") === "profile-1")
      .select(col("jql").as("t_jql"), col("repository").as("t_repo"),
        col("tags").as("t_tags"))
    p.filter(col("name") =!= "profile-1")
      .crossJoin(broadcast(target)) // 1-row dimension
      .select(col("name"),
        (when(col("jql") === col("t_jql"), 0.3).otherwise(0.0)
          + when(col("repository") === col("t_repo"), 0.3).otherwise(0.0)
          + lit(0.4) * (size(array_intersect(col("tags"), col("t_tags"))).cast("double")
            / size(array_distinct(concat(col("tags"), col("t_tags"))))))
          .as("score"))
      .orderBy(desc("score"), col("name")).limit(50)
  }

  /** A8: usage-stat accumulation per repository — success rate, durations
    * (reference: pkg/profile/types.go:36-44, internal/cli/sync.go:621-627).
    */
  private val usage = q("profile_usage_stats",
    s"""WITH $profilesCte
       |SELECT repository, count(*) AS n_profiles,
       |  sum(times_used)::BIGINT AS total_used,
       |  sum(success_count)::DOUBLE / sum(times_used) AS success_rate,
       |  sum(total_duration_ms)::DOUBLE / sum(times_used) AS avg_duration_ms
       |FROM profiles GROUP BY repository ORDER BY repository""".stripMargin) { (s, dir) =>
    profiles(s, dir).groupBy("repository")
      .agg(count(lit(1)).as("n_profiles"),
        sum("times_used").as("total_used"),
        (sum("success_count").cast("double") / sum("times_used")).as("success_rate"),
        (sum("total_duration_ms").cast("double") / sum("times_used")).as("avg_duration_ms"))
      .orderBy("repository")
  }

  /** A5: queue status — job counts by status and type
    * (reference: pkg/jobs/scheduler.go:244-271 GetQueueStatus).
    */
  private val queue = q("job_queue_status",
    s"""WITH $jobsCte
       |SELECT status, job_type, count(*) AS n
       |FROM jobs GROUP BY status, job_type
       |ORDER BY status, job_type""".stripMargin) { (s, dir) =>
    jobs(s, dir).groupBy("status", "job_type").agg(count(lit(1)).as("n"))
      .orderBy("status", "job_type")
  }

  /** P7: job list filter by type/status/namespace/time-range with
    * offset/limit paging (reference: pkg/jobs/scheduler.go:534 matchesFilter,
    * pkg/jobs/types.go:122-130 JobFilter).
    */
  private val jobFilter = q("job_filter_page",
    s"""WITH $jobsCte
       |SELECT job_id, job_type, status, namespace FROM jobs
       |WHERE job_type IN ('jql', 'incremental') AND status = 'completed'
       |  AND namespace = 'ns1'
       |  AND created_at >= TIMESTAMP '1994-01-01 00:00:00'
       |ORDER BY job_id LIMIT 25 OFFSET 50""".stripMargin) { (s, dir) =>
    jobs(s, dir)
      .filter(col("job_type").isin("jql", "incremental") &&
        col("status") === "completed" && col("namespace") === "ns1" &&
        col("created_at") >= lit("1994-01-01 00:00:00").cast("timestamp"))
      .select("job_id", "job_type", "status", "namespace")
      .orderBy("job_id").offset(50).limit(25)
  }

  /** F10: job-ID generation `{type}-{ts}-{rand8}` with the K8s name
    * constraint (≤63 chars, DNS-1123) — rand8 is a deterministic md5 slice
    * here (reference: pkg/jobs/job_id.go:26-60).
    */
  private val jobId = q("job_id_gen",
    s"""WITH $jobsCte
       |SELECT job_id,
       |  job_type || '-' || strftime(created_at, '%Y%m%d%H%M%S') || '-' ||
       |    substr(md5(job_id), 1, 8) AS gen_id,
       |  len(job_type || '-' || strftime(created_at, '%Y%m%d%H%M%S') || '-' ||
       |    substr(md5(job_id), 1, 8)) <= 63
       |    AND regexp_matches(job_type || '-' || strftime(created_at, '%Y%m%d%H%M%S')
       |      || '-' || substr(md5(job_id), 1, 8), '^[a-z0-9]([-a-z0-9]*[a-z0-9])?$$')
       |    AS k8s_valid
       |FROM jobs ORDER BY job_id LIMIT 1000""".stripMargin) { (s, dir) =>
    val gen = concat(col("job_type"), lit("-"),
      date_format(col("created_at"), "yyyyMMddHHmmss"), lit("-"),
      substring(md5(col("job_id")), 1, 8))
    jobs(s, dir).select(col("job_id"), gen.as("gen_id"),
        (length(gen) <= 63 && gen.rlike("^[a-z0-9]([-a-z0-9]*[a-z0-9])?$"))
          .as("k8s_valid"))
      .orderBy("job_id").limit(1000)
  }

  /** F6: JQL template expansion — parameter substitution into saved templates
    * (reference: pkg/jql/jira_builder.go:95-162, pkg/profile/templates.go).
    */
  private val template = q("profile_template_expand",
    s"""WITH $profilesCte
       |SELECT name,
       |  replace(replace(
       |    'project = {project} AND status IN ({statuses}) ORDER BY updated DESC',
       |    '{project}', 'P' || CAST(string_split(name, '-')[2]::INT % 7 AS STRING)),
       |    '{statuses}', '''To Do'', ''In Progress''') AS expanded_jql
       |FROM profiles ORDER BY name LIMIT 200""".stripMargin) { (s, dir) =>
    val tmpl = "project = {project} AND status IN ({statuses}) ORDER BY updated DESC"
    profiles(s, dir).select(col("name"),
        regexp_replace(
          regexp_replace(lit(tmpl), lit("\\{project\\}"),
            concat(lit("P"), (expr("cast(element_at(split(name, '-'), 2) as int)") % 7)
              .cast("string"))),
          lit("\\{statuses\\}"), lit("'To Do', 'In Progress'"))
          .as("expanded_jql"))
      .orderBy("name").limit(200)
  }

  val all: Seq[GQuery] =
    Seq(search, sortQ, similar, usage, queue, jobFilter, jobId, template)
}
