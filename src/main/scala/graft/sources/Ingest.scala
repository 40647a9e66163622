package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Dataset}

import graft.model.Issue

/** Field-mapping ingest (SURVEY.md §2.1 S5): JIRA wire JSON → the flat issue
  * record, including the custom-field epic link and inward/outward link
  * duality (reference: pkg/client/client.go:237-282 convertJIRAIssue,
  * :304-397 extractRelationships/extractEpicLink/extractSubtasks/
  * extractIssueLinks).
  *
  * Pure `from_json` + projection — no UDFs, fully codegen'd, so ingest at
  * 100 TB is a map-only stage over the raw payload column.
  */
object Ingest {

  /** The JIRA REST wire shape (the subset the reference maps). */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("fields", StructType(Seq(
      StructField("summary", StringType),
      StructField("description", StringType),
      StructField("created", StringType),
      StructField("updated", StringType),
      StructField("priority", StructType(Seq(StructField("name", StringType)))),
      StructField("issuetype", StructType(Seq(StructField("name", StringType)))),
      StructField("status", StructType(Seq(
        StructField("name", StringType),
        StructField("statusCategory", StructType(Seq(StructField("key", StringType))))))),
      StructField("assignee", StructType(Seq(
        StructField("displayName", StringType), StructField("emailAddress", StringType)))),
      StructField("reporter", StructType(Seq(
        StructField("displayName", StringType), StructField("emailAddress", StringType)))),
      StructField("customfield_12311140", StringType), // epic link custom field
      StructField("parent", StructType(Seq(StructField("key", StringType)))),
      StructField("subtasks", ArrayType(StructType(Seq(StructField("key", StringType))))),
      StructField("issuelinks", ArrayType(StructType(Seq(
        StructField("type", StructType(Seq(StructField("name", StringType)))),
        StructField("inwardIssue", StructType(Seq(
          StructField("key", StringType), StructField("summary", StringType)))),
        StructField("outwardIssue", StructType(Seq(
          StructField("key", StringType), StructField("summary", StringType)))))))))))))

  /** Parse a raw JSON payload column into the flat issue schema plus nested
    * `subtasks` and `issue_links` arrays. Mirrors convertJIRAIssue: project
    * key from the issue key, epic link from the custom field, links carry
    * the inward/outward direction.
    */
  def fromWire(raw: DataFrame, jsonCol: String = "payload"): DataFrame = {
    val parsed = raw.withColumn("w", from_json(col(jsonCol), wireSchema))
    val f = (name: String) => col(s"w.fields.$name")
    parsed.select(
      col("w.key").as("key"),
      regexp_extract(col("w.key"), "^(.*)-\\d+$", 1).as("project_key"),
      f("summary").as("summary"),
      f("description").as("description"),
      f("status.name").as("status_name"),
      f("status.statusCategory.key").as("status_category"),
      f("assignee.displayName").as("assignee_name"),
      f("assignee.emailAddress").as("assignee_email"),
      f("reporter.displayName").as("reporter_name"),
      f("reporter.emailAddress").as("reporter_email"),
      graft.functions.Time.parseJiraTimestamp(f("created")).as("created"),
      graft.functions.Time.parseJiraTimestamp(f("updated")).as("updated"),
      f("priority.name").as("priority"),
      f("issuetype.name").as("issuetype"),
      f("customfield_12311140").as("epic_link"),
      f("parent.key").as("parent_issue"),
      expr("transform(w.fields.subtasks, s -> s.key)").as("subtasks"),
      // inward/outward duality: exactly one of the two sides is set
      expr("""transform(w.fields.issuelinks, l -> named_struct(
             |  'link_type', l.type.name,
             |  'direction', CASE WHEN l.inwardIssue.key IS NOT NULL THEN 'inward' ELSE 'outward' END,
             |  'issue_key', coalesce(l.inwardIssue.key, l.outwardIssue.key),
             |  'summary', coalesce(l.inwardIssue.summary, l.outwardIssue.summary)))""".stripMargin)
        .as("issue_links"))
  }

  /** Lift flat issue rows into the typed model (`Dataset[Issue]` with nested
    * Status/Person/Relationships, SURVEY.md §1.1) — the type-safe surface for
    * Scala consumers; absent columns (e.g. a source without link arrays)
    * become empty.
    */
  def asIssues(flat: DataFrame): Dataset[Issue] = {
    val spark = flat.sparkSession
    import spark.implicits._
    val linksType =
      "array<struct<link_type:string,direction:string,issue_key:string,summary:string>>"
    val withAll = Seq(
      "sprint" -> "string", "epic_link" -> "string", "parent_issue" -> "string",
      "subtasks" -> "array<string>", "issue_links" -> linksType)
      .foldLeft(flat) { case (df, (c, t)) =>
        if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(t))
      }
    withAll.select(
      col("key"), col("project_key"), col("summary"), col("description"),
      struct(col("status_name").as("name"), col("status_category").as("category"))
        .as("status"),
      struct(col("assignee_name").as("name"), col("assignee_email").as("email"))
        .as("assignee"),
      struct(col("reporter_name").as("name"), col("reporter_email").as("email"))
        .as("reporter"),
      col("created").cast("timestamp").as("created"),
      col("updated").cast("timestamp").as("updated"),
      col("priority"), col("issuetype"), col("sprint"),
      when(col("epic_link").isNotNull || col("parent_issue").isNotNull ||
          size(coalesce(col("subtasks"), array())) > 0 ||
          size(coalesce(col("issue_links"), expr(s"cast(array() as $linksType)"))) > 0,
        struct(
          col("epic_link"), col("parent_issue"),
          coalesce(col("subtasks"), array()).as("subtasks"),
          coalesce(col("issue_links"), expr(s"cast(array() as $linksType)"))
            .as("issue_links")))
        .as("relationships")
    ).as[Issue]
  }

  /** Inverse of [[fromWire]]: render flat issue rows as JIRA wire JSON —
    * fixture generation parity with the reference's mock client
    * (reference: pkg/client/mock.go:282-351 fixture factories).
    */
  def toWire(issues: DataFrame): DataFrame = {
    val wire = to_json(struct(
      col("key"),
      struct(
        col("summary"),
        col("description"),
        graft.functions.Time.formatJiraTimestamp(col("created")).as("created"),
        graft.functions.Time.formatJiraTimestamp(col("updated")).as("updated"),
        struct(col("priority").as("name")).as("priority"),
        struct(col("issuetype").as("name")).as("issuetype"),
        struct(col("status_name").as("name"),
          struct(col("status_category").as("key")).as("statusCategory")).as("status"),
        struct(col("assignee_name").as("displayName"),
          col("assignee_email").as("emailAddress")).as("assignee"),
        struct(col("reporter_name").as("displayName"),
          col("reporter_email").as("emailAddress")).as("reporter"),
        col("epic_link").as("customfield_12311140"),
        when(col("parent_issue").isNotNull,
          struct(col("parent_issue").as("key"))).as("parent")
      ).as("fields")))
    issues.select(wire.as("payload"))
  }

  /** S11: explode the nested relationship arrays into the first-class edge
    * table `(src, link_type, direction, dst, project_key)` — the distributed
    * replacement for symlink edges (reference: pkg/links/links.go:31-95).
    */
  def edges(issues: DataFrame): DataFrame = {
    def base(extra: Column*) =
      issues.select(col("key").as("src") +: col("project_key") +: extra: _*)
    val epic = base(col("epic_link").as("dst"))
      .filter(col("dst").isNotNull)
      .select(col("src"), lit("epic").as("link_type"),
        lit("outward").as("direction"), col("dst"), col("project_key"))
    val parent = base(col("parent_issue").as("dst"))
      .filter(col("dst").isNotNull)
      .select(col("src"), lit("parent").as("link_type"),
        lit("outward").as("direction"), col("dst"), col("project_key"))
    val subtasks = base(explode_outer(col("subtasks")).as("dst"))
      .filter(col("dst").isNotNull)
      .select(col("src"), lit("subtask").as("link_type"),
        lit("outward").as("direction"), col("dst"), col("project_key"))
    val links = issues
      .select(col("key").as("src"), col("project_key"),
        explode_outer(col("issue_links")).as("l"))
      .filter(col("l").isNotNull)
      .select(col("src"), col("l.link_type").as("link_type"),
        col("l.direction").as("direction"), col("l.issue_key").as("dst"),
        col("project_key"))
    epic.unionByName(parent).unionByName(subtasks).unionByName(links)
  }

  /** S11 sink: persist edges partitioned by (project_key, link_type) — the
    * layout the reference encodes as relationship directories.
    *
    * The batch is re-hashed on the partition columns first (keeping the full
    * task-slot count) so each (project_key, link_type) lands in one task:
    * one file per partition instead of tasks × partitions small files, and
    * one open writer per task instead of one per partition value.
    */
  def writeEdges(edges: DataFrame, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(edges.sparkSession.sparkContext.hadoopConfiguration)
    // a full rewrite replaces the table either way, but clearing any
    // mid-swap leftovers first keeps a stale __compact/__old from shadowing
    // or resurrecting old edges later
    recoverCompacted(fs, path)
    // stage + swap rather than overwrite-in-place: an in-place overwrite
    // deletes the table before writing, so a crash mid-write leaves a
    // PARTIAL table that reads as valid. Staging into __compact and swapping
    // reuses the compaction commit: every intermediate crash state is one
    // recoverCompacted() call away from a complete table (old or new).
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact")
    edges
      .repartition(edges.sparkSession.sparkContext.defaultParallelism,
        col("project_key"), col("link_type"))
      .write.mode("overwrite")
      .partitionBy("project_key", "link_type")
      .parquet(tmp.toString)
    swapCompacted(fs, path)
  }

  /** S11 incremental sink: replace the edges of every issue in
    * `changedIssues` — the batch's sync universe, not just the srcs that
    * still have edges — with whatever `edges` now holds for them (idempotent
    * per-src replace, reference: pkg/links/links.go:309-331). Using the
    * changed-key set as the deletion universe covers the two cases a
    * batch-derived set misses: an issue whose links were all removed (no
    * rows in `edges` at all) and a link whose link_type changed (its old
    * row lives in a partition the new batch doesn't touch).
    *
    * Scale shape: only the affected projects' partitions are read
    * (partition-pruned filter on project_key across ALL their link_type
    * partitions), anti-joined on src against the changed-key set, and
    * rewritten via dynamic partition overwrite. Partitions the rewrite
    * leaves empty are dropped explicitly — dynamic overwrite never touches
    * a partition absent from the output.
    */
  def upsertEdges(edges: DataFrame, changedIssues: DataFrame, path: String): Unit = {
    val spark = edges.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a compaction that crashed mid-swap leaves the complete table in
    // __compact with src absent — recover BEFORE deciding the table doesn't
    // exist, or this batch would recreate it with only its own edges and
    // silently drop everyone else's
    recoverCompacted(fs, path)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) return writeEdges(edges, path)
    val changed = changedIssues
      .select(col("key").as("src"), col("project_key")).distinct().cache()
    try {
      // affected projects: small (a handful of keys) — safe to collect
      val projects = changed.select("project_key").distinct()
        .collect().map(_.getString(0))
      if (projects.isEmpty) return
      // explicit schema: a previous zero-edge write leaves a parquet dir with
      // no data files, which defeats inference
      val existing = spark.read.schema(
          org.apache.spark.sql.types.StructType(edges.schema.fields.toSeq))
        .parquet(path)
        .filter(col("project_key").isin(projects.toSeq: _*))
      val existingParts = existing.select("project_key", "link_type").distinct()
        .collect().map(r => (r.getString(0), r.getString(1)))
      val out = existing
        .join(changed.select("src"), Seq("src"), "left_anti")
        .select(edges.columns.map(col).toSeq: _*)
        .unionByName(edges)
        // break the read-from-output-path lineage so the overwrite is legal;
        // on a cluster this would be a checkpoint to reliable storage
        .localCheckpoint(true)
      // drop partitions the batch emptied (all their rows belonged to changed
      // issues and none came back) — absent from `out`, so the dynamic
      // overwrite below never touches them. Deleting BEFORE the write makes a
      // crash recoverable: state isn't merged until the whole batch commits,
      // so a rerun re-derives the same changed set and repeats both steps
      // idempotently, whereas deletes after the commit could be lost forever
      // (those issues never reappear in changedIssues). `out` is already
      // checkpointed, so this collect doesn't recompute the merge.
      val outParts = out.select("project_key", "link_type").distinct()
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName _
      existingParts.filterNot(outParts).foreach { case (p, t) =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$path/project_key=${esc(p)}/link_type=${esc(t)}"), true)
      }
      out
        .repartition(spark.sparkContext.defaultParallelism,
          col("project_key"), col("link_type")) // one file per partition, see writeEdges
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic") // writer-scoped, no session-conf mutation
        .partitionBy("project_key", "link_type")
        .parquet(path)
    } finally changed.unpersist()
  }

  /** S11 maintenance: compact the edge table's accumulated small files.
    * Every incremental upsert rewrites its partitions with one file per
    * write task, so file counts grow with sync frequency and scans degrade.
    * Rewrite with one task per (project_key, link_type) partition (bounded
    * by `maxRecordsPerFile`) into a tmp dir and swap — the same
    * tmp-then-rename commit as the state store.
    */
  /** Finish (or discard) a compaction swap interrupted by a crash. The swap
    * is src→`__old`, `__compact`→src, delete `__old`; the only window where
    * src is absent is between the two renames, and then `__compact` is
    * complete (its `_SUCCESS` marker proves it) — promote it. With src
    * present, any leftover `__old`/`__compact` is from an uncommitted or
    * already-committed swap — src is authoritative, drop them. Shared by
    * every edge-table writer so no caller can mistake a mid-swap table for
    * an absent one.
    */
  private def recoverCompacted(fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val src = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    if (!fs.exists(src)) {
      if (fs.exists(tmp) && fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))) {
        if (!fs.rename(tmp, src))
          throw new java.io.IOException(s"compaction recovery rename failed: $tmp -> $src")
      } else if (fs.exists(old)) {
        // tmp incomplete (shouldn't happen — the rename only runs after a
        // committed write) — fall back to the pre-compaction table
        if (!fs.rename(old, src))
          throw new java.io.IOException(s"compaction rollback rename failed: $old -> $src")
      }
    }
    if (fs.exists(src)) {
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(tmp)) fs.delete(tmp, true)
    }
  }

  /** Commit a complete staged table at `<path>__compact`: park the current
    * table (if any) at `__old`, promote the staged one, clean up. Each
    * intermediate crash state is one [[recoverCompacted]] call away from a
    * complete table — src never disappears un-recoverably.
    */
  private def swapCompacted(fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val src = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    if (fs.exists(src) && !fs.rename(src, old))
      throw new java.io.IOException(s"edge-table rename failed: $src -> $old")
    if (!fs.rename(tmp, src))
      throw new java.io.IOException(s"edge-table rename failed: $tmp -> $src")
    fs.delete(old, true)
    ()
  }

  def compactEdges(spark: org.apache.spark.sql.SparkSession, path: String,
      maxRecordsPerFile: Long = 1L << 20): Unit = {
    val src = new org.apache.hadoop.fs.Path(path)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact")
    recoverCompacted(fs, path)
    if (!fs.exists(src)) return
    spark.read.parquet(path)
      .repartition(col("project_key"), col("link_type"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("project_key", "link_type")
      .parquet(tmp.toString)
    swapCompacted(fs, path)
  }

  /** S12: broken-link GC — dangling edges found by anti-join instead of a
    * filesystem walk (reference: pkg/links/links.go:132-232).
    */
  def brokenEdges(edges: DataFrame, issues: DataFrame): DataFrame =
    edges.join(issues.select(col("key").as("__t")),
      col("dst") === col("__t"), "left_anti")
}
