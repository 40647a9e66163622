package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{GitRepo, Yaml}

class SinkSpec extends AnyFunSuite {
  import TestSpark._

  test("YAML write → read round-trips every field") {
    val repo = Files.createTempDirectory("graft-rt").toString
    val slice = Tables.issues(spark, sf)
      .filter(col("project_key") === "P2")
      .limit(200).cache()
    val n = Yaml.writeIssues(slice, repo)
    assert(n == slice.count())
    val back = Yaml.readIssues(spark, repo).cache()
    assert(back.count() == n)
    // cast timestamps to strings: source is TIMESTAMP_NTZ, round-trip is
    // TIMESTAMP — same instants, different Row rendering
    val cols = Yaml.columns.map {
      case c @ ("created" | "updated") => date_format(col(c), "yyyy-MM-dd HH:mm:ss").as(c)
      case c => col(c)
    }
    val orig = slice.select(cols: _*).orderBy("key").collect()
    val rt = back.select(cols: _*).orderBy("key").collect()
    orig.zip(rt).foreach { case (a, b) =>
      assert(a.toString == b.toString, s"row mismatch: $a vs $b")
    }
  }

  test("relationship arrays (subtasks, issue_links) round-trip through YAML") {
    val repo = Files.createTempDirectory("graft-rel").toString
    val enriched = Yaml.withRelationships(
      Tables.issues(spark, sf), Tables.links(spark, sf))
      .filter(col("project_key") === "P5")
      .limit(300).cache()
    Yaml.writeIssues(enriched, repo)
    val back = Yaml.readIssues(spark, repo).cache()
    // normalize both sides to sorted flat strings (write sorts the arrays)
    def flat(df: org.apache.spark.sql.DataFrame) = df.select(
      col("key"),
      array_join(coalesce(col("subtasks"), array()), ",").as("st"),
      array_join(expr(
        "transform(coalesce(issue_links, array()), l -> concat(l.link_type, '|', l.direction, '|', l.issue_key))"),
        ";").as("il")).orderBy("key").collect()
    val a = flat(enriched)
    val b = flat(back)
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
    // at least some rows exercise each array shape
    assert(back.filter(size(col("subtasks")) > 0).count() > 0)
    assert(back.filter(size(col("issue_links")) > 0).count() > 0)
  }

  test("native YamlRender is byte-identical to toYamlString on every issue") {
    val enriched = Yaml.withRelationships(
      Tables.issues(spark, sf), Tables.links(spark, sf)).limit(2000)
    val complete = (Yaml.columns ++ Yaml.relColumns).foldLeft(enriched) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast("string"))
    }
    val both = complete.select(
      graft.functions.YamlRender.forIssue(complete).as("fast"),
      struct((Yaml.columns ++ Yaml.relColumns).map(col): _*).as("row"))
      .collect()
    assert(both.length > 0)
    both.foreach { r =>
      val slow = Yaml.toYamlString(r.getStruct(1))
      assert(r.getString(0) == slow,
        s"render mismatch:\n${r.getString(0)}\n--- vs ---\n$slow")
    }
  }

  test("YAML escaping survives quotes and backslashes") {
    import spark.implicits._
    val repo = Files.createTempDirectory("graft-esc").toString
    val tricky = Seq(
      ("PX-1", "PX", """He said "hi" \ bye""", "d", "To Do", "new", "u", "u@e",
        "r", "r@e", "2024-01-01 00:00:00", "2024-01-02 00:00:00", "High",
        "Bug", null, null, null))
      .toDF("key", "project_key", "summary", "description", "status_name",
        "status_category", "assignee_name", "assignee_email", "reporter_name",
        "reporter_email", "c", "u2", "priority", "issuetype", "sprint",
        "epic_link", "parent_issue")
      .withColumn("created", col("c").cast("timestamp"))
      .withColumn("updated", col("u2").cast("timestamp"))
      .drop("c", "u2")
    Yaml.writeIssues(tricky, repo)
    val back = Yaml.readIssues(spark, repo).head
    assert(back.getAs[String]("summary") == """He said "hi" \ bye""")
  }

  test("property: arbitrary strings survive esc → snakeyaml parse exactly") {
    import org.scalacheck.Gen
    // bias toward the hostile ranges: C0/C1 controls, YAML specials, quotes,
    // backslashes, unicode line separators, surrogate-free high planes
    val hostileChar: Gen[Char] = Gen.oneOf(
      Gen.choose(0.toChar, 0x1f.toChar),
      Gen.oneOf('"', '\\', '\n', '\r', '\t', '\u007f', '\u0085',
        '\u2028', '\u2029', ':', '#', '-', '\'', '{', '}', '[', ']'),
      Gen.choose(0x80.toChar, 0x9f.toChar),
      Gen.alphaNumChar,
      Gen.choose(0x00a0.toChar, 0xd7ff.toChar))
    val genStr: Gen[String] =
      Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, hostileChar)).map(_.mkString)
    val yaml = new org.yaml.snakeyaml.Yaml()
    Iterator.continually(genStr.sample).flatten.take(300).foreach { s =>
      val rendered = {
        // drive through the real record renderer, not esc() in isolation
        val row = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array[Any]("K-1", "K", s, s, "", "", "", "", "", "", null, null,
            "", "", null, null, null, null, null),
          org.apache.spark.sql.types.StructType(
            (Yaml.columns ++ Yaml.relColumns).map(c =>
              org.apache.spark.sql.types.StructField(c,
                org.apache.spark.sql.types.StringType))))
        Yaml.toYamlString(row)
      }
      val m = yaml.load[java.util.Map[String, Object]](rendered)
      assert(Option(m.get("summary")).map(_.toString).getOrElse("") == s,
        s"summary mangled for ${s.map(_.toInt).mkString("[", ",", "]")}")
      assert(Option(m.get("description")).map(_.toString).getOrElse("") == s)
    }
  }

  test("YAML 1.1 unicode line breaks (NEL/LS/PS) and C1 controls round-trip") {
    import spark.implicits._
    val repo = Files.createTempDirectory("graft-u").toString
    // snakeyaml folds NEL/LS/PS like raw newlines if left unescaped —
    // the exact silent-content-change esc() must prevent
    val desc = "nel\u0085ls\u2028ps\u2029c1\u009fend"
    val tricky = Seq(("PX-3", "PX", "s", desc))
      .toDF("key", "project_key", "summary", "description")
    Yaml.writeIssues(tricky, repo)
    val back = Yaml.readIssues(spark, repo).head
    assert(back.getAs[String]("description") == desc)
  }

  test("multi-line description and empty timestamps survive the round-trip") {
    import spark.implicits._
    val repo = Files.createTempDirectory("graft-nl").toString
    val desc = "line one\nline two\ttabbed\r\nline three"
    val tricky = Seq(("PX-2", "PX", "s", desc))
      .toDF("key", "project_key", "summary", "description")
    // partial CDC schema: created/updated absent → written as "" → read as null
    Yaml.writeIssues(tricky, repo)
    val back = Yaml.readIssues(spark, repo).head
    assert(back.getAs[String]("description") == desc) // newlines NOT folded to spaces
    assert(back.getAs[java.sql.Timestamp]("created") == null)
    assert(back.getAs[java.sql.Timestamp]("updated") == null)
  }

  test("git sink: init, batch commits, clean worktree, conventional messages") {
    val repo = Files.createTempDirectory("graft-git").toString
    GitRepo.init(repo)
    assert(GitRepo.isClean(repo))

    // batch 1: two issues
    val b1 = Tables.issues(spark, sf).filter(col("project_key") === "P3").limit(2)
    Yaml.writeIssues(b1, repo)
    val h1 = GitRepo.commitBatch(repo, "feat(sync): sync batch 1 (2 issues)")
    assert(h1.isDefined)
    assert(GitRepo.isClean(repo))

    // idempotent re-run: same content → nothing to commit
    Yaml.writeIssues(b1, repo)
    assert(GitRepo.commitBatch(repo, "feat(sync): rerun").isEmpty)

    // batch 2: more issues → second commit
    val b2 = Tables.issues(spark, sf).filter(col("project_key") === "P4").limit(2)
    Yaml.writeIssues(b2, repo)
    val h2 = GitRepo.commitBatch(repo, "feat(sync): sync batch 2 (2 issues)")
    assert(h2.isDefined && h2 != h1)

    val log = GitRepo.log(repo)
    assert(log == Seq("feat(sync): sync batch 2 (2 issues)",
      "feat(sync): sync batch 1 (2 issues)"))
    assert(GitRepo.status(repo)("dirty") == "false")
  }

  test("distributed blob write + index-info commit: valid repo, clean tree, idempotent") {
    val repo = Files.createTempDirectory("graft-blobs").toString
    GitRepo.init(repo)
    val b1 = Tables.issues(spark, sf).filter(col("project_key") === "P1").limit(50).cache()
    val wr = Yaml.writeIssuesWithBlobs(b1, repo)
    assert(wr.written == b1.count() && wr.failed == 0)
    val h1 = GitRepo.commitIndexInfo(repo, "feat(sync): blob batch 1", wr.entries)
    assert(h1.isDefined)
    // the hand-rolled loose objects must be bit-valid to git itself
    val fsck = scala.sys.process.Process(
      Seq("git", "fsck", "--strict"), new java.io.File(repo)).!
    assert(fsck == 0, "git fsck rejected executor-written objects")
    // worktree content matches the index → status clean
    assert(GitRepo.isClean(repo))
    assert(GitRepo.log(repo).head == "feat(sync): blob batch 1")
    // idempotent re-run: same content → same tree → no new commit
    val wr2 = Yaml.writeIssuesWithBlobs(b1, repo)
    assert(GitRepo.commitIndexInfo(repo, "feat(sync): rerun", wr2.entries).isEmpty)
    // content readable back through git (not just the worktree)
    val (path, sha) = wr.entries.head
    val catOut = scala.sys.process.Process(
      Seq("git", "cat-file", "blob", sha), new java.io.File(repo)).!!
    val onDisk = new String(Files.readAllBytes(
      java.nio.file.Paths.get(repo, path)), java.nio.charset.StandardCharsets.UTF_8)
    assert(catOut == onDisk)
    b1.unpersist()
  }

  test("index-free tree commit: byte-identical trees to the index path, fsck-clean") {
    // two repos, same batches: one committed through the index
    // (commitIndexInfo), one through direct tree merging (commitTreeDirect) —
    // the resulting TREE shas must be identical commit by commit, proving the
    // hand-written tree objects (sort order, modes, binary shas) match what
    // git itself builds
    val viaIndex = Files.createTempDirectory("graft-tree-a").toString
    val direct = Files.createTempDirectory("graft-tree-b").toString
    GitRepo.init(viaIndex)
    GitRepo.init(direct)
    def treeOf(repo: String): String = scala.sys.process.Process(
      Seq("git", "rev-parse", "HEAD^{tree}"), new java.io.File(repo)).!!.trim
    val batches = Seq(
      Tables.issues(spark, sf).filter(col("project_key").isin("P1", "P2")).limit(60),
      Tables.issues(spark, sf).filter(col("project_key").isin("P2", "P3")).limit(80),
      // overlapping keys: updates must replace, not duplicate
      Tables.issues(spark, sf).filter(col("project_key") === "P1").limit(30)
        .withColumn("summary", concat(col("summary"), lit(" v2"))))
    batches.zipWithIndex.foreach { case (b, i) =>
      val w1 = Yaml.writeIssuesWithBlobs(b, viaIndex)
      assert(GitRepo.commitIndexInfo(viaIndex, s"feat(sync): batch $i", w1.entries).isDefined)
      val w2 = Yaml.writeIssuesWithBlobs(b, direct)
      assert(GitRepo.commitTreeDirect(direct, s"feat(sync): batch $i",
        w2.entries.iterator).isDefined)
      assert(treeOf(viaIndex) == treeOf(direct),
        s"batch $i: direct tree diverged from the index-built tree")
    }
    // hand-written tree objects are bit-valid to git itself
    assert(scala.sys.process.Process(
      Seq("git", "fsck", "--strict"), new java.io.File(direct)).! == 0,
      "git fsck rejected directly-written tree objects")
    // idempotent replay: same adds → same root tree → no commit
    val replay = Yaml.writeIssuesWithBlobs(batches.last, direct)
    assert(GitRepo.commitTreeDirect(direct, "replay", replay.entries.iterator).isEmpty)
    // history depth matches (3 commits each), messages intact
    assert(GitRepo.log(direct).take(3) == GitRepo.log(viaIndex).take(3))
  }

  test("tree-direct commits: stale index self-heals; modes and special names survive") {
    val repo = Files.createTempDirectory("graft-stale").toString
    GitRepo.init(repo)
    // seed through porcelain git: an executable (mode 100755) and a filename
    // with bytes that default `ls-tree` would C-quote — both live in the
    // SAME directory a tree-direct commit will rebuild
    val dir = java.nio.file.Paths.get(repo, "projects", "P1", "issues")
    Files.createDirectories(dir)
    Files.write(dir.resolve("hook.sh"), "#!/bin/sh\n".getBytes)
    dir.resolve("hook.sh").toFile.setExecutable(true)
    // a double quote forces C-quoting in default `ls-tree` output (kept
    // ASCII: the container's filesystem encoding can't create non-ASCII
    // names, but the quoting hazard is identical)
    val weird = "sp ce\"quote.yaml"
    Files.write(dir.resolve(weird),
      "k: v\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(GitRepo.commitBatch(repo, "chore: seed").isDefined)
    // index-free commit into the same directory
    val b = Tables.issues(spark, sf).filter(col("project_key") === "P1").limit(5)
    val wr = Yaml.writeIssuesWithBlobs(b, repo)
    assert(GitRepo.commitTreeDirect(repo, "feat(sync): direct batch",
      wr.entries.iterator).isDefined)
    // -z: NUL-delimited and UNQUOTED — quote-bearing names come back raw
    def lsr() = scala.sys.process.Process(
      Seq("git", "ls-tree", "-r", "-z", "HEAD"),
      new java.io.File(repo)).!!.split(0.toChar).toSeq.filter(_.nonEmpty)
    // the rebuilt tree preserved the exec mode and the raw special name
    assert(lsr().exists(l => l.startsWith("100755") && l.endsWith("hook.sh")),
      s"exec mode degraded: ${lsr().mkString("\n")}")
    assert(lsr().exists(_.endsWith(weird)), "special-byte name corrupted")
    assert(scala.sys.process.Process(
      Seq("git", "fsck", "--strict"), new java.io.File(repo)).! == 0)
    // the index is stale now, but validation self-heals instead of reporting
    // the tree-direct files as phantom dirt
    assert(GitRepo.isClean(repo), "stale index must self-heal for validate")
    assert(GitRepo.status(repo)("dirty") == "false")
    // and a subsequent INDEX-path commit must not write a tree missing the
    // tree-direct batch (the write-tree-from-stale-index hazard)
    val b2 = Tables.issues(spark, sf).filter(col("project_key") === "P2").limit(3)
    val wr2 = Yaml.writeIssuesWithBlobs(b2, repo)
    assert(GitRepo.commitTreeDirect(repo, "feat(sync): direct 2",
      wr2.entries.iterator).isDefined) // restale the index
    val b3 = Tables.issues(spark, sf).filter(col("project_key") === "P3").limit(3)
    val wr3 = Yaml.writeIssuesWithBlobs(b3, repo)
    assert(GitRepo.commitIndexInfo(repo, "feat(sync): via index", wr3.entries).isDefined)
    val paths = lsr().map(l => l.substring(l.indexOf('\t') + 1)).toSet
    assert(wr.entries.map(_._1).forall(paths) && wr2.entries.map(_._1).forall(paths) &&
      wr3.entries.map(_._1).forall(paths),
      "index-path commit dropped tree-direct files from HEAD")
    assert(paths.contains(s"projects/P1/issues/$weird") && paths.exists(_.endsWith("hook.sh")))
    assert(GitRepo.isClean(repo))
  }

  test("property: writeTree's keyed sort equals the definitional tree order") {
    // writeTree sorts on precomputed utf-8 keys (allocation-free compare);
    // treeOrder is the definitional per-comparison form. The two must agree
    // on every name git allows — including non-ASCII, prefixes, and the
    // dir-as-name+'/' rule — or tree shas silently diverge from git's own.
    import org.scalacheck.Gen
    import graft.sink.GitObjects
    import graft.sink.GitObjects.TreeEntry
    val genName = Gen.nonEmptyListOf(Gen.frequency(
      (8, Gen.alphaNumChar), (2, Gen.oneOf('-', '.', '_', ' ', '"', '\'')),
      (1, Gen.oneOf('é', '中', '\ud83d')), // latin-1, CJK, lone surrogate class
      (1, Gen.oneOf('a', 'a')))).map(_.mkString.take(24))
    val genEntries = Gen.listOfN(12, for {
      n <- genName; t <- Gen.oneOf(true, false)
    } yield TreeEntry(n, "0" * 40, t)).map(_.distinctBy(e => (e.name, e.isTree)))
    Iterator.continually(genEntries.sample).flatten.take(300).foreach { es =>
      val definitional = es.sortWith(GitObjects.treeOrder).map(e => (e.name, e.isTree))
      val keyed = es
        .map(e => ((if (e.isTree) e.name + "/" else e.name)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8), e))
        .sortWith((a, b) => java.util.Arrays.compareUnsigned(a._1, b._1) < 0)
        .map(t => (t._2.name, t._2.isTree))
      assert(keyed == definitional, s"sort orders diverged on ${es.map(_.name)}")
    }
  }

  test("commit message column maps issue types to conventional types") {
    import spark.implicits._
    val df = Seq(("Bug", "P1", "P1-1"), ("Story", "P1", "P1-2"),
      ("Task", "P2", "P2-3"), ("Epic", "P2", "P2-4"))
      .toDF("issuetype", "project", "key")
      .select(Yaml.commitMessage(col("issuetype"), col("project"), col("key"),
        lit("add")).as("msg"))
    val msgs = df.collect().map(_.getString(0)).toSeq
    assert(msgs == Seq(
      "fix(P1): add issue P1-1", "feat(P1): add issue P1-2",
      "chore(P2): add issue P2-3", "feat(P2): add issue P2-4"))
  }

  test("streaming CDC writes YAML + commits per micro-batch (the full sink path)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val repo = Files.createTempDirectory("graft-stream-sink").toString
    GitRepo.init(repo)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val issues = Tables.issues(spark, sf).limit(0).cache() // schema template
    val query = mem.toDF().toDF("key", "project_key")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // enrich the keys into full issue rows from the source table
        val full = Tables.issues(spark, sf)
          .join(batch.select("key"), Seq("key"), "left_semi")
        val n = Yaml.writeIssues(full, repo)
        GitRepo.commitBatch(repo, s"feat(sync): sync batch $id ($n issues)")
        ()
      }.start()
    try {
      val twoKeys = Tables.issues(spark, sf).select("key", "project_key")
        .orderBy("key").limit(2).as[(String, String)].collect()
      mem.addData(twoKeys.toIndexedSeq: _*)
      query.processAllAvailable()
    } finally query.stop()
    assert(GitRepo.log(repo).exists(_.startsWith("feat(sync): sync batch 0")))
    assert(GitRepo.isClean(repo))
  }

  test("partitioned corpus layout: two-column predicate prunes to one directory") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files
      .createTempDirectory("graft-prune-spec").toString + "/docs"
    Tables.t(spark, sf, "documents")
      .select("doc_id", "n_chars", "lang", "source")
      .write.mode("overwrite").partitionBy("source", "lang").parquet(out)
    val pruned = spark.read.parquet(out)
      .filter(col("source") === "src7" && col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("src7"),
      "source/lang predicates must prune partitions at the scan")
    // the physical proof: after pruning, the scan reads exactly as many
    // files as live under the ONE matching partition directory
    pruned.collect()
    val numFiles = pruned.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
      }.sum
    val dirFiles = new java.io.File(s"$out/source=src7/lang=en").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(numFiles == dirFiles && dirFiles >= 1,
      s"scan read $numFiles files; the matching directory holds $dirFiles")
  }
}
