package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jql._
import graft.queries.Jql

class JqlSpec extends AnyFunSuite {
  import TestSpark._

  private def run(jql: String) = Jql.run(spark, sf, jql)

  test("every registered jql query runs and matches its hand-built filter") {
    queries.Jql.all.foreach { case queries.GQuery(name, fn, _) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed to run")
    }
  }

  test("doubled-quote escape reaches the compiled literal") {
    // "Issue ""7"" test" must compile to the literal: Issue "7" test
    val n = Jql.run(spark, sf, "summary = \"Issue \"\"7\"\" test\"").count()
    assert(n == 0) // no such summary, but parse + compile + run succeed
    // and the escape is not a parse error in validation either
    assert(graft.jql.Validator.validate("summary = \"a \"\"b\"\" c\"").valid)
  }

  test("precedence: NOT binds tighter than AND, AND tighter than OR") {
    val issues = Tables.issues(spark, sf)
    // a AND b OR c  ≡  (a AND b) OR c
    val viaJql = run("project = P1 AND priority = High OR project = P2").count()
    val expected = issues.filter(
      (lower(col("project_key")) === "p1" && lower(col("priority")) === "high")
        || lower(col("project_key")) === "p2").count()
    assert(viaJql == expected)
    // NOT a AND b  ≡  (NOT a) AND b
    val viaJql2 = run("NOT project = P1 AND priority = High").count()
    val expected2 = issues.filter(
      !(lower(col("project_key")) === "p1") && lower(col("priority")) === "high").count()
    assert(viaJql2 == expected2)
  }

  test("linkedIssues argument is case-insensitive like every key comparison") {
    val upper = run("issue in linkedIssues(P0-20)").count()
    val lower = run("issue in linkedIssues(p0-20)").count()
    assert(upper > 0 && lower == upper)
  }

  test("fuzz: arbitrary input never escapes JqlParseException, validate never throws") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcXYZ019 =!<>~()\",-_[]'privateANDORnotinORDERBYupdated"
    def garbage(): String =
      (0 until 1 + rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    // seed with near-valid prefixes too — deeper paths than pure noise reaches
    val prefixes = Seq("project = ", "key in (", "updated >= -", "cf[", "NOT (",
      "summary ~ \"", "status in (\"a\",", "ORDER BY ", "a = b ORDER BY ")
    (1 to 300).foreach { i =>
      val s = if (i % 3 == 0) prefixes(rnd.nextInt(prefixes.length)) + garbage()
              else garbage()
      try { Parser.parse(s); () }
      catch {
        case _: JqlParseException => () // the contract: controlled failure only
        case e: Throwable => fail(s"input ${i} '$s' escaped with ${e.getClass}: ${e.getMessage}")
      }
      val v = Validator.validate(s) // must never throw, valid or not
      assert(v != null)
    }
    // deep nesting must not blow the stack (recursive-descent depth bound)
    val deep = "(" * 500 + "project = P1" + ")" * 500
    try { Parser.parse(deep); () } catch { case _: JqlParseException => () }
  }

  test("property: random AND/OR/NOT trees compile to equivalent filters") {
    // pool over NON-NULL fields so JIRA's empty-excluding negation and plain
    // boolean negation coincide — null semantics have their own tests
    val pool: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      ("project = P3", lower(col("project_key")) === "p3"),
      ("""status = "In Progress"""", lower(col("status_name")) === "in progress"),
      ("priority = High", lower(col("priority")) === "high"),
      ("type in (Bug, Task)", lower(col("issuetype")).isin("bug", "task")),
      ("priority != Low", lower(col("priority")) =!= "low"))
    val rnd = new scala.util.Random(42)
    def gen(depth: Int): (String, org.apache.spark.sql.Column) =
      if (depth == 0 || rnd.nextInt(3) == 0) pool(rnd.nextInt(pool.length))
      else rnd.nextInt(3) match {
        case 0 =>
          val (ja, ca) = gen(depth - 1); val (jb, cb) = gen(depth - 1)
          (s"($ja) AND ($jb)", ca && cb)
        case 1 =>
          val (ja, ca) = gen(depth - 1); val (jb, cb) = gen(depth - 1)
          (s"($ja) OR ($jb)", ca || cb)
        case _ =>
          val (ja, ca) = gen(depth - 1)
          (s"NOT ($ja)", !ca)
      }
    val issues = Tables.issues(spark, sf).cache()
    (1 to 40).foreach { i =>
      val (jql, column) = gen(3)
      val viaJql = run(jql).count()
      val viaColumn = issues.filter(column).count()
      assert(viaJql == viaColumn, s"sample $i diverged: $jql")
    }
  }

  test("equality is case-insensitive (JIRA semantics)") {
    val a = run("""status = "done"""").count()
    val b = run("""status = "Done"""").count()
    assert(a == b && a > 0)
  }

  test("IN literal matches the union of equalities") {
    val in = run("""status in ("To Do", "Done")""").count()
    val or = run("""status = "To Do" OR status = "Done"""").count()
    assert(in == or)
  }

  test("negation excludes EMPTY rows — both != and NOT forms agree") {
    val neq = run("""parent != P0-4""").count()
    val notForm = run("""NOT parent = P0-4""").count()
    val withParent = Tables.issues(spark, sf)
      .filter(col("parent_issue").isNotNull && lower(col("parent_issue")) =!= "p0-4")
      .count()
    assert(neq == withParent)
    assert(notForm == withParent)
  }

  test("NOT IN excludes EMPTY rows like JIRA") {
    val notIn = run("""sprint not in ("Sprint 1")""").count()
    val expect = Tables.issues(spark, sf)
      .filter(lower(col("sprint")) =!= "sprint 1").count()
    assert(notIn == expect)
  }

  test("issuesInEpic lowers to a membership join matching a manual semi-join") {
    val viaJql = run("""key in (issuesInEpic("E-7"))""").count()
    val manual = Tables.issues(spark, sf)
      .filter(lower(col("epic_link")) === "e-7").count()
    assert(viaJql == manual && viaJql > 0)
  }

  test("bare function after IN parses (sprint in openSprints())") {
    val n = run("""sprint in openSprints()""").count()
    val expect = Tables.issues(spark, sf)
      .filter(lower(col("sprint")).isin("sprint 1", "sprint 2")).count()
    assert(n == expect && n > 0)
  }

  test("empty openSprints compiles to FALSE (TRUE when negated)") {
    val emptyCtx = JqlContext(Jql.ctx.now, "u", Seq.empty)
    val c = new JqlCompiler(Tables.issues(spark, sf), Tables.links(spark, sf), emptyCtx)
    assert(c.compile("""sprint in (openSprints())""").count() == 0)
    val total = Tables.issues(spark, sf).count()
    assert(c.compile("""sprint not in (openSprints())""").count() == total)
  }

  test("now() and startOfDay() work on date fields") {
    val n = run("""created <= now()""").count()
    val expect = Tables.issues(spark, sf)
      .filter(col("created") <= lit("1998-08-01 00:00:00").cast("timestamp")).count()
    assert(n == expect && n > 0)
    val m = run("""created <= startOfDay()""").count()
    assert(m == n) // ctx.now is already midnight
  }

  test("relative dates resolve against pinned now") {
    val n = run("""updated >= -30d""").count()
    val expect = Tables.issues(spark, sf)
      .filter(col("updated") >= lit("1998-07-02 00:00:00").cast("timestamp")).count()
    assert(n == expect)
  }

  test("person equality matches name or email, IN consistent with =") {
    val byName = run("""assignee = user5""").count()
    val byEmail = run("""assignee = "user5@example.com"""").count()
    assert(byName == byEmail && byName > 0)
    val byIn = run("""assignee in (user5)""").count()
    assert(byIn == byName) // IN routed through same person semantics
  }

  test("ORDER BY updated DESC returns newest first") {
    val rows = run("""project = P1 ORDER BY updated DESC""")
      .select(col("updated").cast("string")).limit(2).collect()
    if (rows.length == 2)
      assert(rows(0).getString(0) >= rows(1).getString(0))
  }

  test("AND binds tighter than OR; parentheses override") {
    val flat = run("""project = P1 OR project = P2 AND status = "Done"""").count()
    val expectFlat = Tables.issues(spark, sf).filter(
      lower(col("project_key")) === "p1" ||
        (lower(col("project_key")) === "p2" && lower(col("status_name")) === "done"))
      .count()
    assert(flat == expectFlat)
    val grouped = run("""(project = P1 OR project = P2) AND status = "Done"""").count()
    val expectGrouped = Tables.issues(spark, sf).filter(
      (lower(col("project_key")) === "p1" || lower(col("project_key")) === "p2") &&
        lower(col("status_name")) === "done").count()
    assert(grouped == expectGrouped && grouped != flat)
  }

  test("validator flags bad queries and passes good ones") {
    assert(Validator.validate("""project = P1 AND status = "Done"""").valid)
    assert(!Validator.validate("""project = P1 AND""").valid)
    assert(!Validator.validate("""project = "unclosed""").valid)
    assert(!Validator.validate("""(project = P1""").valid)
    val sug = Validator.validate("""a = 1 OR a = 2 OR a = 3 OR a = 4""")
    assert(sug.suggestions.exists(_.contains("IN")))
  }

  test("golden corpus: every JQL string the reference emits parses and compiles") {
    // drawn from the reference's templates, tests, and CLI examples
    // (pkg/jql/builder.go:126-246, pkg/jql/builder_test.go,
    // internal/cli/sync.go:58, pkg/epic/jira_analyzer.go:160-181)
    val corpus = Seq(
      """"Epic Link" = PROJ-123 OR parent in (issuesInEpic("PROJ-123"))""",
      """"Epic Link" = PROJ-123 AND type = Story""",
      """assignee = currentUser() AND sprint in openSprints() AND project = PROJ""",
      """assignee = currentUser() AND sprint in openSprints()""",
      """project = PROJ AND status in ("To Do", "In Progress", "In Review")""",
      """project = PROJ AND updated >= -7d ORDER BY updated DESC""",
      """cf[12311140] = PROJ-123""",
      """parent in (issuesInEpic("PROJ-123"))""",
      """key in (P1-1, P1-2)""",
      """Epic Link = PROJ-123""",                // unquoted multi-word field
      """project = PROJ AND status = To Do""",   // unquoted multi-word value
      """project = PROJ AND status = 'To Do'""",
      """project = PROJ AND assignee = currentUser()""",
      """project = PROJ""")
    corpus.foreach { jql =>
      assert(Validator.validate(jql).valid, s"validator rejected: $jql")
      val n = run(jql).count() // parse + compile + execute
      assert(n >= 0, s"failed to run: $jql")
    }
    // semantic check for the two liberal forms
    val unquotedField = run("""Epic Link = E-7""").count()
    val quotedField = run(""""Epic Link" = E-7""").count()
    assert(unquotedField == quotedField && quotedField > 0)
    val unquotedValue = run("""status = In Progress""").count()
    val quotedValue = run("""status = "In Progress"""").count()
    assert(unquotedValue == quotedValue && quotedValue > 0)
  }

  test("linkedIssues membership composes under OR with a second marker") {
    val n = run("""issue in linkedIssues(P0-20) OR key in (issuesInEpic("E-7"))""").count()
    val a = run("""issue in linkedIssues(P0-20)""").count()
    val b = run("""key in (issuesInEpic("E-7"))""").count()
    assert(n <= a + b && n >= math.max(a, b))
  }

  // ---- history operators (WAS / CHANGED over Tables.statusHistory) ----

  test("WAS with no window includes the CURRENT value (JIRA rule)") {
    // every currently-Done issue WAS Done
    val currentlyDone = run("""status = Done""").count()
    val wasDone = run("""status WAS "Done"""").count()
    assert(wasDone >= currentlyDone && currentlyDone > 0)
    // and WAS ∪ WAS NOT partitions the corpus (key marker is two-valued)
    val wasNot = run("""status WAS NOT "Done"""").count()
    assert(wasDone + wasNot == Tables.issues(spark, sf).count())
  }

  test("WAS matches a PAST value the current snapshot no longer has") {
    // an issue whose changelog passed through Done but currently isn't
    val h = Tables.statusHistory(spark, sf)
    val pastOnly = h.filter(col("status_name") === "Done")
      .select("key").distinct()
      .join(Tables.issues(spark, sf).filter(col("status_name") === "Done")
        .select("key"), Seq("key"), "left_anti").count()
    assert(pastOnly > 0, "fixture must contain past-only Done issues")
    val wasDone = run("""status WAS "Done"""").count()
    val isDone = run("""status = Done""").count()
    assert(wasDone == isDone + pastOnly)
  }

  test("WAS ON instant picks exactly the interval containing it") {
    val d = "1995-06-01"
    val n = run(s"""status WAS "In Progress" ON "$d"""").count()
    val manual = Tables.statusHistory(spark, sf)
      .filter(col("status_name") === "In Progress" &&
        col("changed_at") <= lit(java.sql.Timestamp.valueOf(s"$d 00:00:00")) &&
        (col("valid_to").isNull ||
          col("valid_to") > lit(java.sql.Timestamp.valueOf(s"$d 00:00:00"))))
      .select("key").distinct().count()
    assert(n == manual && n > 0)
  }

  test("CHANGED with FROM/TO constrains transition endpoints") {
    val all = run("""status CHANGED""").count()
    val fromTo = run("""status CHANGED FROM "To Do" TO "In Progress"""").count()
    assert(all > 0 && fromTo > 0 && fromTo < all)
    // never-changed issues (single-interval changelogs) are the complement
    val h = Tables.statusHistory(spark, sf)
    val everChanged = h.filter(col("prev_status").isNotNull)
      .select("key").distinct().count()
    assert(all == everChanged)
    // NOT CHANGED picks exactly the rest
    val notChanged = run("""NOT status CHANGED""").count()
    assert(all + notChanged == Tables.issues(spark, sf).count())
  }

  test("CHANGED windows: AFTER/BEFORE/DURING agree with manual filters") {
    val cut = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val h = Tables.statusHistory(spark, sf).filter(col("prev_status").isNotNull)
    val after = run("""status CHANGED AFTER "1996-01-01"""").count()
    assert(after == h.filter(col("changed_at") > lit(cut))
      .select("key").distinct().count())
    val during = run(
      """status CHANGED DURING ("1994-01-01", "1996-01-01")""").count()
    assert(during == h.filter(
      col("changed_at") >= lit(java.sql.Timestamp.valueOf("1994-01-01 00:00:00")) &&
        col("changed_at") <= lit(cut)).select("key").distinct().count())
  }

  test("history operators reject unsupported shapes with parse errors") {
    // WAS/CHANGED only have a changelog for status
    intercept[JqlParseException](run("""priority WAS "High"""").count())
    intercept[JqlParseException](run("""assignee CHANGED""").count())
    // BY has no actor in the engine's history
    intercept[JqlParseException](run("""status WAS "Done" BY user1""").count())
    // FROM/TO are CHANGED-only
    intercept[JqlParseException](run("""status WAS "Done" FROM "To Do"""").count())
    // duplicate FROM
    intercept[JqlParseException](
      run("""status CHANGED FROM "To Do" FROM "Done"""").count())
    // and a compiler without a history binding fails loudly, not silently
    val bare = new JqlCompiler(Tables.issues(spark, sf),
      Tables.links(spark, sf), Jql.ctx)
    intercept[RuntimeException](bare.compile("""status WAS "Done""""))
  }

  test("WAS composes with ordinary predicates and ORDER BY") {
    val df = run(
      """project = P1 AND status WAS "Done" BEFORE "1995-06-01" ORDER BY updated DESC""")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // output schema is the issues schema (markers dropped)
    assert(df.columns.toSeq == Tables.issues(spark, sf).columns.toSeq)
    // bare multi-word value absorption stops at the qualifier word
    // (`In Progress` must be QUOTED after WAS — bare `In` is the IN keyword,
    // exactly as in server JQL — so exercise the bare path with `To Do`)
    val q = Parser.parse("""status WAS To Do BEFORE "1995-06-01"""")
    q.where match {
      case Some(JWas(_, Seq(JWord(v)), false, Seq(JHistQual("before", _)))) =>
        assert(v == "To Do")
      case other => fail(s"unexpected AST: $other")
    }
    intercept[JqlParseException](Parser.parse("status WAS In Progress"))
  }
}
