package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.jql.Builder
import graft.jql.Builder.EpicAnalysis
import graft.queries.Jql

class BuilderSpec extends AnyFunSuite {
  import TestSpark._

  test("buildEpicQuery emits subtask clause only when analysis is non-empty") {
    assert(Builder.buildEpicQuery("E-7") == """"Epic Link" = E-7 ORDER BY key ASC""")
    assert(Builder.buildEpicQuery("E-7",
      analysis = Some(EpicAnalysis(10, hasSubtasks = true))) ==
      """("Epic Link" = E-7 OR parent in (issuesInEpic("E-7"))) ORDER BY key ASC""")
    assert(Builder.buildEpicQuery("E-7", projectKey = Some("P1")) ==
      """project = P1 AND "Epic Link" = E-7 ORDER BY key ASC""")
  }

  test("every template expands and compiles against the issues table") {
    val params = Map("epic" -> "E-7", "project" -> "P1", "keys" -> "P1-1, P1-2")
    Builder.templates.keys.foreach { name =>
      val jql = Builder.expand(name, params)
      val n = Jql.run(spark, sf, jql).count() // must parse + compile + run
      assert(n >= 0, s"template $name failed")
    }
  }

  test("buildFromTemplate matches the reference's documented example outputs") {
    // expected strings are the reference's own TemplateExample.ResultingJQL
    // values (pkg/jql/builder.go:141-246)
    assert(Builder.buildFromTemplate("epic-all-issues",
      Map("epic_key" -> "PROJ-123")) ==
      """"Epic Link" = PROJ-123 OR parent in (issuesInEpic("PROJ-123"))""")
    assert(Builder.buildFromTemplate("epic-stories-only",
      Map("epic_key" -> "PROJ-123")) ==
      """"Epic Link" = PROJ-123 AND type = Story""")
    assert(Builder.buildFromTemplate("project-active-issues",
      Map("project_key" -> "PROJ")) ==
      """project = PROJ AND status in ("To Do", "In Progress", "In Review")""")
    // optional conditional clause: absent without the param, present with it
    assert(Builder.buildFromTemplate("assignee-current-sprint", Map.empty) ==
      "assignee = currentUser() AND sprint in openSprints()")
    assert(Builder.buildFromTemplate("assignee-current-sprint",
      Map("project_key" -> "PROJ")) ==
      "assignee = currentUser() AND sprint in openSprints() AND project = PROJ")
    // default parameter: days falls back to 7
    assert(Builder.buildFromTemplate("recent-updates",
      Map("project_key" -> "PROJ")) ==
      "project = PROJ AND updated >= -7d ORDER BY updated DESC")
    assert(Builder.buildFromTemplate("recent-updates",
      Map("project_key" -> "PROJ", "days" -> "30")) ==
      "project = PROJ AND updated >= -30d ORDER BY updated DESC")
    // required parameter enforcement
    intercept[IllegalArgumentException](
      Builder.buildFromTemplate("recent-updates", Map.empty))
    intercept[IllegalArgumentException](
      Builder.buildFromTemplate("no-such-template", Map.empty))
  }

  test("every built-in template compiles and runs against the issues table") {
    val params = Map("epic_key" -> "E-7", "project_key" -> "P1")
    Builder.builtInTemplates.map(_.name).foreach { name =>
      val jql = Builder.buildFromTemplate(name, params)
      assert(Jql.run(spark, sf, jql).count() >= 0, s"template $name failed")
    }
  }

  test("expand rejects unknown templates and missing params") {
    intercept[IllegalArgumentException](Builder.expand("nope", Map.empty))
    intercept[IllegalArgumentException](Builder.expand("epic-stories", Map.empty))
  }

  test("optimize moves the project clause to the front") {
    assert(Builder.optimize("""status = "Done" AND project = P1""") ==
      """project = P1 AND status = "Done"""")
    assert(Builder.optimize("""project = P1 AND status = "Done"""") ==
      """project = P1 AND status = "Done"""")
    assert(Builder.optimize("status = \"Done\"") == "status = \"Done\"")
  }

  test("built epic query matches the jql_epic_union registered semantics") {
    val built = Builder.buildEpicQuery("E-7",
      analysis = Some(EpicAnalysis(10, hasSubtasks = true)))
    val viaBuilt = Jql.run(spark, sf, built).count()
    val viaRegistered = Jql.run(spark, sf,
      """"Epic Link" = E-7 OR parent in (issuesInEpic("E-7")) ORDER BY key ASC""").count()
    assert(viaBuilt == viaRegistered)
  }
}
