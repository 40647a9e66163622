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
