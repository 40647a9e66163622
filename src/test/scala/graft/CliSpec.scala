package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[Cli.run]] in-process (it reuses the test session via
  * getOrCreate): the command surface is parsing + wiring, so the tests
  * assert exit codes and on-disk effects, not engine semantics — those are
  * EngineSpec's and the oracle gate's job.
  */
class CliSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("sync: full run writes the repo and state, prints metrics, exits 0") {
    spark // force session init so Cli's getOrCreate joins it
    val repo = tmp("graft-cli-repo")
    val state = s"${tmp("graft-cli-state")}/state"
    val rc = Cli.run(Array("sync", "--source", sf, "--repo", repo,
      "--state", state, "--projects", "P1"))
    assert(rc == 0)
    assert(Files.isDirectory(Paths.get(repo, "projects", "P1", "issues")),
      "sync must materialize the YAML tree")
    assert(Files.exists(Paths.get(state)), "sync must persist state")
    // a second incremental run over unchanged input skips everything
    val rc2 = Cli.run(Array("sync", "--source", sf, "--repo", repo,
      "--state", state, "--projects", "P1", "--incremental"))
    assert(rc2 == 0)
  }

  test("recover reports cleanly after a sync; repair flag accepted") {
    spark
    val repo = tmp("graft-cli-repo2")
    val state = s"${tmp("graft-cli-state2")}/state"
    assert(Cli.run(Array("sync", "--source", sf, "--repo", repo,
      "--state", state, "--projects", "P2")) == 0)
    assert(Cli.run(Array("recover", "--source", sf, "--repo", repo,
      "--state", state)) == 0)
    assert(Cli.run(Array("recover", "--source", sf, "--repo", repo,
      "--state", state, "--repair")) == 0)
  }

  test("reconcile: bounded ticks run declared resources to completion") {
    spark
    val repo = tmp("graft-cli-rec-repo")
    val state = s"${tmp("graft-cli-rec-state")}/state"
    val resFile = Paths.get(tmp("graft-cli-res"), "resources.json")
    Files.write(resFile,
      """[{"name":"once","sync_type":"jql","jql_query":"project = P1",
        |  "dry_run":true,
        |  "retry":{"max_retries":2,"backoff_multiplier":2.0,"initial_delay_sec":1}}]
        |""".stripMargin.getBytes("UTF-8"))
    val rc = Cli.run(Array("reconcile", "--source", sf, "--repo", repo,
      "--state", state, "--resources", resFile.toString,
      "--ticks", "2", "--step-ms", "10"))
    assert(rc == 0)
    // the same resource as a YAML manifest array parses identically
    val yml = Paths.get(tmp("graft-cli-resy"), "resources.yaml")
    Files.write(yml,
      """- name: once-y
        |  sync_type: jql
        |  jql_query: project = P1
        |  dry_run: true
        |  retry:
        |    max_retries: 1
        |    backoff_multiplier: 2.0
        |    initial_delay_sec: 1
        |""".stripMargin.getBytes("UTF-8"))
    val parsed = Cli.parseResources(yml.toString)
    assert(parsed.size == 1 && parsed.head.name == "once-y" &&
      parsed.head.spec.jql_query.contains("project = P1") &&
      parsed.head.retryPolicy.exists(_.maxRetries == 1))
    // bad resources file is a usage error, not a crash
    val bad = Paths.get(tmp("graft-cli-badres"), "r.json")
    Files.write(bad, "{\"not\":\"an array\"}".getBytes("UTF-8"))
    assert(Cli.run(Array("reconcile", "--source", sf, "--repo", repo,
      "--state", state, "--resources", bad.toString, "--ticks", "1")) == 2)
    assert(Cli.run(Array("reconcile", "--source", sf)) == 2)
  }

  test("reconcile: K8s GraftSync manifests parse (deploy/examples + CRD)") {
    // the committed example drives the loop verbatim — kubectl multi-doc
    val parsed = Cli.parseResources("deploy/examples/graftsync-example.yaml")
    assert(parsed.size == 2)
    val nightly = parsed.find(_.name == "nightly-project-sync").get
    assert(nightly.spec.sync_type == "jql")
    assert(nightly.spec.jql_query.contains("project = PROJ AND updated >= -1d"))
    assert(nightly.spec.destination == "/data/repo")
    assert(nightly.schedule.isDefined) // "0 2 * * *"
    assert(nightly.retryPolicy.exists(r =>
      r.maxRetries == 3 && r.backoffMultiplier == 2.0 && r.initialDelaySec == 30))
    val hotfix = parsed.find(_.name == "hotfix-batch").get
    assert(hotfix.spec.sync_type == "batch" && hotfix.spec.dry_run &&
      hotfix.spec.issue_keys == Seq("PROJ-101", "PROJ-102") &&
      hotfix.schedule.isEmpty && hotfix.retryPolicy.isEmpty)
    // a manifest of the wrong kind is rejected, not silently synced
    val badKind = Paths.get(tmp("graft-cli-badkind"), "r.yaml")
    Files.write(badKind,
      """apiVersion: apps/v1
        |kind: Deployment
        |metadata:
        |  name: oops
        |spec:
        |  replicas: 1
        |""".stripMargin.getBytes("UTF-8"))
    intercept[IllegalArgumentException](Cli.parseResources(badKind.toString))
    // flat and manifest shapes may mix in one YAML stream
    val mixed = Paths.get(tmp("graft-cli-mixed"), "r.yaml")
    Files.write(mixed,
      """- name: flat-one
        |  sync_type: jql
        |  jql_query: project = P1
        |---
        |apiVersion: graft.dev/v1alpha1
        |kind: GraftSync
        |metadata:
        |  name: manifest-one
        |spec:
        |  syncType: single
        |  target:
        |    issueKeys: [P1-1]
        |  destination:
        |    repository: ./r
        |""".stripMargin.getBytes("UTF-8"))
    val both = Cli.parseResources(mixed.toString)
    assert(both.map(_.name) == Seq("flat-one", "manifest-one"))
    assert(both.last.spec.issue_keys == Seq("P1-1"))
    // the CRD itself is well-formed YAML with the GraftSync names + schema
    val crd = new String(Files.readAllBytes(
      Paths.get("deploy/crds/graftsync-crd.yaml")), "UTF-8")
    val tree = new org.yaml.snakeyaml.Yaml().load[java.util.Map[String, Object]](crd)
    assert(tree.get("kind") == "CustomResourceDefinition")
    val spec = tree.get("spec").asInstanceOf[java.util.Map[String, Object]]
    assert(spec.get("group") == "graft.dev")
    assert(spec.get("names").asInstanceOf[java.util.Map[String, Object]]
      .get("kind") == "GraftSync")
    // every phase the Reconciler can publish is an allowed status enum value
    val crdText = crd
    Seq("Scheduled", "Pending", "Running", "Completed", "Failed", "Retrying")
      .foreach(p => assert(crdText.contains(p), s"CRD missing phase $p"))
  }

  test("render: GraftApiServer CR -> kubectl-appliable trio; invalid spec exits 1") {
    val out = java.nio.file.Files.createTempDirectory("graft-render").toString
    val rc = Cli.run(Array("render",
      "--resources", "deploy/examples/graftapiserver-example.yaml",
      "--out", out))
    assert(rc == 0)
    val files = new java.io.File(out).list().toSet
    assert(files == Set("graft-api-api-config-configmap.yaml",
      "graft-api-api-deployment.yaml", "graft-api-api-service.yaml"),
      s"rendered: $files")
    // the rendered deployment round-trips as YAML and carries the CR's image
    val dep = new org.yaml.snakeyaml.Yaml().load[java.util.Map[String, Object]](
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(out, "graft-api-api-deployment.yaml")))
    assert(dep.get("kind") == "Deployment")
    assert(dep.toString.contains("graft/api-server:v1.0.0"))
    // a spec violating the CRD bounds fails the command, not silently renders
    val bad = java.nio.file.Files.createTempFile("graft-badcr", ".yaml")
    java.nio.file.Files.writeString(bad,
      java.nio.file.Files.readString(java.nio.file.Paths.get(
        "deploy/examples/graftapiserver-example.yaml"))
        .replace("replicas: 2", "replicas: 99"))
    assert(Cli.run(Array("render", "--resources", bad.toString, "--out", out)) == 1)
    assert(Cli.run(Array("render", "--out", out)) == 2) // missing --resources
  }

  test("validate: good JQL exits 0, bad JQL 1, missing args 2") {
    assert(Cli.run(Array("validate", "--jql", "project = P1 ORDER BY key ASC")) == 0)
    assert(Cli.run(Array("validate", "--jql", "project = ")) == 1)
    assert(Cli.run(Array("validate")) == 2)
    assert(Cli.run(Array("sync")) == 2)
    assert(Cli.run(Array("nonsense")) == 2)
    assert(Cli.run(Array.empty[String]) == 2)
  }

  test("profile: full CRUD + templates + export/import round-trip") {
    val store = tmp("graft-cli-prof")
    def p(args: String*): Int =
      Cli.run(("profile" +: args :+ "--store" :+ store).toArray)
    // create from flags, show, list
    assert(p("create", "--name", "plain", "--jql", "project = P1",
      "--repository", "./r") == 0)
    assert(p("show", "plain") == 0)
    assert(p("show", "missing") == 1)
    assert(p("list") == 0)
    // duplicate create fails
    assert(p("create", "--name", "plain", "--jql", "x") == 1)
    // create from a template: flags double as variables
    assert(p("create", "--template", "project-active-issues",
      "--name", "proj-active", "--var", "project_key=P2",
      "--var", "repository=./p2") == 0)
    val created = new api.ProfileStore(store).get("proj-active").get
    assert(created.jql == "project = P2 AND status != Closed AND status != Done")
    assert(created.repository == "./p2")
    // a missing required variable is a usage error
    assert(p("create", "--template", "epic-all-issues", "--name", "e1") == 2)
    assert(p("create", "--template", "nope", "--name", "x") == 2)
    // update + delete
    assert(p("update", "plain", "--jql", "project = P9") == 0)
    assert(new api.ProfileStore(store).get("plain").get.jql == "project = P9")
    assert(p("update", "missing", "--jql", "x") == 1)
    // templates listing
    assert(p("templates") == 0)
    assert(p("templates", "--details") == 0)
    // export → import into a fresh store (merge semantics: no overwrite)
    val out = s"${tmp("graft-cli-prof-exp")}/profiles-export.json"
    assert(p("export", "--out", out) == 0)
    val store2 = tmp("graft-cli-prof2")
    assert(Cli.run(Array("profile", "import", "--in", out,
      "--store", store2)) == 0)
    val s2 = new api.ProfileStore(store2)
    assert(s2.list().map(_.name).toSet == Set("plain", "proj-active"))
    // re-import without --overwrite skips everything, changes nothing
    assert(Cli.run(Array("profile", "import", "--in", out,
      "--store", store2)) == 0)
    assert(s2.list().size == 2)
    assert(p("delete", "plain") == 0)
    assert(p("delete", "plain") == 1)
    // missing subcommand / bad subcommand are usage errors
    assert(Cli.run(Array("profile")) == 2)
    assert(Cli.run(Array("profile", "bogus")) == 2)
  }

  test("sync: --issues key list and --profile selection with usage accounting") {
    spark
    val repo = tmp("graft-cli-keys-repo")
    val state = s"${tmp("graft-cli-keys-state")}/state"
    // two explicit keys (taken from the fixture — issue numbering is
    // sparse) sync exactly those two issues
    import org.apache.spark.sql.functions.col
    val Array(k1, k2, k3) = Tables.issues(spark, sf)
      .filter(col("project_key") === "P1").select("key")
      .orderBy("key").limit(3).collect().map(_.getString(0))
    val rc = Cli.run(Array("sync", "--source", sf, "--repo", repo,
      "--state", state, "--issues", s"$k1,$k2"))
    assert(rc == 0)
    assert(Files.exists(Paths.get(repo, "projects", "P1", "issues", s"$k1.yaml")))
    assert(Files.exists(Paths.get(repo, "projects", "P1", "issues", s"$k2.yaml")))
    assert(!Files.exists(Paths.get(repo, "projects", "P1", "issues", s"$k3.yaml")))
    // profile-driven: the profile's jql selects, usage is recorded back
    val store = tmp("graft-cli-sync-prof")
    assert(Cli.run(Array("profile", "create", "--name", "p3only",
      "--jql", s"""key in ("$k3")""", "--repository", "./r",
      "--store", store)) == 0)
    assert(Cli.run(Array("sync", "--source", sf, "--repo", repo,
      "--state", s"${tmp("s2")}/state", "--profile", "p3only",
      "--store", store)) == 0)
    assert(Files.exists(Paths.get(repo, "projects", "P1", "issues", s"$k3.yaml")))
    val used = new api.ProfileStore(store).get("p3only").get.usage
    assert(used.times_used == 1 && used.success_count == 1)
    // unknown profile is an error, not a full-corpus sync
    assert(Cli.run(Array("sync", "--source", sf, "--repo", repo,
      "--state", state, "--profile", "nope", "--store", store)) == 1)
  }

  test("serve: missing args exit 2; startServer binds and answers health") {
    assert(Cli.run(Array("serve")) == 2)
    val work = java.nio.file.Files.createTempDirectory("graft-cli-serve").toString
    val (server, port) = Cli.startServer(Map(
      "source" -> TestSpark.sf, "repo" -> s"$work/repo",
      "state" -> s"$work/state", "port" -> "0"))
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      val resp = http.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/api/v1/health")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      assert(resp.body().contains("\"status\":\"healthy\""))
    } finally server.stop()
  }
}
