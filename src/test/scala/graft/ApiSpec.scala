package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.sql.Timestamp

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{ApiServer, ProfileStore}
import graft.jobs.JobManager
import graft.model.SyncJobSpec

/** End-to-end REST façade coverage: every route in the reference's mux
  * (reference: internal/api/server.go:148-172) exercised over a real HTTP
  * client against a live server bound to an ephemeral port, with sync jobs
  * doing real engine work against the sf0.001 fixture.
  */
class ApiSpec extends AnyFunSuite {
  import TestSpark._

  private val mapper = {
    val m = new ObjectMapper(); m.registerModule(DefaultScalaModule); m
  }

  private def parse(s: String): Map[String, Any] = {
    def norm(v: Any): Any = v match {
      case m: java.util.Map[_, _] =>
        import scala.jdk.CollectionConverters._
        m.asScala.map { case (k, x) => String.valueOf(k) -> norm(x) }.toMap
      case l: java.util.List[_] =>
        import scala.jdk.CollectionConverters._
        l.asScala.map(norm).toSeq
      case m: scala.collection.Map[_, _] =>
        m.map { case (k, x) => String.valueOf(k) -> norm(x) }.toMap
      case sq: scala.collection.Seq[_] => sq.map(norm).toSeq
      case other => other
    }
    norm(mapper.readValue(s, classOf[Object])).asInstanceOf[Map[String, Any]]
  }

  private val http = HttpClient.newHttpClient()

  private def call(method: String, url: String, body: String = ""): (Int, Map[String, Any]) = {
    val b = HttpRequest.newBuilder(URI.create(url))
    val req = (method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
        .header("Content-Type", "application/json")
    }).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), parse(resp.body()))
  }

  private def data(r: Map[String, Any]): Map[String, Any] =
    r("data").asInstanceOf[Map[String, Any]]
  private def error(r: Map[String, Any]): Map[String, Any] =
    r("error").asInstanceOf[Map[String, Any]]

  // deterministic, strictly increasing clock so job IDs never collide
  private val clockMs = new java.util.concurrent.atomic.AtomicLong(
    Timestamp.valueOf("2002-01-01 00:00:00").getTime)
  private def tick(): Timestamp = new Timestamp(clockMs.addAndGet(1000))

  private val work = Files.createTempDirectory("graft-api").toString
  private val manager = new JobManager(spark)
  private val store = new ProfileStore(s"$work/profiles")
  private lazy val issuesDf = Tables.issues(spark, sf).cache()
  private lazy val linksDf = Tables.links(spark, sf)
  private val apiServer = new ApiServer(spark, manager, store,
    () => issuesDf, () => linksDf, s"$work/repos", s"$work/state",
    version = "test-1", clock = () => tick())
  private lazy val base = s"http://127.0.0.1:${apiServer.start()}/api/v1"

  // a second server with its own manager and NO HTTP sync traffic, so
  // directly-submitted jobs deterministically stay Pending (the shared
  // server's worker could drain them mid-test otherwise)
  private val parkedManager = new JobManager(spark)
  private val parked = new ApiServer(spark, parkedManager, store,
    () => issuesDf, () => linksDf, s"$work/repos2", s"$work/state2",
    version = "test-parked", clock = () => tick())
  private lazy val parkedBase = s"http://127.0.0.1:${parked.start()}/api/v1"

  private lazy val someKey: String =
    issuesDf.select("key").head.getString(0)

  test("health, system info, docs") {
    val (hs, hr) = call("GET", s"$base/health")
    assert(hs == 200 && hr("success") == true)
    assert(data(hr)("status") == "healthy")
    val comps = data(hr)("components").asInstanceOf[Map[String, Any]]
    assert(comps("job_manager").asInstanceOf[Map[String, Any]]("status") == "healthy")
    assert(hr("meta").asInstanceOf[Map[String, Any]]("version") == "test-1")

    val (is, ir) = call("GET", s"$base/system/info")
    assert(is == 200)
    assert(data(ir)("api_version") == "v1")
    assert(data(ir)("capabilities").asInstanceOf[Seq[Any]]
      .toSet == Set("sync", "jobs", "profiles", "monitoring"))

    val (ds, dr) = call("GET", s"$base/docs")
    assert(ds == 200)
    val endpoints = data(dr)("endpoints").asInstanceOf[Seq[Any]].map(String.valueOf)
    assert(endpoints.size == 20)
    assert(endpoints.contains("POST /api/v1/sync/jql"))
  }

  test("templates catalog lists built-ins with variable specs") {
    val (s, r) = call("GET", s"$base/templates")
    assert(s == 200 && r("success") == true)
    val ts = data(r)("templates").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    assert(data(r)("count") == ts.size && ts.size >= 7)
    val ids = ts.map(_("id")).toSet
    assert(Set("epic-all-issues", "project-active-issues", "custom-jql")
      .subsetOf(ids.map(String.valueOf)))
    val epic = ts.find(_("id") == "epic-all-issues").get
    val vars = epic("variables").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    assert(vars.exists(v => v("name") == "epic_key" && v("required") == true))
  }

  test("unknown endpoint is a 404 with the error envelope") {
    val (s, r) = call("GET", s"$base/nope")
    assert(s == 404 && r("success") == false)
    assert(error(r)("code") == "NOT_FOUND")
  }

  test("malformed JSON body is a 400 INVALID_REQUEST, not a 500") {
    val (s, r) = call("POST", s"$base/sync/single", "{not json")
    assert(s == 400 && error(r)("code") == "INVALID_REQUEST")
  }

  test("middleware: CORS on every response, OPTIONS preflight, request ids") {
    val req = HttpRequest.newBuilder(URI.create(s"$base/health")).GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    assert(resp.headers().firstValue("Access-Control-Allow-Origin").orElse("") == "*")
    assert(resp.headers().firstValue("X-Request-Id").orElse("").startsWith("req-"))

    val pre = HttpRequest.newBuilder(URI.create(s"$base/sync/single"))
      .method("OPTIONS", HttpRequest.BodyPublishers.noBody()).build()
    val preResp = http.send(pre, HttpResponse.BodyHandlers.ofString())
    assert(preResp.statusCode() == 204)
    assert(preResp.headers().firstValue("Access-Control-Allow-Methods").orElse("")
      .contains("POST"))
  }

  test("synchronous single-issue sync runs the engine end-to-end") {
    val (s, r) = call("POST", s"$base/sync/single",
      s"""{"issue_key": "$someKey", "repository": "$work/repos"}""")
    assert(s == 200, r.toString)
    val result = data(r)("result").asInstanceOf[Map[String, Any]]
    assert(String.valueOf(result("successful_sync")).toLong == 1L)
    val jobId = String.valueOf(data(r)("job_id"))
    // the YAML artifact really exists under the job's repo
    val proj = someKey.split("-")(0)
    assert(Files.exists(java.nio.file.Paths.get(
      s"$work/repos/$jobId/projects/$proj/issues/$someKey.yaml")))
    // and the job is visible as Completed
    val (js, jr) = call("GET", s"$base/jobs/$jobId")
    assert(js == 200 && data(jr)("status") == "Completed")
    assert(data(jr)("type") == "single")
  }

  test("single sync validation: bad key and missing fields are 400") {
    val (s1, r1) = call("POST", s"$base/sync/single",
      s"""{"issue_key": "lowercase-1", "repository": "r"}""")
    assert(s1 == 400 && error(r1)("code") == "VALIDATION_ERROR")
    val (s2, r2) = call("POST", s"$base/sync/single", """{"issue_key": "P1-1"}""")
    assert(s2 == 400 && error(r2)("code") == "VALIDATION_ERROR")
  }

  test("jql sync rejects invalid JQL at the door") {
    val (s, r) = call("POST", s"$base/sync/jql",
      s"""{"jql": "project = P1 AND AND bad", "repository": "$work/repos"}""")
    assert(s == 400 && error(r)("code") == "VALIDATION_ERROR")
    assert(String.valueOf(error(r)("details")).contains("duplicate operator"))
  }

  test("async jql sync: 202, then the worker drains it to Completed") {
    val (s, r) = call("POST", s"$base/sync/jql",
      s"""{"jql": "project = P3 AND status != \\"Done\\"", "repository": "$work/repos"}""")
    assert(s == 202, r.toString)
    assert(data(r)("status") == "Pending")
    val jobId = String.valueOf(data(r)("job_id"))
    var status = ""
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (status != "Completed" && status != "Failed" && System.nanoTime() < deadline) {
      Thread.sleep(150)
      status = String.valueOf(data(call("GET", s"$base/jobs/$jobId")._2)("status"))
    }
    assert(status == "Completed")
    val (_, jr) = call("GET", s"$base/jobs/$jobId")
    val result = data(jr)("result").asInstanceOf[Map[String, Any]]
    assert(String.valueOf(result("total_issues")).toLong > 0)
    // logs narrate the phase machine
    val (ls, lr) = call("GET", s"$base/jobs/$jobId/logs")
    assert(ls == 200)
    val logs = data(lr)("logs").asInstanceOf[Seq[Any]].map(String.valueOf)
    assert(logs.exists(_.startsWith("completed:")) && logs.contains("status: Completed"))
  }

  test("batch sync validates every key and is always async") {
    val (bad, br) = call("POST", s"$base/sync/batch",
      s"""{"issue_keys": ["$someKey", "nope"], "repository": "$work/repos"}""")
    assert(bad == 400 && String.valueOf(error(br)("details")).contains("nope"))
    val (s, r) = call("POST", s"$base/sync/batch",
      s"""{"issue_keys": ["$someKey"], "repository": "$work/repos"}""")
    assert(s == 202 && String.valueOf(data(r)("job_id")).startsWith("batch-"))
  }

  test("job list filters by status/type and paginates; queue status counts") {
    // park two jobs as Pending by submitting directly (the worker only
    // wakes for HTTP submissions)
    val spec = SyncJobSpec("jql", Seq.empty, Some("project = P0"), None, None,
      s"$work/repos2", None, 0, 0, 0, dry_run = true)
    val p1 = parkedManager.submit(spec, tick())
    val p2 = parkedManager.submit(spec.copy(jql_query = Some("project = P1")), tick())

    val (ls, lr) = call("GET", s"$parkedBase/jobs?status=pending&page_size=1")
    assert(ls == 200)
    assert(data(lr)("jobs").asInstanceOf[Seq[Any]].size == 1)
    assert(String.valueOf(data(lr)("total_count")).toInt >= 2)
    assert(data(lr)("has_more") == true)

    val (ts, tr) = call("GET", s"$parkedBase/jobs?type=jql&status=pending")
    assert(ts == 200)
    val typed = data(tr)("jobs").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    assert(typed.forall(_("type") == "jql"))

    val (qs, qr) = call("GET", s"$parkedBase/jobs/queue/status")
    assert(qs == 200)
    assert(String.valueOf(data(qr)("pending_jobs")).toInt >= 2)
    assert(String.valueOf(data(qr)("total_jobs")).toInt ==
      parkedManager.list().size)

    // cancel one pending job; delete it; the other one cleans up too
    val (cs, cr) = call("POST", s"$parkedBase/jobs/$p1/cancel")
    assert(cs == 200 && data(cr)("job_id") == p1)
    assert(String.valueOf(data(call("GET", s"$parkedBase/jobs/$p1")._2)("status")) == "Cancelled")
    val (cs2, cr2) = call("POST", s"$parkedBase/jobs/$p1/cancel")
    assert(cs2 == 409 && error(cr2)("code") == "JOB_CANCEL_ERROR")
    val (del, _) = call("DELETE", s"$parkedBase/jobs/$p1")
    assert(del == 200)
    val (gone, gr) = call("GET", s"$parkedBase/jobs/$p1")
    assert(gone == 404 && error(gr)("code") == "JOB_NOT_FOUND")
    assert(call("POST", s"$parkedBase/jobs/$p2/cancel")._1 == 200)
    assert(call("DELETE", s"$parkedBase/jobs/$p2")._1 == 200)
  }

  test("profile CRUD round-trip with validation and usage accounting") {
    val profile = s"""{
      "name": "nightly-p3", "description": "nightly P3 sync",
      "repository": "$work/repos",
      "jql": "project = P3", "tags": ["nightly"],
      "options": {"concurrency": 2, "incremental": true, "include_links": true}
    }"""
    val (cs, cr) = call("POST", s"$base/profiles", profile)
    assert(cs == 201, cr.toString)
    assert(data(cr)("name") == "nightly-p3")
    val createdAt = String.valueOf(data(cr)("created_at"))

    val (dup, dr) = call("POST", s"$base/profiles", profile)
    assert(dup == 409 && error(dr)("code") == "PROFILE_EXISTS")

    val (bs, br2) = call("POST", s"$base/profiles",
      s"""{"name": "Bad Name", "repository": "r", "jql": "project = P1"}""")
    assert(bs == 400 && String.valueOf(error(br2)("details")).contains("invalid profile name"))

    val (js, jr2) = call("POST", s"$base/profiles",
      s"""{"name": "bad-jql", "repository": "r", "jql": "a = ("}""")
    assert(js == 400 && String.valueOf(error(jr2)("details")).contains("jql:"))

    val (us, ur) = call("PUT", s"$base/profiles/nightly-p3",
      s"""{"description": "updated", "repository": "$work/repos", "jql": "project = P3"}""")
    assert(us == 200 && data(ur)("description") == "updated")
    // update preserves creation time
    assert(String.valueOf(data(ur)("created_at")) == createdAt)

    val (ls, lr) = call("GET", s"$base/profiles")
    assert(ls == 200 && String.valueOf(data(lr)("count")).toInt == 1)

    // usage accounting through the store API the engine integration uses
    assert(store.recordUsage("nightly-p3", 1200, success = true, tick()))
    assert(store.recordUsage("nightly-p3", 800, success = false, tick()))
    val (gs, gr) = call("GET", s"$base/profiles/nightly-p3")
    assert(gs == 200)
    assert(String.valueOf(data(gr)("usage_count")).toInt == 2)
    assert(math.abs(String.valueOf(data(gr)("success_rate")).toDouble - 0.5) < 1e-9)

    val (ds, _) = call("DELETE", s"$base/profiles/nightly-p3")
    assert(ds == 200)
    assert(call("GET", s"$base/profiles/nightly-p3")._1 == 404)
    assert(call("DELETE", s"$base/profiles/nightly-p3")._1 == 404)
  }

  test("profile store survives process-restart shape: reload from disk") {
    val now = tick()
    val p = ProfileStore.Profile(name = "restartable", repository = "r",
      jql = "project = P1")
    assert(new ProfileStore(s"$work/p2").create(p, now).isRight)
    // a fresh store over the same root sees the committed collection
    val reloaded = new ProfileStore(s"$work/p2")
    assert(reloaded.get("restartable").map(_.repository).contains("r"))
    assert(reloaded.rename("restartable", "renamed", now).toOption.flatten.isDefined)
    assert(reloaded.get("restartable").isEmpty)
    assert(reloaded.get("renamed").nonEmpty)
  }

  test("rate limit: fixed window returns 429 past the per-minute budget") {
    val limited = new ApiServer(spark, manager, store,
      () => issuesDf, () => linksDf, s"$work/repos", s"$work/state",
      rateLimitPerMinute = 3, version = "test-rl",
      clock = () => new Timestamp(86400000L)) // frozen: the window can't roll
    val port = limited.start()
    try {
      // system/info, not health: the probe endpoint bypasses the limiter
      val url = s"http://127.0.0.1:$port/api/v1/system/info"
      val codes = (1 to 5).map(_ => call("GET", url)._1)
      assert(codes.take(3).forall(_ == 200))
      assert(codes.drop(3).contains(429))
    } finally limited.stop()
  }

  test("rate limit window map evicts stale clients when the window rolls") {
    val srv = new ApiServer(spark, manager, store,
      () => issuesDf, () => linksDf, s"$work/repos", s"$work/state",
      rateLimitPerMinute = 100, version = "test-evict")
    // minute 0: a burst of distinct client IPs fills the window map
    (1 to 50).foreach(i => srv.noteRequest(s"10.0.0.$i", 0L))
    assert(srv.rateWindowEntries == 50)
    // minute 1: the first request after the roll sweeps every stale window
    srv.noteRequest("10.0.1.1", 1L)
    assert(srv.rateWindowEntries == 1,
      "stale per-IP windows must be evicted on window roll, not kept forever")
    // counting still works after the sweep
    assert(srv.noteRequest("10.0.1.1", 1L) == 2)
  }

  test("rate limit window map stays FLAT over a simulated hour of churn") {
    // sustained distinct-client load, every client unique (the worst case
    // for a per-key map): after each window roll the map must hold only the
    // LIVE window's keys — memory is bounded by clients-per-minute, never by
    // clients-ever-seen. 60 minutes x 500 fresh IPs = 30k distinct keys;
    // peak map size must stay at 500.
    val srv = new ApiServer(spark, manager, store,
      () => issuesDf, () => linksDf, s"$work/repos_flat", s"$work/state_flat",
      rateLimitPerMinute = 100, version = "test-flat")
    var peak = 0
    (0 until 60).foreach { minute =>
      (0 until 500).foreach { i =>
        srv.noteRequest(s"10.$minute.${i / 250}.${i % 250}", minute.toLong)
        peak = math.max(peak, srv.rateWindowEntries)
      }
      assert(srv.rateWindowEntries == 500,
        s"minute $minute holds ${srv.rateWindowEntries} entries, not its own 500")
    }
    assert(peak <= 501, s"peak window-map size $peak grew beyond one window")
    // and a client re-seen in the live window still counts correctly
    assert(srv.noteRequest("10.59.0.0", 59L) == 2)
  }

  test("non-loopback bind: no CORS wildcard, bearer token enforced") {
    val srv = new ApiServer(spark, manager, store,
      () => issuesDf, () => linksDf, s"$work/repos3", s"$work/state3",
      host = "0.0.0.0", authToken = Some("sekret"), version = "test-auth",
      clock = () => tick())
    val port = srv.start()
    try {
      val url = s"http://127.0.0.1:$port/api/v1/jobs"
      // no token → 401 with the error envelope, and no wildcard CORS header
      val bare = http.send(
        HttpRequest.newBuilder(URI.create(url)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(bare.statusCode() == 401)
      assert(parse(bare.body())("error").asInstanceOf[Map[String, Any]]("code")
        == "UNAUTHORIZED")
      assert(bare.headers.firstValue("Access-Control-Allow-Origin").isEmpty,
        "a non-loopback bind must not advertise wildcard CORS")
      // correct bearer token → served
      val authed = http.send(
        HttpRequest.newBuilder(URI.create(url))
          .header("Authorization", "Bearer sekret").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(authed.statusCode() == 200)
      // wrong token → still 401
      val wrong = http.send(
        HttpRequest.newBuilder(URI.create(url))
          .header("Authorization", "Bearer nope").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(wrong.statusCode() == 401)
      // GET /health is the kubelet probe: exempt from the token (httpGet
      // probes cannot carry a secret-sourced header), but still no wildcard
      // CORS on a non-loopback bind
      val probe = http.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/api/v1/health")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(probe.statusCode() == 200,
        "health probe must not require the bearer token")
      assert(probe.headers.firstValue("Access-Control-Allow-Origin").isEmpty)
      // ...and the UNAUTHENTICATED body is minimal: the probe only needs the
      // status word — version, uptime and component detail would otherwise be
      // an unthrottled unauthenticated disclosure on a non-loopback bind
      val probeData = parse(probe.body())("data").asInstanceOf[Map[String, Any]]
      assert(probeData.keySet == Set("status"),
        s"unauthenticated health body must carry only 'status', got ${probeData.keySet}")
      // a bearer-carrying caller still gets the full diagnostic body
      val authedHealth = http.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/api/v1/health"))
          .header("Authorization", "Bearer sekret").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      val healthData =
        parse(authedHealth.body())("data").asInstanceOf[Map[String, Any]]
      assert(Set("version", "uptime_ms", "components").subsetOf(healthData.keySet))
    } finally srv.stop()
  }

  test("health probe bypasses the rate limiter (a 429'd probe kills healthy pods)") {
    val srv = new ApiServer(spark, manager, store,
      () => issuesDf, () => linksDf, s"$work/repos5", s"$work/state5",
      rateLimitPerMinute = 1, version = "test-rl", clock = () => tick())
    val port = srv.start()
    try {
      def get(path: String) = http.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
        HttpResponse.BodyHandlers.ofString()).statusCode()
      assert(get("/api/v1/system/info") == 200)
      // window budget (1/min) exhausted: the API throttles...
      assert(get("/api/v1/system/info") == 429)
      // ...but the kubelet probe must still get through
      assert(get("/api/v1/health") == 200,
        "health must not consume or be blocked by the shared rate budget")
    } finally srv.stop()
  }

  test("a configured token is enforced on a LOOPBACK bind too") {
    // the common deployment reverse-proxies to 127.0.0.1 — a loopback bind
    // must not silently disable an explicitly configured --auth-token
    val srv = new ApiServer(spark, manager, store,
      () => issuesDf, () => linksDf, s"$work/repos4", s"$work/state4",
      authToken = Some("sekret2"), version = "test-auth-lo",
      clock = () => tick())
    val port = srv.start()
    try {
      val url = s"http://127.0.0.1:$port/api/v1/jobs"
      val bare = http.send(
        HttpRequest.newBuilder(URI.create(url)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(bare.statusCode() == 401,
        "loopback must not bypass an explicitly configured token")
      val authed = http.send(
        HttpRequest.newBuilder(URI.create(url))
          .header("Authorization", "Bearer sekret2").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(authed.statusCode() == 200)
    } finally srv.stop()
  }

  test("template expansion never re-expands placeholders inside values") {
    import graft.api.ProfileTemplates
    val t = ProfileTemplates.byId("issue-list").get
    // a variable value that itself looks like a placeholder must land
    // literally — one pass, no rescanning of substituted output
    val p = ProfileTemplates.expand(t, Map(
      "name" -> "release", "issue_keys" -> "PROJ-1",
      "repository" -> "{name}")).toOption.get
    assert(p.repository == "{name}",
      s"value '{name}' must stay literal, got '${p.repository}'")
    assert(p.name == "release")
    // an unknown placeholder in the template survives untouched
    val p2 = ProfileTemplates.expand(t, Map(
      "name" -> "r{nope}x", "issue_keys" -> "PROJ-1",
      "repository" -> "./r")).toOption.get
    assert(p2.name == "r{nope}x")
  }

  test("jobs listing pages in stable (submittedAt, id) order") {
    val m = new JobManager(spark)
    // three jobs at strictly increasing submit times
    def spec(k: String) = SyncJobSpec("single", Seq(k), None, None, None,
      "repo", None, 0, 1, 1, dry_run = true)
    val ids = (1 to 3).map { i =>
      m.submit(spec(s"P1-$i"), new Timestamp(1000000000000L + i * 1000L))
    }
    assert(m.list().map(_.id) == ids,
      "list() must present jobs in submission order")
    // a job submitted later never reshuffles the earlier pages
    val id4 = m.submit(spec("P1-4"), new Timestamp(1000000000000L + 4000L))
    assert(m.list().map(_.id) == ids :+ id4)
  }

  test("serve --reconcile: backoff walks and schedules fire through the REST facade") {
    import graft.jobs.{Cron, Reconciler, RetryPolicy, SyncResource}
    val rwork = Files.createTempDirectory("graft-api-rec").toString
    val rManager = new JobManager(spark)
    // controllable clock: the ticker thread polls every 25 ms of real time,
    // but every fire decision reads THIS clock — the fake-clock semantics
    // ReconcilerSpec pins, driven by a live control loop
    val recClock = new java.util.concurrent.atomic.AtomicLong(
      Timestamp.valueOf("2002-06-01 00:00:00").getTime)
    def now() = new Timestamp(recClock.get())
    val rec = new Reconciler(spark, rManager,
      () => issuesDf, () => linksDf, s"$rwork/repos", s"$rwork/state")
    def spec(jql: String) = SyncJobSpec("jql", Nil, Some(jql), None, None,
      "repo", None, max_retries = 0, backoff_base_sec = 1,
      backoff_cap_sec = 2, dry_run = true)
    rec.apply(SyncResource("doomed", spec("project = AND AND"),
      retryPolicy = Some(RetryPolicy(maxRetries = 2, backoffMultiplier = 2.0,
        initialDelaySec = 10))), now())
    rec.apply(SyncResource("quarterly", spec("project = P1"),
      schedule = Some(Cron.parse("*/15 * * * *"))), now())
    val srv = new ApiServer(spark, rManager, store,
      () => issuesDf, () => linksDf, s"$rwork/repos", s"$rwork/state",
      version = "test-rec", clock = () => now(),
      reconciler = Some(rec), reconcileIntervalMs = 25L)
    val rb = s"http://127.0.0.1:${srv.start()}/api/v1"
    def resource(name: String): Map[String, Any] =
      data(call("GET", s"$rb/resources/$name")._2)
    def await(cond: () => Boolean, what: String): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (!cond() && System.currentTimeMillis() < deadline) Thread.sleep(25)
      assert(cond(), s"timed out waiting for $what")
    }
    try {
      // listing shows both declared resources
      val (ls, lr) = call("GET", s"$rb/resources")
      assert(ls == 200 && data(lr)("count") == 2)

      // the failing resource's first attempt fires immediately (unscheduled
      // one-shot), fails, and re-arms 10 s out per the retry policy
      await(() => resource("doomed")("retry_count") == 1,
        "first failure to consume retry 1")
      val d1 = resource("doomed")
      assert(d1("phase") == "Scheduled" &&
        String.valueOf(d1("next_run_at")).startsWith("2002-06-01 00:00:10"))
      assert(d1("last_error") != null)

      // nothing moves while the clock is parked before the retry window
      Thread.sleep(150)
      assert(resource("doomed")("retry_count") == 1)

      // advance past the retry; the next failure backs off 10x2 = 20 s
      recClock.addAndGet(10000)
      await(() => resource("doomed")("retry_count") == 2,
        "retry 2 after the 10 s backoff")
      assert(String.valueOf(resource("doomed")("next_run_at"))
        .startsWith("2002-06-01 00:00:30"))

      // budget (maxRetries=2) exhausts on the next failure: terminal Failed
      recClock.addAndGet(20000)
      await(() => resource("doomed")("phase") == "Failed",
        "retries to exhaust into Failed")
      assert(resource("doomed")("next_run_at") == null)

      // the cron resource fires exactly at its quarter-hour match
      assert(resource("quarterly")("phase") == "Scheduled")
      recClock.set(Timestamp.valueOf("2002-06-01 00:15:00").getTime)
      await(() => resource("quarterly")("job_id") != null,
        "the */15 schedule to fire at 00:15")
      await(() => resource("quarterly")("phase") == "Scheduled",
        "the completed run to re-arm")
      val q = resource("quarterly")
      assert(String.valueOf(q("next_run_at")).startsWith("2002-06-01 00:30:00"))
      // and its job is visible through the ordinary jobs route
      val jid = String.valueOf(q("job_id"))
      val (js, jr) = call("GET", s"$rb/jobs/$jid")
      assert(js == 200 && data(jr)("status") == "Completed")
    } finally srv.stop()

    // a server without a reconciler 404s the resources routes
    val (ns, nr) = call("GET", s"$base/resources")
    assert(ns == 404 && error(nr)("code") == "NOT_FOUND")
  }

  test("/metrics scrapes Prometheus text format with job and resource gauges") {
    // prime at least one job through the shared server so phases are nonzero
    call("POST", s"$base/sync/single", s"""{"issue_key":"$someKey"}""")
    val resp = http.send(
      HttpRequest.newBuilder(
        URI.create(s"${base.stripSuffix("/api/v1")}/metrics")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 200)
    assert(resp.headers().firstValue("Content-Type").orElse("")
      .startsWith("text/plain"))
    val body = resp.body()
    // text format 0.0.4: HELP/TYPE headers and one sample per line
    assert(body.contains("# TYPE graft_jobs gauge"))
    assert(body.contains("# HELP graft_uptime_seconds"))
    val jobLine = "graft_jobs\\{phase=\"(\\w+)\"\\} (\\d+)".r
    val byPhase = jobLine.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
    assert(byPhase.keySet == Set("Pending", "Running", "Completed",
      "Failed", "Cancelled"))
    assert(byPhase("Completed") >= 1, s"no completed jobs in: $byPhase")
    assert("graft_http_requests_total (\\d+)".r.findFirstMatchIn(body)
      .exists(_.group(1).toLong >= 1))
    // *_total is a monotone counter — the declared type must say so, or
    // rate()/increase() and promtool reject the metric
    assert(body.contains("# TYPE graft_http_requests_total counter"))
    // default posture: a token-guarded server keeps /metrics behind the
    // token (resource names ride the labels — upgrades must not silently
    // expose them)
    val g = new ApiServer(spark, manager, store, () => issuesDf, () => linksDf,
      s"$work/repos", s"$work/state", version = "test-m",
      clock = () => tick(), authToken = Some("sekret3"))
    val gp = g.start()
    try {
      val denied = http.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$gp/metrics")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(denied.statusCode() == 401,
        "a token-guarded scrape must stay guarded without --open-metrics")
      val ok = http.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$gp/metrics"))
          .header("Authorization", "Bearer sekret3").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(ok.statusCode() == 200 && ok.body().contains("graft_jobs"))
    } finally g.stop()
    // --open-metrics (the K8s scrape posture): unauthenticated scrape
    // succeeds while the API beside it still enforces the token
    val o = new ApiServer(spark, manager, store, () => issuesDf, () => linksDf,
      s"$work/repos", s"$work/state", version = "test-m2",
      clock = () => tick(), authToken = Some("sekret4"), openMetrics = true)
    val op = o.start()
    try {
      val open = http.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$op/metrics")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(open.statusCode() == 200 && open.body().contains("graft_jobs"),
        "annotation-driven scrapes can't carry secrets")
      val denied = http.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$op/api/v1/jobs")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(denied.statusCode() == 401)
    } finally o.stop()
  }
}
