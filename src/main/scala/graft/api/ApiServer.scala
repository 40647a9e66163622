package graft.api

import java.net.InetSocketAddress
import java.sql.Timestamp
import java.util.concurrent.{Executors, LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.jobs.JobManager
import graft.model.SyncJobSpec

/** REST façade over the engine — the reference's HTTP API surface
  * (reference: internal/api/server.go:148-172 route table;
  * handlers_sync.go:84-164; handlers_jobs.go:46-247;
  * handlers_profiles.go:73-212; handlers_system.go:100-219) served by the
  * JDK's built-in `com.sun.net.httpserver` so the engine stays
  * dependency-free.
  *
  * The control plane is deliberately thin: every request either reads
  * driver-side job/profile metadata or enqueues a [[SyncJobSpec]]; all
  * distributed work happens inside [[graft.engine.SyncEngine]] exactly as
  * when driven by the CLI, so the API adds no new data-plane semantics to
  * audit. Async jobs are drained by one daemon worker; the synchronous
  * single-issue path shares the same execution lock so a job never runs
  * twice. Responses use the reference's envelope
  * `{success, data|error, meta{request_id, timestamp, version}}`
  * (server.go:240-301).
  */
final class ApiServer(
    spark: SparkSession,
    jobs: JobManager,
    profiles: ProfileStore,
    issues: () => DataFrame,
    links: () => DataFrame,
    repoRoot: String,
    stateRoot: String,
    host: String = "127.0.0.1",
    port: Int = 0,
    rateLimitPerMinute: Int = 0,
    authToken: Option[String] = None,
    version: String = "dev",
    clock: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
    reconciler: Option[graft.jobs.Reconciler] = None,
    reconcileIntervalMs: Long = 30000L,
    openMetrics: Boolean = false) {

  private val mapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  private val requestIds = new AtomicLong(0)
  private val startedAtMs = new AtomicLong(0)
  private var server: HttpServer = _

  // one-permit execution: the async worker and the sync single-issue path
  // both call runPending; serializing them keeps each job's phase machine
  // single-writer (JobManager is a TrieMap, not a scheduler)
  private val executionLock = new Object
  private val wake = new LinkedBlockingQueue[Object]()
  private val running = new AtomicBoolean(false)
  private val worker = new Thread(() => {
    while (running.get()) {
      if (wake.poll(200, TimeUnit.MILLISECONDS) ne null) drainPending()
    }
  }, "graft-api-worker")
  worker.setDaemon(true)

  private def drainPending(): Unit = executionLock.synchronized {
    jobs.runPending(issues(), links(), repoRoot, stateRoot, clock())
  }

  /** Long-lived control loop over the injected [[graft.jobs.Reconciler]] —
    * the reference operator's requeue-every-30s Reconcile driver
    * (reference: internal/operator/controllers/jirasync_controller.go:472-554)
    * on the real (or injected) clock. Each pass takes the SAME execution
    * lock as the async job worker, so the phase machine stays
    * single-writer; the loop polls at `reconcileIntervalMs` but fire times
    * come from `clock()` through the Reconciler's deterministic `tick`, so
    * a fake clock drives the identical semantics the ReconcilerSpec pins.
    */
  private val reconcileTicker: Option[Thread] = reconciler.map { r =>
    val t = new Thread(() => {
      while (running.get()) {
        try executionLock.synchronized { r.tick(clock()) }
        catch { case _: InterruptedException => () ; case _: Throwable => () }
        try Thread.sleep(reconcileIntervalMs)
        catch { case _: InterruptedException => () }
      }
    }, "graft-reconcile")
    t.setDaemon(true)
    t
  }

  /** Bind and serve; returns the bound port (pass port=0 for ephemeral). */
  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(host, port), 0)
    server.createContext("/api/v1/", handle _)
    server.createContext("/metrics", metricsHandle _)
    server.setExecutor(Executors.newFixedThreadPool(4, r => {
      val t = new Thread(r, "graft-api"); t.setDaemon(true); t
    }))
    startedAtMs.set(clock().getTime)
    running.set(true)
    worker.start()
    reconcileTicker.foreach(_.start())
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    running.set(false)
    reconcileTicker.foreach(_.interrupt())
    if (server != null) server.stop(0)
  }

  // ---- middleware: request id, CORS, fixed-window rate limit ----

  private val windowCounts = TrieMap.empty[String, (Long, Int)]
  private val lastSweepMinute = new AtomicLong(Long.MinValue)

  /** Count a request from `key` in fixed window `minute`; returns the
    * window's running count. Once per window roll, sweeps every client
    * whose window has passed — without the sweep the map holds one entry
    * per distinct IP ever seen, an unbounded leak on a long-lived server.
    */
  private[graft] def noteRequest(key: String, minute: Long): Int = {
    val prev = lastSweepMinute.get()
    if (prev < minute && lastSweepMinute.compareAndSet(prev, minute))
      windowCounts.filterInPlace { case (_, (w, _)) => w >= minute }
    windowCounts.updateWith(key) {
      case Some((w, c)) if w == minute => Some((w, c + 1))
      case _ => Some((minute, 1))
    }.map(_._2).getOrElse(1)
  }

  private[graft] def rateWindowEntries: Int = windowCounts.size

  private def rateLimited(exchange: HttpExchange): Boolean = {
    if (rateLimitPerMinute <= 0) return false
    val key = exchange.getRemoteAddress.getAddress.getHostAddress
    noteRequest(key, clock().getTime / 60000L) > rateLimitPerMinute
  }

  /** True when the bind host is loopback — the trust boundary for the
    * permissive defaults (wildcard CORS, no auth). `serve --host 0.0.0.0`
    * exposes a writable control plane, so the wildcard is withheld and a
    * configured bearer token is enforced there.
    */
  private val loopbackHost: Boolean =
    try java.net.InetAddress.getByName(host).isLoopbackAddress
    catch { case _: Throwable => false }

  /** A configured token is enforced on EVERY bind, loopback included: the
    * common deployment reverse-proxies or port-forwards to 127.0.0.1, so a
    * loopback bind does not imply a trusted caller. Loopback only relaxes
    * DEFAULT: with no token configured the server is open, which is only
    * a sensible default on loopback — hence the loopback-only CORS
    * wildcard above. The comparison is constant-time
    * (MessageDigest.isEqual) so the token can't be recovered
    * byte-at-a-time from response timing.
    */
  private def authorized(exchange: HttpExchange): Boolean =
    authToken match {
      case None => true
      case Some(t) =>
        Option(exchange.getRequestHeaders.getFirst("Authorization")).exists {
          h =>
            java.security.MessageDigest.isEqual(
              h.getBytes("UTF-8"), s"Bearer $t".getBytes("UTF-8"))
        }
    }

  /** GET /api/v1/health is exempt from bearer auth AND the rate limiter:
    * kubelet liveness / readiness probes cannot carry a secret-sourced
    * header (httpGet probes take only literal httpHeaders), and on a pod
    * whose service traffic is SNAT'd to one node IP a chatty co-located
    * client would otherwise consume the shared fixed-window budget and
    * 429 the probe — either failure marks a healthy pod unready by
    * construction. The endpoint is read-only and reveals only phase
    * counts and uptime; everything mutating stays behind [[authorized]]
    * and the limiter. `/metrics` openness is the explicit
    * [[openMetrics]] opt-in instead (see [[metricsHandle]]).
    */
  private def isOpenProbe(exchange: HttpExchange): Boolean =
    exchange.getRequestMethod == "GET" &&
      exchange.getRequestURI.getPath.stripSuffix("/") == "/api/v1/health"

  private def handle(exchange: HttpExchange): Unit = {
    val requestId = s"req-${requestIds.incrementAndGet()}"
    try {
      val h = exchange.getResponseHeaders
      // the CORS wildcard is a loopback-only convenience: on a non-loopback
      // bind the API is writable by anyone who can reach it, and a wildcard
      // would additionally invite cross-origin browser traffic
      if (loopbackHost) h.set("Access-Control-Allow-Origin", "*")
      h.set("Access-Control-Allow-Methods", "GET, POST, PUT, DELETE, OPTIONS")
      h.set("Access-Control-Allow-Headers", "Content-Type, Authorization")
      h.set("X-Request-Id", requestId)
      if (exchange.getRequestMethod == "OPTIONS") {
        exchange.sendResponseHeaders(204, -1)
      } else if (!isOpenProbe(exchange) && !authorized(exchange)) {
        writeError(exchange, requestId, 401, "UNAUTHORIZED",
          "Authentication required", "provide Authorization: Bearer <token>")
      } else if (!isOpenProbe(exchange) && rateLimited(exchange)) {
        writeError(exchange, requestId, 429, "RATE_LIMITED",
          "Too many requests", s"limit is $rateLimitPerMinute/minute")
      } else route(exchange, requestId)
    } catch {
      case e: BadJson =>
        try writeError(exchange, requestId, 400, "INVALID_REQUEST",
          "Invalid JSON request body", Option(e.getCause.getMessage).getOrElse(""))
        catch { case _: Throwable => () }
      case e: Throwable =>
        try writeError(exchange, requestId, 500, "INTERNAL_ERROR",
          "Internal server error", Option(e.getMessage).getOrElse(e.getClass.getName))
        catch { case _: Throwable => () }
    } finally exchange.close()
  }

  // ---- routing (reference: server.go:148-172) ----

  private def route(exchange: HttpExchange, rid: String): Unit = {
    val method = exchange.getRequestMethod
    val path = exchange.getRequestURI.getPath.stripPrefix("/api/v1").stripSuffix("/")
    val parts = path.stripPrefix("/").split("/").toList.filter(_.nonEmpty)
    (method, parts) match {
      case ("GET", List("health")) => health(exchange, rid)
      case ("GET", List("system", "info")) => systemInfo(exchange, rid)
      case ("GET", List("docs")) => docs(exchange, rid)
      case ("POST", List("sync", "single")) => syncSingle(exchange, rid)
      case ("POST", List("sync", "batch")) => syncBatch(exchange, rid)
      case ("POST", List("sync", "jql")) => syncJql(exchange, rid)
      case ("GET", List("jobs", "queue", "status")) => queueStatus(exchange, rid)
      case ("GET", List("jobs")) => listJobs(exchange, rid)
      case ("GET", List("jobs", id)) => getJob(exchange, rid, id)
      case ("DELETE", List("jobs", id)) => deleteJob(exchange, rid, id)
      case ("POST", List("jobs", id, "cancel")) => cancelJob(exchange, rid, id)
      case ("GET", List("jobs", id, "logs")) => jobLogs(exchange, rid, id)
      case ("GET", List("resources")) => listResources(exchange, rid)
      case ("GET", List("resources", name)) => getResource(exchange, rid, name)
      case ("GET", List("templates")) => listTemplates(exchange, rid)
      case ("GET", List("profiles")) => listProfiles(exchange, rid)
      case ("POST", List("profiles")) => createProfile(exchange, rid)
      case ("GET", List("profiles", name)) => getProfile(exchange, rid, name)
      case ("PUT", List("profiles", name)) => updateProfile(exchange, rid, name)
      case ("DELETE", List("profiles", name)) => deleteProfile(exchange, rid, name)
      case _ => writeError(exchange, rid, 404, "NOT_FOUND",
        "Unknown endpoint", s"$method /api/v1/$path")
    }
  }

  // ---- system (reference: handlers_system.go) ----

  private def health(exchange: HttpExchange, rid: String): Unit = {
    // queue status doubles as the job-manager liveness probe
    // (reference: handlers_system.go:106-125)
    val jobManagerHealth =
      try { jobs.queueStatus(); Map("status" -> "healthy") }
      catch { case e: Throwable =>
        Map("status" -> "unhealthy", "message" -> s"Job manager error: ${e.getMessage}") }
    val overall = jobManagerHealth("status") match {
      case "healthy" => ("healthy", 200)
      case _ => ("unhealthy", 503)
    }
    // The probe exemption ([[isOpenProbe]]) makes this endpoint reachable
    // without auth on any bind — so an UNAUTHENTICATED caller gets only the
    // status word a probe needs (the HTTP code already carries it); version,
    // uptime and component error text are reserved for bearer-carrying
    // callers. A kubelet httpGet probe only reads the status code either way.
    if (!authorized(exchange))
      writeJson(exchange, rid, overall._2, Map("status" -> overall._1))
    else
      writeJson(exchange, rid, overall._2, Map(
        "status" -> overall._1,
        "version" -> version,
        "uptime_ms" -> (clock().getTime - startedAtMs.get()),
        "components" -> Map("job_manager" -> jobManagerHealth)))
  }

  private def systemInfo(exchange: HttpExchange, rid: String): Unit =
    writeJson(exchange, rid, 200, Map(
      "version" -> version,
      "api_version" -> "v1",
      "platform" -> s"${sys.props("os.name")}/${sys.props("os.arch")}",
      "scala_version" -> scala.util.Properties.versionNumberString,
      "spark_version" -> spark.version,
      "capabilities" -> Seq("sync", "jobs", "profiles", "monitoring"),
      "job_system" -> Map(
        "supported_job_types" -> Seq("single", "batch", "jql", "incremental"))))

  private def docs(exchange: HttpExchange, rid: String): Unit =
    writeJson(exchange, rid, 200, Map(
      "title" -> "graft sync API",
      "version" -> version,
      "endpoints" -> Seq(
        "GET /api/v1/health", "GET /api/v1/system/info", "GET /api/v1/docs",
        "POST /api/v1/sync/single", "POST /api/v1/sync/batch", "POST /api/v1/sync/jql",
        "GET /api/v1/jobs", "GET /api/v1/jobs/{id}", "DELETE /api/v1/jobs/{id}",
        "POST /api/v1/jobs/{id}/cancel", "GET /api/v1/jobs/{id}/logs",
        "GET /api/v1/jobs/queue/status",
        "GET /api/v1/resources", "GET /api/v1/resources/{name}",
        "GET /api/v1/templates",
        "GET /api/v1/profiles", "POST /api/v1/profiles", "GET /api/v1/profiles/{name}",
        "PUT /api/v1/profiles/{name}", "DELETE /api/v1/profiles/{name}")))

  // ---- Prometheus text-format metrics (reference: the operator's
  // controller metrics, internal/operator/controllers/jirasync_controller.go:100-179)
  // served at /metrics OUTSIDE the /api/v1 envelope, as scrapers expect ----

  private def promEscape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  private[graft] def metricsText(): String = {
    val sb = new StringBuilder
    def emit(name: String, help: String, mtype: String,
        rows: Seq[(Map[String, String], Double)]): Unit = {
      sb.append(s"# HELP $name $help\n# TYPE $name $mtype\n")
      rows.foreach { case (labels, v) =>
        val l = if (labels.isEmpty) ""
          else labels.toSeq.sortBy(_._1)
            .map { case (k, x) => s"""$k="${promEscape(x)}"""" }
            .mkString("{", ",", "}")
        val vs = if (v == v.floor && !v.isInfinite) v.toLong.toString else v.toString
        sb.append(s"$name$l $vs\n")
      }
    }
    def gauge(name: String, help: String,
        rows: Seq[(Map[String, String], Double)]): Unit =
      emit(name, help, "gauge", rows)
    gauge("graft_uptime_seconds", "Seconds since the server started",
      Seq(Map.empty[String, String] ->
        ((clock().getTime - startedAtMs.get()) / 1000.0).floor))
    // a *_total metric is a COUNTER (monotone since process start): rate()/
    // increase() and promtool both key off the declared type
    emit("graft_http_requests_total", "Requests handled since start",
      "counter", Seq(Map.empty[String, String] -> requestIds.get().toDouble))
    val phases = Seq("Pending", "Running", "Completed", "Failed", "Cancelled")
    val byPhase = jobs.queueStatus()
    gauge("graft_jobs", "Jobs in the manager by phase",
      phases.map(p => Map("phase" -> p) -> byPhase.getOrElse(p, 0).toDouble))
    gauge("graft_rate_limit_clients", "Distinct clients in the current window",
      Seq(Map.empty[String, String] -> rateWindowEntries.toDouble))
    reconciler.foreach { r =>
      val rs = r.list()
      val rPhases = Seq("Scheduled", "Pending", "Running", "Completed", "Failed")
      gauge("graft_resources", "Reconciled resources by phase",
        rPhases.map(p =>
          Map("phase" -> p) -> rs.count(_.phase == p).toDouble))
      gauge("graft_resource_retries", "Retries consumed per resource",
        rs.map(st =>
          Map("resource" -> st.resource.name) -> st.retryCount.toDouble))
    }
    sb.toString
  }

  /** Annotation-driven Prometheus scrapes (`prometheus.io/scrape`) cannot
    * attach a per-target bearer token, so a token-guarded scrape endpoint
    * silently produces a fleet of `401` targets — but the exposition also
    * carries resource NAMES (`graft_resource_retries{resource=...}`), so
    * dropping the guard unconditionally would silently expose telemetry on
    * existing token-protected binds after an upgrade. The deployment
    * chooses: `--open-metrics` ([[openMetrics]]) serves the scrape
    * unauthenticated — `deploy/operator.yaml` sets it, with a
    * NetworkPolicy as the reachability boundary — while the default keeps
    * `/metrics` behind the configured token exactly like the API.
    */
  private def metricsHandle(exchange: HttpExchange): Unit = {
    try {
      if (!openMetrics && !authorized(exchange)) {
        exchange.sendResponseHeaders(401, -1)
      } else {
        val bytes = metricsText().getBytes("UTF-8")
        exchange.getResponseHeaders.set("Content-Type",
          "text/plain; version=0.0.4; charset=utf-8")
        exchange.sendResponseHeaders(200, bytes.length)
        val out = exchange.getResponseBody
        out.write(bytes); out.close()
      }
    } catch { case _: Throwable => () }
    finally exchange.close()
  }

  // ---- reconciled resources (reference: the operator's status subresource,
  // internal/operator/types/types.go:30-55 JiraSyncStatus) ----

  private def resourceJson(st: graft.jobs.Reconciler#ResourceState): Map[String, Any] =
    Map(
      "name" -> st.resource.name,
      "phase" -> st.phase,
      "schedule" -> st.resource.schedule.isDefined,
      "next_run_at" -> st.nextRunAt.map(_.toString).orNull,
      "retry_count" -> st.retryCount,
      "max_retries" -> st.resource.retryPolicy.map(_.maxRetries).getOrElse(0),
      "job_id" -> st.jobId.orNull,
      "last_error" -> st.lastError.orNull)

  private def listResources(exchange: HttpExchange, rid: String): Unit =
    reconciler match {
      case None => writeError(exchange, rid, 404, "NOT_FOUND",
        "Reconciler not enabled",
        "start serve with --reconcile <resources.json>")
      case Some(r) =>
        val rs = r.list().map(resourceJson)
        writeJson(exchange, rid, 200, Map("resources" -> rs, "count" -> rs.size))
    }

  private def getResource(exchange: HttpExchange, rid: String, name: String): Unit =
    reconciler.flatMap(_.status(name)) match {
      case None => writeError(exchange, rid, 404, "NOT_FOUND",
        "Unknown resource", name)
      case Some(st) => writeJson(exchange, rid, 200, resourceJson(st))
    }

  // ---- sync (reference: handlers_sync.go) ----

  private val issueKeyPattern = "^[A-Z][A-Z0-9]*-[0-9]+$".r

  /** Parse a JSON body into Scala maps/seqs regardless of whether Jackson's
    * untyped path hands back Java or Scala collections.
    */
  private def normalize(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      import scala.jdk.CollectionConverters._
      m.asScala.map { case (k, x) => String.valueOf(k) -> normalize(x) }.toMap
    case l: java.util.List[_] =>
      import scala.jdk.CollectionConverters._
      l.asScala.map(normalize).toSeq
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => String.valueOf(k) -> normalize(x) }.toMap
    case s: scala.collection.Seq[_] => s.map(normalize).toSeq
    case other => other
  }

  /** Signals a malformed request body; mapped to 400 INVALID_REQUEST
    * (reference: handlers_sync.go:86-89).
    */
  private final class BadJson(cause: Throwable) extends RuntimeException(cause)

  private def body(exchange: HttpExchange): Map[String, Any] = {
    val bytes = exchange.getRequestBody.readAllBytes()
    if (bytes.isEmpty) Map.empty
    else {
      val parsed =
        try mapper.readValue(bytes, classOf[Object])
        catch { case e: com.fasterxml.jackson.core.JacksonException => throw new BadJson(e) }
      normalize(parsed) match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => Map.empty
      }
    }
  }

  private def str(m: Map[String, Any], k: String): String =
    m.get(k).map(String.valueOf).filterNot(_ == "null").getOrElse("")

  private def bool(m: Map[String, Any], k: String): Boolean =
    m.get(k).contains(true)

  private def strings(m: Map[String, Any], k: String): Seq[String] = m.get(k) match {
    case Some(s: Seq[_]) => s.map(String.valueOf)
    case _ => Seq.empty
  }

  private def specOf(m: Map[String, Any], syncType: String, keys: Seq[String],
      jql: Option[String]): SyncJobSpec = {
    val opts = m.get("options") match {
      case Some(o: Map[_, _]) => o.asInstanceOf[Map[String, Any]]
      case _ => Map.empty[String, Any]
    }
    SyncJobSpec(
      sync_type = if (bool(opts, "incremental")) "incremental" else syncType,
      issue_keys = keys,
      jql_query = jql,
      project_key = None,
      epic_key = None,
      destination = str(m, "repository"),
      schedule = None,
      max_retries = 2,
      backoff_base_sec = 0,
      backoff_cap_sec = 0,
      dry_run = bool(opts, "dry_run"))
  }

  private def accepted(exchange: HttpExchange, rid: String, id: String): Unit =
    writeJson(exchange, rid, 202, Map(
      "job_id" -> id, "status" -> "Pending",
      "created_at" -> isoNow()))

  private def syncSingle(exchange: HttpExchange, rid: String): Unit = {
    val m = body(exchange)
    val key = str(m, "issue_key")
    if (key.isEmpty || str(m, "repository").isEmpty) {
      writeError(exchange, rid, 400, "VALIDATION_ERROR", "Request validation failed",
        "issue_key and repository are required"); return
    }
    if (issueKeyPattern.findFirstIn(key).isEmpty) {
      writeError(exchange, rid, 400, "VALIDATION_ERROR", "Request validation failed",
        s"invalid issue key format: $key"); return
    }
    val spec = specOf(m, "single", Seq(key), jql = Some(s"""key = "$key""""))
    val id = jobs.submit(spec, clock())
    if (bool(m, "async")) { accepted(exchange, rid, id); wake.offer(new Object) }
    else {
      // synchronous path for small operations (reference: handlers_sync.go:108-115)
      drainPending()
      jobs.status(id) match {
        case Some(j) if j.phase == "Completed" =>
          writeJson(exchange, rid, 200, Map(
            "job_id" -> id, "status" -> j.phase, "result" -> resultOf(j)))
        case Some(j) =>
          writeError(exchange, rid, 500, "SYNC_ERROR", "Sync operation failed",
            j.error.getOrElse(j.phase))
        case None =>
          writeError(exchange, rid, 500, "SYNC_ERROR", "Sync operation failed",
            "job record lost")
      }
    }
  }

  private def syncBatch(exchange: HttpExchange, rid: String): Unit = {
    val m = body(exchange)
    val keys = strings(m, "issue_keys")
    if (keys.isEmpty || str(m, "repository").isEmpty) {
      writeError(exchange, rid, 400, "VALIDATION_ERROR", "Request validation failed",
        "issue_keys (non-empty) and repository are required"); return
    }
    keys.find(k => issueKeyPattern.findFirstIn(k).isEmpty) match {
      case Some(bad) =>
        writeError(exchange, rid, 400, "VALIDATION_ERROR", "Request validation failed",
          s"invalid issue key format: $bad")
      case None =>
        // batch is always async (reference: handlers_sync.go:132)
        val quoted = keys.map(k => s""""$k"""").mkString(", ")
        val spec = specOf(m, "batch", keys, jql = Some(s"key IN ($quoted)"))
        val id = jobs.submit(spec, clock())
        accepted(exchange, rid, id)
        wake.offer(new Object)
    }
  }

  private def syncJql(exchange: HttpExchange, rid: String): Unit = {
    val m = body(exchange)
    val jql = str(m, "jql")
    if (jql.isEmpty || str(m, "repository").isEmpty) {
      writeError(exchange, rid, 400, "VALIDATION_ERROR", "Request validation failed",
        "jql and repository are required"); return
    }
    val v = graft.jql.Validator.validate(jql)
    if (!v.valid) {
      writeError(exchange, rid, 400, "VALIDATION_ERROR", "Request validation failed",
        v.errors.mkString("; ")); return
    }
    // JQL is always async: result sets are unbounded (handlers_sync.go:156)
    val spec = specOf(m, "jql", Seq.empty, jql = Some(jql))
    val id = jobs.submit(spec, clock())
    accepted(exchange, rid, id)
    wake.offer(new Object)
  }

  // ---- jobs (reference: handlers_jobs.go) ----

  private def phaseOf(apiStatus: String): Option[String] = apiStatus match {
    case "pending" => Some("Pending")
    case "running" => Some("Running")
    case "succeeded" => Some("Completed")
    case "failed" => Some("Failed")
    case "cancelled" => Some("Cancelled")
    case _ => None
  }

  private def query(exchange: HttpExchange): Map[String, String] =
    Option(exchange.getRequestURI.getQuery).getOrElse("").split("&").toSeq
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def resultOf(j: JobManager#JobRecord): Map[String, Any] =
    j.result.map(r => Map[String, Any](
      "total_issues" -> r.total, "successful_sync" -> r.successful,
      "failed_sync" -> r.failed, "skipped" -> r.skipped,
      "duration_ms" -> r.elapsed_ms, "issues_per_sec" -> r.issues_per_sec))
      .getOrElse(Map.empty[String, Any])

  private def jobJson(j: JobManager#JobRecord): Map[String, Any] = Map(
    "job_id" -> j.id, "status" -> j.phase, "type" -> j.spec.sync_type,
    "attempts" -> j.attempts,
    "created_at" -> java.time.Instant.ofEpochMilli(j.submittedAt.getTime).toString,
    "error" -> j.error.getOrElse(""), "result" -> resultOf(j))

  private def listJobs(exchange: HttpExchange, rid: String): Unit = {
    val q = query(exchange)
    val page = math.max(1, q.get("page").flatMap(_.toIntOption).getOrElse(1))
    val rawSize = q.get("page_size").flatMap(_.toIntOption).getOrElse(20)
    val pageSize = if (rawSize < 1 || rawSize > 100) 20 else rawSize
    val phases = q.get("status").toSeq.flatMap(_.split(",")).flatMap(s => phaseOf(s.trim))
    val types = q.get("type").toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val all = jobs.list()
      .filter(j => phases.isEmpty || phases.contains(j.phase))
      .filter(j => types.isEmpty || types.contains(j.spec.sync_type))
    val slice = all.slice((page - 1) * pageSize, page * pageSize)
    writeJson(exchange, rid, 200, Map(
      "jobs" -> slice.map(jobJson), "total_count" -> all.size,
      "page" -> page, "page_size" -> pageSize,
      "has_more" -> (page * pageSize < all.size)))
  }

  private def getJob(exchange: HttpExchange, rid: String, id: String): Unit =
    jobs.status(id) match {
      case Some(j) => writeJson(exchange, rid, 200, jobJson(j))
      case None => writeError(exchange, rid, 404, "JOB_NOT_FOUND", "Job not found", id)
    }

  private def deleteJob(exchange: HttpExchange, rid: String, id: String): Unit =
    jobs.status(id) match {
      case None => writeError(exchange, rid, 404, "JOB_NOT_FOUND", "Job not found", id)
      case Some(j) if j.phase == "Running" =>
        writeError(exchange, rid, 409, "JOB_DELETE_ERROR", "Failed to delete job",
          "job is running; cancel it first")
      case Some(_) =>
        jobs.delete(id)
        writeJson(exchange, rid, 200, Map(
          "message" -> "Job deleted successfully", "job_id" -> id))
    }

  private def cancelJob(exchange: HttpExchange, rid: String, id: String): Unit =
    jobs.status(id) match {
      case None => writeError(exchange, rid, 404, "JOB_NOT_FOUND", "Job not found", id)
      case Some(_) if jobs.cancel(id) =>
        writeJson(exchange, rid, 200, Map(
          "message" -> "Job cancelled successfully", "job_id" -> id))
      case Some(j) =>
        writeError(exchange, rid, 409, "JOB_CANCEL_ERROR", "Failed to cancel job",
          s"job is ${j.phase}")
    }

  private def jobLogs(exchange: HttpExchange, rid: String, id: String): Unit =
    jobs.status(id) match {
      case None => writeError(exchange, rid, 404, "JOB_NOT_FOUND", "Job not found", id)
      case Some(j) =>
        // the phase machine IS the log: graft jobs run in-driver, so the
        // record's transitions replace the reference's pod log fetch
        val logs = Seq(
          s"${java.time.Instant.ofEpochMilli(j.submittedAt.getTime)} submitted ${j.spec.sync_type} job ${j.id}") ++
          (1 to j.attempts).map(a => s"attempt $a") ++
          j.error.map(e => s"error: $e").toSeq ++
          j.result.map(r => s"completed: ${r.successful}/${r.total} issues in ${r.elapsed_ms} ms").toSeq ++
          Seq(s"status: ${j.phase}")
        writeJson(exchange, rid, 200, Map("job_id" -> id, "logs" -> logs))
    }

  private def queueStatus(exchange: HttpExchange, rid: String): Unit = {
    val counts = jobs.queueStatus()
    writeJson(exchange, rid, 200, Map(
      "total_jobs" -> counts.values.sum,
      "pending_jobs" -> counts.getOrElse("Pending", 0),
      "running_jobs" -> counts.getOrElse("Running", 0),
      "completed_jobs" -> counts.getOrElse("Completed", 0),
      "failed_jobs" -> counts.getOrElse("Failed", 0),
      "cancelled_jobs" -> counts.getOrElse("Cancelled", 0)))
  }

  // ---- profiles (reference: handlers_profiles.go shapes, pkg/profile semantics) ----

  private def profileOf(m: Map[String, Any], name: String): ProfileStore.Profile = {
    val opts = m.get("options") match {
      case Some(o: Map[_, _]) => o.asInstanceOf[Map[String, Any]]
      case _ => Map.empty[String, Any]
    }
    ProfileStore.Profile(
      name = name,
      description = str(m, "description"),
      repository = str(m, "repository"),
      jql = str(m, "jql"),
      issue_keys = strings(m, "issue_keys"),
      epic_key = str(m, "epic_key"),
      options = ProfileStore.ProfileOptions(
        concurrency = opts.get("concurrency").map(String.valueOf)
          .flatMap(_.toIntOption).getOrElse(1),
        rate_limit = str(opts, "rate_limit"),
        incremental = bool(opts, "incremental"),
        force = bool(opts, "force"),
        dry_run = bool(opts, "dry_run"),
        include_links = !m.contains("options") || bool(opts, "include_links")),
      tags = strings(m, "tags"))
  }

  private def profileJson(p: ProfileStore.Profile): Map[String, Any] = Map(
    "name" -> p.name, "description" -> p.description, "repository" -> p.repository,
    "jql" -> p.jql, "issue_keys" -> p.issue_keys, "epic_key" -> p.epic_key,
    "tags" -> p.tags,
    "options" -> Map(
      "concurrency" -> p.options.concurrency, "rate_limit" -> p.options.rate_limit,
      "incremental" -> p.options.incremental, "force" -> p.options.force,
      "dry_run" -> p.options.dry_run, "include_links" -> p.options.include_links),
    "created_at" -> java.time.Instant.ofEpochMilli(p.created_at_ms).toString,
    "updated_at" -> java.time.Instant.ofEpochMilli(p.updated_at_ms).toString,
    "usage_count" -> p.usage.times_used,
    "success_rate" -> p.usage.success_rate)

  private def listProfiles(exchange: HttpExchange, rid: String): Unit = {
    val all = profiles.list()
    writeJson(exchange, rid, 200, Map(
      "profiles" -> all.map(profileJson), "count" -> all.size))
  }

  /** Built-in profile templates (reference: internal/cli/profile.go
    * `profile templates`; pkg/profile/templates.go catalog) — the same
    * catalog the CLI lists, served for UI pickers.
    */
  private def listTemplates(exchange: HttpExchange, rid: String): Unit = {
    val ts = ProfileTemplates.all.map { t =>
      Map(
        "id" -> t.id, "name" -> t.title, "description" -> t.description,
        "category" -> t.category,
        "variables" -> t.variables.map(v => Map(
          "name" -> v.name, "description" -> v.description,
          "required" -> v.required, "default" -> v.default,
          "example" -> v.example)),
        "example" -> t.example)
    }
    writeJson(exchange, rid, 200, Map("templates" -> ts, "count" -> ts.size))
  }

  private def getProfile(exchange: HttpExchange, rid: String, name: String): Unit =
    profiles.get(name) match {
      case Some(p) => writeJson(exchange, rid, 200, profileJson(p))
      case None => writeError(exchange, rid, 404, "PROFILE_NOT_FOUND",
        "Profile not found", name)
    }

  private def createProfile(exchange: HttpExchange, rid: String): Unit = {
    val m = body(exchange)
    val name = str(m, "name")
    if (profiles.exists(name) && name.nonEmpty) {
      writeError(exchange, rid, 409, "PROFILE_EXISTS",
        "Profile already exists", name); return
    }
    profiles.create(profileOf(m, name), clock()) match {
      case Right(p) => writeJson(exchange, rid, 201, profileJson(p))
      case Left(v) => writeError(exchange, rid, 400, "VALIDATION_ERROR",
        "Profile validation failed", v.errors.mkString("; "))
    }
  }

  private def updateProfile(exchange: HttpExchange, rid: String, name: String): Unit =
    profiles.update(name, profileOf(body(exchange), name), clock()) match {
      case Right(Some(p)) => writeJson(exchange, rid, 200, profileJson(p))
      case Right(None) => writeError(exchange, rid, 404, "PROFILE_NOT_FOUND",
        "Profile not found", name)
      case Left(v) => writeError(exchange, rid, 400, "VALIDATION_ERROR",
        "Profile validation failed", v.errors.mkString("; "))
    }

  private def deleteProfile(exchange: HttpExchange, rid: String, name: String): Unit =
    if (profiles.delete(name))
      writeJson(exchange, rid, 200, Map(
        "message" -> "Profile deleted successfully", "name" -> name))
    else writeError(exchange, rid, 404, "PROFILE_NOT_FOUND", "Profile not found", name)

  // ---- envelope (reference: server.go:240-301) ----

  private def isoNow(): String =
    java.time.Instant.ofEpochMilli(clock().getTime).toString

  private def writeJson(exchange: HttpExchange, rid: String, status: Int,
      data: Map[String, Any]): Unit = {
    val envelope = Map(
      "success" -> (status < 400),
      (if (status < 400) "data" else "error") -> data,
      "meta" -> Map("request_id" -> rid, "timestamp" -> isoNow(), "version" -> version))
    val bytes = mapper.writeValueAsBytes(envelope)
    exchange.getResponseHeaders.set("Content-Type", "application/json")
    exchange.sendResponseHeaders(status, bytes.length)
    val out = exchange.getResponseBody
    out.write(bytes); out.close()
  }

  private def writeError(exchange: HttpExchange, rid: String, status: Int,
      code: String, message: String, details: String): Unit =
    writeJson(exchange, rid, status,
      Map("code" -> code, "message" -> message, "details" -> details))
}
