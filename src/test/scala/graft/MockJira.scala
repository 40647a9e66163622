package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process mock of the JIRA paged-search REST endpoint — the zero-egress
  * stand-in the HTTP connector's tests run against (the reference gates its
  * live integration suite on env vars the same way;
  * test/jql_sync_integration_test.go:27-46). Serves the reference envelope
  * `{startAt, maxResults, total, issues: [...]}` over `issues` payload
  * lines, enforces Bearer auth, and can inject a one-shot 429 with
  * Retry-After to exercise the retry policy.
  */
final class MockJira(issues: Seq[String], token: String = "sekret",
    rateLimitOnce: Boolean = false) {

  private var server: HttpServer = _
  val requests = new java.util.concurrent.CopyOnWriteArrayList[String]()
  private val throttled = new AtomicInteger(0)

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/rest/api/2/search", (ex: HttpExchange) => {
      try handle(ex) finally ex.close()
    })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: String,
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
  }

  private def handle(ex: HttpExchange): Unit = {
    val query = Option(ex.getRequestURI.getQuery).getOrElse("")
    requests.add(query)
    val params = query.split("&").filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
    if (!Option(ex.getRequestHeaders.getFirst("Authorization"))
        .contains(s"Bearer $token")) {
      respond(ex, 401, """{"errorMessages":["auth failed"]}""")
      return
    }
    val startAt = params.get("startAt").flatMap(_.toLongOption).getOrElse(0L)
    val maxResults = params.get("maxResults").flatMap(_.toLongOption).getOrElse(50L)
    // one-shot 429 on the first DATA request (probes have maxResults=0)
    if (rateLimitOnce && maxResults > 0 && throttled.compareAndSet(0, 1)) {
      respond(ex, 429, "", Map("Retry-After" -> "0"))
      return
    }
    val page = issues.slice(startAt.toInt,
      math.min(startAt + maxResults, issues.size.toLong).toInt)
    respond(ex, 200,
      s"""{"startAt":$startAt,"maxResults":$maxResults,"total":${issues.size},""" +
        s""""issues":[${page.mkString(",")}]}""",
      Map("Content-Type" -> "application/json"))
  }
}
