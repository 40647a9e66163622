package graft.sources.v2

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Throttle

/** DataSource V2 connector over the LIVE JIRA paged-search REST protocol —
  * the wire-transport sibling of [[JiraFixtureSource]] (same `payload`
  * schema, same page-partition planning, same auth-probe and LIMIT-pushdown
  * contract), speaking the reference client's protocol
  * (reference: pkg/client/client.go:150-223 SearchIssues startAt/maxResults
  * paging against response `total`; Bearer-token transport
  * pkg/ratelimit/transport.go:17-85; 30s request timeout client.go:108).
  *
  * Spark-native mapping of the live protocol:
  *   - PLANNING makes exactly one `maxResults=0` probe request to learn
  *     `total` (and to fail fast on bad credentials — the S4 auth probe
  *     becomes an HTTP 401 at plan time, before any task launches);
  *   - one page = one input partition, so a 33k-issue JQL result fetches as
  *     ⌈total/pageSize⌉ parallel tasks, each a single GET;
  *   - a pushed LIMIT caps `total` at plan time: `df.limit(n)` issues
  *     ⌈n/pageSize⌉ requests, never paging past the bound;
  *   - each reader retries 429s with `Retry-After`/exponential backoff via
  *     [[Throttle.nextDelayMs]] (the C8 policy), and an optional
  *     `maxPerSecond` paces rows within the partition.
  *
  * The build is zero-egress, so nothing in the repo dials a real host: the
  * test suite drives this connector against an in-process mock JIRA server
  * (SourceSpec), and a LIVE endpoint is exercised only when the operator
  * sets `JIRA_LIVE_URL` — the same env-gate discipline as the reference's
  * own integration tests (reference: test/jql_sync_integration_test.go:27-46
  * skipping without JIRA_BASE_URL/JIRA_PAT).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.v2.JiraHttpSource")
  *   .option("url", "https://jira.example.com")   // base URL
  *   .option("jql", "project = P1")
  *   .option("token", sys.env("JIRA_PAT"))
  *   .option("pageSize", "100")
  *   .load()                        // → (payload STRING), one row per issue
  *   .transform(Ingest.fromWire(_)) // → flat issue records
  * }}}
  */
class JiraHttpSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JiraFixtureSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JiraHttpTable(properties.asScala.toMap)
}

object JiraHttpSource {
  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()
  private val mapper = new ObjectMapper()

  /** One GET of `search?jql&startAt&maxResults` → (rate signal, total,
    * issues as compact JSON payloads). 2xx parses the reference envelope
    * `{startAt, maxResults, total, issues: [...]}`; 429 surfaces its
    * `Retry-After`; anything else throws with the status and body head.
    */
  private[v2] def fetchPage(baseUrl: String, jql: String, token: String,
      startAt: Long, maxResults: Long): (Throttle.RateSignal, Long, Seq[String]) = {
    val q = java.net.URLEncoder.encode(jql, "UTF-8")
    val uri = URI.create(
      s"$baseUrl/rest/api/2/search?jql=$q&startAt=$startAt&maxResults=$maxResults")
    val req = HttpRequest.newBuilder(uri)
      .header("Authorization", s"Bearer $token")
      .header("Accept", "application/json")
      .timeout(Duration.ofSeconds(30)) // the reference client's bound
      .GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case ok if ok >= 200 && ok < 300 =>
        val root = mapper.readTree(resp.body())
        val total = root.path("total").asLong(0L)
        val issues = Option(root.get("issues")).map { arr =>
          arr.elements().asScala
            .map(n => mapper.writeValueAsString(n)).toSeq
        }.getOrElse(Seq.empty)
        val remaining = Option(resp.headers.firstValue("X-RateLimit-Remaining")
          .orElse(null)).flatMap(_.toIntOption)
        val resetIn = Option(resp.headers.firstValue("X-RateLimit-Reset")
          .orElse(null)).flatMap(_.toLongOption).map(_ * 1000)
        (Throttle.RateSignal(ok, remaining = remaining, resetInMs = resetIn),
          total, issues)
      case 429 =>
        val retryAfter = Option(resp.headers.firstValue("Retry-After")
          .orElse(null)).flatMap(_.toLongOption).map(_ * 1000)
        (Throttle.RateSignal(429, retryAfterMs = retryAfter), 0L, Seq.empty)
      case other =>
        throw new java.io.IOException(
          s"jira http source: $uri returned $other: ${resp.body().take(200)}")
    }
  }

  /** [[fetchPage]] with bounded 429 retries under the C8 adaptation policy. */
  private[v2] def fetchPageRetrying(baseUrl: String, jql: String, token: String,
      startAt: Long, maxResults: Long, maxRetries: Int = 5,
      sleepMs: Long => Unit = Thread.sleep): (Long, Seq[String]) = {
    var attempt = 0
    while (true) {
      val (sig, total, issues) = fetchPage(baseUrl, jql, token, startAt, maxResults)
      if (sig.status != 429) return (total, issues)
      if (attempt >= maxRetries)
        throw new java.io.IOException(
          s"jira http source: still rate-limited after $maxRetries retries")
      sleepMs(Throttle.nextDelayMs(sig, 100, attempt))
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }
}

final class JiraHttpTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"jira_http(${props.getOrElse("url", "?")})"
  override def schema(): StructType = JiraFixtureSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val all = props ++ options.asScala
    val token = all.getOrElse("token",
      throw new IllegalArgumentException(
        "jira http source: 'token' option is required (auth probe)"))
    if (token.trim.isEmpty)
      throw new IllegalArgumentException("jira http source: empty credentials")
    val url = all.getOrElse("url",
      throw new IllegalArgumentException("jira http source: 'url' option is required"))
      .stripSuffix("/")
    val jql = all.getOrElse("jql",
      throw new IllegalArgumentException("jira http source: 'jql' option is required"))
    val pageSize = all.getOrElse("pageSize", "100").toInt
    require(pageSize > 0, "pageSize must be positive")
    val maxPerSecond = all.get("maxPerSecond").map(_.toInt)
    new JiraHttpScanBuilder(url, jql, token, pageSize, maxPerSecond)
  }
}

final class JiraHttpScanBuilder(url: String, jql: String, token: String,
    pageSize: Int, maxPerSecond: Option[Int])
  extends ScanBuilder with SupportsPushDownLimit {
  private var limit: Option[Int] = None
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def build(): Scan =
    new JiraHttpScan(url, jql, token, pageSize, maxPerSecond, limit)
}

final case class HttpPage(url: String, jql: String, token: String,
    startAt: Long, maxResults: Long, maxPerSecond: Option[Int])
  extends InputPartition {
  // case-class toString would print the bearer token verbatim into task
  // failure messages and plan dumps; redact it entirely
  override def toString: String =
    s"HttpPage($url,$jql,***,$startAt,$maxResults,$maxPerSecond)"
}

final class JiraHttpScan(url: String, jql: String, token: String,
    pageSize: Int, maxPerSecond: Option[Int], limit: Option[Int])
  extends Scan with Batch {
  override def readSchema(): StructType = JiraFixtureSource.schema
  override def toBatch: Batch = this

  override def description(): String =
    s"jira_http pageSize=$pageSize" + limit.fold("")(n => s" pushedLimit=$n")

  override def planInputPartitions(): Array[InputPartition] = {
    // one maxResults=0 probe: learns `total` AND validates credentials at
    // plan time (bad token → 401 here, before any task launches)
    val (total, _) =
      JiraHttpSource.fetchPageRetrying(url, jql, token, 0L, 0L)
    val bounded = limit.fold(total)(n => math.min(total, n.toLong))
    (0L until bounded by pageSize.toLong).map { s =>
      HttpPage(url, jql, token, s, math.min(pageSize.toLong, bounded - s),
        maxPerSecond)
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[HttpPage]
      new PartitionReader[InternalRow] {
        // the page is fetched lazily on first next() so a cancelled task
        // never pays the request
        private lazy val base: Iterator[String] = JiraHttpSource
          .fetchPageRetrying(p.url, p.jql, p.token, p.startAt, p.maxResults)
          ._2.iterator
        private lazy val lines: Iterator[String] =
          p.maxPerSecond.fold(base)(r => Throttle.rateLimited(base, r))
        private var current: String = _
        override def next(): Boolean =
          if (lines.hasNext) { current = lines.next(); true } else false
        override def get(): InternalRow =
          InternalRow(UTF8String.fromString(current))
        override def close(): Unit = ()
      }
    }
}
