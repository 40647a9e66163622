package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Throttle

/** DataSource V2 connector for a JIRA-style paged REST source, backed by a
  * JSONL fixture file (the offline analogue of the reference's client;
  * reference: pkg/client/client.go:150-223 paged SearchIssues,
  * pkg/client/mock.go the fixture store).
  *
  * Spark-native mappings of the reference's client behaviors:
  *   - S2 auto-pagination → `planInputPartitions` = one partition per page of
  *     `pageSize` (the reference's 100, pkg/client/client.go:160) so pages
  *     fetch in parallel across tasks;
  *   - S4 auth probe → option validation at scan build: a missing `token`
  *     fails fast, before any task launches;
  *   - C8 rate limiting → the partition reader throttles its own rows
  *     (`maxPerSecond` per partition, the per-worker budget);
  *   - S3 bounded fetch → LIMIT pushdown (`SupportsPushDownLimit`): a
  *     `df.limit(n)` plans only ⌈n/pageSize⌉ pages instead of paging the
  *     whole remote dataset — the reference's `maxResults` cap
  *     (pkg/client/client.go:160), expressed as a Catalyst pushdown so
  *     the optimizer applies it to any bounded query automatically.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.v2.JiraFixtureSource")
  *   .option("path", "/fixtures/issues.jsonl")
  *   .option("token", "t").option("pageSize", "100")
  *   .load()                        // → (payload STRING)
  *   .transform(Ingest.fromWire(_)) // → flat issue records
  * }}}
  */
class JiraFixtureSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JiraFixtureSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JiraFixtureTable(properties.asScala.toMap)
}

object JiraFixtureSource {
  val schema: StructType = StructType(Seq(StructField("payload", StringType)))
}

final class JiraFixtureTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"jira_fixture(${props.getOrElse("path", "?")})"
  override def schema(): StructType = JiraFixtureSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val all = props ++ options.asScala
    // S4: authentication probe — fail at planning, not mid-job
    val token = all.getOrElse("token",
      throw new IllegalArgumentException(
        "jira fixture source: 'token' option is required (auth probe)"))
    if (token.trim.isEmpty)
      throw new IllegalArgumentException("jira fixture source: empty credentials")
    val path = all.getOrElse("path",
      throw new IllegalArgumentException("jira fixture source: 'path' option is required"))
    val pageSize = all.getOrElse("pageSize", "100").toInt
    require(pageSize > 0, "pageSize must be positive")
    val maxPerSecond = all.get("maxPerSecond").map(_.toInt)
    new JiraFixtureScanBuilder(path, pageSize, maxPerSecond)
  }
}

final class JiraFixtureScanBuilder(path: String, pageSize: Int,
    maxPerSecond: Option[Int]) extends ScanBuilder with SupportsPushDownLimit {
  private var limit: Option[Int] = None
  // a pushed limit is fully honored (we stop paging at exactly `limit`
  // rows), so returning true lets Spark drop its own Limit node entirely
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def build(): Scan =
    new JiraFixtureScan(path, pageSize, maxPerSecond, limit)
}

/** One page of the fixture = one input partition. */
final case class FixturePage(path: String, start: Long, end: Long,
    maxPerSecond: Option[Int]) extends InputPartition

final class JiraFixtureScan(path: String, pageSize: Int,
    maxPerSecond: Option[Int], limit: Option[Int] = None) extends Scan with Batch {
  override def readSchema(): StructType = JiraFixtureSource.schema
  override def toBatch: Batch = this

  override def description(): String =
    s"jira_fixture pageSize=$pageSize" + limit.fold("")(n => s" pushedLimit=$n")

  override def planInputPartitions(): Array[InputPartition] = {
    // the reference pages with startAt/maxResults until `total` is exhausted
    // (pkg/client/client.go:158-188); here total = fixture line count,
    // capped by a pushed LIMIT. The count itself short-circuits at the
    // limit — a bounded query must not pay a full-file scan at PLANNING
    // time either (the whole point of the pushdown).
    val total = {
      val src = scala.io.Source.fromFile(path)
      try {
        val lines = src.getLines().filter(_.trim.nonEmpty)
        limit.fold(lines.size.toLong)(n => lines.take(n).size.toLong)
      } finally src.close()
    }
    (0L until total by pageSize.toLong)
      .map(s => FixturePage(path, s, math.min(s + pageSize, total), maxPerSecond))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[FixturePage]
      new PartitionReader[InternalRow] {
        private val source = scala.io.Source.fromFile(p.path)
        private val base = source.getLines().filter(_.trim.nonEmpty)
          .slice(p.start.toInt, p.end.toInt)
        private val lines =
          p.maxPerSecond.fold(base: Iterator[String])(r => Throttle.rateLimited(base, r))
        private var current: String = _
        override def next(): Boolean =
          if (lines.hasNext) { current = lines.next(); true } else false
        override def get(): InternalRow =
          InternalRow(UTF8String.fromString(current))
        override def close(): Unit = source.close()
      }
    }
}
