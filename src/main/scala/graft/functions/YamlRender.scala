package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression rendering one issue (a 19-field canonical struct, field
  * order = `Yaml.columns ++ Yaml.relColumns`) to its YAML document string —
  * the reference's on-disk record (pkg/schema/yaml.go:30-84) — entirely from
  * the InternalRow representation.
  *
  * Why custom (SURVEY.md §2.9 preference order (b)): the YAML sink's writer
  * task previously received external `Row`s, and converting the relationship
  * arrays (`array<string>` + `array<struct<…>>`) through CatalystTypeConverters
  * per row dominated the sync write stage once full-parity records carried
  * them. Rendering inside the projection keeps the string build in the
  * codegen stage reading unsafe rows directly; the writer task then only
  * sees three flat strings (key, project, yaml).
  *
  * Byte-for-byte equivalent to `Yaml.toYamlString` (pinned by SinkSpec's
  * equivalence test).
  */
final case class YamlRender(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType

  @transient private lazy val schema = child.dataType.asInstanceOf[StructType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == YamlRender.Arity =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"yaml_render requires the ${YamlRender.Arity}-field canonical issue struct, got ${other.sql}")
  }

  private def tsKind(i: Int): Int = schema(i).dataType match {
    case TimestampType => YamlRender.TsLtz
    case TimestampNTZType => YamlRender.TsNtz
    case DateType => YamlRender.TsDate
    case other => throw new IllegalArgumentException(
      s"yaml_render timestamp field ${schema(i).name} has unsupported type ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    YamlRender.render(input.asInstanceOf[InternalRow], tsKind(10), tsKind(11))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (kc, ku) = (tsKind(10), tsKind(11))
    defineCodeGen(ctx, ev, c => s"graft.functions.YamlRender.render($c, $kc, $ku)")
  }

  override protected def withNewChildInternal(newChild: Expression): YamlRender =
    copy(child = newChild)
}

object YamlRender {

  /** Canonical struct arity (Yaml.columns 17 + relColumns 2). */
  val Arity = 19

  final val TsLtz = 0
  final val TsNtz = 1
  final val TsDate = 2

  /** The canonical issue struct for [[YamlRender]], built from `df`'s columns
    * in `Yaml.columns ++ Yaml.relColumns` order (absent columns must already
    * be null-filled). The issue_links element struct is re-projected to the
    * (link_type, direction, issue_key) field order the renderer indexes.
    */
  def forIssue(df: DataFrame): Column = {
    import org.apache.spark.sql.functions._
    val flat = graft.sink.Yaml.columns.map(col)
    val subs = col("subtasks")
    val links = transform(col("issue_links"), l =>
      struct(l.getField("link_type").as("link_type"),
        l.getField("direction").as("direction"),
        l.getField("issue_key").as("issue_key")))
    toColumn(YamlRender(toExpression(struct(flat :+ subs :+ links: _*))))
  }

  private def fmtMicrosWall(micros: Long): String = {
    val secs = Math.floorDiv(micros, 1000000L)
    val nanos = (Math.floorMod(micros, 1000000L) * 1000L).toInt
    java.time.LocalDateTime.ofEpochSecond(secs, nanos, java.time.ZoneOffset.UTC)
      .format(graft.sink.Yaml.wire)
  }

  private def fmtTs(row: InternalRow, i: Int, kind: Int): String =
    if (row.isNullAt(i)) ""
    else kind match {
      case TsLtz =>
        // same instant→wall mapping as java.sql.Timestamp.toLocalDateTime
        // (the external-Row path): JVM default zone
        val micros = row.getLong(i)
        java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            Math.floorMod(micros, 1000000L) * 1000L),
          java.time.ZoneId.systemDefault()).format(graft.sink.Yaml.wire)
      case TsNtz => fmtMicrosWall(row.getLong(i))
      case TsDate => java.time.LocalDate.ofEpochDay(row.getInt(i).toLong).toString
    }

  /** Render the canonical issue struct. Field indices are fixed by
    * [[forIssue]]; must stay byte-identical to `Yaml.toYamlString`.
    */
  def render(row: InternalRow, tsKindCreated: Int, tsKindUpdated: Int): UTF8String = {
    import graft.sink.Yaml.esc
    def s(i: Int): String =
      if (row.isNullAt(i)) "" else row.getUTF8String(i).toString
    val sb = new StringBuilder
    sb ++= s"key: ${esc(s(0))}\n"
    sb ++= s"project: ${esc(s(1))}\n"
    sb ++= s"summary: ${esc(s(2))}\n"
    sb ++= s"description: ${esc(s(3))}\n"
    sb ++= "status:\n"
    sb ++= s"  name: ${esc(s(4))}\n"
    sb ++= s"  category: ${esc(s(5))}\n"
    sb ++= "assignee:\n"
    sb ++= s"  name: ${esc(s(6))}\n"
    sb ++= s"  email: ${esc(s(7))}\n"
    sb ++= "reporter:\n"
    sb ++= s"  name: ${esc(s(8))}\n"
    sb ++= s"  email: ${esc(s(9))}\n"
    sb ++= s"created: ${esc(fmtTs(row, 10, tsKindCreated))}\n"
    sb ++= s"updated: ${esc(fmtTs(row, 11, tsKindUpdated))}\n"
    sb ++= s"priority: ${esc(s(12))}\n"
    sb ++= s"issuetype: ${esc(s(13))}\n"
    sb ++= s"sprint: ${esc(s(14))}\n"
    val epicLink = s(15)
    val parentIssue = s(16)
    val subtasks: ArrayData = if (row.isNullAt(17)) null else row.getArray(17)
    val links: ArrayData = if (row.isNullAt(18)) null else row.getArray(18)
    val nSubs = if (subtasks == null) 0 else subtasks.numElements()
    val nLinks = if (links == null) 0 else links.numElements()
    if (epicLink.nonEmpty || parentIssue.nonEmpty || nSubs > 0 || nLinks > 0) {
      sb ++= "relationships:\n"
      if (epicLink.nonEmpty) sb ++= s"  epic_link: ${esc(epicLink)}\n"
      if (parentIssue.nonEmpty) sb ++= s"  parent_issue: ${esc(parentIssue)}\n"
      if (nSubs > 0) {
        sb ++= "  subtasks:\n"
        var i = 0
        while (i < nSubs) {
          sb ++= s"    - ${esc(subtasks.getUTF8String(i).toString)}\n"
          i += 1
        }
      }
      if (nLinks > 0) {
        sb ++= "  issue_links:\n"
        var i = 0
        while (i < nLinks) {
          val l = links.getStruct(i, 3)
          def ls(j: Int): String =
            if (l.isNullAt(j)) "" else l.getUTF8String(j).toString
          sb ++= s"    - type: ${esc(ls(0))}\n"
          sb ++= s"      direction: ${esc(ls(1))}\n"
          sb ++= s"      issue_key: ${esc(ls(2))}\n"
          i += 1
        }
      }
    }
    UTF8String.fromString(sb.result())
  }
}
