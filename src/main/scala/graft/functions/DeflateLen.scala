package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Native Catalyst expression computing the DEFLATE-compressed size of a
  * value — the primitive under the compression-ratio quality filter
  * (Gopher-family pipelines drop documents whose bytes compress too well:
  * highly repetitive boilerplate/spam; or too poorly: binary junk inside a
  * text field). The ratio `deflate_len(text) / octet_length(text)` is a
  * model-free redundancy score that catches repetition structures n-gram
  * heuristics miss (long-period repeats, interleaved templates).
  *
  * Determinism: DEFLATE output length at a FIXED level with a fresh
  * `Deflater` per value is a pure function of the input bytes for a given
  * zlib build, and the JDK pins its own zlib — stable across runs, sessions,
  * and executors (this guarantee is what the spec pins). No cross-engine
  * oracle exists (DuckDB ships no deflate surface), so the signal is engine
  * API + spec-tested rather than a registered query.
  *
  * Why custom (SURVEY.md §2.9 preference order (b)): a Scala UDF would box
  * every row and fall out of whole-stage codegen; this expression runs
  * map-side inside the generated loop like the other native primitives —
  * one Deflater per evaluation, `finish`+single `deflate` pass, no output
  * buffer retained.
  */
final case class DeflateLen(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len requires BINARY input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.len(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateLen.len($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  /** Fixed compression level: the determinism contract is per-level, and 6
    * (zlib default) is the standard choice for ratio filters. */
  val Level = 6

  def len(bytes: Array[Byte]): Int = {
    val d = new Deflater(Level)
    try {
      d.setInput(bytes)
      d.finish()
      // deflate-to-count: drain into a scratch buffer, keep only the size —
      // the output bytes are never needed, only their count
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Column API: compressed byte count of the (binary-cast) column. */
  def apply(c: Column): Column =
    toColumn(DeflateLen(toExpression(c.cast(BinaryType))))
}
