package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k-smallest aggregate: the k smallest DISTINCT string values of
  * a group, ascending — `list_sort(list(DISTINCT c))[1:k]` with a HARD
  * k-element buffer instead of collecting the whole group.
  *
  * This is the aggregation shape for "sample keys per group" at 100 TB
  * (reference's analyzeIssues key lists, pkg/epic/jira_analyzer.go:223-247):
  * a window `row_number <= k` ranks by sorting the ENTIRE corpus inside each
  * group partition — one full range shuffle + sort whose cost scales with
  * corpus size; an unbounded `collect_set` carries every key of the group
  * through the exchange. This aggregate's partial states are ≤ k entries, so
  * the map side combines locally and the exchange carries k strings per
  * group no matter how large the group is. Exact (not approximate) for any
  * group size.
  */
final case class MinKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[UTF8String]] {

  require(k > 0, "min_k requires k > 0")

  private implicit val ord: Ordering[UTF8String] =
    Ordering.fromLessThan((a, b) => a.compareTo(b) < 0)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"min_k requires a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType)

  override def createAggregationBuffer(): mutable.TreeSet[UTF8String] =
    mutable.TreeSet.empty

  private def add(buf: mutable.TreeSet[UTF8String], v: UTF8String): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (ord.lt(v, buf.last)) {
      // only materialize an insert when v beats the current k-th smallest
      if (buf.add(v)) buf.remove(buf.last)
      ()
    }

  override def update(buf: mutable.TreeSet[UTF8String],
      input: InternalRow): mutable.TreeSet[UTF8String] = {
    val v = child.eval(input)
    // clone: Spark reuses the UTF8String's backing buffer across rows
    if (v != null) add(buf, v.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: mutable.TreeSet[UTF8String],
      other: mutable.TreeSet[UTF8String]): mutable.TreeSet[UTF8String] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[UTF8String]): Any =
    new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: mutable.TreeSet[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { s =>
      val b = s.getBytes
      out.writeInt(b.length); out.write(b)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[UTF8String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[UTF8String]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.add(UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "min_k"
}

object MinK {
  /** Column API: `df.groupBy(...).agg(MinK(col, k))` → sorted array<string>. */
  def apply(c: Column, k: Int): Column =
    toColumn(MinKAgg(toExpression(c), k).toAggregateExpression())
}
