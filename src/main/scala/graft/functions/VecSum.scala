package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Element-wise sum of `array<bigint>` rows: the centroid-update aggregate
  * for k-means-style clustering (`sum(vec[i]) for each i`, one output array
  * per group).
  *
  * The naive spelling — `posexplode` the vector then `groupBy(key, pos)` —
  * pushes dim× the corpus row count through a shuffle and needs a second
  * aggregation to reassemble arrays in position order. This aggregate keeps
  * the whole update ONE hash aggregate: the partial state is a single
  * dim-length long array per (partition, group), the map side combines
  * locally, and the exchange carries k×dim longs total no matter how many
  * input rows there are — the shape that survives a 100 TB corpus with a
  * handful of clusters.
  *
  * Exact integer arithmetic (callers quantize doubles to fixed-point first),
  * so partial-aggregation order cannot change the result — the property the
  * cross-engine oracle hash depends on. Sums are unchecked longs by design:
  * at 1e6-scale quantized components, overflow needs ~9e12 rows in one
  * group; quantize coarser or pre-aggregate per-shard before that point.
  *
  * Rows whose array is null are skipped; all arrays in a group must share
  * one length (the first row fixes it — a mismatch throws rather than
  * silently truncating).
  */
final case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_sum requires array<bigint>, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Empty array = "no rows seen yet" (a real input of length 0 sums to
    * itself, which is indistinguishable and equally correct).
    */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def addInto(buf: Array[Long], v: ArrayData): Array[Long] = {
    val n = v.numElements()
    if (buf.length == 0) {
      val fresh = new Array[Long](n)
      var i = 0
      while (i < n) { fresh(i) = v.getLong(i); i += 1 }
      fresh
    } else {
      require(buf.length == n,
        s"vec_sum: ragged input (expected length ${buf.length}, got $n)")
      var i = 0
      while (i < n) { buf(i) += v.getLong(i); i += 1 }
      buf
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else addInto(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other.length == 0) buf
    else if (buf.length == 0) other
    else {
      require(buf.length == other.length,
        s"vec_sum: ragged partials (${buf.length} vs ${other.length})")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "vec_sum"
}

object VecSum {
  /** Column API: `df.groupBy(...).agg(VecSum(col))` → array<bigint>. */
  def apply(c: Column): Column =
    toColumn(VecSumAgg(toExpression(c)).toAggregateExpression())
}
