package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving heavy hitters (Metwally et al.): top-k frequent items with a
  * HARD k-entry memory bound per aggregation state — the sketch shape for
  * "most frequent values of an unbounded-cardinality column at 100 TB",
  * where an exact groupBy+count would shuffle every distinct value. A novel
  * sketch as a first-class Catalyst aggregate (`TypedImperativeAggregate`):
  * partial states combine map-side like any built-in aggregate, so the
  * exchange carries at most k counters per group.
  *
  * When k ≥ the true distinct count no eviction ever happens and the result
  * is EXACT (the regime the DuckDB-oracled query runs in). Under eviction,
  * note the distributed caveat: the single-stream overestimate guarantee
  * does not survive merging k-bounded PARTIAL sketches — mass evicted from
  * a partition's summary before the merge is lost, so merged counts can
  * under- as well as over-estimate; what the merge preserves is the
  * identity of items whose frequency strictly exceeds n/k (pinned by test).
  * Size k generously relative to the tail when counts matter. Output is
  * `array<struct<item,cnt>>` sorted by (count desc, item asc), capped at k.
  */
final case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k > 0, "heavy_hitters requires k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters requires a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[UTF8String, Long],
      key: UTF8String, c: Long): Unit =
    buf.get(key) match {
      case Some(n) => buf.update(key, n + c)
      case None if buf.size < k => buf.update(key, c)
      case None =>
        // space-saving eviction: replace a minimum-count entry, inheriting
        // its count (the overestimate that gives the algorithm its bound).
        // Ties evict the lexicographically largest item — deterministic for
        // a given buffer content.
        val (minItem, minCnt) = buf.foldLeft((null: UTF8String, Long.MaxValue)) {
          case (best @ (bi, bc), (i, n)) =>
            if (n < bc || (n == bc && (bi == null || i.compareTo(bi) > 0))) (i, n)
            else best
        }
        buf.remove(minItem)
        buf.update(key, minCnt + c)
    }

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    // clone: Spark reuses the UTF8String's backing buffer across rows
    if (v != null) add(buf, v.asInstanceOf[UTF8String].clone(), 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    // deterministic merge order regardless of hash-map iteration
    other.toSeq.sortBy(_._1).foreach { case (key, c) => add(buf, key, c) }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (i, n) => (-n, i) }.take(k)
    new GenericArrayData(sorted.map { case (i, n) =>
      InternalRow(i, n)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, n) =>
      val b = i.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(n)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "heavy_hitters"
}

object HeavyHitters {
  /** Column API: `df.groupBy(...).agg(HeavyHitters(col, k))`. */
  def apply(c: Column, k: Int): Column =
    toColumn(HeavyHittersAgg(toExpression(c), k).toAggregateExpression())
}
