package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous heavy hitters — the streaming twin of the bounded batch
  * `heavy_hitters` aggregate: "what's trending right now" over an unbounded
  * stream with BOUNDED state. Items shard map-side into `buckets` groups by
  * content hash; each group's `flatMapGroupsWithState` holds a SpaceSaving
  * sketch (Metwally et al., the same algorithm family as the batch
  * `HeavyHittersAgg`) of at most `capacity` counters in the state store.
  * The global top-k is the merge of the per-bucket sketches at read time —
  * a bucket count × capacity frame, broadcast-sized.
  *
  * Guarantees carried over from SpaceSaving, per bucket (and therefore
  * globally, since the hash shard is disjoint — an item lives in exactly
  * one bucket):
  *   - estimates never undercount: `count ≥ true count`;
  *   - the error is bounded and REPORTED: `count − err ≤ true count`;
  *   - any item whose true count exceeds (bucket stream length / capacity)
  *     is present in the sketch.
  *
  * Determinism: the batch's arrivals are pre-counted per item and applied
  * in item-sorted order, and eviction takes the minimum (count, item) — no
  * dependence on shuffle iteration order, so replaying the same batches
  * yields byte-identical sketches (the spec pins this).
  *
  * Scale/state: state is `buckets × capacity` counters TOTAL, independent
  * of stream length and item cardinality; the shard key spreads hot items
  * across executors (one pathological item still lands in one bucket, but
  * a counter is O(1) — the hot-KEY problem of a naive
  * `groupBy(item).count()` streaming aggregate, whose state grows with
  * CARDINALITY, is the thing this operator exists to avoid).
  */
object Trending {

  final case class ItemRow(bucket: Int, item: String)
  /** Parallel arrays, not a Map: stable encoder layout + cheap state I/O. */
  final case class Sketch(items: Array[String], counts: Array[Long],
      errs: Array[Long])
  final case class Estimate(bucket: Int, item: String, count: Long, err: Long)

  /** One group invocation: apply the batch's per-item counts (sorted) to the
    * sketch, then emit the bucket's FULL current sketch — downstream keeps
    * the latest estimate per item (counts are monotone, so `max(count)`
    * over an append sink is the current value).
    */
  def fold(capacity: Int)(bucket: Int, rows: Iterator[ItemRow],
      state: GroupState[Sketch]): Iterator[Estimate] = {
    val prior = state.getOption.getOrElse(
      Sketch(Array.empty, Array.empty, Array.empty))
    val m = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
    prior.items.indices.foreach { i =>
      m.put(prior.items(i), (prior.counts(i), prior.errs(i)))
    }
    // pre-count the batch per item, apply in sorted order — determinism
    // does not depend on the group iterator's arrival order
    val batch = scala.collection.mutable.HashMap[String, Long]()
    rows.foreach(r => batch.update(r.item, batch.getOrElse(r.item, 0L) + 1L))
    batch.toSeq.sortBy(_._1).foreach { case (item, n) =>
      m.get(item) match {
        case Some((c, e)) => m.update(item, (c + n, e))
        case None if m.size < capacity => m.put(item, (n, 0L))
        case None =>
          // evict the minimum (count, item); the newcomer inherits its
          // count as the SpaceSaving overestimation error
          val (evict, (minC, _)) = m.minBy { case (it, (c, _)) => (c, it) }
          m.remove(evict)
          m.put(item, (minC + n, minC))
      }
    }
    val out = m.toArray.sortBy(_._1)
    state.update(Sketch(out.map(_._1), out.map(_._2._1), out.map(_._2._2)))
    out.iterator.map { case (it, (c, e)) => Estimate(bucket, it, c, e) }
  }

  /** `items` must carry `item: string`. Works on streaming and batch
    * Datasets (batch = one giant micro-batch, empty prior state).
    */
  def estimates(items: DataFrame, buckets: Int = 32,
      capacity: Int = 64): Dataset[Estimate] = {
    implicit val rowEnc: Encoder[ItemRow] = Encoders.product[ItemRow]
    implicit val skEnc: Encoder[Sketch] = Encoders.product[Sketch]
    implicit val estEnc: Encoder[Estimate] = Encoders.product[Estimate]
    items
      .select(pmod(graft.pipeline.hash64(col("item")), lit(buckets.toLong))
        .cast("int").as("bucket"), col("item"))
      .as[ItemRow]
      .groupByKey(_.bucket)(Encoders.scalaInt)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fold(capacity))
  }

  /** Current top-k from an append sink of [[estimates]] rows: latest (= max,
    * counts are monotone) estimate per item, ranked. Broadcast-sized input
    * (≤ buckets × capacity live items). */
  def topK(emitted: DataFrame, k: Int): DataFrame =
    emitted.groupBy("item")
      .agg(max("count").as("count"), max("err").as("err"))
      .orderBy(desc("count"), asc("item")).limit(k)
}
