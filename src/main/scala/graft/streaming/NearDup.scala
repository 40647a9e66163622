package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash near-dup detection — the continuous-ingest twin of the
  * batch band join (`pipe_dedup_minhash`): documents arrive as a stream,
  * each folds to its 4 LSH band signatures MAP-SIDE (the same per-row
  * signature pipeline as batch, via [[graft.pipeline.Dedup.bandSignatures]]),
  * and a `flatMapGroupsWithState` operator keyed by the band signature
  * keeps each bucket's resident doc ids in the state store and emits a
  * candidate pair the moment a new document lands in an occupied bucket.
  *
  * Semantics vs batch: over all micro-batches, the DISTINCT emitted pairs
  * equal the batch band join over the union of the batches (order-
  * insensitive; [[graft.StreamSpec]] pins this equivalence), with two
  * deliberate deviations, both state-size bounds a 100 TB stream needs:
  *   - **bucket cap**: a bucket holds at most `cap` doc ids; docs landing
  *     in a full bucket emit pairs against the residents but are not
  *     stored (an over-full bucket is degenerate boilerplate — its pair
  *     count is quadratic and its contents near-identical, so capping
  *     loses only redundant edges, same rationale as the batch SimHash
  *     bucket cap);
  *   - **TTL**: an idle bucket's state is dropped after `ttlMs` — dedup
  *     against a bounded recency horizon, exactly like the exact-dedup
  *     stream's `dropDuplicatesWithinWatermark`. None = keep forever.
  *
  * Replays are idempotent FOR ADMITTED DOCS: a doc id resident in the
  * bucket emits nothing and changes no state on redelivery, so
  * at-least-once delivery yields exactly-once pair emission per
  * (bucket, pair) for every pair whose newer doc was stored. The one
  * deliberate exception is an arrival on a FULL bucket: it emits against
  * the residents but is not remembered (remembering every capped arrival
  * would rebuild exactly the unbounded state the cap exists to avoid), so
  * redelivering it re-emits those pairs — at-least-once for capped
  * arrivals. [[distinctPairs]] is the idempotency boundary consumers
  * already need for cross-band collisions, and it absorbs these replays
  * identically (the spec pins both behaviors).
  *
  * State size: ≤ cap BIGINTs per occupied bucket, buckets ∝ distinct band
  * signatures in the horizon — proportional to the deduped corpus slice,
  * never to stream history.
  */
object NearDup {

  final case class BandRow(bucket: String, doc_id: Long)
  final case class Bucket(docIds: Array[Long])
  final case class Candidate(doc_a: Long, doc_b: Long, bucket: String)

  /** One group invocation: fold the batch's arrivals into the bucket,
    * emitting each (resident, fresh) and (fresh, fresh) pair once,
    * canonically ordered. Deterministic: arrivals are deduped and sorted
    * before insertion, so emission order never depends on shuffle order.
    */
  def admit(cap: Int, ttlMs: Option[Long])(bucket: String,
      rows: Iterator[BandRow], state: GroupState[Bucket]): Iterator[Candidate] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val resident = state.getOption.map(_.docIds).getOrElse(Array.empty[Long])
    val seen = resident.toSet
    val fresh = rows.map(_.doc_id).filterNot(seen).toArray.distinct.sorted
    if (fresh.isEmpty) {
      ttlMs.foreach(state.setTimeoutDuration) // activity refreshes the TTL
      return Iterator.empty
    }
    val out = Array.newBuilder[Candidate]
    var cur = resident
    fresh.foreach { d =>
      cur.foreach { o =>
        out += (if (o < d) Candidate(o, d, bucket) else Candidate(d, o, bucket))
      }
      if (cur.length < cap) cur = cur :+ d
    }
    state.update(Bucket(cur))
    ttlMs.foreach(state.setTimeoutDuration)
    out.result().iterator
  }

  /** `docs` must carry `doc_id: long, text: string`. Works identically on a
    * streaming or batch Dataset (a batch run sees empty state everywhere —
    * that IS the batch band join, the twin the spec compares against).
    *
    * @param cap   max resident doc ids per band bucket (state + blowup bound)
    * @param ttlMs optional idle-bucket state TTL (processing time)
    */
  def candidates(docs: DataFrame, cap: Int = 64,
      ttlMs: Option[Long] = None): Dataset[Candidate] = {
    implicit val bandEnc: Encoder[BandRow] = Encoders.product[BandRow]
    implicit val bucketEnc: Encoder[Bucket] = Encoders.product[Bucket]
    implicit val candEnc: Encoder[Candidate] = Encoders.product[Candidate]
    val bands = graft.pipeline.Dedup.bandSignatures(docs)
      .select(concat_ws(":", col("band"), col("sig")).as("bucket"),
        col("doc_id"))
      .as[BandRow]
    val timeout =
      if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    bands.groupByKey(_.bucket)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(admit(cap, ttlMs))
  }

  /** Distinct candidate pairs, the cross-band dedup a consumer applies
    * before Jaccard verification (a pair can collide in several bands). */
  def distinctPairs(cands: Dataset[Candidate]): DataFrame =
    cands.toDF().select("doc_a", "doc_b").distinct()
}
