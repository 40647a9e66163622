package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-conversion funnel: the per-user stage machine form of
  * the batch `stream_funnel` query (graft.queries.Misc). Each user's state
  * is O(1) — the furthest stage reached plus the event time it was reached —
  * so total state is ∝ users who started the funnel, never ∝ event volume;
  * the state store is checkpointed with the query like every
  * `flatMapGroupsWithState` operator here.
  *
  * Semantics match the batch query exactly when events arrive in event-time
  * order across micro-batches (within a batch they are sorted here): stage 1
  * is the user's first `signup`, each later stage is the first matching
  * event STRICTLY after the previous stage's time. Late cross-batch
  * arrivals that would retroactively unlock an earlier stage are not
  * replayed — the inherent streaming-funnel tradeoff; run the batch twin
  * for the exact answer over history.
  */
object Funnel {

  /** Funnel stage order; index i advances to stage i+1. */
  val Stages: Seq[String] = Seq("signup", "click", "purchase")

  final case class Event(user_id: Long, event_type: String, ts: Timestamp)

  /** Furthest stage reached (1-based) and when. */
  final case class UserStage(stage: Int, t: Timestamp)

  /** One row per stage ADVANCE (append-mode friendly; the max stage per user
    * downstream is the funnel census).
    */
  final case class Advance(user_id: Long, stage: Int, event_type: String,
      ts: Timestamp)

  /** One group invocation: fold this batch's events (sorted by event time)
    * through the stage machine. Multiple stages can advance inside one
    * batch; each advance emits one row.
    *
    * Memory bound: `rows.toArray` buffers ONE user's events from ONE
    * micro-batch (Spark hands groups per (key, batch)) — bounded in any
    * sane trigger cadence, but a single user emitting millions of events
    * inside one micro-batch would materialize them all here. The batch twin
    * (`stream_funnel`) has no such bound; a production guard would cap the
    * per-trigger intake (`maxOffsetsPerTrigger`-style) or pre-aggregate the
    * per-batch candidate events (first event per stage type) before the
    * group fold.
    */
  def step(user: Long, rows: Iterator[Event],
      state: GroupState[UserStage]): Iterator[Advance] = {
    val sorted = rows.toArray.sortBy(_.ts.getTime)
    var cur = state.getOption.getOrElse(UserStage(0, new Timestamp(0L)))
    val out = Seq.newBuilder[Advance]
    sorted.foreach { e =>
      if (cur.stage < Stages.length && e.event_type == Stages(cur.stage) &&
          (cur.stage == 0 || e.ts.after(cur.t))) {
        cur = UserStage(cur.stage + 1, e.ts)
        out += Advance(user, cur.stage, e.event_type, e.ts)
      }
    }
    if (cur.stage > 0) state.update(cur)
    out.result().iterator
  }

  /** The stage-advance stream (append mode; runs on batch Datasets too —
    * every group then sees empty state, i.e. the whole history folds in one
    * invocation).
    */
  def advances(events: Dataset[Event]): Dataset[Advance] = {
    implicit val st: Encoder[UserStage] = Encoders.product[UserStage]
    implicit val adv: Encoder[Advance] = Encoders.product[Advance]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
  }
}
