package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming daily gap fill: the per-user stateful form of the batch
  * `stream_gap_fill` query (graft.queries.Misc) — a live event stream
  * becomes a DENSE per-user daily series, quiet days emitted as explicit
  * gap rows carrying the last observed daily total forward.
  *
  * A day can only be emitted once it is CLOSED (a later event for the same
  * user proves no more rows can land on it under ordered arrival), so each
  * arrival at day D > current emits the current day's row plus one gap row
  * per skipped day, then re-arms on D. The user's newest day stays open in
  * state until a later day closes it — the batch twin, which sees the whole
  * history at once, additionally emits that final day; parity over CLOSED
  * days is exact and pinned by StreamSpec.
  *
  * Exactness: day totals accumulate as integer CENTS (the batch side's
  * DECIMAL(18,2) in fixed-point), and the emitted double is one correctly-
  * rounded division `cents / 100.0` — the same value the batch side's
  * DECIMAL→DOUBLE cast produces, no float accumulation anywhere. Day
  * boundaries are UTC epoch-day arithmetic, matching the batch session's
  * UTC `date_trunc`.
  *
  * Semantics match the batch query exactly when events arrive in event-time
  * order across micro-batches (within a batch they are sorted here). A late
  * cross-batch arrival on an already-closed day is DROPPED — re-opening a
  * closed day would retract emitted rows, which append mode cannot do; the
  * divergence is deliberate, pinned by StreamSpec, and the batch twin is
  * the exact answer over history (the same contract as [[Funnel]]).
  *
  * State per user is O(1): (open day, its event count, its cent total, the
  * last closed day's cent total) — total state ∝ active users, never event
  * volume.
  */
object GapFill {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)

  /** Open-day accumulator: `day` is the UTC epoch day currently filling,
    * `fillCents` the last CLOSED day's total (the forward-fill source).
    */
  final case class UserDay(day: Long, n: Long, cents: Long, fillCents: Long)

  /** One dense-series row (append-mode friendly; `day_s` is the UTC date). */
  final case class DayRow(user_id: Long, day_s: String, n_events: Long,
      is_gap: Boolean, filled_value: Double)

  private def epochDay(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 86400000L)

  private def dayString(day: Long): String =
    java.time.LocalDate.ofEpochDay(day).toString

  /** The batch side casts `value` to DECIMAL(18,2) before summing; this is
    * that cast in fixed-point (same HALF_UP tie rule as Spark's cast).
    */
  private def toCents(value: Double): Long =
    BigDecimal(value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValueExact

  /** Fold one user's micro-batch (sorted by event time) through the day
    * machine. Buffers one (user, batch) group like [[Funnel.step]] — same
    * bound, same production guard note there.
    */
  def step(user: Long, rows: Iterator[Event],
      state: GroupState[UserDay]): Iterator[DayRow] = {
    val sorted = rows.toArray.sortBy(_.ts.getTime)
    val out = Seq.newBuilder[DayRow]
    var cur = state.getOption.orNull
    sorted.foreach { e =>
      val d = epochDay(e.ts)
      if (cur == null) {
        cur = UserDay(d, 1L, toCents(e.value), 0L)
      } else if (d == cur.day) {
        cur = cur.copy(n = cur.n + 1, cents = cur.cents + toCents(e.value))
      } else if (d > cur.day) {
        // close the open day, then fill the quiet days up to (excl.) d
        out += DayRow(user, dayString(cur.day), cur.n, is_gap = false,
          cur.cents / 100.0)
        var g = cur.day + 1
        while (g < d) {
          out += DayRow(user, dayString(g), 0L, is_gap = true,
            cur.cents / 100.0)
          g += 1
        }
        cur = UserDay(d, 1L, toCents(e.value), cur.cents)
      }
      // d < cur.day: late arrival on a closed day — dropped (see scaladoc)
    }
    if (cur != null) state.update(cur)
    out.result().iterator
  }

  /** The dense daily stream (append mode; runs on batch Datasets too — every
    * group then folds its whole history in one invocation, emitting all but
    * each user's final open day).
    */
  def dense(events: Dataset[Event]): Dataset[DayRow] = {
    implicit val st: Encoder[UserDay] = Encoders.product[UserDay]
    implicit val row: Encoder[DayRow] = Encoders.product[DayRow]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
  }
}
