package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: the live twin of the batch
  * `stream_interval_join` card (graft.queries.Misc) — every click paired
  * with the SAME user's views in the preceding `windowSec` seconds, as a
  * genuine Spark stream-stream inner join (not a stateful fold): both legs
  * carry a watermark, the join condition is the equi key plus the event-time
  * range, and Spark's symmetric hash join buffers each side only within the
  * watermark horizon.
  *
  * Scale shape: state per side is bounded by (arrival rate × watermark
  * delay) — the engine drops a buffered view once the click-side watermark
  * passes `vts + windowSec` (no click can still match it), so state never
  * grows with history. The join itself shuffles both streams on user_id,
  * the same key the batch twin's bucketed range join uses.
  *
  * Parity contract (pinned by StreamSpec): with all events inside the
  * watermark horizon, the emitted pair set is EXACTLY the batch card's
  * rows — an inner join emits each qualifying pair once, exactly-once per
  * micro-batch epoch. Events later than the watermark delay are dropped
  * once the matching state is evicted (the standard lateness trade every
  * stream-stream join makes); the batch twin over full history remains the
  * exact answer.
  *
  * Two operational facts StreamSpec pins because they bite in production:
  * the GLOBAL watermark is the MIN across both legs' watermark nodes, so a
  * leg that stops receiving data freezes eviction for the whole join (set
  * `spark.sql.streaming.multipleWatermarkPolicy=max` to trade correctness
  * for progress); and state cleanup lags one micro-batch (batch N evicts
  * with the watermark computed from batch N−1's data), so a row later than
  * the delay can still pair until the next batch commits.
  */
object IntervalJoin {

  /** Join two event streams (schema: event_id, user_id, ts, ...) into
    * attribution pairs `(click_id, user_id, view_id, lag_us)`. Works on
    * batch frames too (the watermark is a no-op there), which is what lets
    * the spec pin twin parity on identical input.
    */
  def pairs(clicks: DataFrame, views: DataFrame,
      windowSec: Long = 600L,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").cast("timestamp").as("cts"))
      .withWatermark("cts", watermarkDelay)
    val v = views
      .select(col("event_id").as("view_id"),
        col("user_id").as("view_user_id"),
        col("ts").cast("timestamp").as("vts"))
      .withWatermark("vts", watermarkDelay)
    // the range condition is spelled with the arithmetic on the VIEW side
    // (`cts > vts AND cts <= vts + w` — algebraically identical to
    // `vts ∈ [cts − w, cts)`): this is the canonical form Spark's
    // stream-stream join derives BOTH state-cleanup watermarks from; with
    // the arithmetic on the click column the click-side predicate is not
    // derived and click state is never evicted (pinned by StreamSpec's
    // late-view test, which fails under the other spelling)
    c.join(v, expr(
        s"""user_id = view_user_id
           |AND cts > vts
           |AND cts <= vts + interval $windowSec seconds""".stripMargin))
      .select(col("click_id"), col("user_id"), col("view_id"),
        (unix_micros(col("cts")) - unix_micros(col("vts"))).as("lag_us"))
  }
}
