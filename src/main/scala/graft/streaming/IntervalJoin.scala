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
  * micro-batch epoch. Events later than the watermark delay are dropped by
  * the engine (the standard lateness trade every stream-stream join makes);
  * the batch twin over full history remains the exact answer.
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
    c.join(v, expr(
        s"""user_id = view_user_id
           |AND vts >= cts - interval $windowSec seconds
           |AND vts < cts""".stripMargin))
      .select(col("click_id"), col("user_id"), col("view_id"),
        (unix_micros(col("cts")) - unix_micros(col("vts"))).as("lag_us"))
  }
}
