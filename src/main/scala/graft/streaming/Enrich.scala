package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static dimension enrichment — the third join family next to the
  * stateful stream-stream [[IntervalJoin]] and the batch as-of join: a live
  * event stream joined per micro-batch against a STATIC (batch) dimension.
  * Spark re-plans the static side every micro-batch, so a dimension refresh
  * on disk is picked up without restarting the query, and a small dimension
  * broadcasts — the enrichment is stateless and map-side, nothing is
  * buffered.
  *
  * Two forms:
  *  - [[withDim]]: current-value lookup (plain equi key).
  *  - [[withScd2]]: EVENT-TIME lookup against an SCD2 interval dimension
  *    (the shape `queries/Cdc.scd2` emits): the event joins the version row
  *    whose `[valid_from, valid_to)` interval contains the event time, so a
  *    late-replayed event enriches with the attributes that were true WHEN
  *    IT HAPPENED, not today's — the difference between an audit-correct
  *    pipeline and one that rewrites history on every dim update.
  *
  * Both run identically on batch frames (a stream-static join IS a batch
  * join per micro-batch), which is how the spec pins twin parity.
  */
object Enrich {

  /** Current-value enrichment: left join on `keys`; unmatched events pass
    * through with null attributes (never dropped — a missing dim row is a
    * data-quality signal downstream, not a silent filter).
    */
  def withDim(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** SCD2 event-time enrichment: join the dimension version valid at the
    * event's own timestamp. `dim` carries `keys`, `fromCol`, `toCol`
    * (null/absent upper bound = still current) and attribute columns. An
    * SCD2 dim has non-overlapping intervals per key by construction, so at
    * most one version matches — cardinality is preserved.
    */
  def withScd2(stream: DataFrame, dim: DataFrame, keys: Seq[String],
      eventTime: String, fromCol: String = "valid_from",
      toCol: String = "valid_to"): DataFrame = {
    val cond = keys.map(k => stream(k) === dim(k)).reduce(_ && _) &&
      col(eventTime) >= col(fromCol) &&
      (col(toCol).isNull || col(eventTime) < col(toCol))
    keys.foldLeft(stream.join(broadcast(dim), cond, "left")) {
      (d, k) => d.drop(dim(k))
    }
  }
}
