package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.normText

/** Streaming curation — the continuous-ingest twin of the batch
  * `pipe_corpus_select` composition: score quality map-side, gate, dedup
  * exactly by content fingerprint within a watermark, and emit per-source
  * admitted document/token counts per event-time window. A training-data
  * ingestion service runs precisely this shape: documents arrive
  * continuously, only gated+deduped ones reach the corpus store, and the
  * windowed counters are the ingest dashboard.
  *
  * Scale/state design:
  *   - the quality gate is the SAME map-side expression fragment as the
  *     batch scorer ([[graft.pipeline.TextAnalysis.qualityOf]]) — zero
  *     state, bit-identical scores to the oracle-gated batch form;
  *   - dedup state is keyed by the 64-hex sha256 fingerprint and bounded
  *     by the watermark (`dropDuplicatesWithinWatermark`): expired keys
  *     are evicted, so state is proportional to the dedup horizon, not
  *     the stream's history;
  *   - the windowed counter is the second stateful operator in the same
  *     query — Spark's multi-stateful-operator support (watermark
  *     propagation in append mode) keeps it one job, no intermediate
  *     sink.
  */
object Curate {

  /** Gate + fingerprint: quality-scored rows at or above `tau`, with the
    * content fingerprint appended. Map-side only (safe on any stream). */
  def gated(docs: DataFrame, tau: Double = 0.5): DataFrame =
    graft.pipeline.TextAnalysis.qualityOf(docs)
      .filter(col("quality") >= tau)
      .withColumn("fp", sha2(normText(col("text")), 256))

  /** The full streaming pipeline: gate → watermarked exact dedup →
    * per-(window, source) admitted counts. `docs` must carry
    * `doc_id, text, source, ts` (event time).
    */
  def curated(docs: DataFrame, tau: Double = 0.5,
      dedupHorizon: String = "10 minutes",
      window: String = "1 minute"): DataFrame =
    gated(docs, tau)
      .withWatermark("ts", dedupHorizon)
      .dropDuplicatesWithinWatermark("fp")
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("source"))
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_tokens"))
      .select(col("window.start").as("win_start"), col("source"),
        col("n_docs"), col("n_tokens"))
}
