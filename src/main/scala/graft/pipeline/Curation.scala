package graft.pipeline

import org.apache.spark.sql.functions._

import graft.queries.{q, GQuery}

/** Dataset-curation operators over `documents`: deterministic hash-based
  * stratified sampling and train/val/test split assignment — the standard
  * reproducible alternative to RNG sampling for training-data pipelines.
  *
  * Scale design: both are pure map-side predicates/projections on the
  * 60-bit content hash of the stable document id ([[hash64]], codegen'd) —
  * no shuffle, no driver-side RNG state, no `sample()` nondeterminism; the
  * same row lands in the same bucket on any cluster, any partitioning, any
  * re-run, which is what makes dataset versions reproducible at 100 TB.
  */
object Curation {

  /** Per-language sampling rates (percent) for the stratified sample. */
  private val rates: Seq[(String, Int)] = Seq("en" -> 50, "de" -> 20)
  private val defaultRate = 10

  /** Stratified sample: keep `rate(lang)`% of each language stratum, chosen
    * by hash-mod of the doc id.
    */
  private val sample = {
    val rateCaseSql = rates.map { case (l, r) => s"WHEN '$l' THEN $r" }
      .mkString("CASE lang ", " ", s" ELSE $defaultRate END")
    q("pipe_sample_stratified",
      s"""SELECT doc_id, lang
         |FROM documents
         |WHERE ${sqlHash64("doc_id::VARCHAR")} % 100 < $rateCaseSql
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val rateCase = rates.foldLeft(when(lit(false), 0)) { case (acc, (l, r)) =>
        acc.when(col("lang") === l, r)
      }.otherwise(defaultRate)
      graft.Tables.t(s, dir, "documents")
        .filter(hash64(col("doc_id").cast("string")) % 100 < rateCase)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }
  }

  /** Train/val/test assignment: 80/10/10 by hash-mod — disjoint, exhaustive,
    * stable under re-runs and data growth (a document never migrates between
    * splits when other rows change).
    */
  private val split = q("pipe_split_assign",
    s"""SELECT doc_id,
       |  CASE WHEN ${sqlHash64("doc_id::VARCHAR")} % 100 < 80 THEN 'train'
       |       WHEN ${sqlHash64("doc_id::VARCHAR")} % 100 < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val bucket = hash64(col("doc_id").cast("string")) % 100
    graft.Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
          .as("split"))
      .orderBy("doc_id")
  }

  /** The capstone composition: the training corpus = documents that survive
    * exact dedup (first doc per normalized-content fingerprint) AND clear the
    * quality threshold AND fall in the train split — the three curation
    * stages chained the way a real pretraining pipeline runs them. Each
    * stage is a map-side predicate or one keyed shuffle; composing them
    * changes no plan shape.
    */
  private val corpus = q("pipe_corpus_select",
    withDocs(s""", ${TextAnalysis.qualitySql},
       |kept AS (
       |  SELECT doc_id,
       |    row_number() OVER (PARTITION BY sha256(norm) ORDER BY doc_id) = 1 AS k
       |  FROM docs)
       |SELECT q.doc_id, q.n_words, q.quality
       |FROM quality q JOIN kept ON kept.doc_id = q.doc_id
       |WHERE kept.k AND q.quality >= 0.5
       |  AND ${sqlHash64("q.doc_id::VARCHAR")} % 100 < 80
       |ORDER BY q.doc_id""".stripMargin)) { (s, dir) =>
    val firstPerFp = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy("doc_id")
    val kept = docsNorm(s, dir)
      .select(col("doc_id"), sha2(col("norm"), 256).as("fp"))
      .withColumn("k", row_number().over(firstPerFp) === 1)
      .select("doc_id", "k")
    TextAnalysis.qualityDf(s, dir)
      .join(kept, Seq("doc_id"))
      .filter(col("k") && col("quality") >= 0.5 &&
        hash64(col("doc_id").cast("string")) % 100 < 80)
      .select("doc_id", "n_words", "quality")
      .orderBy("doc_id")
  }

  val all: Seq[GQuery] = Seq(sample, split, corpus)
}
