package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** LLM-training-data pipeline operators over the `documents` and `embeddings`
  * tables: deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine), similarity search (brute-force + IVF-pruned ANN), and
  * text analysis (language-ID, quality scoring, token counting,
  * fingerprinting).
  *
  * Every operator is expressed twice — Spark DataFrame API and DuckDB oracle
  * SQL — over a shared deterministic primitive set so the driver can
  * hash-compare results:
  *   - text normalization: lowercase, non-alphanumeric → space, trim;
  *   - a 60-bit string hash: first 15 hex chars of md5, parsed as a BIGINT
  *     (both engines produce identical lowercase md5 hex);
  *   - double-precision arithmetic on exact integer counts (no rounding
  *     needed: same ints + one division = bit-identical doubles).
  */
package object pipeline {

  // ---- Spark-side shared primitives ---------------------------------------

  /** Deterministic 60-bit hash of a string column (cross-engine: DuckDB
    * equivalent is `('0x' || substr(md5(e),1,15))::BIGINT`). Computed by the
    * native codegen'd [[graft.functions.Md5Prefix64]] expression — one digest,
    * no hex-string materialization; definitionally equal to
    * `conv(substring(md5(c),1,15),16,10)::long`.
    */
  def hash64(c: Column): Column = graft.functions.Md5Prefix64(c)

  /** Normalized text: lowercase, punctuation collapsed to single spaces. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** documents → (doc_id, norm). Narrow projection, no shuffle. (A blanket
    * [[Tables.fanOut]] here was measured NET-NEGATIVE: ~40 consumers, and
    * for the many cheap-map ones the extra exchange cost more than the
    * parallelism bought — fan-out is applied per heavy consumer instead.)
    */
  def docsNorm(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), normText(col("text")).as("norm"))

  /** documents → (doc_id, w: array<string>) word arrays. */
  def docWords(s: SparkSession, dir: String): DataFrame =
    docsNorm(s, dir).withColumn("w", split(col("norm"), " "))

  /** documents → (doc_id, sh) DISTINCT word-3-gram shingles, one row per
    * shingle. The shingle set is the dedup unit for MinHash and Jaccard.
    * Shingling is the native codegen'd [[graft.functions.Shingles]] (one
    * fused loop; semantics identical to
    * `array_distinct(transform(sequence(1, size(w)-2), i -> concat_ws(' ',
    * w[i], w[i+1], w[i+2])))`).
    */
  def docShingles(s: SparkSession, dir: String): DataFrame =
    docWords(s, dir).select(col("doc_id"),
      explode(graft.functions.Shingles(col("w"))).as("sh"))

  /** [[docShingles]] over an arbitrary `(doc_id, text)` DataFrame — for
    * incremental pipelines that shingle only a changed batch, not a table.
    */
  def docShinglesOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.Shingles(
        split(normText(col("text")), " "))).as("sh"))

  /** documents → (doc_id, shs: array<string>) — the distinct shingle SET as
    * one array row per doc (docs with <3 words have none and are dropped,
    * matching the exploded form). Keeping the set rolled up lets signature
    * and set-similarity work fold per row instead of exploding shingles
    * through an exchange.
    */
  def docShingleArrays(s: SparkSession, dir: String): DataFrame =
    docWords(s, dir)
      .select(col("doc_id"), graft.functions.Shingles(col("w")).as("shs"))
      .filter(size(col("shs")) > 0)

  /** [[docShingleArrays]] over an arbitrary `(doc_id, text)` DataFrame. */
  def docShingleArraysOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.Shingles(split(normText(col("text")), " ")).as("shs"))
      .filter(size(col("shs")) > 0)

  /** Double-precision dot product of two array<double> columns — the native
    * codegen'd [[graft.functions.DotProductD]] expression (one fused loop,
    * stays in whole-stage codegen). Same sequential fold order as the
    * higher-order `aggregate(zip_with(...))` chain it replaced and as
    * DuckDB's list_dot_product, so results are bit-identical.
    */
  def dotD(x: Column, y: Column): Column = graft.functions.DotProductD(x, y)

  /** Cosine similarity between two array<double> columns. */
  def cosineD(x: Column, y: Column): Column =
    dotD(x, y) / (sqrt(dotD(x, x)) * sqrt(dotD(y, y)))

  /** embeddings → (vec_id, label, e: array<double>). */
  def embD(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), v => v.cast("double")).as("e"))

  /** [[embD]] plus the precomputed L2 norm: pairwise cosine then costs ONE
    * dot product per pair (`dot / (na * nb)`) instead of three — bit-identical
    * to [[cosineD]], the per-row `sqrt(dot(x,x))` factors are just hoisted
    * out of the pair loop.
    */
  def embDN(s: SparkSession, dir: String): DataFrame =
    embD(s, dir).withColumn("nrm", sqrt(dotD(col("e"), col("e"))))

  // ---- DuckDB oracle shared fragments -------------------------------------

  /** DuckDB spelling of [[hash64]]. */
  def sqlHash64(e: String): String = s"('0x' || substr(md5($e),1,15))::BIGINT"

  val docsNormCte: String =
    """docs AS (
      |  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
      |  FROM documents)""".stripMargin

  val wordsCte: String =
    "words AS (SELECT doc_id, string_split(norm, ' ') AS w FROM docs)"

  val shinglesCte: String =
    """shingles AS (
      |  SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |    FROM words WHERE len(w) >= 3))""".stripMargin

  /** `WITH docs, words, shingles <sql>` oracle prefix over documents. */
  def withDocs(sql: String): String =
    s"WITH $docsNormCte,\n$wordsCte,\n$shinglesCte\n$sql"

  val embCte: String =
    "emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings)"

  def sqlCosine(a: String, b: String): String =
    s"(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))))"
}
