package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** Corpus output writer that controls FILE SIZES, not just partitioning —
  * the small-files problem is the classic way a 100 TB curation job ruins
  * its own downstream readers (a million 2 MB parquet files cost more in
  * footer reads and task scheduling than the data itself).
  *
  * Unpartitioned writes use AQE's rebalance: a `REBALANCE` hint lets the
  * runtime coalesce undersized shuffle partitions AND split oversized ones
  * to `spark.sql.adaptive.advisoryPartitionSizeInBytes` — unlike a static
  * `repartition(n)`, which needs the writer to guess n before knowing the
  * data volume, and unlike `coalesce`, which can only merge and destroys
  * write parallelism when it over-merges.
  *
  * Directory-partitioned writes need more than `REBALANCE(cols)`: AQE's
  * skew splitter cuts an oversized shuffle bucket by MAP RANGES, and when a
  * small partition value hash-collides into the same bucket as a huge one
  * (`source=web` at 90%, say), every map-range chunk carries a few of the
  * small value's rows — the small directory shatters into one sliver file
  * per chunk, which is precisely the storm this writer exists to prevent
  * (measured: a 260 KB source wrote 8 slivers next to a split 12 MB one).
  * So partitioned writes budget files EXPLICITLY instead:
  *
  *   1. census — one map-side-combinable aggregate computes each partition
  *      value's byte volume (json-serialized width as the proxy: it only
  *      overestimates vs. compressed parquet, which errs toward smaller
  *      files, never oversized ones). Costs one extra pass over the input,
  *      amortized by the 100 TB write it right-sizes; `censusFraction`
  *      switches it to a seeded sample when even that pass is too dear.
  *   2. budget — value v gets `k_v = ceil(bytes_v / advisory)` target
  *      files, laid out as a contiguous global slot range; every row picks
  *      the slot `offset_v + hash(non-partition cols) % k_v` (broadcast
  *      join on the budget table, whose cardinality is the hive partition
  *      count — bounded by contract, or the layout itself is broken).
  *   3. placement — one shuffle with exactly one output task per slot.
  *      `repartition(F, expr)` routes by `pmod(murmur3(expr), F)`, so the
  *      budget table carries, per slot, a probe long whose Murmur3 hash
  *      lands exactly on that slot (found by driver-side coupon-collector
  *      search, O(F log F) hashes; Spark pins Murmur3/seed-42 forever for
  *      bucketing compatibility, so the probe is stable API behavior).
  *
  * Result, by construction: a small value lands in exactly one task → one
  * file; a huge value writes its k_v right-sized files in parallel; no
  * group can shatter because no task ever holds more than one group. AQE
  * is not involved in placement, so nothing re-splits behind the budget's
  * back.
  */
object CorpusSink {

  /** For each slot `0 ≤ i < f`, a probe long that Spark's shuffle hash
    * (`pmod(murmur3_seed42(probe), f)`) maps to slot i.
    */
  private def slotProbes(f: Int): Array[Long] = {
    val probes = new Array[Long](f)
    val filled = new Array[Boolean](f)
    var remaining = f
    var q = 0L
    while (remaining > 0) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(q, 42)
      val slot = ((h % f) + f) % f
      if (!filled(slot)) { filled(slot) = true; probes(slot) = q; remaining -= 1 }
      q += 1
    }
    probes
  }

  /** Write `df` as parquet at `path` with files sized toward
    * `advisoryMB` per file, optionally directory-partitioned by
    * `partitionCols` (hive-style `col=value` layout, so downstream reads
    * prune partitions for free). `censusFraction` < 1 estimates the
    * file budget from a seeded sample instead of an exact pass.
    */
  def write(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
      advisoryMB: Int = 128, censusFraction: Double = 1.0): Unit = {
    val s = df.sparkSession
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = s.conf.getOption(key)
    s.conf.set(key, s"${advisoryMB}m")
    try {
      val balanced =
        if (partitionCols.isEmpty) df.hint("rebalance")
        else sizedByBudget(df, partitionCols, advisoryMB, censusFraction)
      val writer = balanced.write.mode("overwrite")
      (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
       else writer).parquet(path)
    } finally {
      prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }

  /** Z-ORDER (Morton) clustering key over `zCols` — multi-dimensional data
    * skipping for the layouts hive partitioning can't give. Directory
    * partitioning prunes ONE dimension at directory granularity; a scan
    * filtered on two+ columns (user AND time window, source AND quality
    * band) skips files only if each file covers a tight hyper-rectangle in
    * all filter dimensions at once. Interleaving the bits of per-column
    * rank codes gives exactly that: sorting by the interleaved key places
    * rows so any contiguous key range — hence any range-partitioned output
    * file — spans a bounded box in every clustered dimension, and parquet's
    * per-file/row-group min-max stats then prune multi-column predicates at
    * 100 TB the way an index would.
    *
    * Per-column codes are QUANTILE fences (equal-population bins via
    * `approxQuantile`, driver cost `bits`-bounded), not linear min-max
    * scaling: a skewed column (long-tail user ids, bursty timestamps)
    * under linear scaling collapses most rows into a few codes and the
    * interleave degenerates to a single-column sort. Binning is one
    * ordered scan of the ≤2^bits-element fence array per row
    * (`functions.aggregate` over an array literal — no UDF), the
    * interleave is pure shift/mask arithmetic, both map-side.
    */
  def zOrderKey(df: DataFrame, zCols: Seq[String], bits: Int = 8): org.apache.spark.sql.Column = {
    require(zCols.size >= 2, "z-ordering needs at least two columns")
    require(bits * zCols.size <= 62, s"${zCols.size} cols x $bits bits overflows a long")
    val nBins = 1 << bits
    val probs = (1 until nBins).map(_.toDouble / nBins).toArray
    val codes = zCols.map { c =>
      // timestamps/numerics alike: cast to double for fence computation
      val d = df.select(col(c).cast("double").as("__zq"))
      val fences = d.stat.approxQuantile("__zq", probs, 1.0 / (4 * nBins))
        .distinct.sorted
      val fenceArr = array(fences.map(lit): _*)
      val rank = aggregate(fenceArr, lit(0),
        (acc, f) => acc + when(col(c).cast("double") >= f, 1).otherwise(0))
        .cast("long")
      // a low-cardinality column dedups to few fences; scale its rank to
      // the FULL code range or its bits land below the other columns' in
      // the interleave and the clustering degenerates to a one-column sort
      rank * nBins / (fences.length + 1)
    }
    val n = zCols.size
    val terms = for {
      j <- codes.indices
      i <- 0 until bits
    } yield shiftleft(shiftright(codes(j), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` z-order-clustered by `zCols` into ~`targetFiles` parquet
    * files (0 = derive from `advisoryMB` via the same row-byte proxy as
    * [[write]]). Files are cut at ALIGNED Morton blocks — the range
    * shuffle keys on the top `log2(files)` bits of the z-key, with equal
    * block ids never split across partitions — because an arbitrary cut
    * of the curve is what ruins min-max pruning: an unaligned interval
    * that crosses a high-bit boundary has a bounding rectangle spanning
    * most of the space in one dimension (measured: 10 of 64 files touched
    * by a probe box vs 2-3 with aligned blocks). Aligned blocks make
    * every file a union of adjacent power-of-two boxes, so footprints
    * stay tight by construction; the in-partition sort keeps row groups
    * inside each file tight too.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      bits: Int = 8, advisoryMB: Int = 128, targetFiles: Int = 0): Unit = {
    val tf =
      if (targetFiles > 0) targetFiles
      else {
        val rowBytes = octet_length(to_json(struct(df.columns.map(col): _*)))
        val total = df.agg(sum(rowBytes.cast("long"))).head.getLong(0)
        math.max(1L, (total + advisoryMB * 1024L * 1024L - 1) /
          (advisoryMB * 1024L * 1024L)).toInt
      }
    val totalBits = bits * zCols.size
    val blockBits = math.min(totalBits,
      math.ceil(math.log(tf.toDouble) / math.log(2.0)).toInt)
    val zkey = zOrderKey(df, zCols, bits)
    df.withColumn("__zblock", shiftright(zkey, totalBits - blockBits))
      .withColumn("__zkey", zkey)
      .repartitionByRange(tf, col("__zblock"))
      .sortWithinPartitions("__zkey")
      .drop("__zblock", "__zkey")
      .write.mode("overwrite").parquet(path)
  }

  private def sizedByBudget(df: DataFrame, partitionCols: Seq[String],
      advisoryMB: Int, censusFraction: Double): DataFrame = {
    val s = df.sparkSession
    val pc = partitionCols.map(col)
    val censused =
      if (censusFraction >= 1.0) df
      else df.sample(withReplacement = false, censusFraction, seed = 42)
    val scale = if (censusFraction >= 1.0) 1.0 else 1.0 / censusFraction
    val rowBytes = octet_length(to_json(struct(df.columns.map(col): _*)))
    // one row per hive partition value — bounded cardinality by contract
    val census = censused.groupBy(pc: _*)
      .agg(sum(rowBytes.cast("long")).as("__bytes")).collect()
    val advisoryBytes = advisoryMB * 1024L * 1024L
    var offset = 0L
    val budgets = census.map { r =>
      val bytes = (r.getAs[Long]("__bytes") * scale).toLong
      val k = math.max(1L, (bytes + advisoryBytes - 1) / advisoryBytes)
      val e = (r, offset, k)
      offset += k
      e
    }
    val totalFiles = offset.toInt
    val probes = slotProbes(totalFiles)
    val budgetRows: java.util.List[Row] = java.util.Arrays.asList(
      budgets.map { case (r, off, k) =>
        Row.fromSeq(partitionCols.indices.map(r.get) ++
          Seq(k, probes.slice(off.toInt, (off + k).toInt).toSeq))
      }: _*)
    val keySchema = StructType(partitionCols.map(c =>
      StructField(s"__b_$c", df.schema(c).dataType, nullable = true)))
    val budgetSchema = StructType(keySchema.fields ++ Seq(
      StructField("__k", LongType, nullable = false),
      StructField("__probes", ArrayType(LongType, containsNull = false),
        nullable = false)))
    val budgetDf = s.createDataFrame(budgetRows, budgetSchema)
    // null-safe join: a null partition value is legal hive layout
    // (__HIVE_DEFAULT_PARTITION__) and must not drop rows here
    val cond = partitionCols.map(c => col(c) <=> col(s"__b_$c"))
      .reduce(_ && _)
    val rest = df.columns.filterNot(partitionCols.contains).map(col)
    val salt =
      if (rest.isEmpty) lit(0L)
      else pmod(hash(rest: _*).cast("long"), col("__k"))
    df.join(broadcast(budgetDf), cond, "left")
      .withColumn("__q",
        coalesce(element_at(col("__probes"), (salt + 1).cast("int")), lit(0L)))
      .repartition(totalFiles, col("__q"))
      .drop((keySchema.fieldNames ++ Seq("__k", "__probes", "__q")).toSeq: _*)
  }
}
