package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Corpus output writer that controls FILE SIZES, not just partitioning —
  * the small-files problem is the classic way a 100 TB curation job ruins
  * its own downstream readers (a million 2 MB parquet files cost more in
  * footer reads and task scheduling than the data itself).
  *
  * The mechanism is AQE's rebalance: a `REBALANCE(cols)` hint lets the
  * runtime coalesce undersized shuffle partitions AND split oversized ones
  * to `spark.sql.adaptive.advisoryPartitionSizeInBytes` — unlike a static
  * `repartition(n)`, which needs the writer to guess n before knowing the
  * data volume, and unlike `coalesce`, which can only merge and destroys
  * write parallelism when it over-merges. Skewed partition columns are
  * handled the same way (an over-large `source=web` slice splits into
  * multiple files instead of one straggler task writing one giant file).
  */
object CorpusSink {

  /** Write `df` as parquet at `path` with files sized toward
    * `advisoryMB` per file, optionally directory-partitioned by
    * `partitionCols` (hive-style `col=value` layout, so downstream reads
    * prune partitions for free).
    */
  def write(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
      advisoryMB: Int = 128): Unit = {
    val s = df.sparkSession
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = s.conf.getOption(key)
    s.conf.set(key, s"${advisoryMB}m")
    try {
      // rebalance on the partition columns (or round-robin when none): each
      // output task then writes one right-sized file per directory partition
      // it owns, instead of every task writing a sliver into every directory
      val balanced =
        if (partitionCols.nonEmpty)
          df.hint("rebalance", partitionCols.map(org.apache.spark.sql.functions.col): _*)
        else df.hint("rebalance")
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
}
