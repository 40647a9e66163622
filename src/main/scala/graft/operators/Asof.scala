package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame}

/** As-of join — for every left row, the single latest right row with
  * `rightTime <= leftTime` within the same key (time-series enrichment /
  * attribution; the operator Spark has no native join type for).
  *
  * Implemented as union + ONE ordered window sweep, not a range join: both
  * sides shuffle once on the key, each partition is sorted once on
  * `(time, side)`, and the match is a `last(..., ignoreNulls)` carry-forward
  * with O(1) state per row. At 100 TB there is no per-row range probe, no
  * row explosion, and no broadcast requirement on either side — the cost is
  * exactly one co-partitioned sort-merge pass. Right rows order before left
  * rows at equal timestamps, giving inclusive (`<=`) semantics, matching
  * DuckDB's `ASOF JOIN ... ON l.t >= r.t` which oracles it.
  *
  * Left rows with no preceding right row keep NULL right columns (left-outer
  * semantics). `tieBreak` names right-side columns used to order right rows
  * that share a timestamp (the largest wins); pass one when such ties are
  * possible to keep results deterministic.
  */
object Asof {

  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPrefix: String = "asof_",
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val lPayload = left.columns.filterNot(c => keys.contains(c) || c == leftTime)
    val rPayload = right.columns.filterNot(keys.contains)
    val lType = StructType(lPayload.map(left.schema(_)))
    val rType = StructType(rPayload.map(right.schema(_)))
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).cast("timestamp").as("__ts"), lit(1).as("__side"),
        struct(lPayload.map(col).toSeq: _*).as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("timestamp").as("__ts"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"),
        struct(rPayload.map(col).toSeq: _*).as("__r")): _*)
    val order: Seq[Column] = Seq(col("__ts").asc, col("__side").asc) ++
      tieBreak.map(t => col(s"__r.$t").asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++ Seq(col("__ts").as(leftTime)) ++
          lPayload.map(c => col(s"__l.$c").as(c)) ++
          rPayload.map(c => col(s"__m.$c").as(s"$rightPrefix$c")): _*)
  }
}
