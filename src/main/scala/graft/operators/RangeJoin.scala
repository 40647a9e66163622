package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Interval (range) join — pair every left row with the right rows whose
  * timestamp falls in `[leftTime + lowerSec, leftTime + upperSec]`, with NO
  * equi key to hash on (the case where a naive plan degenerates to a
  * cartesian product × range filter).
  *
  * Implemented as a bucketed range join: right rows land in fixed-width time
  * buckets (width = the interval span), each left row probes the one or two
  * buckets its interval can overlap, and the exact range predicate filters
  * the bucket-join output. The plan is an equi-join on the bucket id — at
  * 100 TB a shuffle join whose per-bucket fan-out is bounded by data density
  * per span, never |left|×|right|; a pathological hot bucket is split by
  * AQE's skew handling like any other hot key.
  */
object RangeJoin {

  def intervalJoin(left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String,
      lowerSec: Long, upperSec: Long): DataFrame = {
    require(upperSec > lowerSec, "interval must be non-empty")
    // microsecond precision throughout: unix_timestamp() floors to seconds,
    // which would silently widen the interval for sub-second timestamps
    val width = (upperSec - lowerSec) * 1000000L
    val lowerUs = lowerSec * 1000000L
    val upperUs = upperSec * 1000000L
    // a left interval [lt+lower, lt+upper] of span == bucket width overlaps
    // at most two buckets — probe both (array_distinct collapses the
    // boundary case where they coincide)
    val l = left
      .withColumn("__lt", unix_micros(col(leftTime)))
      .withColumn("__b", explode(array_distinct(array(
        floor((col("__lt") + lowerUs) / width),
        floor((col("__lt") + upperUs) / width)))))
    val r = right
      .withColumn("__rt", unix_micros(col(rightTime)))
      .withColumn("__b", floor(col("__rt") / width))
    l.join(r, Seq("__b"))
      .filter(col("__rt").between(col("__lt") + lowerUs, col("__lt") + upperUs))
      .drop("__b", "__lt", "__rt")
  }

  /** Keyed variant: interval join WITH an equi key (`keys` must exist on
    * both sides). The shuffle key becomes (keys..., bucket) — without the
    * key, every co-temporal row pairs across all key values and the bucket
    * join's fan-out is |bucket density|² corpus-wide; with it, fan-out is
    * bounded by per-key density per span, which is what a per-user/per-
    * entity interval join costs at any scale. Same two-bucket probe and
    * exact range filter as [[intervalJoin]].
    */
  def intervalJoinKeyed(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      lowerSec: Long, upperSec: Long): DataFrame = {
    require(upperSec > lowerSec, "interval must be non-empty")
    val width = (upperSec - lowerSec) * 1000000L
    val lowerUs = lowerSec * 1000000L
    val upperUs = upperSec * 1000000L
    val l = left
      .withColumn("__lt", unix_micros(col(leftTime)))
      .withColumn("__b", explode(array_distinct(array(
        floor((col("__lt") + lowerUs) / width),
        floor((col("__lt") + upperUs) / width)))))
    val r = right
      .withColumn("__rt", unix_micros(col(rightTime)))
      .withColumn("__b", floor(col("__rt") / width))
    l.join(r, keys :+ "__b")
      .filter(col("__rt").between(col("__lt") + lowerUs, col("__lt") + upperUs))
      .drop("__b", "__lt", "__rt")
  }
}
