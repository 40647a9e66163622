package graft.sources

import org.apache.spark.sql.{DataFrame, Row}

/** C8: reader-side rate limiting — the analogue of the reference's
  * rate-limited REST transport (reference: pkg/ratelimit/ratelimit.go:67-210,
  * transport wrapper pkg/ratelimit/transport.go:17-85). A remote source's
  * `PartitionReader` wraps its row iterator here, so backpressure lives
  * inside the scan (like `maxOffsetsPerTrigger`), never in the query plan.
  *
  * The clock and sleeper are injectable for deterministic tests.
  */
object Throttle {

  /** Yield at most `maxPerSecond` items per wall-clock second, smoothing with
    * a fixed inter-item delay (the reference's delay-between-requests model,
    * defaults pkg/config/config.go:20-21).
    */
  def rateLimited[T](
      it: Iterator[T],
      maxPerSecond: Int,
      nanoTime: () => Long = () => System.nanoTime(),
      sleepMs: Long => Unit = Thread.sleep): Iterator[T] = {
    require(maxPerSecond > 0, "maxPerSecond must be positive")
    val intervalNanos = 1000000000L / maxPerSecond
    var nextAllowed = nanoTime()
    it.map { item =>
      val now = nanoTime()
      if (now < nextAllowed) sleepMs((nextAllowed - now) / 1000000)
      nextAllowed = math.max(now, nextAllowed) + intervalNanos
      item
    }
  }

  /** Throttle a DataFrame scan per partition (each task independently honors
    * its own budget — aggregate rate = partitions × maxPerSecond, mirroring
    * the reference's per-worker limits).
    */
  def throttled(df: DataFrame, maxPerSecondPerPartition: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val rdd = df.rdd.mapPartitions(it => rateLimited(it, maxPerSecondPerPartition))
    spark.createDataFrame(rdd, schema)
  }
}
