package graft.tools

import org.apache.spark.sql.SparkSession

/** Local profiling helper: time one registered query N times at a given SF
  * dir (`runMain graft.tools.QTime <name> [dir] [reps]`). Not part of the
  * driver contract — Bench is the per-round measurement.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    name.split(",").foreach { nm =>
      val fn = graft.SparkEntry.queries(nm)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"[qtime] $nm rep$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
