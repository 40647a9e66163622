package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling-exponent measurement harness: times a set of registered queries
  * across several dataset dirs of increasing size (the [[GenScale]] series)
  * and reports per-query seconds at each scale, plus the fitted power-law
  * exponent between consecutive scales — `log(t2/t1) / log(n2/n1)` with n =
  * the dir's lineitem+documents+embeddings+events row count. An exponent
  * near 1 is linear scaling; >1.3 on a doubling is the flag SCALING.md's
  * plan audit can't see and this harness exists to catch.
  *
  * Usage:
  *   runMain graft.tools.ScaleBench <out.json> <dir1,dir2,...> <q1,q2,...>
  */
object ScaleBench {

  def main(args: Array[String]): Unit = {
    val Array(outPath, dirsArg, queriesArg) = args.take(3)
    val dirs = dirsArg.split(",").toSeq
    val queries = queriesArg.split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.muteStreamProbe()

    def rowsOf(dir: String): Long =
      Seq("lineitem", "documents", "embeddings", "events").map { t =>
        try graft.Tables.t(spark, dir, t).count() catch { case _: Throwable => 0L }
      }.sum

    val sizes = dirs.map(d => d -> rowsOf(d)).toMap
    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[(String, Double)]]
    dirs.foreach { dir =>
      // warm footers + codegen on this dir once
      Seq("orders", "lineitem", "documents", "embeddings", "events")
        .foreach(t => try graft.Tables.t(spark, dir, t).count()
        catch { case _: Throwable => })
      queries.foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val t = try math.min(once(), once()) catch {
          case e: Throwable =>
            System.err.println(s"[scalebench] $name @ $dir failed: ${e.getMessage}")
            Double.NaN
        }
        results(name) = results.getOrElse(name, Seq.empty) :+ (dir, t)
        println(f"[scalebench] $name%-34s ${new java.io.File(dir).getName}%-10s $t%8.2f s")
      }
      // release this dir's memoized fragments before the next scale
      graft.Caches.clearDir(spark, dir)
    }
    def f(d: Double) = if (d.isNaN) "null"
      else "%.4f".formatLocal(java.util.Locale.ROOT, d)
    val json = results.map { case (name, ts) =>
      val series = ts.map { case (dir, t) =>
        s"""{"dir":"${new java.io.File(dir).getName}","rows":${sizes(dir)},"sec":${f(t)}}"""
      }.mkString("[", ",", "]")
      val exps = ts.sliding(2).collect {
        case Seq((d1, t1), (d2, t2))
            if !t1.isNaN && !t2.isNaN && t1 > 0 && sizes(d1) > 0 =>
          math.log(t2 / t1) / math.log(sizes(d2).toDouble / sizes(d1))
      }.toSeq
      s""""$name":{"series":$series,"exponents":[${exps.map(f).mkString(",")}]}"""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(s"[scalebench] wrote $outPath")
    spark.stop()
  }
}
