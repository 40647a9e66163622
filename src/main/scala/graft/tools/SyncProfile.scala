package graft.tools

import org.apache.spark.sql.SparkSession

/** Local profiling utility: phase-by-phase wall-clock of one sync run
  * (not part of the driver contract; used to attribute sync_issues_per_sec).
  */
object SyncProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val work = graft.Caches.scratchDir("sync-prof").toString
    val limit = sys.env.getOrElse("SPARK_GRAFT_SYNC_LIMIT", "20000").toLong
    val issues = graft.Tables.issuesFull(spark, sfDir).filter(
      expr(s"cast(element_at(split(key, '-'), 2) as int) < $limit")).cache()
    issues.count()
    val links = graft.Tables.links(spark, sfDir)
    val now1 = java.sql.Timestamp.valueOf("2002-01-01 00:00:00")
    // warm
    graft.engine.SyncEngine.run(spark,
      issues.filter(expr("cast(element_at(split(key, '-'), 2) as int) < 1000")),
      links, s"$work/warm_repo", s"$work/warm_state",
      graft.engine.SyncEngine.SyncOptions(), now = now1)
    for (i <- 1 to 6) {
      val t0 = System.nanoTime()
      var last = t0
      val rep = new graft.engine.SyncEngine.ProgressReporter {
        def step(name: String, percent: Int): Unit = {
          val now = System.nanoTime()
          println(f"[prof$i] $name%-16s +${(now - last) / 1e9}%6.2fs  total ${(now - t0) / 1e9}%6.2fs")
          last = now
        }
      }
      val r = graft.engine.SyncEngine.run(spark, issues, links,
        s"$work/repo$i", s"$work/state$i",
        graft.engine.SyncEngine.SyncOptions(), now = now1, progress = rep)
      println(s"[prof$i] issues=${r.total} ips=${r.issues_per_sec}")
    }
    // remove the ~100k temp files: leftover profiling repos accumulate and
    // degrade filesystem metadata performance for every later run
    scala.util.Try(java.nio.file.Files.walk(java.nio.file.Paths.get(work))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () }))
    spark.stop()
  }
}
