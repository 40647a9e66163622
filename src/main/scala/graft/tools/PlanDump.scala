package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named registered queries to files —
  * the before/after plan evidence an optimization round commits under
  * `plans/<round>/`. Fragment memoization is bypassed so the dump always
  * shows the raw construction, never an InMemoryTableScan over a fragment
  * cached by an earlier query in the same JVM.
  *
  *   sbt "runMain graft.tools.PlanDump /root/testdata/sf0.1 plans/r14 _before name1,name2"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val only: Seq[String] =
      if (args.length > 3) args(3).split(',').toSeq else Seq.empty
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.exists(n.contains))
    names.foreach { name =>
      try {
        val plan = graft.Caches.bypassed(
          graft.SparkEntry.queries(name)(spark, sfDir))
          .queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(outDir.resolve(s"$name$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] wrote $name$suffix.txt (${plan.length} chars)")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
