package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Stage-level profiler for one or more registered queries (guide §1:
  * measure first; §7.1: decide whether time goes to shuffle, compute or
  * scheduling before touching anything). Not used by the driver — Bench is
  * the graded entry point; this exists so an optimization round can see
  * WHERE a 3-second query spends its time without the (disabled) Spark UI.
  *
  * For each named query: two timed runs (cold = plan + codegen + first
  * materialization, warm = steady state), the warm run through the noop
  * sink (guide §1.4 — computes every column, no sink cost, no count()
  * column-pruning shortcut), then a per-stage table of the warm run:
  * duration, task count, shuffle read/write bytes, input bytes, and the
  * first line of the stage's call site. Usage:
  *
  *   sbt "runMain graft.tools.StageProfile /root/testdata/sf0.1 name1,name2"
  */
object StageProfile {

  private final case class StageRow(id: Int, name: String, ms: Long,
      tasks: Int, shufRead: Long, shufWrite: Long, input: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val only: Seq[String] =
      if (args.length > 1) args(1).split(',').toSeq else Seq.empty
    val explain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("orders", "lineitem", "documents", "embeddings", "events")
      .foreach(t => try graft.Tables.t(spark, sfDir, t).count() catch { case _: Throwable => })

    val stages = mutable.ArrayBuffer.empty[StageRow]
    val collecting = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        if (!collecting.get()) return
        val i = e.stageInfo
        val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s)
          .getOrElse(-1L)
        val m = i.taskMetrics
        stages.synchronized {
          stages += StageRow(i.stageId, i.name.takeWhile(_ != '\n'), ms,
            i.numTasks, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead)
        }
      }
    })

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.exists(n.contains))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def noop(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        spark.sparkContext.setJobDescription(s"$name cold")
        val cold = noop()
        stages.synchronized(stages.clear())
        collecting.set(true)
        spark.sparkContext.setJobDescription(s"$name warm")
        val warm = noop()
        collecting.set(false)
        println(f"%n[stageprofile] $name cold=$cold%7.2fs warm=$warm%7.2fs")
        val rows = stages.synchronized(stages.sortBy(_.id).toVector)
        def mb(b: Long) = f"${b / 1048576.0}%8.2fMB"
        rows.foreach { r =>
          println(f"  stage ${r.id}%4d ${r.ms}%6dms tasks=${r.tasks}%3d " +
            f"in=${mb(r.input)} sr=${mb(r.shufRead)} sw=${mb(r.shufWrite)}  ${r.name}")
        }
        println(f"  stages=${rows.size} sumStageMs=${rows.map(_.ms).sum}%d " +
          f"sumShufRead=${mb(rows.map(_.shufRead).sum)} " +
          f"sumShufWrite=${mb(rows.map(_.shufWrite).sum)}")
        if (explain)
          println(graft.Caches.bypassed(fn(spark, sfDir))
            .queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      } catch { case e: Throwable =>
        collecting.set(false)
        println(s"[stageprofile] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
