package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every registered query at SPARK_GRAFT_SF_DIR.
  * Emits ONE JSON line; failing queries are reported in an `errors` map (never
  * silently timed as ~0s — a failure must not look like a speedup).
  */
object Bench {

  /** Median fresh/baseline per-query time ratio over the queries both maps
    * share — the canary statistic for the baseline-refresh guard. Queries
    * with a sub-50ms baseline are excluded (scheduler jitter dominates
    * them); None when fewer than 5 canaries remain (no basis to judge).
    */
  private[graft] def medianDriftRatio(
      baseline: Map[String, Double], fresh: Map[String, Double]): Option[Double] = {
    val ratios = baseline.toSeq.collect {
      case (k, b) if b >= 0.05 && fresh.contains(k) => fresh(k) / b
    }.sorted
    if (ratios.size < 5) None
    else Some(
      if (ratios.size % 2 == 1) ratios(ratios.size / 2)
      else (ratios(ratios.size / 2 - 1) + ratios(ratios.size / 2)) / 2.0)
  }

  /** 90th-percentile fresh/baseline per-query ratio over the shared
    * canaries — the TAIL canary the median misses. Round 12 measured a sweep
    * whose median was in-band while individual queries ran 12–18× their
    * baseline (`pipe_dedup_minhash_est` 0.77→9.44s) and totals walked
    * 122→198s across promotions; at 100 TB the slowest decile IS the job
    * time, so a median-only gate optimizes the wrong statistic. Same
    * sub-50ms exclusion and ≥5-canary floor as [[medianDriftRatio]].
    */
  private[graft] def p90DriftRatio(
      baseline: Map[String, Double], fresh: Map[String, Double]): Option[Double] = {
    val ratios = baseline.toSeq.collect {
      case (k, b) if b >= 0.05 && fresh.contains(k) => fresh(k) / b
    }.sorted
    if (ratios.size < 5) None
    // nearest-rank p90 (ceil(0.9n)th order statistic): the previous
    // (n*9)/10 index sat one rank high and selected the MAX outright for
    // 5..10 canaries, letting a single scheduler-jitter outlier park a
    // refresh under a gate documented as p90
    else Some(ratios(math.ceil(ratios.size * 0.9).toInt - 1))
  }

  /** Fresh/baseline ratio of SUMMED time over the shared canaries — the
    * aggregate twin of the per-query gates: a broad 1.2× creep that never
    * trips a per-query bound still compounds into an unusable baseline.
    */
  private[graft] def totalDriftRatio(
      baseline: Map[String, Double], fresh: Map[String, Double]): Option[Double] = {
    // toSeq FIRST: collecting (b, fresh) pairs straight off the Map would
    // rebuild a Map keyed by b and silently collapse equal-time queries
    val shared = baseline.toSeq.collect {
      case (k, b) if b >= 0.05 && fresh.contains(k) => (b, fresh(k))
    }
    if (shared.size < 5) None
    else Some(shared.map(_._2).sum / shared.map(_._1).sum)
  }

  /** A parsed bench run file (baseline / anchor / candidate slot). */
  private[graft] final case class RunFile(sf: String,
      queries: Map[String, Double], sync: Double, incr: Double,
      staged: Boolean)

  private[graft] def readRun(path: java.nio.file.Path): Option[RunFile] =
    scala.util.Try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readAllBytes(path))
      val sf = Option(root.get("sf")).map(_.asText).getOrElse("")
      val qs = Option(root.get("queries")).map { qn =>
        import scala.jdk.CollectionConverters._
        qn.properties().asScala.map(e => e.getKey -> e.getValue.asDouble()).toMap
      }.getOrElse(Map.empty[String, Double])
      def num(k: String) = Option(root.get(k)).map(_.asDouble()).getOrElse(0.0)
      RunFile(sf, qs, num("sync_issues_per_sec"),
        num("incr_scan_issues_per_sec"),
        Option(root.get("staged")).exists(_.asBoolean(false)))
    }.toOption.filter(_.queries.nonEmpty)

  /** What to do with a fresh sweep. */
  private[graft] sealed trait RefreshDecision
  /** Replace the committed baseline. */
  private[graft] case object Promote extends RefreshDecision
  /** Clean run, but the first of its kind — stage it in the candidate slot
    * and promote only when a SECOND window agrees (two-window rule). */
  private[graft] case object Stage extends RefreshDecision
  /** Out-of-band run — park it in the candidate slot, flagged, and leave
    * the baseline alone. */
  private[graft] final case class Park(reason: String) extends RefreshDecision

  /** The full baseline-refresh decision for one fresh sweep. History this
    * guard exists to stop repeating:
    *   - round 9: a contended-host driver sweep replaced a clean 202 s
    *     baseline with a 405 s one on identical code → the query-median
    *     drift bound (`bound`, both directions).
    *   - earlier rounds: an sf0.01 smoke sweep clobbered the sf0.1
    *     reference twice → the sf pin.
    *   - a poisoned partial run (mid-sweep crash records fast failures)
    *     once reached the baseline → any-error refusal.
    *   - round 10: a sweep with query drift 1.28 (just under the bound)
    *     carried a sync leg of 4,888/s — 6× under the committed 30,015/s
    *     and 3.5× under the worst of five documented same-code windows —
    *     and rode into the baseline ungated → the throughput band: clean
    *     query drift plus an out-of-band sync/incr leg is diagnostic of an
    *     I/O-throttled window, not an engine change ([syncBandLo,
    *     syncBandHi]× the committed leg).
    *   - the ratchet: successive just-under-bound drifts compound
    *     (1.28³ ≈ 2.1×) because each refresh becomes the next comparison
    *     point → (a) two-window promotion: a clean run only STAGES into
    *     bench_candidate.json; it promotes when a second clean window
    *     agrees with the staged one within `bound`; (b) a pinned anchor
    *     (bench_anchor.json, the best condition-stamped run): any refresh
    *     whose median drifts beyond `anchorBound` from the anchor is
    *     refused regardless of the rolling comparison.
    *   - round 12: the median gate was TAIL-BLIND — a sweep promoted with a
    *     flat median while single queries ran 12–18× their baseline and
    *     committed totals ratcheted 122→167s with a 198s candidate staged →
    *     (a) the p90 gate (`p90Bound` vs baseline, `anchorBound` vs anchor);
    *     (b) the aggregate band: summed shared-canary time beyond
    *     `anchorTotalBound`× the anchor parks the run.
    * Bootstrap (no readable baseline) promotes directly — nothing to
    * defend. The anchor only moves forward when a promoted run is FASTER
    * than it (see main), so it cannot ratchet slow.
    */
  private[graft] def refreshDecision(
      basePath: java.nio.file.Path, anchorPath: java.nio.file.Path,
      candPath: java.nio.file.Path,
      fresh: Map[String, Double], freshSync: Double, freshIncr: Double,
      freshSf: String, hasErrors: Boolean,
      bound: Double = 1.3, syncBandLo: Double = 0.5, syncBandHi: Double = 2.0,
      anchorBound: Double = 1.5, p90Bound: Double = 1.5,
      anchorTotalBound: Double = 1.4): RefreshDecision = {
    if (hasErrors) return Park("errors")
    val baseOpt = readRun(basePath)
    baseOpt match {
      case Some(b) if b.sf != freshSf => return Park("sf_mismatch")
      case Some(b) =>
        medianDriftRatio(b.queries, fresh) match {
          case Some(m) if m > bound || m < 1.0 / bound =>
            return Park(f"query_drift=$m%.3f")
          case _ => ()
        }
        // tail gate (one-sided: a faster tail is welcome): a median-flat run
        // whose slowest decile exploded is a contended window or a real
        // regression — either way not a refresh basis until explained
        p90DriftRatio(b.queries, fresh) match {
          case Some(p) if p > p90Bound => return Park(f"query_p90=$p%.3f")
          case _ => ()
        }
        def outOfBand(base: Double, f: Double): Boolean =
          base > 0 && f > 0 && (f < base * syncBandLo || f > base * syncBandHi)
        if (outOfBand(b.sync, freshSync))
          return Park(f"sync_out_of_band=${freshSync / b.sync}%.2f")
        if (outOfBand(b.incr, freshIncr))
          return Park(f"incr_out_of_band=${freshIncr / b.incr}%.2f")
      case None => ()
    }
    readRun(anchorPath).filter(_.sf == freshSf).foreach { a =>
      medianDriftRatio(a.queries, fresh) match {
        case Some(m) if m > anchorBound || m < 1.0 / anchorBound =>
          return Park(f"anchor_drift=$m%.3f")
        case _ => ()
      }
      p90DriftRatio(a.queries, fresh) match {
        case Some(p) if p > anchorBound => return Park(f"anchor_p90=$p%.3f")
        case _ => ()
      }
      // aggregate band vs the pinned BEST run: successive median-clean
      // promotions ratcheted committed totals 122→167s in round 12 — the
      // total must stay within anchorTotalBound of the anchor or the run
      // parks for a regression hunt
      totalDriftRatio(a.queries, fresh) match {
        case Some(t) if t > anchorTotalBound =>
          return Park(f"anchor_total=$t%.3f")
        case _ => ()
      }
    }
    if (baseOpt.isEmpty) Promote // bootstrap: nothing to defend
    else readRun(candPath) match {
      // second window: promote only when a STAGED (itself gate-clean)
      // candidate exists and the fresh run agrees with it within the bound.
      // exists (not forall): <5 shared canaries means the registry changed
      // between windows — agreement is unverifiable, so re-stage.
      case Some(c) if c.sf == freshSf && c.staged &&
          medianDriftRatio(c.queries, fresh)
            .exists(m => m <= bound && m >= 1.0 / bound) => Promote
      case _ => Stage
    }
  }

  /** Run-condition stamp recorded into every bench_full.json so a number
    * can never again be read without knowing what host state produced it.
    */
  private[graft] def runConditionsJson(): String = {
    val load = try java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    catch { case _: Throwable => -1.0 }
    val nproc = Runtime.getRuntime.availableProcessors()
    s""""run_conditions":{"nproc":$nproc,"load_avg":$load,""" +
      s""""epoch_ms":${System.currentTimeMillis()},"timing":"best_of_2"}"""
  }

  /** `spark.read.text` on a glob probes for a streaming-sink metadata dir and
    * logs a full FileNotFoundException stack at WARN — pure noise that eats
    * the driver's bounded stdout-tail parse window. Pin that one logger to
    * ERROR (both the Spark 3 and Spark 4 class locations).
    */
  private[graft] def muteStreamProbe(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      java.util.Map.of(
        "org.apache.spark.sql.execution.streaming.FileStreamSink",
        org.apache.logging.log4j.Level.ERROR,
        "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink",
        org.apache.logging.log4j.Level.ERROR))
    catch { case _: Throwable => () }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    muteStreamProbe()
    // warm the session once (codegen compiler, parquet footers) so the first
    // timed query doesn't absorb several seconds of one-time init
    Seq("orders", "lineitem", "documents", "embeddings", "events")
      .foreach(t => try Tables.t(spark, sfDir, t).count() catch { case _: Throwable => })
    // compile the common codegen templates (hash join, hash agg, sort,
    // window) on a small slice — one-time janino work that otherwise lands
    // in whatever query happens to run first
    try {
      import org.apache.spark.sql.functions._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("project_key").orderBy("count")
      val i = Tables.issues(spark, sfDir).limit(2000).cache()
      i.join(i.select(col("key").as("k2")), col("key") === col("k2"))
        .groupBy("project_key").count()
        .withColumn("rn", row_number().over(w))
        .orderBy("project_key").count()
      i.unpersist()
    } catch { case _: Throwable => }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // defensive sweep: stale graft-* temp trees from earlier crashed runs
    // (~100k small files each) measurably throttle filesystem metadata
    // performance — 2-5x swings on the sync number were traced to exactly
    // this. Only our own prefix, only dirs idle for over an hour.
    try {
      import scala.jdk.CollectionConverters._
      val tmpRoot = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      val cutoff = System.currentTimeMillis() - 60L * 60 * 1000
      java.nio.file.Files.list(tmpRoot).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("graft-") &&
          scala.util.Try(java.nio.file.Files.getLastModifiedTime(p).toMillis)
            .getOrElse(Long.MaxValue) < cutoff)
        .foreach(p => scala.util.Try(java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(q => { java.nio.file.Files.deleteIfExists(q); () })))
    } catch { case _: Throwable => () }
    // end-to-end sync throughput vs BASELINE's issues/sec: a bounded slice
    // (~60k issues) through the full pipeline — JQL plan, YAML files,
    // edge parquet, git commit, state merge — then an incremental no-op rerun
    // over the same slice (pure change-detection scan).
    // Measured FIRST, right after warmup: the query sweep below ages the JVM
    // (100+ generated codegen classes, promoted heap, fragmented metaspace),
    // and measuring sync after it made the number drift DOWN every time a
    // round added queries (29k → 19k → 9.6k local with zero SyncEngine
    // changes). The engine's rate is a property of the engine, not of how
    // many unrelated queries ran earlier in the same JVM.
    val (syncIps, incrIps) = try {
      // Prefer a RAM-backed work dir: the baseline's 15,023/sec is an
      // in-memory mock with ZERO file I/O, while this bench writes real YAML
      // + git objects — and the host disk's small-file create rate is both
      // environment-dependent and (on throttled VMs) the hard ceiling on the
      // measured number (measured here: ~8k creates/sec on ext4 vs ~84k on
      // tmpfs, single-threaded — at 8k the "sync throughput" is a disk
      // benchmark, not an engine one). tmpfs keeps the comparison
      // engine-vs-engine; the fallback is the plain tmpdir.
      val shm = java.nio.file.Paths.get("/dev/shm")
      val work = (if (java.nio.file.Files.isDirectory(shm) &&
          java.nio.file.Files.isWritable(shm))
        java.nio.file.Files.createTempDirectory(shm, "graft-bench-sync")
      else java.nio.file.Files.createTempDirectory("graft-bench-sync")).toString
      // a 60k-issue slice: large enough that the per-run fixed costs (git
      // process spawns, Spark job scheduling, state-merge setup — ~0.5s
      // total) amortize to noise, the way they would in any real batch
      // full-parity input: issues WITH relationship arrays, materialized once
      // before the measured runs — the reference's benchmark holds fetched
      // issues (relationships included) in memory; deriving them is fetch
      // work, not sync work. The measured loop starts from the same place.
      val issues = Tables.issuesFull(spark, sfDir).filter(
        org.apache.spark.sql.functions.expr(
          "cast(element_at(split(key, '-'), 2) as int) < 60000")).cache()
      issues.count()
      val links = Tables.links(spark, sfDir)
      val now1 = java.sql.Timestamp.valueOf("2002-01-01 00:00:00")
      // warm the sink path (git startup, fs caches, codegen, JIT) on a small
      // slice so the measured runs reflect steady state, like the baseline's
      // peak
      graft.engine.SyncEngine.run(spark,
        issues.filter(org.apache.spark.sql.functions.expr(
          "cast(element_at(split(key, '-'), 2) as int) < 2000")),
        links, s"$work/warm_repo", s"$work/warm_state",
        graft.engine.SyncEngine.SyncOptions(), now = now1)
      // BASELINE's 15,023/sec is PEAK throughput (SPIKE-005); measure three
      // steady-state runs and report the best one so a GC pause or
      // noisy-neighbor blip doesn't stand in for the engine's rate (the
      // file-write JIT also keeps warming through the first measured run)
      val r1 = Seq("repo", "repo_b", "repo_c").map { d =>
        graft.engine.SyncEngine.run(spark, issues, links,
          s"$work/$d", s"$work/state_${d}",
          graft.engine.SyncEngine.SyncOptions(), now = now1)
      }.maxBy(_.issues_per_sec)
      // incremental no-op rescan: idempotent (state unchanged), so measure
      // best-of-3 like the full sync — a single run showed 3x host-noise
      // swings (43k..130k/sec) that had nothing to do with the engine
      val r2 = (1 to 3).map { _ =>
        graft.engine.SyncEngine.run(spark, issues, links,
          s"$work/repo", s"$work/state_repo",
          graft.engine.SyncEngine.SyncOptions(incremental = true),
          now = java.sql.Timestamp.valueOf("2002-01-02 00:00:00"))
      }.minBy(_.elapsed_ms)
      issues.unpersist()
      // clean up the ~20k temp files so repeated runs don't accumulate
      import scala.util.Try
      Try(java.nio.file.Files.walk(java.nio.file.Paths.get(work))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () }))
      (r1.issues_per_sec, r2.total * 1000.0 / math.max(1, r2.elapsed_ms))
    } catch { case e: Throwable =>
      errors("sync_bench") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      (0.0, 0.0)
    }
    // local profiling escape hatch: `runMain graft.Bench --sync-only` measures
    // just the sync/incr throughput pair (the headline vs-BASELINE numbers)
    // without the ~2-minute query sweep, so variance can be characterized by
    // repeated runs at interactive cost
    if (args.contains("--sync-only")) {
      spark.stop()
      println(s"""{"metric":"sync_only","sync_issues_per_sec":${"%.1f".formatLocal(java.util.Locale.ROOT, syncIps)},"incr_scan_issues_per_sec":${"%.1f".formatLocal(java.util.Locale.ROOT, incrIps)}}""")
      return
    }
    // best-of-2 per query: a single-shot sweep let one GC pause / noisy-
    // neighbor blip stand in for a query's time (round 9 measured 27x swings
    // on unchanged code). The second run re-executes the full plan (only
    // registered fragments are cached, identically for both runs); min is
    // the standard noise-rejecting statistic for a deterministic workload.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          None
        }
      }
      val t = once() match {
        case None => Double.NaN // failed: never report a timing for it
        case Some(t1) => once() match {
          case Some(t2) => math.min(t1, t2)
          // run 1 succeeded, run 2 flaked: one clean measurement stands.
          // Drop the recorded error — a query must never appear BOTH timed
          // and errored in the same sweep (and a lone second-run blip must
          // not trip the any-error refresh refusal on an otherwise clean run)
          case None => errors.remove(name); t1
        }
      }
      name -> t
    }.filterNot(_._2.isNaN)
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                  case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    val total = results.map(_._2).sum
    val errJson = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    // The driver captures only the last ~2000 chars of stdout and parses the
    // JSON line out of that window; sbt's trailing "[success] ..." line eats
    // ~75 of them. With 80+ registered queries a full per-query map is ~2.4k
    // chars and pushes the line's START out of the window (r05/r06 parsed
    // null). So the stdout line carries the headline q* queries plus per-group
    // subtotals and the slowest-5; the full per-query map goes to
    // bench_full.json. Print the line LAST — after spark.stop() — so nothing
    // can push it out, and hard-cap its length as a safety net.
    def f2(d: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, d)
    def f1(d: Double): String = "%.1f".formatLocal(java.util.Locale.ROOT, d)
    def jmap(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + f2(v) }.mkString("{", ",", "}")
    val headline = jmap(results.filter(_._1.matches("q\\d+_.*")).sortBy(_._1))
    val groups = jmap(results.filterNot(_._1.matches("q\\d+_.*"))
      .groupBy(_._1.takeWhile(_ != '_'))
      .map { case (g, kv) => g -> kv.map(_._2).sum }.toSeq.sortBy(_._1))
    val slowest = jmap(results.sortBy(-_._2).take(5))
    val sfName = new java.io.File(sfDir).getName
    // drift of THIS sweep's unchanged queries vs the committed baseline —
    // stamped into the stdout line so a contended-host sweep is self-labeled
    val driftStdout = readRun(java.nio.file.Paths.get("bench_full.json"))
      .filter(_.sf == sfDir)
      .flatMap(b => medianDriftRatio(b.queries, results.toMap))
    val driftField = driftStdout
      .map(m => s""""drift_vs_baseline":${f2(m)},""").getOrElse("")
    def mkLine(extra: String): String =
      s"""{"metric":"total","value":${f2(total)},"unit":"sec",""" +
        s""""queries":$headline,$extra$driftField"n_queries":${results.size},""" +
        s""""errors":$errJson,"sync_issues_per_sec":${f1(syncIps)},""" +
        s""""incr_scan_issues_per_sec":${f1(incrIps)},"sf":"$sfName"}"""
    val line = Seq(
      mkLine(s""""groups":$groups,"slowest":$slowest,"""),
      mkLine(s""""groups":$groups,"""),
      mkLine("")
    ).find(_.length <= 1600).getOrElse(mkLine("").take(1600))
    // full-precision copy for local profiling (driver ignores files). The
    // committed bench_full.json is the regression REFERENCE; refreshDecision
    // (scaladoc above) decides whether this run replaces it (Promote),
    // stages as the first of two agreeing windows (Stage), or parks flagged
    // (Park) — the baseline is only ever touched by Promote.
    val full = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val basePath = java.nio.file.Paths.get("bench_full.json")
    val candPath = java.nio.file.Paths.get("bench_candidate.json")
    val anchorPath = java.nio.file.Paths.get("bench_anchor.json")
    val parkedPath = java.nio.file.Paths.get("bench_parked.json")
    val decision = refreshDecision(basePath, anchorPath, candPath,
      results.toMap, syncIps, incrIps, sfDir, hasErrors = errors.nonEmpty)
    // fragment-cache lifecycle over the sweep: a healthy run builds each
    // fragment exactly once and evicts none — rebuilds/evictions here are
    // the smoking gun for tail blowups on fragment-composed queries
    val fstats = Caches.stats
    def fullJson(marker: String): String =
      s"""{"total":$total,"queries":$full,"errors":$errJson,$marker${runConditionsJson()},"fragment_hits":${fstats.hits},"fragment_builds":${fstats.builds},"fragment_evictions":${fstats.evictions},"sync_issues_per_sec":$syncIps,"incr_scan_issues_per_sec":$incrIps,"sf":"$sfDir"}\n"""
    scala.util.Try(persistDecision(decision, basePath, anchorPath, candPath,
      parkedPath, fullJson, sfDir, results.toMap))
    spark.stop()
    println(line)
  }

  /** Applies a [[RefreshDecision]] to the baseline/candidate/anchor files.
    * A Park run writes to its OWN slot (`parkedPath`): parking into the
    * candidate slot would destroy a STAGED candidate, resetting two-window
    * promotion progress — on a host that alternates clean and contended
    * sweeps, the baseline would then never refresh despite unlimited
    * agreeing clean windows.
    */
  private[graft] def persistDecision(decision: RefreshDecision,
      basePath: java.nio.file.Path, anchorPath: java.nio.file.Path,
      candPath: java.nio.file.Path, parkedPath: java.nio.file.Path,
      fullJson: String => String, sfDir: String,
      fresh: Map[String, Double]): Unit = decision match {
    case Promote =>
      java.nio.file.Files.write(basePath,
        fullJson("").getBytes("UTF-8"))
      java.nio.file.Files.deleteIfExists(candPath)
      // anchor = the best condition-stamped run: it moves only FORWARD
      // (a promoted run that is faster than it, median < 1.0, or whose
      // query overlap with it has decayed below judgeable) — so a chain
      // of just-under-bound slowdowns can never drag the anchor along
      val anchorStale = readRun(anchorPath) match {
        case Some(a) if a.sf == sfDir =>
          medianDriftRatio(a.queries, fresh).forall(_ < 1.0)
        case _ => true
      }
      if (anchorStale)
        java.nio.file.Files.write(anchorPath,
          fullJson("\"anchor\":true,").getBytes("UTF-8"))
    case Stage =>
      java.nio.file.Files.write(candPath,
        fullJson("\"staged\":true,").getBytes("UTF-8"))
    case Park(reason) =>
      java.nio.file.Files.write(parkedPath,
        fullJson(s""""drift_flagged":true,"park_reason":"$reason",""")
          .getBytes("UTF-8"))
  }
}
