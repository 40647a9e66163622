package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{GitRepo, Yaml}
import graft.state.StateStore

/** Crash-point property for the manifest lifecycle — the generalization of
  * StreamSpec's four pinned kill cases. The streaming sink's per-batch
  * protocol is re-executed step by step here (the same library calls
  * CdcStream.foreachBatch makes), a kill point is injected ANYWHERE in the
  * protocol — including the two intra-step states a between-steps kill
  * cannot produce (a truncated `.attempt-` file; commit objects written
  * with HEAD unmoved) — then the restart sequence runs exactly what
  * `CdcStream.start` runs (recoverManifests → immediate commit → delete),
  * the killed batch replays (its checkpoint never committed), and the
  * remaining script finishes.
  *
  * Invariant, asserted on EVERY case:
  *   1. every state-acknowledged key's file_path is present in HEAD's tree
  *      (nothing acknowledged may be lost — reference:
  *      pkg/state/manager.go:210-267 recovery contract);
  *   2. `git fsck --strict` is clean;
  *   3. no double-commit: no two adjacent commits share a tree (replays and
  *      recovery re-feeds must fold into the idempotent None path);
  *   4. no manifest leaks: `.git/graft-manifest/` is empty once the final
  *      restart has flushed.
  *
  * Any divergence shrinks to a (script, cadence, kill-point) triple — pin
  * it as a named regression test, fuzzer-style.
  */
class ManifestCrashSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val syncedAt = ts("2024-06-01 00:00:00")

  /** One scripted micro-batch: (key, version) pairs; version feeds content
    * and the updated timestamp, so replays are byte-identical and cross-
    * batch updates are strictly newer.
    */
  private type Script = Seq[Seq[(String, Int)]]

  /** Kill points, in protocol order. Between-step points:
    *   0 before anything, 1 after blob/manifest write, 2 after appendDelta
    *   (the state ACK — from here the key must survive), 3 after the
    *   cadence commit but before manifest delete.
    * Intra-step reconstructions:
    *   4 = point 1 + a truncated `.attempt-` file in the pending manifest,
    *   5 = commit + trees written but HEAD unmoved, manifests intact
    *       (crash inside commitTreeDirect after object writes).
    */
  private val KillPoints = 0 to 5

  private def git(repo: String, args: String*): (Int, String) = {
    val out = new StringBuilder
    val code = scala.sys.process.Process(Seq("git") ++ args, new java.io.File(repo))
      .!(scala.sys.process.ProcessLogger(s => { out ++= s; out += '\n' }, _ => ()))
    (code, out.toString)
  }

  private def batchDf(rows: Seq[(String, Int)]) = {
    import spark.implicits._
    rows.toDF("key", "v")
      .select(col("key"),
        element_at(split(col("key"), "-"), 1).as("project_key"),
        concat(lit("content v"), col("v")).as("summary"),
        expr("timestampadd(DAY, v, timestamp'2024-01-01 00:00:00')").as("updated"))
      .coalesce(1)
  }

  /** The foreachBatch body, stoppable at a kill point. Returns the pending
    * manifests going INTO the next batch; None = killed here.
    */
  private def runBatch(work: String, rows: Seq[(String, Int)], id: Long,
      cadence: Int, pending: Vector[Yaml.BlobManifest],
      killPoint: Option[Int]): Option[Vector[Yaml.BlobManifest]] = {
    val repo = s"$work/repo"
    val statePath = s"$work/state"
    def killed(p: Int) = killPoint.contains(p)
    if (killed(0)) return None
    val latest = batchDf(rows)
    val state = StateStore.loadResolved(spark, statePath)
    val fresh = StateStore.changedIssues(latest, state).drop("change_type")
    val m = Yaml.writeIssuesWithBlobsManifest(fresh, repo, sharded = true)
    if (killed(4)) {
      // a task killed mid-write: truncated attempt file among the parts
      Files.write(m.dir.resolve("part-99999.attempt-7"),
        "ok\tdeadbeef".getBytes("UTF-8")) // no trailing newline: truncated
      return None
    }
    if (killed(1)) return None
    val freshState = StateStore.fromIssues(fresh, syncedAt, sharded = true)
    val touched = state.join(freshState.select("key"), Seq("key"), "left_semi")
    val delta = StateStore.merge(touched, freshState)
    if (!delta.isEmpty) {
      StateStore.appendDelta(delta, statePath)
      if (StateStore.deltaCount(spark, statePath) >= StateStore.CompactEvery)
        StateStore.compactDeltas(spark, statePath)
    }
    if (killed(2)) return None
    var nowPending = if (m.written > 0) pending :+ m else { m.delete(); pending }
    if (nowPending.nonEmpty &&
        (nowPending.size >= cadence || (id + 1) % cadence == 0)) {
      if (killed(5)) {
        // reconstruct "crashed inside commitTreeDirect after writing
        // objects": run the commit fully, then move HEAD back and restore
        // the manifests — commit/tree objects present, HEAD unmoved,
        // stale-index marker present (it is written before update-ref)
        val before = git(repo, "rev-parse", "-q", "--verify", "HEAD")
        GitRepo.commitTreeDirect(repo, s"feat(sync): stream batch $id",
          nowPending.iterator.flatMap(_.entries))
        if (before._1 == 0) git(repo, "update-ref", "HEAD", before._2.trim)
        else git(repo, "update-ref", "-d", "HEAD")
        return None
      }
      GitRepo.commitTreeDirect(repo, s"feat(sync): stream batch $id",
        nowPending.iterator.flatMap(_.entries))
      if (killed(3)) return None
      nowPending.foreach(_.delete())
      nowPending = Vector.empty
    }
    Some(nowPending)
  }

  /** What CdcStream.start runs before consuming input. */
  private def restartRecovery(work: String): Unit = {
    val repo = s"$work/repo"
    GitRepo.init(repo)
    val leftover = Yaml.recoverManifests(repo)
    if (leftover.nonEmpty) {
      val n = leftover.map(_.written).sum
      if (n > 0)
        GitRepo.commitTreeDirect(repo, s"feat(sync): recover $n issues",
          leftover.iterator.flatMap(_.entries))
      leftover.foreach(_.delete())
    }
  }

  /** Execute the script with one injected kill, restart, replay, finish;
    * then check the four invariants. Returns error strings (empty = pass).
    */
  private def runCase(script: Script, cadence: Int,
      kill: Option[(Int, Int)]): Seq[String] = {
    val work = Files.createTempDirectory("graft-crash").toString
    try {
      restartRecovery(work)
      var pending = Vector.empty[Yaml.BlobManifest]
      var crashedAt = -1
      var i = 0
      while (i < script.size && crashedAt < 0) {
        val kp = kill.collect { case (b, p) if b == i => p }
        runBatch(work, script(i), i, cadence, pending, kp) match {
          case Some(next) => pending = next; i += 1
          case None => crashedAt = i
        }
      }
      if (crashedAt >= 0) {
        // the crash: driver gone; restart recovers + the killed batch
        // replays (its checkpoint never committed), then the tail runs
        restartRecovery(work)
        pending = Vector.empty
        var j = crashedAt
        while (j < script.size) {
          pending = runBatch(work, script(j), j, cadence, pending, None)
            .getOrElse(fail("uninjected batch cannot crash"))
          j += 1
        }
      }
      // stream stops; the NEXT start flushes any cadence-pending manifests
      restartRecovery(work)

      val errs = Seq.newBuilder[String]
      val repo = s"$work/repo"
      // 1. every acknowledged key reaches HEAD's tree
      val state = StateStore.loadResolved(spark, s"$work/state")
        .select("key", "file_path").collect()
      val (lsCode, lsOut) = git(repo, "ls-tree", "-r", "--name-only", "HEAD")
      if (lsCode != 0) errs += s"ls-tree failed: $lsOut"
      else {
        val inHead = lsOut.linesIterator.toSet
        state.foreach { r =>
          if (!inHead.contains(r.getString(1)))
            errs += s"acknowledged ${r.getString(0)} missing from HEAD (${r.getString(1)})"
        }
      }
      // 2. fsck clean
      val (fsckCode, fsckOut) = git(repo, "fsck", "--strict")
      if (fsckCode != 0) errs += s"fsck: $fsckOut"
      // 3. no adjacent commits with identical trees (double-commit)
      val (_, revs) = git(repo, "rev-list", "HEAD")
      val trees = revs.linesIterator.toSeq.map(c =>
        git(repo, "rev-parse", s"$c^{tree}")._2.trim)
      trees.sliding(2).foreach {
        case Seq(a, b) if a == b => errs += s"double commit: adjacent tree $a"
        case _ => ()
      }
      // 4. no manifest leaks after the final flush
      val mroot = Paths.get(repo, ".git", "graft-manifest")
      if (Files.isDirectory(mroot) && Files.list(mroot).count() > 0)
        errs += "manifest dir not empty after recovery flush"
      errs.result()
    } finally {
      scala.util.Try(Files.walk(Paths.get(work))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () }))
      ()
    }
  }

  // keys span two range blocks and two projects so commits touch several
  // tree directories (the overlay/recursion paths all exercise)
  private val keyPool = Vector("P1-1", "P1-2", "P1-3", "P1-8200", "P1-8201",
    "P2-5", "P2-8193")

  private val genBatch: Gen[Seq[(String, Int)]] = for {
    n <- Gen.choose(1, 4)
    keys <- Gen.pick(n, keyPool)
  } yield keys.toSeq.map(_ -> 0)

  private val genScript: Gen[Script] = for {
    nb <- Gen.choose(2, 4)
    batches <- Gen.listOfN(nb, genBatch)
  } yield batches.zipWithIndex.map { case (b, i) =>
    b.map { case (k, _) => (k, i) } // version = batch index: updates are newer
  }

  private val genCase: Gen[(Script, Int, Option[(Int, Int)])] = for {
    script <- genScript
    cadence <- Gen.oneOf(1, 2, 3)
    killBatch <- Gen.choose(0, script.size - 1)
    killPoint <- Gen.oneOf(KillPoints)
  } yield (script, cadence, Some((killBatch, killPoint)))

  test("exhaustive kill-point grid: one deterministic case per protocol state") {
    // fixed 3-batch script with overlap (updates) and a fresh-key tail;
    // every (batch, point) × cadence ∈ {1, 3} runs once — full coverage of
    // the protocol-state space, independent of the sampler
    val script: Script = Seq(
      Seq(("P1-1", 0), ("P1-8200", 0)),
      Seq(("P1-1", 1), ("P2-5", 1)),
      Seq(("P1-2", 2), ("P1-8201", 2), ("P2-8193", 2)))
    for (cadence <- Seq(1, 3); b <- script.indices; p <- KillPoints) {
      val errs = runCase(script, cadence, Some((b, p)))
      assert(errs.isEmpty,
        s"cadence=$cadence kill=(batch $b, point $p): ${errs.mkString("; ")}")
    }
    // and the unkilled control
    assert(runCase(script, 3, None).isEmpty)
  }

  test("property: every acknowledged key reaches HEAD under any single kill") {
    val cases = sys.env.get("GRAFT_CRASH_CASES").flatMap(_.toIntOption).getOrElse(60)
    val prop = Prop.forAllNoShrink(genCase) { case (script, cadence, kill) =>
      val errs = runCase(script, cadence, kill)
      if (errs.nonEmpty)
        println(s"CRASH-CASE FAILURE cadence=$cadence kill=$kill script=$script: " +
          errs.mkString("; "))
      errs.isEmpty
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, s"crash property failed: ${res.status}")
  }
}
