package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

/** Thin command-line entry over the engine — the Spark spelling of the
  * reference's primary UX (`jira-sync sync --jql=... --repo=...`,
  * reference: cmd/jira-sync/main.go:17-30, internal/cli/sync.go:74):
  *
  * {{{
  * graft.Cli sync     --source <sfDir> --repo <dir> --state <path>
  *                    [--jql <query>] [--incremental] [--force] [--dry-run]
  *                    [--projects P1,P2]
  * graft.Cli recover  --source <sfDir> --repo <dir> --state <path> [--repair]
  * graft.Cli validate --jql <query>
  * }}}
  *
  * Everything here is flag parsing and printing; all semantics live in
  * [[engine.SyncEngine]] / [[jql.Validator]], which the test suite and the
  * oracle gate already cover. `run` returns the exit code so tests can drive
  * the CLI in-process; `main` is the thinnest possible shell around it.
  */
object Cli {

  def main(args: Array[String]): Unit = {
    val rc = run(args)
    if (rc != 0) sys.exit(rc)
  }

  private def parse(args: Seq[String]): (Map[String, String], Set[String]) = {
    val kv = Map.newBuilder[String, String]
    val flags = Set.newBuilder[String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val name = a.drop(2)
        if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          kv += name -> args(i + 1); i += 2
        } else { flags += name; i += 1 }
      } else i += 1
    }
    (kv.result(), flags.result())
  }

  def run(args: Array[String]): Int = {
    if (args.isEmpty) { Console.err.println(usage); return 2 }
    val (kv, flags) = parse(args.toSeq.drop(1))
    args(0) match {
      case "validate" =>
        kv.get("jql") match {
          case None => Console.err.println("validate requires --jql"); 2
          case Some(q) =>
            val r = jql.Validator.validate(q)
            r.errors.foreach(e => println(s"error: $e"))
            r.warnings.foreach(w => println(s"warning: $w"))
            r.suggestions.foreach(s => println(s"suggestion: $s"))
            println(if (r.valid) "valid" else "invalid")
            if (r.valid) 0 else 1
        }
      case cmd @ ("sync" | "recover") =>
        val missing = Seq("source", "repo", "state").filterNot(kv.contains)
        if (missing.nonEmpty) {
          Console.err.println(s"$cmd requires ${missing.map("--" + _).mkString(", ")}")
          return 2
        }
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.legacy.parquet.nanosAsLong", "true")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        try {
          if (cmd == "recover") {
            val findings = engine.SyncEngine.recover(spark, kv("repo"),
              kv("state"), repair = flags.contains("repair"))
            val rows = findings.collect()
            rows.foreach(r => println((s"${r.getAs[String]("issue")}: " +
              s"${Option(r.getAs[String]("key")).getOrElse("")} " +
              s"${Option(r.getAs[String]("file_path")).getOrElse("")}").trim))
            println(s"findings: ${rows.length}")
            0
          } else {
            val src = kv("source")
            val opts = engine.SyncEngine.SyncOptions(
              jql = kv.get("jql"),
              incremental = flags.contains("incremental"),
              force = flags.contains("force"),
              dryRun = flags.contains("dry-run"),
              projects = kv.get("projects").map(_.split(',').toSeq).getOrElse(Nil))
            val r = engine.SyncEngine.run(spark,
              Tables.issuesFull(spark, src), Tables.links(spark, src),
              kv("repo"), kv("state"), opts,
              now = new Timestamp(System.currentTimeMillis()))
            println(s"""{"op_id":"${r.op_id}","total":${r.total},""" +
              s""""successful":${r.successful},"failed":${r.failed},""" +
              s""""skipped":${r.skipped},"elapsed_ms":${r.elapsed_ms},""" +
              s""""issues_per_sec":${r.issues_per_sec}}""")
            if (r.failed > 0) 1 else 0
          }
        } catch {
          case e: Throwable =>
            Console.err.println(s"$cmd failed: ${e.getMessage}")
            1
        }
      case "serve" =>
        val missing = Seq("source", "repo", "state").filterNot(kv.contains)
        if (missing.nonEmpty) {
          Console.err.println(s"serve requires ${missing.map("--" + _).mkString(", ")}")
          return 2
        }
        val (_, port) = startServer(kv)
        println(s"""{"listening":"${kv.getOrElse("host", "127.0.0.1")}:$port"}""")
        // serve forever (reference: cmd/api-server/main.go); ApiSpec drives
        // the server in-process instead of through this blocking path
        new java.util.concurrent.CountDownLatch(1).await()
        0
      case other =>
        Console.err.println(s"unknown command: $other\n$usage"); 2
    }
  }

  /** Build and start the REST façade from CLI flags
    * (reference: cmd/api-server/main.go flag surface).
    */
  private[graft] def startServer(kv: Map[String, String]): (api.ApiServer, Int) = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = kv("source")
    val server = new api.ApiServer(spark,
      new jobs.JobManager(spark),
      new api.ProfileStore(s"${kv("state")}/profiles"),
      () => Tables.issuesFull(spark, src), () => Tables.links(spark, src),
      kv("repo"), kv("state"),
      host = kv.getOrElse("host", "127.0.0.1"),
      port = kv.get("port").flatMap(_.toIntOption).getOrElse(8080),
      rateLimitPerMinute = kv.get("rate-limit").flatMap(_.toIntOption).getOrElse(0),
      authToken = kv.get("auth-token"),
      version = "0.1.0")
    val port = server.start()
    (server, port)
  }

  private val usage: String =
    """usage:
      |  sync     --source <sfDir> --repo <dir> --state <path>
      |           [--jql <query>] [--incremental] [--force] [--dry-run]
      |           [--projects P1,P2]
      |  recover  --source <sfDir> --repo <dir> --state <path> [--repair]
      |  validate --jql <query>
      |  serve    --source <sfDir> --repo <dir> --state <path>
      |           [--host 127.0.0.1] [--port 8080] [--rate-limit N]
      |           [--auth-token T]
      |           (loopback binds get wildcard CORS and no auth; a
      |            non-loopback bind drops the CORS wildcard and enforces
      |            --auth-token as a Bearer token when one is set)""".stripMargin
}
