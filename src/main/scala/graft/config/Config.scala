package graft.config

/** Config source (SURVEY.md §2.1 S14): environment + `.env` loading with
  * defaults and validation (reference: pkg/config/config.go:76-161,
  * dotenv parser pkg/config/dotenv.go:42-96).
  *
  * Driver-side only — configuration is not a data-plane concern; kept for
  * API parity so a reference user finds the same knobs.
  */
object Config {

  /** The reference's tunables with its documented defaults
    * (reference: pkg/config/config.go:20-23).
    */
  final case class SyncConfig(
      baseUrl: String,
      email: String,
      token: String,
      rateLimitDelayMs: Long = 100,
      maxConcurrentRequests: Int = 5,
      backoffBaseMs: Long = 1000,
      backoffCapMs: Long = 30000)

  /** Parse `.env` content: `KEY=VALUE` lines, `#` comments, optional quotes,
    * `export ` prefixes ignored (reference: pkg/config/dotenv.go:42-96).
    */
  def parseDotenv(content: String): Map[String, String] =
    content.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
      .map { l =>
        val noExport = if (l.startsWith("export ")) l.stripPrefix("export ") else l
        val i = noExport.indexOf('=')
        val k = noExport.substring(0, i).trim
        var v = noExport.substring(i + 1).trim
        // strip trailing inline comment only outside quotes
        if (!v.startsWith("\"") && !v.startsWith("'")) {
          val h = v.indexOf('#')
          if (h >= 0) v = v.substring(0, h).trim
        }
        if (v.length >= 2 &&
          ((v.startsWith("\"") && v.endsWith("\"")) ||
            (v.startsWith("'") && v.endsWith("'"))))
          v = v.substring(1, v.length - 1)
        k -> v
      }.toMap

  /** Load with env taking precedence over `.env`, apply defaults, validate
    * required fields (reference: pkg/config/config.go:76-161).
    */
  def load(env: Map[String, String],
      dotenv: Map[String, String] = Map.empty): Either[Seq[String], SyncConfig] = {
    def get(k: String): Option[String] = env.get(k).orElse(dotenv.get(k)).filter(_.nonEmpty)
    def getLong(k: String, dflt: Long): Either[String, Long] =
      get(k) match {
        case None => Right(dflt)
        case Some(v) => v.toLongOption.toRight(s"$k must be a number, got '$v'")
      }
    val errors = Seq.newBuilder[String]
    val baseUrl = get("JIRA_BASE_URL").getOrElse { errors += "JIRA_BASE_URL is required"; "" }
    if (baseUrl.nonEmpty && !baseUrl.matches("^https?://.*"))
      errors += "JIRA_BASE_URL must start with http:// or https://"
    val email = get("JIRA_EMAIL").getOrElse { errors += "JIRA_EMAIL is required"; "" }
    val token = get("JIRA_PAT").getOrElse { errors += "JIRA_PAT is required"; "" }
    val delay = getLong("JIRA_RATE_LIMIT_DELAY_MS", 100).left.map(errors += _)
      .getOrElse(100L)
    val conc = getLong("JIRA_MAX_CONCURRENT_REQUESTS", 5).left.map(errors += _)
      .getOrElse(5L)
    if (conc < 1 || conc > 10) errors += "JIRA_MAX_CONCURRENT_REQUESTS must be in [1, 10]"
    val base = getLong("JIRA_BACKOFF_BASE_MS", 1000).left.map(errors += _)
      .getOrElse(1000L)
    val cap = getLong("JIRA_BACKOFF_CAP_MS", 30000).left.map(errors += _)
      .getOrElse(30000L)
    val errs = errors.result()
    if (errs.nonEmpty) Left(errs)
    else Right(SyncConfig(baseUrl, email, token, delay, conc.toInt, base, cap))
  }
}
