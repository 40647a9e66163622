package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time parsing/formatting column functions (SURVEY.md §2.7 F3).
  *
  * The reference re-parses string timestamps lazily with a 6-format fallback
  * chain (reference: pkg/state/manager.go:679-702) and emits JIRA's wire
  * format `2006-01-02T15:04:05.000Z` (pkg/client/client.go:293-300). Here the
  * chain is a single `coalesce` of `try_to_timestamp` attempts — codegen'd,
  * null on total failure (ANSI-safe), evaluated once at the source boundary.
  */
object Time {

  /** The reference's fallback formats, most-specific first. */
  val formats: Seq[String] = Seq(
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX", // RFC3339 + millis + offset (JIRA wire)
    "yyyy-MM-dd'T'HH:mm:ssXXX",     // RFC3339 + offset
    "yyyy-MM-dd'T'HH:mm:ss.SSS",    // ISO + millis, no zone
    "yyyy-MM-dd'T'HH:mm:ss",        // ISO, no zone
    "yyyy-MM-dd HH:mm:ss",          // SQL style
    "yyyy-MM-dd")                   // date only

  /** Parse a string timestamp through the fallback chain. */
  def parseJiraTimestamp(c: Column): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)

  /** Emit JIRA's wire format (UTC, millisecond precision, Z suffix). */
  def formatJiraTimestamp(c: Column): Column =
    date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
}
