package graft.jql

import java.sql.Timestamp
import java.time.Duration

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Session bindings for JQL's server-side functions
  * (reference: pkg/jql/builder.go:195,221 — `currentUser()`, `openSprints()`,
  * relative dates). `now` is explicit so compiled plans are deterministic and
  * oracle-checkable.
  */
final case class JqlContext(
    now: Timestamp,
    currentUser: String,
    openSprints: Seq[String])

/** Compiles a JQL string into a DataFrame transform over the `issues` table.
  *
  * The reference never evaluates JQL locally — it ships the string to the
  * JIRA server (reference: pkg/client/client.go:170). This compiler is the
  * local evaluator: AST → Catalyst `Column` predicates, with the JQL functions
  * `issuesInEpic` / `linkedIssues` lowered to left-join membership markers
  * (SURVEY.md §2.9) so membership composes under OR/NOT. Catalyst then gets a
  * fully declarative plan: predicate pushdown, OptimizeIn, join reorder all
  * apply for free (SURVEY.md §4.1). The membership join is NOT force-broadcast:
  * an epic's member set is unbounded at 100 TB, so AQE picks the strategy
  * (broadcast when small, shuffle otherwise).
  *
  * Null semantics: JIRA excludes EMPTY fields from negated clauses
  * (`status != X`, `NOT status = X`, `status NOT IN (...)` all drop rows where
  * status is EMPTY unless `IS EMPTY` is used). We get this uniformly from SQL
  * three-valued logic: predicates over null evaluate to null, negation keeps
  * null, and `filter` drops non-true — so plain `!` is exactly JIRA's rule.
  *
  * Determinism parity: when `deterministic` is set (the oracle harness), the
  * compiled query ends with `key ASC` as the final sort tiebreak
  * (reference: pkg/jql/jira_builder.go:222-225). At production scale a total
  * sort on every query is a full range shuffle, so it is opt-in.
  */
final class JqlCompiler(
    issues: DataFrame,
    links: => DataFrame,
    ctx: JqlContext,
    deterministic: Boolean = true) {

  /** Pending membership joins: (marker column, field column, key set). */
  private val pending = ArrayBuffer.empty[(String, Column, DataFrame)]
  private var markerId = 0

  def compile(jql: String): DataFrame = apply(Parser.parse(jql))

  def apply(q: JqlQuery): DataFrame = {
    pending.clear()
    val outCols = issues.columns.toSeq
    val pred = q.where.map(compileExpr)
    val withMarkers = pending.foldLeft(issues) { case (df, (marker, fieldCol, keys)) =>
      val keyCol = s"${marker}_k"
      // Function-sourced membership must match the case-insensitive literal
      // path, so lower() both sides of the marker join.
      df.join(
        keys.distinct().withColumnRenamed("__k", keyCol)
          .withColumn(marker, lit(true)),
        lower(fieldCol) === lower(col(keyCol)), "left")
        .drop(keyCol)
    }
    val filtered = pred.map(withMarkers.filter).getOrElse(withMarkers)
    val explicitSort = q.orderBy.map { case (f, asc) =>
      val c = fieldCol(f)
      if (asc) c.asc_nulls_last else c.desc_nulls_first
    }
    val sortCols =
      if (deterministic) explicitSort :+ col("key").asc
      else explicitSort
    val sorted =
      if (sortCols.nonEmpty) filtered.orderBy(sortCols: _*) else filtered
    sorted.select(outCols.map(col): _*)
  }

  // ---- field catalog ------------------------------------------------------

  private val dateFields = Set("created", "createddate", "updated", "updateddate")

  private def fieldCol(f: JqlField): Column = f.normalized match {
    case "project" => col("project_key")
    case "key" | "issue" | "issuekey" | "id" => col("key")
    case "status" => col("status_name")
    case "statuscategory" => col("status_category")
    case "type" | "issuetype" => col("issuetype")
    case "priority" => col("priority")
    case "summary" => col("summary")
    case "description" => col("description")
    case "text" => concat_ws(" ", col("summary"), col("description"))
    case "created" | "createddate" => col("created")
    case "updated" | "updateddate" => col("updated")
    case "epic link" | "cf[12311140]" | "epiclink" => col("epic_link")
    case "parent" => col("parent_issue")
    case "sprint" => col("sprint")
    case "assignee" => col("assignee_email") // equality handled specially below
    case "reporter" => col("reporter_email")
    case other =>
      throw JqlParseException(s"unknown field '$other'", 0)
  }

  private def isDateField(f: JqlField): Boolean = dateFields(f.normalized)

  private def isPersonField(f: JqlField): Boolean =
    f.normalized == "assignee" || f.normalized == "reporter"

  // ---- expression compilation --------------------------------------------

  private def compileExpr(e: JqlExpr): Column = e match {
    case JAnd(l, r) => compileExpr(l) && compileExpr(r)
    case JOr(l, r) => compileExpr(l) || compileExpr(r)
    // Three-valued NOT: null stays null → filter drops it (JIRA's EMPTY rule).
    case JNot(x) => !compileExpr(x)
    case JEmpty(f, neg) =>
      if (neg) fieldCol(f).isNotNull else fieldCol(f).isNull
    case JCmp(f, op, v) => compileCmp(f, op, v)
    case JIn(f, vs, neg) => compileIn(f, vs, neg)
  }

  /** Person fields match either display name or email, case-insensitively
    * (JIRA matches any user identifier).
    */
  private def personEq(prefix: String, value: String): Column =
    lower(col(s"${prefix}_name")) === value.toLowerCase ||
      lower(col(s"${prefix}_email")) === value.toLowerCase

  private def compileCmp(f: JqlField, op: String, v: JqlValue): Column = {
    // JIRA's EMPTY literal: `field = EMPTY` ≡ IS EMPTY, `!= EMPTY` ≡ IS NOT EMPTY
    v match {
      case JWord(w) if w.equalsIgnoreCase("empty") || w.equalsIgnoreCase("null") =>
        op match {
          case "=" => return fieldCol(f).isNull
          case "!=" => return fieldCol(f).isNotNull
          case other => throw JqlParseException(s"operator $other not valid with EMPTY", 0)
        }
      case _ =>
    }
    val value: Any = v match {
      case JFunc(name, args) => evalScalarFunc(name, args)
      case JStr(s) => s
      case JWord(s) => s
      case JNum(n) => n
    }
    if (isPersonField(f) && (op == "=" || op == "!=")) {
      val eq = personEq(f.normalized, value.toString)
      return if (op == "=") eq else !eq
    }
    val c = fieldCol(f)
    if (isDateField(f)) {
      // Scalar functions (now(), startOfDay()) already evaluated to Timestamp;
      // only string literals go through the relative/absolute date parser.
      val ts = lit(value match {
        case t: Timestamp => t
        case s => parseDateValue(s.toString)
      })
      op match {
        case "=" => c === ts
        case "!=" => c =!= ts
        case ">" => c > ts
        case ">=" => c >= ts
        case "<" => c < ts
        case "<=" => c <= ts
        case other => throw JqlParseException(s"operator $other not valid for dates", 0)
      }
    } else value match {
      case n: BigDecimal =>
        op match {
          case "=" => c === n
          case "!=" => c =!= n
          case ">" => c > n
          case ">=" => c >= n
          case "<" => c < n
          case "<=" => c <= n
          case "~" | "!~" => throw JqlParseException("~ not valid for numbers", 0)
        }
      case s =>
        val sv = s.toString
        op match {
          // JQL string equality is case-insensitive
          case "=" => lower(c) === sv.toLowerCase
          case "!=" => lower(c) =!= sv.toLowerCase
          case "~" => lower(c).contains(sv.toLowerCase)
          case "!~" => !lower(c).contains(sv.toLowerCase)
          case ">" => c > sv
          case ">=" => c >= sv
          case "<" => c < sv
          case "<=" => c <= sv
        }
    }
  }

  private def compileIn(f: JqlField, vs: Seq[JqlValue], neg: Boolean): Column = {
    // Split literal values from subquery functions; JIRA allows mixing.
    val literals = ArrayBuffer.empty[String]
    val subqueries = ArrayBuffer.empty[DataFrame]
    vs.foreach {
      case JStr(s) => literals += s
      case JWord(s) => literals += s
      case JNum(n) => literals += n.toString
      case JFunc(name, args) => name.toLowerCase match {
        case "opensprints" => literals ++= ctx.openSprints
        case "currentuser" => literals += ctx.currentUser
        case "issuesinepic" =>
          subqueries += issues
            .filter(lower(col("epic_link")) === args.head.toLowerCase)
            .select(col("key").as("__k"))
        case "linkedissues" =>
          // keys compare case-insensitively everywhere in JQL — the edge
          // endpoints are no exception
          val k = args.head.toLowerCase
          subqueries += links.filter(lower(col("src")) === k)
            .select(col("dst").as("__k"))
            .union(links.filter(lower(col("dst")) === k)
              .select(col("src").as("__k")))
        case other => throw JqlParseException(s"unknown JQL function '$other'", 0)
      }
    }
    val parts = ArrayBuffer.empty[Column]
    if (literals.nonEmpty) {
      if (isPersonField(f))
        // person IN matches name-or-email per value, same as person equality
        parts += literals.map(v => personEq(f.normalized, v)).reduce(_ || _)
      else if (isDateField(f))
        parts += fieldCol(f).isin(literals.map(parseDateValue).toSeq: _*)
      else
        parts += lower(fieldCol(f)).isin(literals.map(_.toLowerCase).toSeq: _*)
    }
    subqueries.foreach { sub =>
      markerId += 1
      val marker = s"__jql_m$markerId"
      pending += ((marker, fieldCol(f), sub))
      // EMPTY field → NULL (not false), so `field NOT IN (subquery)` drops
      // empty-field rows exactly like the literal path and JIRA's
      // empty-exclusion rule; a non-null field missing from the set is a
      // definite false, which negation turns into a definite true.
      parts += when(fieldCol(f).isNull, lit(null).cast("boolean"))
        .otherwise(coalesce(col(marker), lit(false)))
    }
    // Empty membership set (e.g. `sprint in (openSprints())` with no open
    // sprints) compiles to FALSE — TRUE under negation.
    val combined = parts.reduceOption(_ || _).getOrElse(lit(false))
    if (neg) !combined else combined
  }

  private def evalScalarFunc(name: String, args: Seq[String]): Any =
    name.toLowerCase match {
      case "currentuser" => ctx.currentUser
      case "now" => ctx.now
      case "startofday" => // midnight of ctx.now
        Timestamp.valueOf(ctx.now.toLocalDateTime.toLocalDate.atStartOfDay)
      case other => throw JqlParseException(s"unknown JQL function '$other'", 0)
    }

  /** Parse a date value: absolute (`2024-01-01`, `2024-01-01 10:00`) or
    * relative to ctx.now (`-7d`, `4h`, `-2w`, `30m`), mirroring JIRA
    * relative-date literals (reference: pkg/jql/builder.go:221-243).
    */
  private def parseDateValue(s: String): Timestamp = {
    val rel = "^(-?\\d+)([mhdw])$".r
    s.trim match {
      case rel(n, unit) =>
        val minutes = unit match {
          case "m" => n.toLong
          case "h" => n.toLong * 60
          case "d" => n.toLong * 60 * 24
          case "w" => n.toLong * 60 * 24 * 7
        }
        Timestamp.from(ctx.now.toInstant.plus(Duration.ofMinutes(minutes)))
      case d if d.matches("^\\d{4}-\\d{2}-\\d{2}$") =>
        Timestamp.valueOf(s"$d 00:00:00")
      case dt if dt.matches("^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}(:\\d{2})?$") =>
        if (dt.length == 16) Timestamp.valueOf(s"$dt:00") else Timestamp.valueOf(dt)
      case other => throw JqlParseException(s"cannot parse date '$other'", 0)
    }
  }
}
