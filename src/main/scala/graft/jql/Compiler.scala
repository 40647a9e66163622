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
    deterministic: Boolean = true,
    // status changelog (SCD2 intervals: key, status_name, prev_status,
    // changed_at, valid_to) backing the history operators WAS / CHANGED;
    // by-name with a failing default so non-history deployments never touch it
    history: => DataFrame =
      sys.error("WAS/CHANGED need a status-history binding")) {

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
    case JWas(f, vs, neg, quals) => compileWas(f, vs, neg, quals)
    case JChanged(f, from, to, quals) => compileChanged(f, from, to, quals)
  }

  // ---- history operators ---------------------------------------------------

  /** History operators lower to a KEY semi-join against the status changelog
    * — the same membership-marker mechanism as `issuesInEpic`, so they
    * compose under OR/NOT and Catalyst plans them as one (AQE-chosen) join
    * per clause. Only `status` has a changelog; JIRA's own WAS/CHANGED are
    * likewise restricted to history-tracked fields.
    *
    * Window semantics over SCD2 intervals [changed_at, valid_to):
    * WAS v AFTER d — a v-interval still open after d; BEFORE d — a
    * v-interval that began before d; ON d — the interval CONTAINING instant
    * d is a v-interval; DURING (a,b) — a v-interval overlapping [a,b].
    * No window: ever, INCLUDING the current (open) interval — JIRA's rule.
    * WAS NOT is "at no such instant" (¬∃, not ∃¬).
    */
  private def compileWas(f: JqlField, vs: Seq[JqlValue], neg: Boolean,
      quals: Seq[JHistQual]): Column = {
    requireStatus(f, "WAS")
    val wanted = vs.map(histString(_).toLowerCase)
    val statusPred = lower(col("status_name")).isin(wanted: _*)
    val windowPred = quals.map { q =>
      val d = q.values.map(v => lit(histInstant(v)))
      q.kind match {
        case "after" => col("valid_to").isNull || col("valid_to") > d.head
        case "before" => col("changed_at") < d.head
        case "on" => col("changed_at") <= d.head &&
          (col("valid_to").isNull || col("valid_to") > d.head)
        case "during" => col("changed_at") <= d(1) &&
          (col("valid_to").isNull || col("valid_to") > d.head)
        case other => throw JqlParseException(s"$other not valid after WAS", 0)
      }
    }.foldLeft(statusPred)(_ && _)
    histMarker(windowPred, neg)
  }

  /** CHANGED matches TRANSITION EVENTS (changelog rows with a predecessor):
    * FROM/TO constrain the endpoints, BEFORE/AFTER/ON/DURING the event time
    * (ON d = the calendar day starting at d; DURING is inclusive, JIRA's
    * documented behavior).
    */
  private def compileChanged(f: JqlField, from: Option[JqlValue],
      to: Option[JqlValue], quals: Seq[JHistQual]): Column = {
    requireStatus(f, "CHANGED")
    val dayMs = 24L * 3600 * 1000
    val preds =
      Seq(col("prev_status").isNotNull) ++
        from.map(v => lower(col("prev_status")) === histString(v).toLowerCase) ++
        to.map(v => lower(col("status_name")) === histString(v).toLowerCase) ++
        quals.map { q =>
          val d = q.values.map(histInstant)
          q.kind match {
            case "after" => col("changed_at") > lit(d.head)
            case "before" => col("changed_at") < lit(d.head)
            case "on" => col("changed_at") >= lit(d.head) &&
              col("changed_at") < lit(new Timestamp(d.head.getTime + dayMs))
            case "during" => col("changed_at") >= lit(d.head) &&
              col("changed_at") <= lit(d(1))
            case other =>
              throw JqlParseException(s"$other not valid after CHANGED", 0)
          }
        }
    histMarker(preds.reduce(_ && _), neg = false)
  }

  private def requireStatus(f: JqlField, op: String): Unit =
    if (f.normalized != "status")
      throw JqlParseException(
        s"$op is only supported for 'status' (the history-tracked field)", 0)

  /** Register a key-membership marker against the filtered changelog. The
    * issue key is never EMPTY, so the marker is two-valued and plain
    * negation is exact ¬∃.
    */
  private def histMarker(pred: Column, neg: Boolean): Column = {
    markerId += 1
    val marker = s"__jql_m$markerId"
    pending += ((marker, col("key"), history.filter(pred).select(col("key").as("__k"))))
    val exists = coalesce(col(marker), lit(false))
    if (neg) !exists else exists
  }

  private def histString(v: JqlValue): String = v match {
    case JStr(s) => s
    case JWord(s) => s
    case JNum(n) => n.toString
    case JFunc(name, _) =>
      throw JqlParseException(s"$name() not valid as a history value", 0)
  }

  /** A qualifier instant: date literal, relative date, or now()/startOfDay(). */
  private def histInstant(v: JqlValue): Timestamp = v match {
    case JFunc(name, args) => evalScalarFunc(name, args) match {
      case t: Timestamp => t
      case other =>
        throw JqlParseException(s"$name() is not a date (got $other)", 0)
    }
    case other => parseDateValue(histString(other))
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
          // endpoints are no exception. Deliberately TWO union branches,
          // not one disjunctive pass: each branch's equality filter sits
          // on a single endpoint, so it pushes BELOW the link-derivation
          // join and prunes that side before joining; a `src = k OR
          // dst = k` filter can only run above the unfiltered join
          // (measured 1.19 -> 1.50 s on jql_linked when tried, r15)
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
