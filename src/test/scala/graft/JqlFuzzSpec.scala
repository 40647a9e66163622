package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Shrink, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.jql._
import graft.queries.Jql

/** Differential JQL fuzzer — SURVEY §7.4 risk #1 (JQL-semantics fidelity:
  * the reference never evaluates JQL locally, so there is no executable
  * spec to diff against).
  *
  * Method: ScalaCheck generates random predicate ASTs over the issue
  * schema (every comparison op, IN/NOT IN with literals and the membership
  * functions, IS [NOT] EMPTY, the EMPTY literal, relative/absolute dates,
  * person fields, WAS/CHANGED with windows, AND/OR/NOT nesting, ORDER BY),
  * renders each to JQL surface syntax, and runs it through the REAL path —
  * Lexer → Parser → JqlCompiler → Catalyst over the fixture — while a
  * SECOND, independently-written interpreter evaluates the SAME AST on the
  * driver over the collected fixture rows (Kleene three-valued logic,
  * JIRA's empty-exclusion, case-insensitive equality/IN, binary-collation
  * ordering ops, name-or-email person matching, SCD2 history semantics).
  * Any row-set (or, under ORDER BY, row-ORDER) difference is a real parser,
  * compiler, or interpreter bug; ScalaCheck shrinks the AST to a minimal
  * counterexample. 600 seeded cases per run.
  */
class JqlFuzzSpec extends AnyFunSuite {
  import TestSpark._

  // ---- fixture snapshot (collected once; the interpreter's world) ----------

  private case class IRow(
      key: String, project: String, summary: String, description: String,
      status: String, statusCategory: String,
      assigneeName: String, assigneeEmail: String,
      reporterName: String, reporterEmail: String,
      created: Timestamp, updated: Timestamp,
      priority: String, issuetype: String, sprint: String,
      epicLink: Option[String], parent: Option[String])

  private case class HRow(key: String, status: String, prev: Option[String],
      changedAt: Timestamp, validTo: Option[Timestamp])

  private lazy val issuesDf = Tables.issues(spark, sf).cache()
  private lazy val linksDf = Tables.links(spark, sf).cache()
  private lazy val historyDf = Tables.statusHistory(spark, sf).cache()

  // collect() may yield java.sql or java.time values depending on
  // spark.sql.datetime.java8API.enabled and the column's NTZ-ness; the
  // session TZ is pinned UTC, so all conversions below are value-exact
  private def tsOf(v: Any): Timestamp = v match {
    case t: Timestamp => t
    case d: java.sql.Date => Timestamp.valueOf(d.toLocalDate.atStartOfDay())
    case i: java.time.Instant => Timestamp.from(i)
    case d: java.time.LocalDate => Timestamp.valueOf(d.atStartOfDay())
    case dt: java.time.LocalDateTime => Timestamp.valueOf(dt)
    case other => sys.error(s"not a time value: $other (${other.getClass})")
  }

  private lazy val rows: Seq[IRow] = issuesDf.collect().toSeq.map { r =>
    def s(n: String) = r.getString(r.fieldIndex(n))
    def os(n: String) = Option(r.getString(r.fieldIndex(n)))
    IRow(s("key"), s("project_key"), s("summary"), s("description"),
      s("status_name"), s("status_category"),
      s("assignee_name"), s("assignee_email"),
      s("reporter_name"), s("reporter_email"),
      tsOf(r.get(r.fieldIndex("created"))), tsOf(r.get(r.fieldIndex("updated"))),
      s("priority"), s("issuetype"), s("sprint"),
      os("epic_link"), os("parent_issue"))
  }

  private lazy val history: Map[String, Seq[HRow]] =
    historyDf.collect().toSeq.map { r =>
      HRow(r.getString(r.fieldIndex("key")),
        r.getString(r.fieldIndex("status_name")),
        Option(r.getString(r.fieldIndex("prev_status"))),
        tsOf(r.get(r.fieldIndex("changed_at"))),
        Option(r.get(r.fieldIndex("valid_to"))).map(tsOf))
    }.groupBy(_.key)

  /** (srcLower, dstLower) edge list for linkedIssues. */
  private lazy val edges: Seq[(String, String)] = linksDf
    .select("src", "dst").collect().toSeq
    .map(r => (r.getString(0).toLowerCase, r.getString(1).toLowerCase))

  // ---- reference interpreter (independent of the compiler) -----------------

  private type TV = Option[Boolean]
  private def tvAnd(a: TV, b: TV): TV = (a, b) match {
    case (Some(false), _) | (_, Some(false)) => Some(false)
    case (Some(true), Some(true)) => Some(true)
    case _ => None
  }
  private def tvOr(a: TV, b: TV): TV = (a, b) match {
    case (Some(true), _) | (_, Some(true)) => Some(true)
    case (Some(false), Some(false)) => Some(false)
    case _ => None
  }
  private def tvNot(a: TV): TV = a.map(!_)

  private val now: Timestamp = Jql.ctx.now

  /** Independent date-literal evaluation (relative + absolute forms). */
  private def instant(s: String): Timestamp = {
    val rel = "^(-?\\d+)([mhdw])$".r
    s.trim match {
      case rel(n, u) =>
        val min = u match {
          case "m" => n.toLong
          case "h" => n.toLong * 60
          case "d" => n.toLong * 1440
          case "w" => n.toLong * 10080
        }
        new Timestamp(now.getTime + min * 60000L)
      case d if d.matches("\\d{4}-\\d{2}-\\d{2}") => Timestamp.valueOf(s"$d 00:00:00")
      case dt if dt.matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}") => Timestamp.valueOf(s"$dt:00")
      case dt => Timestamp.valueOf(dt)
    }
  }

  private def valueString(v: JqlValue): String = v match {
    case JStr(s) => s
    case JWord(s) => s
    case JNum(n) => n.toString
    case JFunc(n, _) if n.equalsIgnoreCase("currentuser") => Jql.ctx.currentUser
    case JFunc(n, _) => sys.error(s"unexpected scalar function $n")
  }

  private def valueInstant(v: JqlValue): Timestamp = v match {
    case JFunc(n, _) if n.equalsIgnoreCase("now") => now
    case JFunc(n, _) if n.equalsIgnoreCase("startofday") =>
      Timestamp.valueOf(now.toLocalDateTime.toLocalDate.atStartOfDay)
    case other => instant(valueString(other))
  }

  private sealed trait FVal
  private case class FStr(v: Option[String]) extends FVal
  private case class FTs(v: Timestamp) extends FVal
  private case class FPerson(name: String, email: String) extends FVal

  private def fieldOf(r: IRow, f: JqlField): FVal = f.normalized match {
    case "project" => FStr(Some(r.project))
    case "key" | "issue" | "issuekey" | "id" => FStr(Some(r.key))
    case "status" => FStr(Some(r.status))
    case "statuscategory" => FStr(Some(r.statusCategory))
    case "type" | "issuetype" => FStr(Some(r.issuetype))
    case "priority" => FStr(Some(r.priority))
    case "summary" => FStr(Some(r.summary))
    case "description" => FStr(Some(r.description))
    case "text" => FStr(Some(s"${r.summary} ${r.description}"))
    case "created" | "createddate" => FTs(r.created)
    case "updated" | "updateddate" => FTs(r.updated)
    case "epic link" | "cf[12311140]" | "epiclink" => FStr(r.epicLink)
    case "parent" => FStr(r.parent)
    case "sprint" => FStr(Some(r.sprint))
    case "assignee" => FPerson(r.assigneeName, r.assigneeEmail)
    case "reporter" => FPerson(r.reporterName, r.reporterEmail)
    case other => sys.error(s"unknown field $other")
  }

  /** The scalar the membership/marker path joins on (person → email). */
  private def fieldScalar(r: IRow, f: JqlField): Option[String] = fieldOf(r, f) match {
    case FStr(v) => v
    case FPerson(_, email) => Some(email)
    case FTs(t) => Some(t.toString)
  }

  private def personMatches(p: FPerson, v: String): Boolean =
    p.name.equalsIgnoreCase(v) || p.email.equalsIgnoreCase(v)

  private def evalCmp(r: IRow, f: JqlField, op: String, v: JqlValue): TV = {
    // EMPTY literal: `= EMPTY` ≡ IS EMPTY (definite)
    val isEmptyLit = v match {
      case JWord(w) => w.equalsIgnoreCase("empty") || w.equalsIgnoreCase("null")
      case _ => false
    }
    if (isEmptyLit) {
      val empt = fieldOf(r, f) match {
        case FStr(s) => s.isEmpty
        case _ => false
      }
      return Some(if (op == "=") empt else !empt)
    }
    fieldOf(r, f) match {
      case FPerson(n, e) if op == "=" || op == "!=" =>
        val eq = personMatches(FPerson(n, e), valueString(v))
        Some(if (op == "=") eq else !eq)
      case FTs(t) =>
        val d = valueInstant(v)
        Some(op match {
          case "=" => t.equals(d)
          case "!=" => !t.equals(d)
          case ">" => t.after(d)
          case ">=" => !t.before(d)
          case "<" => t.before(d)
          case "<=" => !t.after(d)
        })
      case FStr(None) => None // EMPTY field: unknown under every comparison
      case FStr(Some(s)) =>
        val lit = valueString(v)
        Some(op match {
          case "=" => s.equalsIgnoreCase(lit)
          case "!=" => !s.equalsIgnoreCase(lit)
          case "~" => s.toLowerCase.contains(lit.toLowerCase)
          case "!~" => !s.toLowerCase.contains(lit.toLowerCase)
          case ">" => s.compareTo(lit) > 0 // binary collation, like Catalyst
          case ">=" => s.compareTo(lit) >= 0
          case "<" => s.compareTo(lit) < 0
          case "<=" => s.compareTo(lit) <= 0
        })
      case _ => sys.error(s"op $op invalid for ${f.raw}")
    }
  }

  /** Membership set of a subquery function, lower-cased keys. */
  private def subquerySet(fn: JFunc): Set[String] = fn.name.toLowerCase match {
    case "issuesinepic" =>
      val e = fn.args.head.toLowerCase
      rows.filter(_.epicLink.exists(_.toLowerCase == e)).map(_.key.toLowerCase).toSet
    case "linkedissues" =>
      val k = fn.args.head.toLowerCase
      (edges.collect { case (s, d) if s == k => d } ++
        edges.collect { case (s, d) if d == k => s }).toSet
    case other => sys.error(s"unexpected subquery $other")
  }

  private def evalIn(r: IRow, f: JqlField, vs: Seq[JqlValue], neg: Boolean): TV = {
    val lits = Seq.newBuilder[String]
    val subs = Seq.newBuilder[JFunc]
    vs.foreach {
      case fn @ JFunc(n, _) => n.toLowerCase match {
        case "opensprints" => lits ++= Jql.ctx.openSprints
        case "currentuser" => lits += Jql.ctx.currentUser
        case _ => subs += fn
      }
      case other => lits += valueString(other)
    }
    val parts = Seq.newBuilder[TV]
    val litSeq = lits.result()
    if (litSeq.nonEmpty) parts += (fieldOf(r, f) match {
      case p: FPerson => Some(litSeq.exists(personMatches(p, _)))
      case FTs(t) => Some(litSeq.map(instant).exists(_.equals(t)))
      case FStr(None) => None
      case FStr(Some(s)) => Some(litSeq.exists(_.equalsIgnoreCase(s)))
    })
    subs.result().foreach { fn =>
      val set = subquerySet(fn)
      parts += (fieldScalar(r, f) match {
        case None => None // EMPTY field: membership unknown → excluded both ways
        case Some(s) => Some(set.contains(s.toLowerCase))
      })
    }
    val combined = parts.result().reduceOption(tvOr).getOrElse(Some(false))
    if (neg) tvNot(combined) else combined
  }

  private def evalWas(r: IRow, vs: Seq[JqlValue], neg: Boolean,
      quals: Seq[JHistQual]): TV = {
    val wanted = vs.map(valueString(_).toLowerCase).toSet
    val hit = history.getOrElse(r.key, Seq.empty).exists { h =>
      wanted.contains(h.status.toLowerCase) && quals.forall { q =>
        val d = q.values.map(valueInstant)
        q.kind match {
          case "after" => h.validTo.forall(_.after(d.head))
          case "before" => h.changedAt.before(d.head)
          case "on" => !h.changedAt.after(d.head) && h.validTo.forall(_.after(d.head))
          case "during" => !h.changedAt.after(d(1)) && h.validTo.forall(_.after(d.head))
        }
      }
    }
    Some(if (neg) !hit else hit)
  }

  private def evalChanged(r: IRow, from: Option[JqlValue], to: Option[JqlValue],
      quals: Seq[JHistQual]): TV = {
    val hit = history.getOrElse(r.key, Seq.empty).exists { h =>
      h.prev.nonEmpty &&
        from.forall(v => h.prev.exists(_.equalsIgnoreCase(valueString(v)))) &&
        to.forall(v => h.status.equalsIgnoreCase(valueString(v))) &&
        quals.forall { q =>
          val d = q.values.map(valueInstant)
          q.kind match {
            case "after" => h.changedAt.after(d.head)
            case "before" => h.changedAt.before(d.head)
            case "on" => !h.changedAt.before(d.head) &&
              h.changedAt.before(new Timestamp(d.head.getTime + 86400000L))
            case "during" => !h.changedAt.before(d.head) && !h.changedAt.after(d(1))
          }
        }
    }
    Some(hit)
  }

  private def eval(r: IRow, e: JqlExpr): TV = e match {
    case JAnd(l, rr) => tvAnd(eval(r, l), eval(r, rr))
    case JOr(l, rr) => tvOr(eval(r, l), eval(r, rr))
    case JNot(x) => tvNot(eval(r, x))
    case JEmpty(f, negd) =>
      val empt = fieldOf(r, f) match {
        case FStr(s) => s.isEmpty
        case _ => false
      }
      Some(if (negd) !empt else empt)
    case JCmp(f, op, v) => evalCmp(r, f, op, v)
    case JIn(f, vs, negd) => evalIn(r, f, vs, negd)
    case JWas(_, vs, negd, quals) => evalWas(r, vs, negd, quals)
    case JChanged(_, from, to, quals) => evalChanged(r, from, to, quals)
  }

  /** Interpreter result: key list in the compiler's deterministic order. */
  private def interpret(q: JqlQuery): Seq[String] = {
    val selected = rows.filter(r => q.where.forall(e => eval(r, e).contains(true)))
    // compiled ordering: each ORDER BY field asc-nulls-last / desc-nulls-first,
    // then key asc as the final tiebreak
    val ord = new Ordering[IRow] {
      def compare(a: IRow, b: IRow): Int = {
        val it = q.orderBy.iterator
        while (it.hasNext) {
          val (f, asc) = it.next()
          // null placement is FINAL (nulls last asc / first desc) — it must
          // not be negated again by the direction flip, which only applies
          // to value-vs-value comparisons (the first fuzz hunt over nullable
          // sort fields caught exactly that double reversal in this replica)
          (fieldOf(a, f), fieldOf(b, f)) match {
            case (FStr(None), FStr(None)) => ()
            case (FStr(None), FStr(_)) => return if (asc) 1 else -1
            case (FStr(_), FStr(None)) => return if (asc) -1 else 1
            case (x, y) =>
              val c = (x, y) match {
                case (FStr(Some(u)), FStr(Some(v))) => u.compareTo(v)
                case (FTs(u), FTs(v)) => u.compareTo(v)
                case (FPerson(_, u), FPerson(_, v)) => u.compareTo(v)
                case _ => 0
              }
              if (c != 0) return if (asc) c else -c
          }
        }
        a.key.compareTo(b.key)
      }
    }
    selected.sorted(ord).map(_.key)
  }

  // ---- AST generators -------------------------------------------------------

  private def fld(s: String) = JqlField(s)
  private def w(s: String) = JWord(s)
  private def str(s: String) = JStr(s)

  private val genProject: Gen[JqlExpr] = for {
    f <- Gen.oneOf("project", "Project")
    op <- Gen.oneOf("=", "!=")
    v <- Gen.oneOf(str("P0"), w("P3"), w("p5"), str("P9"), w("P6"))
  } yield JCmp(fld(f), op, v)

  private val statusVals =
    Seq(str("To Do"), str("In Progress"), str("Done"), w("done"), str("Blocked"))
  private val genStatus: Gen[JqlExpr] = Gen.oneOf(
    for { op <- Gen.oneOf("=", "!="); v <- Gen.oneOf(statusVals) }
      yield JCmp(fld("status"), op, v),
    for { vs <- Gen.nonEmptyListOf(Gen.oneOf(statusVals)).map(_.take(3))
          neg <- Gen.oneOf(true, false) }
      yield JIn(fld("status"), vs, neg))

  private val prioVals = Seq(w("Highest"), w("High"), w("Medium"), w("Low"),
    w("Lowest"), str("LOW"), w("high"))
  private val genPriority: Gen[JqlExpr] = for {
    op <- Gen.oneOf("=", "!=", ">", ">=", "<", "<=")
    v <- Gen.oneOf(prioVals)
  } yield JCmp(fld("priority"), op, v)

  private val genType: Gen[JqlExpr] = Gen.oneOf(
    for { v <- Gen.oneOf(w("Epic"), w("Story"), w("Bug"), w("Task"), str("Sub-task")) }
      yield JCmp(fld("type"), "=", v),
    for { vs <- Gen.someOf(w("Bug"), w("task"), str("Story")).suchThat(_.nonEmpty)
          neg <- Gen.oneOf(true, false) }
      yield JIn(fld("issuetype"), vs.toSeq, neg))

  private val genSprint: Gen[JqlExpr] = Gen.oneOf(
    Gen.oneOf(0 to 9).map(i => JCmp(fld("sprint"), "=", str(s"Sprint $i"))),
    Gen.const(JIn(fld("sprint"), Seq(JFunc("openSprints", Nil)), negated = false)),
    for { neg <- Gen.oneOf(true, false) }
      yield JIn(fld("sprint"), Seq(JFunc("openSprints", Nil), str("Sprint 7")), neg))

  private val genText: Gen[JqlExpr] = for {
    f <- Gen.oneOf("summary", "text", "description")
    op <- Gen.oneOf("~", "!~")
    v <- Gen.oneOf(str("URGENT"), str("1-URGENT"), str("Issue 7"), str("xyzzy"),
      str("order F"))
  } yield JCmp(fld(f), op, v)

  private val dateVals = Seq(str("1994-06-01"), w("1996-01-01"), str("1998-03-15"),
    str("1995-06-01 12:30"), w("-30d"), w("-400d"), w("-2000d"), w("-2w"), w("4h"),
    JFunc("now", Nil), JFunc("startOfDay", Nil))
  private val genDate: Gen[JqlExpr] = for {
    f <- Gen.oneOf("created", "updated", "createdDate", "updatedDate")
    op <- Gen.oneOf("=", "!=", ">", ">=", "<", "<=")
    v <- Gen.oneOf(dateVals)
  } yield JCmp(fld(f), op, v)

  private val genPerson: Gen[JqlExpr] = Gen.oneOf(
    for { f <- Gen.oneOf("assignee", "reporter"); op <- Gen.oneOf("=", "!=")
          v <- Gen.oneOf(str("user5"), w("user7@example.com"), w("rep3"),
            str("REP5@example.com"), JFunc("currentUser", Nil): JqlValue) }
      yield JCmp(fld(f), op, v),
    for { f <- Gen.oneOf("assignee", "reporter"); neg <- Gen.oneOf(true, false)
          vs <- Gen.someOf[JqlValue](w("user3"), str("rep5@example.com"),
            JFunc("currentUser", Nil)).suchThat(_.nonEmpty) }
      yield JIn(fld(f), vs.toSeq, neg))

  private val genEpicLink: Gen[JqlExpr] = Gen.oneOf(
    for { f <- Gen.oneOf("\"Epic Link\"", "cf[12311140]", "epicLink")
          op <- Gen.oneOf("=", "!="); v <- Gen.oneOf(str("E-7"), w("e-3"), w("E-49")) }
      yield JCmp(fld(if (f.startsWith("\"")) "Epic Link" else f), op, v),
    for { neg <- Gen.oneOf(true, false) } yield JEmpty(fld("Epic Link"), neg),
    for { op <- Gen.oneOf("=", "!=") } yield JCmp(fld("epicLink"), op, w("EMPTY")))

  private val genParent: Gen[JqlExpr] = Gen.oneOf(
    for { v <- Gen.oneOf(str("P0-4"), w("P1-8"), w("p2-13")) }
      yield JCmp(fld("parent"), "=", v),
    for { neg <- Gen.oneOf(true, false) } yield JEmpty(fld("parent"), neg),
    for { e <- Gen.oneOf("E-7", "E-3", "e-12"); neg <- Gen.oneOf(true, false) }
      yield JIn(fld("parent"), Seq(JFunc("issuesInEpic", Seq(e))), neg))

  private val genKey: Gen[JqlExpr] = Gen.oneOf(
    for { v <- Gen.oneOf(str("P0-20"), w("p0-20"), w("P1-7"), str("P9-99")) }
      yield JCmp(fld("key"), "=", v),
    for { op <- Gen.oneOf(">", "<", ">=", "<=") ; v <- Gen.oneOf(str("P2"), str("P4-500")) }
      yield JCmp(fld("key"), op, v),
    for { e <- Gen.oneOf("E-7", "e-3", "E-999"); neg <- Gen.oneOf(true, false)
          f <- Gen.oneOf("key", "issue") }
      yield JIn(fld(f), Seq(JFunc("issuesInEpic", Seq(e))), neg),
    for { k <- Gen.oneOf("P0-20", "p0-32", "P3-999"); neg <- Gen.oneOf(true, false) }
      yield JIn(fld("key"), Seq(JFunc("linkedIssues", Seq(k))), neg),
    for { e <- Gen.oneOf("E-7", "E-3") }
      yield JIn(fld("key"), Seq(JFunc("issuesInEpic", Seq(e)), str("P0-20")),
        negated = false))

  // the FULL qualifier value space: absolute dates (day + minute forms),
  // relative dates, and the scalar date functions — every form the grammar
  // admits as a window instant
  private val windowVals = Seq[JqlValue](str("1994-01-01"), str("1996-06-15"),
    w("-400d"), str("1998-01-01"), str("1995-06-01 12:30"), w("-100d"),
    w("-2w"), JFunc("now", Nil), JFunc("startOfDay", Nil))
  private val genHistQual: Gen[JHistQual] = Gen.oneOf(
    Gen.oneOf(windowVals).map(v => JHistQual("after", Seq(v))),
    Gen.oneOf(windowVals).map(v => JHistQual("before", Seq(v))),
    Gen.oneOf(windowVals).map(v => JHistQual("on", Seq(v))),
    // DURING with arbitrary (possibly inverted or function-valued) endpoints
    for { a <- Gen.oneOf(windowVals); b <- Gen.oneOf(windowVals) }
      yield JHistQual("during", Seq(a, b)))

  private val wasVals = Seq(str("To Do"), str("In Progress"), str("Done"), str("done"))
  // up to THREE stacked qualifiers, duplicates included — the grammar allows
  // `AFTER a AFTER b` (conjunction) and `AFTER a BEFORE b DURING (c,d)`;
  // the compiler folds them with && and the interpreter with forall, and the
  // fuzzer holds the two to agreement
  private val genWas: Gen[JqlExpr] = for {
    vs <- Gen.nonEmptyListOf(Gen.oneOf(wasVals)).map(_.take(3))
    neg <- Gen.oneOf(true, false)
    quals <- Gen.listOf(genHistQual).map(_.take(3))
  } yield JWas(fld("status"), vs, neg, quals)

  private val genChanged: Gen[JqlExpr] = for {
    from <- Gen.option(Gen.oneOf(wasVals))
    to <- Gen.option(Gen.oneOf(wasVals))
    quals <- Gen.listOf(genHistQual).map(_.take(3))
  } yield JChanged(fld("status"), from, to, quals)

  private val genLeaf: Gen[JqlExpr] = Gen.frequency(
    (3, genProject), (3, genStatus), (2, genPriority), (2, genType),
    (2, genSprint), (2, genText), (3, genDate), (2, genPerson),
    (2, genEpicLink), (2, genParent), (3, genKey), (2, genWas), (2, genChanged))

  private def genExpr(depth: Int): Gen[JqlExpr] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      (4, genLeaf),
      (2, for { a <- genExpr(depth - 1); b <- genExpr(depth - 1) } yield JAnd(a, b)),
      (2, for { a <- genExpr(depth - 1); b <- genExpr(depth - 1) } yield JOr(a, b)),
      (1, genExpr(depth - 1).map(JNot(_))))

  // epicLink is nullable: ordering by it exercises asc-nulls-last /
  // desc-nulls-first against the interpreter's replica of the rule
  private val orderFields = Seq("key", "updated", "created", "priority", "status",
    "project", "epicLink")
  private val genOrder: Gen[Seq[(JqlField, Boolean)]] = for {
    n <- Gen.oneOf(0, 0, 1, 1, 2) // bias: most queries have 0-1 sort keys
    fs <- Gen.pick(n, orderFields)
    dirs <- Gen.listOfN(n, Gen.oneOf(true, false))
  } yield fs.toSeq.zip(dirs).map { case (f, d) => (fld(f), d) }

  private val genQuery: Gen[JqlQuery] = for {
    whereOpt <- Gen.frequency((9, genExpr(3).map(Some(_))), (1, Gen.const(None)))
    order <- genOrder
  } yield JqlQuery(whereOpt, order)

  // ---- AST → JQL surface renderer ------------------------------------------

  private def needsQuotes(s: String): Boolean =
    s.isEmpty || !s.matches("[A-Za-z0-9_.@#*+/-]+( [A-Za-z0-9_.@#*+/-]+)*") ||
      s.split(' ').exists(p => Set("and", "or", "not", "in", "is", "order", "by",
        "asc", "desc", "empty", "null", "was", "changed")(p.toLowerCase)) ||
      s.contains("\"")

  private def renderValue(v: JqlValue, hist: Boolean = false): String = v match {
    case JStr(s) => "\"" + s.replace("\"", "\"\"") + "\""
    // bare EMPTY/NULL IS the null literal; quoting it would change the
    // semantics to a string compare (true in server JQL too)
    case JWord(s) if s.equalsIgnoreCase("empty") || s.equalsIgnoreCase("null") => s
    case JWord(s) =>
      // bare only when the lexer round-trips it; qualifier words also force
      // quotes inside history clauses
      val histUnsafe = hist && s.split(' ').exists(p =>
        Set("from", "to", "before", "after", "on", "during", "by")(p.toLowerCase))
      if (needsQuotes(s) || s.contains(' ') && histUnsafe) "\"" + s + "\""
      else if (histUnsafe) "\"" + s + "\"" else s
    case JNum(n) => n.toString
    case JFunc(n, args) => s"$n(${args.map("\"" + _ + "\"").mkString(", ")})"
  }

  private def renderField(f: JqlField): String =
    if (f.raw.contains(" ")) "\"" + f.raw + "\"" else f.raw

  private def renderQual(q: JHistQual): String = q.kind match {
    case "during" =>
      s"DURING (${renderValue(q.values.head, hist = true)}, ${renderValue(q.values(1), hist = true)})"
    case k => s"${k.toUpperCase} ${renderValue(q.values.head, hist = true)}"
  }

  private def render(e: JqlExpr): String = e match {
    case JAnd(l, r) => s"(${render(l)}) AND (${render(r)})"
    case JOr(l, r) => s"(${render(l)}) OR (${render(r)})"
    case JNot(x) => s"NOT (${render(x)})"
    case JEmpty(f, neg) => s"${renderField(f)} IS ${if (neg) "NOT " else ""}EMPTY"
    case JCmp(f, op, v) => s"${renderField(f)} $op ${renderValue(v)}"
    case JIn(f, vs, neg) =>
      s"${renderField(f)} ${if (neg) "NOT IN" else "IN"} (${vs.map(renderValue(_)).mkString(", ")})"
    case JWas(f, vs, neg, quals) =>
      val core =
        if (vs.size == 1 && !neg) s"WAS ${renderValue(vs.head, hist = true)}"
        else if (vs.size == 1) s"WAS NOT ${renderValue(vs.head, hist = true)}"
        else s"WAS ${if (neg) "NOT " else ""}IN (${vs.map(renderValue(_, hist = true)).mkString(", ")})"
      (s"${renderField(f)} $core" +: quals.map(renderQual)).mkString(" ")
    case JChanged(f, from, to, quals) =>
      (Seq(s"${renderField(f)} CHANGED") ++
        from.map(v => s"FROM ${renderValue(v, hist = true)}") ++
        to.map(v => s"TO ${renderValue(v, hist = true)}") ++
        quals.map(renderQual)).mkString(" ")
  }

  private def renderQuery(q: JqlQuery): String = {
    val where = q.where.map(render).getOrElse("")
    val order =
      if (q.orderBy.isEmpty) ""
      else " ORDER BY " + q.orderBy.map { case (f, asc) =>
        s"${renderField(f)} ${if (asc) "ASC" else "DESC"}"
      }.mkString(", ")
    (where + order).trim
  }

  // ---- shrinking ------------------------------------------------------------

  private implicit val shrinkExpr: Shrink[JqlQuery] = Shrink.withLazyList { q =>
    def subs(e: JqlExpr): LazyList[JqlExpr] = e match {
      case JAnd(l, r) => LazyList(l, r) ++ subs(l).map(JAnd(_, r)) ++ subs(r).map(JAnd(l, _))
      case JOr(l, r) => LazyList(l, r) ++ subs(l).map(JOr(_, r)) ++ subs(r).map(JOr(l, _))
      case JNot(x) => x #:: subs(x).map(JNot(_))
      case JIn(f, vs, neg) if vs.size > 1 =>
        LazyList.from(vs.indices).map(i => JIn(f, vs.patch(i, Nil, 1), neg))
      case JWas(f, vs, neg, quals) =>
        LazyList.from(quals.indices).map(i => JWas(f, vs, neg, quals.patch(i, Nil, 1))) ++
          (if (vs.size > 1) LazyList.from(vs.indices).map(i => JWas(f, vs.patch(i, Nil, 1), neg, quals)) else LazyList.empty)
      case JChanged(f, from, to, quals) =>
        (if (from.nonEmpty) LazyList(JChanged(f, None, to, quals)) else LazyList.empty) ++
          (if (to.nonEmpty) LazyList(JChanged(f, from, None, quals)) else LazyList.empty) ++
          LazyList.from(quals.indices).map(i => JChanged(f, from, to, quals.patch(i, Nil, 1)))
      case _ => LazyList.empty
    }
    val wheres: LazyList[JqlQuery] = q.where match {
      case Some(e) => JqlQuery(None, q.orderBy) #:: subs(e).map(s => JqlQuery(Some(s), q.orderBy))
      case None => LazyList.empty
    }
    val orders: LazyList[JqlQuery] =
      if (q.orderBy.nonEmpty) LazyList(JqlQuery(q.where, Seq.empty)) else LazyList.empty
    wheres ++ orders
  }

  // ---- the differential property --------------------------------------------

  test("differential fuzz: compiled JQL matches the independent interpreter (600 seeded cases)") {
    // force fixture materialization before the timed loop
    assert(rows.nonEmpty && history.nonEmpty && edges.nonEmpty)
    var count = 0
    val prop = Prop.forAll(genQuery) { q =>
      val jql = renderQuery(q)
      val expected = interpret(q)
      val got = Jql.run(spark, sf, jql).select("key").collect().map(_.getString(0)).toSeq
      count += 1
      val ok =
        if (q.orderBy.nonEmpty) got == expected
        else got.sorted == expected.sorted
      if (!ok) {
        val g = got.take(8).mkString(",")
        val e = expected.take(8).mkString(",")
        println(s"DIVERGENCE on: $jql\n  ast: $q\n  compiled(${got.size}): $g\n  interp(${expected.size}): $e")
      }
      ok
    }
    // extended hunt: GRAFT_FUZZ_SEEDS="1,2,3" runs extra seeded batches
    // locally without inflating the pinned CI cost
    val seeds = 20260816L +:
      sys.env.get("GRAFT_FUZZ_SEEDS").toSeq
        .flatMap(_.split(',')).filter(_.nonEmpty).map(_.trim.toLong)
    seeds.foreach { seed =>
      val params = SCTest.Parameters.default
        .withMinSuccessfulTests(600)
        .withInitialSeed(org.scalacheck.rng.Seed(seed))
        .withWorkers(1)
      val result = SCTest.check(params, prop)
      assert(result.passed, s"fuzzer found a divergence (seed $seed): ${result.status}")
    }
    assert(count >= 600 * seeds.size)
  }

  test("history qualifier grammar: unsupported/malformed forms are clean parse errors") {
    // the qualifier space the grammar REJECTS must reject at parse/compile
    // time with a positioned JqlParseException — never reach Catalyst as a
    // silently-wrong plan
    val bad = Seq(
      """status WAS "Done" BY user5""", // history has no actor
      """status WAS "Done" FROM "To Do"""", // FROM only valid after CHANGED
      """status WAS "Done" TO "In Progress"""", // TO likewise
      """status CHANGED FROM "A" FROM "B"""", // duplicate FROM
      """status CHANGED TO "A" TO "B"""", // duplicate TO
      """status CHANGED DURING ("1994-01-01")""", // DURING needs two values
      """status CHANGED DURING "1994-01-01", "1995-01-01"""", // missing parens
      """summary WAS "x"""", // only the history-tracked field has a changelog
      """priority CHANGED""", // same restriction on CHANGED
      """status WAS linkedIssues("P0-1")""", // subquery not a history value
      """status CHANGED AFTER now""") // function instant requires call parens
    bad.foreach { jql =>
      withClue(s"accepted: $jql") {
        assertThrows[JqlParseException](Jql.run(spark, sf, jql).collect())
      }
    }
  }

  test("named regression cases the fuzzer hunt pinned") {
    // exact-shape cases kept as plain asserts so a future regression names
    // itself; seeded from fuzzer development (see the differential test)
    val cases = Seq(
      // EMPTY literal under negation keeps empty-exclusion
      """NOT (epicLink = EMPTY)""",
      // subquery membership under NOT IN over a nullable field
      """parent NOT IN (issuesInEpic("E-7"))""",
      // WAS NOT with window composed under OR
      """(status WAS NOT "Done" AFTER "1996-06-15") OR project = P9""",
      // string > on priority (binary collation)
      """priority >= "Low" AND priority < "Mediumz"""",
      // ORDER BY with nulls and DESC over a nullable-ish sort prefix
      """project IN (P2, P3) ORDER BY priority DESC, key ASC""",
      // nullable sort key, both directions: nulls last asc / FIRST desc,
      // a placement rule the direction flip must not double-reverse
      // (hunt find: seed 424242 shrank to exactly this)
      """ORDER BY epicLink DESC""",
      """ORDER BY epicLink ASC, updated DESC""")
    cases.foreach { jql =>
      val q = Parser.parse(jql)
      val expected = interpret(q)
      val got = Jql.run(spark, sf, jql).select("key").collect().map(_.getString(0)).toSeq
      val ok = if (q.orderBy.nonEmpty) got == expected else got.sorted == expected.sorted
      assert(ok, s"regression case diverged: $jql")
    }
  }
}
