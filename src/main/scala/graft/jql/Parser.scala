package graft.jql

import Lexer._

/** Recursive-descent JQL parser.
  *
  * Grammar (keywords case-insensitive):
  * {{{
  * query     := orExpr? (ORDER BY orderItem (',' orderItem)*)?
  * orExpr    := andExpr (OR andExpr)*
  * andExpr   := notExpr (AND notExpr)*
  * notExpr   := NOT notExpr | primary
  * primary   := '(' orExpr ')' | fieldExpr
  * fieldExpr := field op value
  *            | field [NOT] IN '(' value (',' value)* ')'
  *            | field IS [NOT] (EMPTY | NULL)
  * field     := WORD | QUOTED | 'cf' '[' NUM ']'
  * value     := QUOTED | WORD | WORD '(' [arg (',' arg)*] ')'
  * }}}
  */
final class Parser(tokens: Vector[Tok]) {
  private var pos = 0
  private def peek: Tok = tokens(pos)
  private def advance(): Tok = { val t = tokens(pos); pos += 1; t }

  private def isKw(t: Tok, kw: String): Boolean = t match {
    case TWord(s, _) => s.equalsIgnoreCase(kw)
    case _ => false
  }

  /** Words that terminate a multi-word bare field or value. `was`/`changed`
    * are global keywords (they must stop FIELD absorption: `status WAS X`);
    * the history-qualifier words (`from`, `to`, `before`, `after`, `on`,
    * `during`) are NOT — `status = To Do` must keep absorbing `To` — and
    * only terminate values inside a WAS/CHANGED clause ([[histStops]]).
    */
  private val keywords = Set(
    "and", "or", "not", "in", "is", "order", "by", "asc", "desc",
    "empty", "null", "was", "changed")
  private val histStops = Set("from", "to", "before", "after", "on", "during", "by")
  private def isBareWord(t: Tok): Boolean = t match {
    case TWord(s, _) => !keywords(s.toLowerCase)
    case _ => false
  }
  private def isHistBareWord(t: Tok): Boolean = t match {
    case TWord(s, _) => !keywords(s.toLowerCase) && !histStops(s.toLowerCase)
    case _ => false
  }
  private def expectKw(kw: String): Unit =
    if (isKw(peek, kw)) { advance(); () }
    else throw JqlParseException(s"expected $kw", peek.pos)

  def parseQuery(): JqlQuery = {
    val where =
      if (peek.isInstanceOf[TEof] || isKw(peek, "order")) None
      else Some(parseOr())
    val order =
      if (isKw(peek, "order")) { advance(); expectKw("by"); parseOrderItems() }
      else Seq.empty
    peek match {
      case TEof(_) => JqlQuery(where, order)
      case t => throw JqlParseException("trailing input", t.pos)
    }
  }

  private def parseOrderItems(): Seq[(JqlField, Boolean)] = {
    val items = Seq.newBuilder[(JqlField, Boolean)]
    var more = true
    while (more) {
      val f = parseField()
      val asc =
        if (isKw(peek, "asc")) { advance(); true }
        else if (isKw(peek, "desc")) { advance(); false }
        else true
      items += ((f, asc))
      peek match {
        case TPunct(",", _) => advance()
        case _ => more = false
      }
    }
    items.result()
  }

  private def parseOr(): JqlExpr = {
    var left = parseAnd()
    while (isKw(peek, "or")) { advance(); left = JOr(left, parseAnd()) }
    left
  }

  private def parseAnd(): JqlExpr = {
    var left = parseNot()
    while (isKw(peek, "and")) { advance(); left = JAnd(left, parseNot()) }
    left
  }

  private def parseNot(): JqlExpr =
    if (isKw(peek, "not")) { advance(); JNot(parseNot()) }
    else parsePrimary()

  private def parsePrimary(): JqlExpr = peek match {
    case TPunct("(", _) =>
      advance()
      val e = parseOr()
      peek match {
        case TPunct(")", _) => advance(); e
        case t => throw JqlParseException("expected ')'", t.pos)
      }
    case _ => parseFieldExpr()
  }

  private def parseField(): JqlField = peek match {
    case TStr(s, _) => advance(); JqlField(s)
    case TWord(s, _) if s.equalsIgnoreCase("cf") &&
        pos + 1 < tokens.length && tokens(pos + 1) == TPunct("[", tokens(pos + 1).pos) =>
      advance(); advance() // cf [
      val num = peek match {
        case TWord(v, _) => advance(); v
        case t => throw JqlParseException("expected custom field id", t.pos)
      }
      peek match {
        case TPunct("]", _) => advance()
        case t => throw JqlParseException("expected ']'", t.pos)
      }
      JqlField(s"cf[$num]")
    case TWord(s, _) =>
      advance()
      // unquoted multi-word fields, e.g. `Epic Link = K`
      // (reference: internal/cli/sync.go:58) — absorb bare words up to the
      // operator/keyword
      val parts = Seq.newBuilder[String]
      parts += s
      while (isBareWord(peek)) parts += advance().asInstanceOf[TWord].s
      JqlField(parts.result().mkString(" "))
    case t => throw JqlParseException("expected field", t.pos)
  }

  private def parseFieldExpr(): JqlExpr = {
    val field = parseField()
    peek match {
      case TOp(op, _) =>
        advance()
        JCmp(field, op, parseValue())
      case t if isKw(t, "in") =>
        advance(); JIn(field, parseValueList(), negated = false)
      case t if isKw(t, "not") =>
        advance(); expectKw("in")
        JIn(field, parseValueList(), negated = true)
      case t if isKw(t, "is") =>
        advance()
        val neg = if (isKw(peek, "not")) { advance(); true } else false
        if (isKw(peek, "empty") || isKw(peek, "null")) { advance(); JEmpty(field, neg) }
        else throw JqlParseException("expected EMPTY or NULL", peek.pos)
      case t if isKw(t, "was") =>
        advance()
        val neg = if (isKw(peek, "not")) { advance(); true } else false
        val values =
          if (isKw(peek, "in")) { advance(); parseValueList() }
          else Seq(parseValue(hist = true))
        JWas(field, values, neg, parseHistQuals())
      case t if isKw(t, "changed") =>
        advance()
        // FROM / TO are position-free like the date qualifiers; collect
        // everything, split the value constraints out of the window ones
        val quals = parseHistQuals(allowFromTo = true)
        def one(kind: String): Option[JqlValue] =
          quals.filter(_.kind == kind) match {
            case Seq() => None
            case Seq(q) => Some(q.values.head)
            case _ => throw JqlParseException(s"duplicate $kind in CHANGED", peek.pos)
          }
        JChanged(field, one("from"), one("to"),
          quals.filterNot(q => q.kind == "from" || q.kind == "to"))
      case t => throw JqlParseException("expected operator", t.pos)
    }
  }

  /** Zero or more history qualifiers after WAS/CHANGED:
    * `BEFORE v | AFTER v | ON v | DURING (v1, v2)` (+ `FROM v | TO v` when
    * `allowFromTo`). `BY user` is recognized and rejected explicitly — the
    * engine's history carries no change actor.
    */
  private def parseHistQuals(allowFromTo: Boolean = false): Seq[JHistQual] = {
    val out = Seq.newBuilder[JHistQual]
    var more = true
    while (more) peek match {
      case t @ TWord(s, _) if histStops(s.toLowerCase) =>
        val kind = s.toLowerCase
        if (kind == "by")
          throw JqlParseException("BY is not supported (history has no actor)", t.pos)
        if ((kind == "from" || kind == "to") && !allowFromTo)
          throw JqlParseException(s"${kind.toUpperCase} is only valid after CHANGED", t.pos)
        advance()
        if (kind == "during") {
          peek match {
            case TPunct("(", _) => advance()
            case tt => throw JqlParseException("expected '(' after DURING", tt.pos)
          }
          val v1 = parseValue(hist = true)
          peek match {
            case TPunct(",", _) => advance()
            case tt => throw JqlParseException("expected ',' in DURING range", tt.pos)
          }
          val v2 = parseValue(hist = true)
          peek match {
            case TPunct(")", _) => advance()
            case tt => throw JqlParseException("expected ')' after DURING range", tt.pos)
          }
          out += JHistQual("during", Seq(v1, v2))
        } else out += JHistQual(kind, Seq(parseValue(hist = true)))
      case _ => more = false
    }
    out.result()
  }

  private def parseValueList(): Seq[JqlValue] = {
    peek match {
      case TPunct("(", _) => advance()
      // Bare function after IN without an outer paren list — the form the
      // reference's templates emit: `sprint in openSprints()`,
      // `key in issuesInEpic("K")` (reference: pkg/jql/builder.go:195).
      case TWord(_, _) if pos + 1 < tokens.length &&
          (tokens(pos + 1) match {
            case TPunct("(", _) => true
            case _ => false
          }) =>
        return Seq(parseValue())
      case t => throw JqlParseException("expected '('", t.pos)
    }
    val vals = Seq.newBuilder[JqlValue]
    var more = true
    while (more) {
      vals += parseValue()
      peek match {
        case TPunct(",", _) => advance()
        case TPunct(")", _) => advance(); more = false
        case t => throw JqlParseException("expected ',' or ')'", t.pos)
      }
    }
    vals.result()
  }

  /** `hist` restricts bare multi-word absorption so qualifier words
    * (`before`, `to`, ...) terminate the value inside WAS/CHANGED clauses.
    */
  private def parseValue(hist: Boolean = false): JqlValue = peek match {
    case TStr(s, _) => advance(); JStr(s)
    case TWord(s, _) =>
      advance()
      peek match {
        case TPunct("(", _) => // function call: currentUser(), issuesInEpic("K")
          advance()
          val args = Seq.newBuilder[String]
          var more = true
          while (more) peek match {
            case TPunct(")", _) => advance(); more = false
            case TPunct(",", _) => advance()
            case TStr(a, _) => advance(); args += a
            case TWord(a, _) => advance(); args += a
            case t => throw JqlParseException("bad function argument", t.pos)
          }
          JFunc(s, args.result())
        case _ =>
          if (s.matches("^-?\\d+(\\.\\d+)?$")) JNum(BigDecimal(s))
          else {
            // unquoted multi-word values, e.g. `status = To Do` — the
            // reference's own template examples emit this form
            // (reference: pkg/jql/builder_test.go:359)
            val parts = Seq.newBuilder[String]
            parts += s
            while (if (hist) isHistBareWord(peek) else isBareWord(peek))
              parts += advance().asInstanceOf[TWord].s
            JWord(parts.result().mkString(" "))
          }
      }
    case t => throw JqlParseException("expected value", t.pos)
  }
}

object Parser {
  def parse(jql: String): JqlQuery = new Parser(Lexer.tokenize(jql)).parseQuery()
}
