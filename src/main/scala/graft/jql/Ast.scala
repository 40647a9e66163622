package graft.jql

/** JQL abstract syntax tree.
  *
  * The dialect covered is exactly what the reference system emits and tests
  * (reference: pkg/jql/builder.go:126-246, pkg/epic/jira_analyzer.go:160-181,
  * internal/cli/sync.go:733): comparison ops `= != ~ !~ > >= < <=`,
  * `IN / NOT IN`, `AND / OR / NOT`, `IS [NOT] EMPTY|NULL`, quoted fields
  * (`"Epic Link"`), custom fields (`cf[12311140]`), relative dates (`-7d`),
  * `ORDER BY f [ASC|DESC], ...` and the server-side functions
  * `currentUser()`, `openSprints()`, `issuesInEpic("K")`, `linkedIssues(K)`.
  */
sealed trait JqlValue
final case class JWord(s: String) extends JqlValue // unquoted: PROJ-123, Story, -7d
final case class JStr(s: String) extends JqlValue // quoted: "To Do"
final case class JNum(v: BigDecimal) extends JqlValue
final case class JFunc(name: String, args: Seq[String]) extends JqlValue

/** A (normalized) field reference; `raw` keeps the user-visible spelling. */
final case class JqlField(raw: String) {
  val normalized: String = raw.trim.toLowerCase
}

/** A history-predicate qualifier: `BEFORE d` / `AFTER d` / `ON d` take one
  * value, `DURING (d1, d2)` takes two. Public JQL grammar for the history
  * operators (`field WAS ... AFTER -7d`, `field CHANGED DURING (a, b)`).
  */
final case class JHistQual(kind: String, values: Seq[JqlValue])

sealed trait JqlExpr
final case class JCmp(field: JqlField, op: String, value: JqlValue) extends JqlExpr
final case class JIn(field: JqlField, values: Seq[JqlValue], negated: Boolean) extends JqlExpr
final case class JEmpty(field: JqlField, negated: Boolean) extends JqlExpr

/** `field WAS [NOT] [IN] value(s) [qualifiers]` — the field held one of the
  * values at some instant (negated: at no instant) inside the qualifier
  * window; no window means "ever, including now".
  */
final case class JWas(field: JqlField, values: Seq[JqlValue], negated: Boolean,
    quals: Seq[JHistQual]) extends JqlExpr

/** `field CHANGED [FROM v] [TO v] [BEFORE|AFTER|ON d | DURING (a,b)]` — a
  * transition event exists satisfying every given constraint.
  */
final case class JChanged(field: JqlField, from: Option[JqlValue],
    to: Option[JqlValue], quals: Seq[JHistQual]) extends JqlExpr

final case class JAnd(left: JqlExpr, right: JqlExpr) extends JqlExpr
final case class JOr(left: JqlExpr, right: JqlExpr) extends JqlExpr
final case class JNot(expr: JqlExpr) extends JqlExpr

final case class JqlQuery(
    where: Option[JqlExpr],
    orderBy: Seq[(JqlField, Boolean)]) // (field, ascending)

final case class JqlParseException(message: String, position: Int)
    extends RuntimeException(s"JQL parse error at $position: $message")
