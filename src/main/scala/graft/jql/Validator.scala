package graft.jql

/** Pre-parse lint + advisory layer, for parity with the reference's
  * validator (reference: pkg/jql/builder.go:267-341 `validateJQLSyntax`,
  * `areQuotesBalanced`, `generateJQLSuggestions`;
  * pkg/jql/jira_builder.go:165-192 `ValidateQuery`).
  */
object Validator {
  final case class ValidationResult(
      valid: Boolean,
      errors: Seq[String],
      warnings: Seq[String],
      suggestions: Seq[String])

  def validate(jql: String): ValidationResult = {
    val errors = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]
    val suggestions = Seq.newBuilder[String]

    if (jql.trim.isEmpty) errors += "query is empty"
    if (!quotesBalanced(jql, '"')) errors += "unbalanced double quotes"
    if (!quotesBalanced(jql, '\'')) errors += "unbalanced single quotes"
    if (!parensBalanced(jql)) errors += "unbalanced parentheses"
    if (jql.matches("(?is).*\\b(and|or)\\s*$")) errors += "query ends with a dangling operator"
    if (jql.matches("(?is).*\\b(and\\s+and|or\\s+or)\\b.*")) errors += "duplicate operator"

    // parse as the authoritative check when the cheap lint passes
    val preErrors = errors.result()
    val parseError: Option[String] =
      if (preErrors.isEmpty)
        try { Parser.parse(jql); None }
        catch { case e: JqlParseException => Some(e.getMessage) }
      else None
    parseError.foreach(errors += _)

    // advisory warnings (reference thresholds)
    if (jql.length > 1000) warnings += "query longer than 1000 characters"
    val orCount = "(?i)\\bor\\b".r.findAllIn(jql).length
    if (orCount > 10) warnings += s"query has $orCount OR clauses"
    if (orCount >= 3) suggestions += "consider replacing OR chains with IN (...)"
    if (jql.contains("*") && !jql.toLowerCase.contains("order by"))
      suggestions += "wildcard query without ORDER BY may return unstable ordering"
    if (jql.matches("(?is).*assignee\\s*=\\s*['\"]?[a-z0-9.@_-]+['\"]?.*") &&
        !jql.toLowerCase.contains("currentuser"))
      suggestions += "consider currentUser() instead of a hardcoded assignee"

    val errs = errors.result()
    ValidationResult(errs.isEmpty, errs, warnings.result(), suggestions.result())
  }

  /** Quote balance with doubled-quote escapes
    * (reference: pkg/jql/builder.go:292-321).
    */
  private[jql] def quotesBalanced(s: String, quote: Char): Boolean = {
    var i = 0
    var inside = false
    while (i < s.length) {
      if (s(i) == quote) {
        if (inside && i + 1 < s.length && s(i + 1) == quote) i += 1 // escaped
        else inside = !inside
      }
      i += 1
    }
    !inside
  }

  private[jql] def parensBalanced(s: String): Boolean = {
    var depth = 0
    var i = 0
    var inQuote: Option[Char] = None
    while (i < s.length) {
      val c = s(i)
      inQuote match {
        case Some(q) => if (c == q) inQuote = None
        case None =>
          if (c == '"' || c == '\'') inQuote = Some(c)
          else if (c == '(') depth += 1
          else if (c == ')') { depth -= 1; if (depth < 0) return false }
      }
      i += 1
    }
    depth == 0
  }
}
