package graft.jql

/** JQL query construction — the reference's template/builder surface
  * (reference: pkg/jql/builder.go:126-246 templates,
  * pkg/jql/jira_builder.go:49-92 BuildEpicQuery, :195-234 OptimizeQuery).
  *
  * Queries are built as strings in the same dialect the compiler evaluates,
  * so built queries flow straight into [[JqlCompiler]].
  */
object Builder {

  /** Epic discovery analysis input (J8): strategy counts from a prior
    * analysis pass decide which clauses are worth emitting
    * (reference: pkg/jql/jira_builder.go:66-70 — subtask clause only when the
    * epic has issues).
    */
  final case class EpicAnalysis(totalIssues: Long, hasSubtasks: Boolean)

  /** Build the epic membership query: Epic Link equality OR'd with the
    * parent-in-epic clause when analysis says the epic is non-empty, plus the
    * project constraint "for performance" (= partition pruning here) and the
    * deterministic ORDER BY (reference: pkg/jql/jira_builder.go:49-92).
    */
  def buildEpicQuery(epicKey: String, projectKey: Option[String] = None,
      analysis: Option[EpicAnalysis] = None): String = {
    val base = s""""Epic Link" = $epicKey"""
    val withSubtasks = analysis match {
      case Some(a) if a.totalIssues > 0 && a.hasSubtasks =>
        s"""($base OR parent in (issuesInEpic("$epicKey")))"""
      case _ => base
    }
    val withProject = projectKey match {
      case Some(p) => s"project = $p AND $withSubtasks"
      case None => withSubtasks
    }
    s"$withProject ORDER BY key ASC"
  }

  /** A template parameter (reference: pkg/jql/builder.go:79-87). */
  final case class TemplateParam(name: String, required: Boolean,
      default: Option[String] = None)

  /** A predefined query template (reference: pkg/jql/builder.go:69-77). */
  final case class Template(name: String, category: String,
      jqlTemplate: String, params: Seq[TemplateParam])

  /** The reference's five built-in templates, byte-for-byte
    * (reference: pkg/jql/builder.go:125-246 GetBuiltInTemplates).
    */
  val builtInTemplates: Seq[Template] = Seq(
    Template("epic-all-issues", "epic",
      """"Epic Link" = {{.epic_key}} OR parent in (issuesInEpic("{{.epic_key}}"))""",
      Seq(TemplateParam("epic_key", required = true))),
    Template("epic-stories-only", "epic",
      """"Epic Link" = {{.epic_key}} AND type = Story""",
      Seq(TemplateParam("epic_key", required = true))),
    Template("project-active-issues", "project",
      """project = {{.project_key}} AND status in ("To Do", "In Progress", "In Review")""",
      Seq(TemplateParam("project_key", required = true))),
    Template("assignee-current-sprint", "assignee",
      "assignee = currentUser() AND sprint in openSprints()" +
        "{{if .project_key}} AND project = {{.project_key}}{{end}}",
      Seq(TemplateParam("project_key", required = false))),
    Template("recent-updates", "project",
      """project = {{.project_key}} AND updated >= -{{.days}}d ORDER BY updated DESC""",
      Seq(TemplateParam("project_key", required = true),
        TemplateParam("days", required = false, default = Some("7")))))

  /** BuildFromTemplate parity (reference: pkg/jql/builder.go:16-17): apply
    * defaults, enforce required parameters, expand the two Go-template
    * constructs the templates use — `{{if .k}}…{{end}}` conditionals and
    * `{{.k}}` substitutions.
    */
  def buildFromTemplate(name: String, params: Map[String, String]): String = {
    val tmpl = builtInTemplates.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"unknown template '$name'"))
    val withDefaults = tmpl.params.flatMap(p =>
      p.default.filterNot(_ => params.contains(p.name)).map(p.name -> _)).toMap ++ params
    tmpl.params.filter(p => p.required && !withDefaults.get(p.name).exists(_.nonEmpty))
      .foreach(p => throw new IllegalArgumentException(
        s"template '$name': required parameter '${p.name}' missing"))
    val conditional = "(?s)\\{\\{if \\.([a-zA-Z_]+)\\}\\}(.*?)\\{\\{end\\}\\}".r
    val afterIf = conditional.replaceAllIn(tmpl.jqlTemplate, m =>
      if (withDefaults.get(m.group(1)).exists(_.nonEmpty))
        scala.util.matching.Regex.quoteReplacement(m.group(2))
      else "")
    "\\{\\{\\.([a-zA-Z_]+)\\}\\}".r.replaceAllIn(afterIf, m =>
      scala.util.matching.Regex.quoteReplacement(
        withDefaults.getOrElse(m.group(1),
          throw new IllegalArgumentException(
            s"template '$name': parameter '${m.group(1)}' missing"))))
  }

  /** Additional saved-query shorthands beyond the reference's built-ins, with
    * `{param}` placeholders.
    */
  val templates: Map[String, String] = Map(
    "epic-all-issues" -> """"Epic Link" = {epic} ORDER BY key ASC""",
    "epic-stories" -> """"Epic Link" = {epic} AND type = Story ORDER BY key ASC""",
    "project-active" ->
      """project = {project} AND status IN ("To Do", "In Progress", "In Review") ORDER BY updated DESC""",
    "my-open-issues" ->
      """assignee = currentUser() AND status != "Done" ORDER BY updated DESC""",
    "current-sprint" ->
      """project = {project} AND sprint in openSprints() ORDER BY key ASC""",
    "recently-updated" ->
      """project = {project} AND updated >= -7d ORDER BY updated DESC""",
    "key-list" -> "key in ({keys}) ORDER BY key ASC")

  /** F6: expand a named template with parameters. Unknown template or missing
    * parameter throws — matching the reference's template errors.
    */
  def expand(template: String, params: Map[String, String]): String = {
    val tmpl = templates.getOrElse(template,
      throw new IllegalArgumentException(s"unknown template '$template'"))
    val out = params.foldLeft(tmpl) { case (acc, (k, v)) =>
      acc.replace(s"{$k}", v)
    }
    "\\{[a-z]+\\}".r.findFirstIn(out).foreach { missing =>
      throw new IllegalArgumentException(s"missing template parameter $missing")
    }
    out
  }

  /** Query optimization parity (reference: pkg/jql/jira_builder.go:195-234):
    * move the project constraint to the front of the AND chain. (Catalyst
    * reorders predicates anyway — this keeps the reference's observable
    * string behavior for API parity.)
    */
  def optimize(jql: String): String = {
    val parts = jql.split("(?i) AND ").toList
    if (parts.length < 2) jql
    else {
      val (proj, rest) = parts.partition(_.trim.toLowerCase.startsWith("project "))
      if (proj.isEmpty) jql else (proj ++ rest).mkString(" AND ")
    }
  }
}
