package graft.api

import graft.api.ProfileStore.{Profile, ProfileOptions}

/** Built-in profile templates — the reference's template catalog
  * re-expressed (reference: pkg/profile/templates.go:10-345
  * `GetBuiltinTemplates`; variable substitution semantics of
  * pkg/jql/jira_builder.go:95-162): each template is a pre-configured
  * [[ProfileStore.Profile]] with `{variable}` placeholders, a variable
  * spec (required / default / example), and the expansion is plain
  * string substitution after required-variable checking — no template
  * engine, so expansion is deterministic and injection-free (a profile
  * value can't introduce new placeholders: one pass, no re-scan).
  */
object ProfileTemplates {

  final case class TemplateVar(
      name: String,
      description: String,
      required: Boolean,
      default: String = "",
      example: String = "")

  final case class Template(
      id: String,
      title: String,
      description: String,
      category: String,
      profile: Profile,
      variables: Seq[TemplateVar],
      example: String)

  val all: Seq[Template] = Seq(
    Template(
      id = "epic-all-issues",
      title = "EPIC - All Issues",
      description =
        "Sync all issues associated with an EPIC (stories, subtasks, related)",
      category = "epic",
      profile = Profile(
        name = "{name}",
        description = "Sync for EPIC {epic_key} - all associated issues",
        epic_key = "{epic_key}",
        repository = "{repository}",
        options = ProfileOptions(concurrency = 5, rate_limit = "500ms",
          include_links = true),
        tags = Seq("epic", "comprehensive")),
      variables = Seq(
        TemplateVar("name", "Profile name", required = true,
          example = "my-epic-sync"),
        TemplateVar("epic_key", "JIRA EPIC key", required = true,
          example = "PROJ-123"),
        TemplateVar("repository", "Target Git repository path",
          required = true, example = "./my-repo")),
      example = "profile create --template epic-all-issues --name product-epic " +
        "--var epic_key=PROJ-456 --var repository=./product-repo"),
    Template(
      id = "epic-stories-only",
      title = "EPIC - Stories Only",
      description = "Sync only the stories under an EPIC",
      category = "epic",
      profile = Profile(
        name = "{name}",
        description = "Sync for EPIC {epic_key} - stories only",
        jql = "\"Epic Link\" = {epic_key} AND type = Story",
        repository = "{repository}",
        options = ProfileOptions(concurrency = 5, rate_limit = "500ms",
          include_links = true),
        tags = Seq("epic", "stories")),
      variables = Seq(
        TemplateVar("name", "Profile name", required = true),
        TemplateVar("epic_key", "JIRA EPIC key", required = true),
        TemplateVar("repository", "Target Git repository path",
          required = true)),
      example = "profile create --template epic-stories-only --name feature-stories " +
        "--var epic_key=PROJ-789 --var repository=./feature-repo"),
    Template(
      id = "project-active-issues",
      title = "Project - Active Issues",
      description = "Sync all active (non-closed) issues in a project",
      category = "project",
      profile = Profile(
        name = "{name}",
        description = "Active issues for project {project_key}",
        jql = "project = {project_key} AND status != Closed AND status != Done",
        repository = "{repository}",
        options = ProfileOptions(concurrency = 5, rate_limit = "500ms",
          incremental = true, include_links = true),
        tags = Seq("project", "active")),
      variables = Seq(
        TemplateVar("name", "Profile name", required = true),
        TemplateVar("project_key", "JIRA project key", required = true,
          example = "PROJ"),
        TemplateVar("repository", "Target Git repository path",
          required = true)),
      example = "profile create --template project-active-issues --name proj-active " +
        "--var project_key=PROJ --var repository=./proj-issues"),
    Template(
      id = "my-current-sprint",
      title = "My Current Sprint",
      description = "Sync issues assigned to you in the current sprint",
      category = "personal",
      profile = Profile(
        name = "{name}",
        description = "My issues in current sprint",
        jql = "assignee = currentUser() AND sprint in openSprints()",
        repository = "{repository}",
        options = ProfileOptions(concurrency = 2, rate_limit = "1s",
          incremental = true, include_links = true),
        tags = Seq("personal", "sprint")),
      variables = Seq(
        TemplateVar("name", "Profile name", required = true),
        TemplateVar("repository", "Target Git repository path",
          required = true)),
      example = "profile create --template my-current-sprint --name my-sprint " +
        "--var repository=./current-sprint"),
    Template(
      id = "recent-updates",
      title = "Recent Updates",
      description = "Sync recently updated issues across projects",
      category = "monitoring",
      profile = Profile(
        name = "{name}",
        description = "Recently updated issues (last {days} days)",
        jql = "updated >= -{days}d",
        repository = "{repository}",
        options = ProfileOptions(concurrency = 3, rate_limit = "500ms",
          incremental = true, include_links = false),
        tags = Seq("monitoring", "recent")),
      variables = Seq(
        TemplateVar("name", "Profile name", required = true),
        TemplateVar("repository", "Target Git repository path",
          required = true),
        TemplateVar("days", "Look-back window in days", required = false,
          default = "7")),
      example = "profile create --template recent-updates --name weekly " +
        "--var repository=./updates --var days=7"),
    Template(
      id = "custom-jql",
      title = "Custom JQL",
      description = "Sync issues matching an arbitrary JQL query",
      category = "custom",
      profile = Profile(
        name = "{name}",
        description = "Custom JQL sync",
        jql = "{jql}",
        repository = "{repository}",
        options = ProfileOptions(concurrency = 3, rate_limit = "500ms",
          include_links = true),
        tags = Seq("custom")),
      variables = Seq(
        TemplateVar("name", "Profile name", required = true),
        TemplateVar("jql", "JQL query", required = true,
          example = "priority = High AND status != Closed"),
        TemplateVar("repository", "Target Git repository path",
          required = true)),
      example = "profile create --template custom-jql --name urgent " +
        "--var jql='priority = High' --var repository=./urgent"),
    Template(
      id = "issue-list",
      title = "Issue List",
      description = "Sync a fixed list of issue keys",
      category = "custom",
      profile = Profile(
        name = "{name}",
        description = "Fixed issue list sync",
        issue_keys = Seq("{issue_keys}"),
        repository = "{repository}",
        options = ProfileOptions(concurrency = 2, rate_limit = "500ms",
          include_links = true),
        tags = Seq("custom", "list")),
      variables = Seq(
        TemplateVar("name", "Profile name", required = true),
        TemplateVar("issue_keys", "Comma-separated issue keys",
          required = true, example = "PROJ-1,PROJ-2"),
        TemplateVar("repository", "Target Git repository path",
          required = true)),
      example = "profile create --template issue-list --name release " +
        "--var issue_keys=PROJ-1,PROJ-2 --var repository=./release"))

  def byId(id: String): Option[Template] = all.find(_.id == id)

  /** Expand a template with `vars`: required variables must be present,
    * optional ones fall back to their defaults; every `{var}` occurrence
    * in the string fields substitutes in one pass. Returns Left(missing)
    * when a required variable is absent.
    */
  def expand(t: Template, vars: Map[String, String]): Either[Seq[String], Profile] = {
    val missing = t.variables.filter(v => v.required && !vars.contains(v.name))
      .map(_.name)
    if (missing.nonEmpty) return Left(missing)
    val env = t.variables.map(v => v.name -> vars.getOrElse(v.name, v.default))
      .toMap ++ vars
    // ONE left-to-right regex pass over {word} placeholders, looking each
    // up in env exactly once and never rescanning substituted output — a
    // value that itself contains "{name}" stays literal instead of being
    // re-expanded by whichever map entries happen to iterate later
    val Placeholder = "\\{(\\w+)\\}".r
    def sub(s: String): String =
      Placeholder.replaceAllIn(s, m => scala.util.matching.Regex
        .quoteReplacement(env.getOrElse(m.group(1), m.matched)))
    val p = t.profile
    val keys = p.issue_keys.map(sub).flatMap(_.split(",")).map(_.trim)
      .filter(_.nonEmpty)
    Right(p.copy(
      name = sub(p.name),
      description = sub(p.description),
      repository = sub(p.repository),
      jql = sub(p.jql),
      epic_key = sub(p.epic_key),
      issue_keys = keys))
  }
}
