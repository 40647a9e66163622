package graft.api

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.Timestamp

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Named reusable sync configurations with usage accounting — the
  * reference's file-backed profile manager re-expressed driver-side
  * (reference: pkg/profile/types.go:8-45 `Profile`/`ProfileOptions`/
  * `UsageStats`; pkg/profile/manager.go:155-463 CRUD + `RecordUsage`).
  *
  * Persistence is one JSON collection file committed atomically by
  * tmp+rename, the same crash-safety discipline as
  * [[graft.state.StateStore]]: a torn write can never destroy the previous
  * collection. Profiles are driver-side metadata (tens to thousands of
  * rows); the DISTRIBUTED profile analytics — search, top-k similarity,
  * usage stats over the corpus-scale profile tables — live in
  * [[graft.queries.Profiles]] and are oracle-checked there. This store is
  * the control-plane source of truth the REST façade mutates.
  */
object ProfileStore {

  final case class ProfileOptions(
      concurrency: Int = 1,
      rate_limit: String = "",
      incremental: Boolean = false,
      force: Boolean = false,
      dry_run: Boolean = false,
      include_links: Boolean = true)

  final case class UsageStats(
      times_used: Int = 0,
      last_used_ms: Long = 0L,
      total_sync_time_ms: Long = 0L,
      avg_sync_time_ms: Long = 0L,
      success_count: Int = 0,
      success_rate: Double = 0.0)

  final case class Profile(
      name: String,
      description: String = "",
      repository: String = "",
      jql: String = "",
      issue_keys: Seq[String] = Seq.empty,
      epic_key: String = "",
      options: ProfileOptions = ProfileOptions(),
      tags: Seq[String] = Seq.empty,
      created_at_ms: Long = 0L,
      updated_at_ms: Long = 0L,
      usage: UsageStats = UsageStats())

  final case class Validation(valid: Boolean, errors: Seq[String], warnings: Seq[String])

  private final case class Collection(version: String, profiles: Map[String, Profile])

  private val mapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** Name rules mirror the reference's validation: DNS-label-ish, so a
    * profile name is always safe as a path segment and a job-ID fragment
    * (reference: pkg/profile/manager.go:310-370 `ValidateProfile`).
    */
  private val namePattern = "^[a-z0-9]([a-z0-9._-]{0,61}[a-z0-9])?$".r

  def validate(p: Profile): Validation = {
    val errors = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]
    if (p.name.isEmpty) errors += "name is required"
    else if (namePattern.findFirstIn(p.name).isEmpty)
      errors += s"invalid profile name '${p.name}': lowercase alphanumerics, '.', '_', '-'; max 63 chars"
    if (p.repository.isEmpty) errors += "repository is required"
    val modes = Seq(p.jql.nonEmpty, p.issue_keys.nonEmpty, p.epic_key.nonEmpty).count(identity)
    if (modes == 0) errors += "one of jql, issue_keys, epic_key is required"
    if (modes > 1) warnings += "multiple sync modes set; jql takes precedence"
    if (p.jql.nonEmpty) {
      val v = graft.jql.Validator.validate(p.jql)
      if (!v.valid) errors ++= v.errors.map(e => s"jql: $e")
      warnings ++= v.warnings.map(w => s"jql: $w")
    }
    if (p.options.concurrency < 0) errors += "options.concurrency must be >= 0"
    val errs = errors.result()
    Validation(errs.isEmpty, errs, warnings.result())
  }
}

final class ProfileStore(root: String) {
  import ProfileStore._

  private def file: Path = Paths.get(root, "profiles.json")

  private def load(): Collection = {
    if (!Files.exists(file)) Collection("v1", Map.empty)
    else mapper.readValue(Files.readAllBytes(file), classOf[Collection])
  }

  /** Atomic commit: write the whole collection to a tmp sibling, fsync-free
    * rename into place. Readers see the old or the new file, never a torn
    * one (reference persists per-save the same way:
    * pkg/profile/manager.go:112-153 `SaveCollection`).
    */
  private def save(c: Collection): Unit = {
    Files.createDirectories(file.getParent)
    val tmp = file.resolveSibling(file.getFileName.toString + ".tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(c))
    Files.move(tmp, file, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private val lock = new Object

  def list(): Seq[Profile] = lock.synchronized {
    load().profiles.values.toSeq.sortBy(_.name)
  }

  def get(name: String): Option[Profile] = lock.synchronized {
    load().profiles.get(name)
  }

  def exists(name: String): Boolean = get(name).isDefined

  /** Create fails on duplicates (reference: manager.go:155-191 returns
    * `ErrProfileExists`), so POST can map it to 409.
    */
  def create(p: Profile, now: Timestamp): Either[Validation, Profile] = lock.synchronized {
    val v = validate(p)
    if (!v.valid) Left(v)
    else {
      val c = load()
      if (c.profiles.contains(p.name)) Left(Validation(valid = false,
        Seq(s"profile '${p.name}' already exists"), Seq.empty))
      else {
        val stamped = p.copy(created_at_ms = now.getTime, updated_at_ms = now.getTime,
          usage = UsageStats())
        save(c.copy(profiles = c.profiles + (p.name -> stamped)))
        Right(stamped)
      }
    }
  }

  /** Update preserves creation time and usage history; the name is fixed
    * (rename is its own operation, as in the reference).
    */
  def update(name: String, p: Profile, now: Timestamp): Either[Validation, Option[Profile]] =
    lock.synchronized {
      val c = load()
      c.profiles.get(name) match {
        case None => Right(None)
        case Some(old) =>
          val merged = p.copy(name = name, created_at_ms = old.created_at_ms,
            updated_at_ms = now.getTime, usage = old.usage)
          val v = validate(merged)
          if (!v.valid) Left(v)
          else {
            save(c.copy(profiles = c.profiles + (name -> merged)))
            Right(Some(merged))
          }
      }
    }

  def delete(name: String): Boolean = lock.synchronized {
    val c = load()
    if (!c.profiles.contains(name)) false
    else { save(c.copy(profiles = c.profiles - name)); true }
  }

  def duplicate(source: String, target: String, now: Timestamp): Either[Validation, Option[Profile]] =
    lock.synchronized {
      get(source) match {
        case None => Right(None)
        case Some(p) => create(p.copy(name = target), now) match {
          case Left(v) => Left(v)
          case Right(created) => Right(Some(created))
        }
      }
    }

  def rename(oldName: String, newName: String, now: Timestamp): Either[Validation, Option[Profile]] =
    lock.synchronized {
      duplicate(oldName, newName, now) match {
        case Right(Some(p)) =>
          // keep history through a rename (reference: manager.go:392-421)
          val withHistory = get(oldName).map(o => p.copy(
            created_at_ms = o.created_at_ms, usage = o.usage)).getOrElse(p)
          val c = load()
          save(c.copy(profiles = c.profiles - oldName + (newName -> withHistory)))
          Right(Some(withHistory))
        case other => other
      }
    }

  /** Usage accounting after a sync run driven by this profile
    * (reference: manager.go:423-463 `RecordUsage` — times used, rolling
    * average duration, success rate).
    */
  def recordUsage(name: String, durationMs: Long, success: Boolean, now: Timestamp): Boolean =
    lock.synchronized {
      val c = load()
      c.profiles.get(name) match {
        case None => false
        case Some(p) =>
          val used = p.usage.times_used + 1
          val total = p.usage.total_sync_time_ms + durationMs
          val ok = p.usage.success_count + (if (success) 1 else 0)
          val u = UsageStats(
            times_used = used,
            last_used_ms = now.getTime,
            total_sync_time_ms = total,
            avg_sync_time_ms = total / used,
            success_count = ok,
            success_rate = ok.toDouble / used)
          save(c.copy(profiles = c.profiles + (name -> p.copy(usage = u))))
          true
      }
    }

  /** Export the collection as pretty JSON (reference:
    * pkg/profile/import_export.go); import is just dropping the file in
    * `root` — same format.
    */
  def exportJson(): String = lock.synchronized {
    new String(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(load()), UTF_8)
  }

  /** Merge-import a collection exported by [[exportJson]]: each profile is
    * validated and added; an existing name is skipped unless `overwrite`
    * (the safe default for merging a teammate's export into a live store —
    * import must never silently clobber local tuning). Timestamps refresh
    * to `now` so usage accounting starts clean on the importing side.
    * Returns (imported, skipped, invalid-names).
    */
  def importJson(json: String, now: Timestamp,
      overwrite: Boolean = false): (Int, Int, Seq[String]) = lock.synchronized {
    val in = mapper.readValue(json.getBytes(UTF_8), classOf[Collection])
    var c = load()
    var imported = 0
    var skipped = 0
    val invalid = Seq.newBuilder[String]
    in.profiles.values.toSeq.sortBy(_.name).foreach { p =>
      val v = validate(p)
      if (!v.valid) invalid += p.name
      else if (c.profiles.contains(p.name) && !overwrite) skipped += 1
      else {
        c = c.copy(profiles = c.profiles + (p.name -> p.copy(
          created_at_ms = now.getTime, updated_at_ms = now.getTime,
          usage = UsageStats())))
        imported += 1
      }
    }
    save(c)
    (imported, skipped, invalid.result())
  }
}
