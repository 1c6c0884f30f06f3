package graft.model

import scala.collection.mutable

/** Admin-plane metadata: teams, server settings, and server-side user
  * sessions — the reference's remaining metadata registries (reference
  * metadata/src/teams.rs, settings.rs, sessions.rs). Like [[Tenancy]]
  * and [[Reports]] these are driver-side tiny (the reference keeps
  * them in RocksDB): in-memory registries with the same unique
  * indexes, id sequences, and validation. None of them touch the data
  * path — the query plans never consult them — which is why they are
  * unit-tested rather than oracled.
  */

// ---------------------------------------------------------------
// Teams (teams.rs:46-182)
// ---------------------------------------------------------------

final case class Team(
    id: Long, organizationId: Long, name: String, createdBy: Long,
    createdAt: Long = 0L, updatedAt: Option[Long] = None,
    updatedBy: Option[Long] = None)

/** Org-scoped team registry (teams.rs:71-182): unique name per
  * organization, monotonic ids, rename via update. */
final class Teams {
  private var nextId = 0L
  private val teams = mutable.LinkedHashMap.empty[Long, Team]

  def create(organizationId: Long, name: String, createdBy: Long, now: Long): Team = {
    require(!teams.values.exists(t =>
        t.organizationId == organizationId && t.name == name),
      s"team $name already exists")
    nextId += 1
    val t = Team(nextId, organizationId, name, createdBy, createdAt = now)
    teams(t.id) = t
    t
  }

  /** teams.rs:104-108 — lookups are org-scoped: a valid id under the
    * wrong organization is "not found", not a cross-tenant read. */
  def get(organizationId: Long, id: Long): Option[Team] =
    teams.get(id).filter(_.organizationId == organizationId)

  def list(organizationId: Long): Seq[Team] =
    teams.values.filter(_.organizationId == organizationId).toSeq

  def update(organizationId: Long, id: Long, updatedBy: Long, now: Long,
             name: Option[String] = None): Team = {
    val cur = get(organizationId, id).getOrElse(sys.error(s"team $id not found"))
    name.foreach(n => require(!teams.values.exists(t =>
        t.id != id && t.organizationId == organizationId && t.name == n),
      s"team $n already exists"))
    val next = cur.copy(name = name.getOrElse(cur.name),
      updatedAt = Some(now), updatedBy = Some(updatedBy))
    teams(id) = next
    next
  }

  def delete(organizationId: Long, id: Long): Team = {
    val t = get(organizationId, id).getOrElse(sys.error(s"team $id not found"))
    teams.remove(id)
    t
  }
}

// ---------------------------------------------------------------
// Settings (settings.rs:29-160)
// ---------------------------------------------------------------

/** Server settings document (settings.rs:29-75). One flat record, the
  * reference's field set; backup execution itself is scoped out
  * (SURVEY §2.1 — immutable parquet is the backup) but the settings
  * surface a UI would edit is real, including the reference's
  * provider-conditional validation. */
final case class Settings(
    authAccessToken: String = "",
    authRefreshToken: String = "",
    authAdminDefaultPassword: String = "",
    backupEnabled: Boolean = false,
    backupEncryptionEnabled: Boolean = false,
    backupEncryptionPassword: String = "",
    backupCompressionEnabled: Boolean = false,
    backupProvider: String = "local",   // local | s3 | gcp
    backupProviderLocalPath: String = "",
    backupProviderS3Bucket: String = "",
    backupProviderS3Path: String = "",
    backupProviderS3Region: String = "",
    backupProviderS3AccessKey: String = "",
    backupProviderS3SecretKey: String = "",
    backupProviderGcpBucket: String = "",
    backupProviderGcpPath: String = "",
    backupProviderGcpKey: String = "",
    backupScheduleInterval: String = "daily",
    backupScheduleStartHour: Int = 0) {

  /** settings.rs:77-123 validate — provider-conditional requireds. */
  def validate(): Either[String, Unit] = {
    if (backupEncryptionEnabled && backupEncryptionPassword.isEmpty)
      return Left("backup encryption password is required")
    backupProvider match {
      case "local" => Right(())
      case "s3" =>
        if (backupProviderS3Bucket.isEmpty) Left("backup provider s3 bucket is required")
        else if (backupProviderS3Region.isEmpty) Left("backup provider s3 region is required")
        else if (backupProviderS3AccessKey.isEmpty) Left("backup provider s3 access key is required")
        else if (backupProviderS3SecretKey.isEmpty) Left("backup provider s3 secret key is required")
        else Right(())
      case "gcp" =>
        if (backupProviderGcpBucket.isEmpty) Left("backup provider gcp bucket is required")
        else if (backupProviderGcpKey.isEmpty) Left("backup provider gcp key is required")
        else Right(())
      case other => Left(s"unknown backup provider: $other")
    }
  }
}

/** load/save pair over a single settings document (settings.rs:125-160
  * SettingsProvider — RocksDB there, an in-memory slot here). save
  * validates first; load of a never-saved store yields defaults. */
final class SettingsProvider {
  private var current: Settings = Settings()
  def load(): Settings = current
  def save(s: Settings): Unit = s.validate() match {
    case Left(msg) => throw new IllegalArgumentException(msg)
    case Right(()) => current = s
  }
}

// ---------------------------------------------------------------
// Backups (reference platform/src/backups.rs:87-106 Backup{id,
// created_at, provider, status: Idle|InProgress|…|Failed|Completed};
// metadata/src/backups.rs persists the records)
// ---------------------------------------------------------------

final case class BackupRecord(
    id: Long, createdAtMs: Long, provider: String, path: String,
    status: String, files: Int = 0, bytes: Long = 0L,
    updatedAtMs: Option[Long] = None, error: Option[String] = None)

/** Backup run bookkeeping — records move InProgress → Completed or
  * Failed(error), like the reference's status enum; the archive
  * itself is [[graft.sources.Backup]]'s job. Synchronized: the JDK
  * HTTP server dispatches handlers concurrently, and an unsynchronized
  * counter would hand two simultaneous runs the same record id. */
final class Backups {
  private var next = 0L
  private val items = mutable.LinkedHashMap.empty[Long, BackupRecord]

  def start(provider: String, path: String, now: Long): BackupRecord =
    synchronized {
      next += 1
      val b = BackupRecord(next, now, provider, path, "inProgress")
      items(b.id) = b
      b
    }
  def complete(id: Long, files: Int, bytes: Long, now: Long): BackupRecord =
    synchronized {
      val b = items(id).copy(status = "completed", files = files, bytes = bytes,
        updatedAtMs = Some(now))
      items(id) = b
      b
    }
  def fail(id: Long, error: String, now: Long): BackupRecord =
    synchronized {
      val b = items(id).copy(status = "failed", error = Some(error),
        updatedAtMs = Some(now))
      items(id) = b
      b
    }
  def repath(id: Long, path: String): BackupRecord =
    synchronized {
      val b = items(id).copy(path = path)
      items(id) = b
      b
    }
  def get(id: Long): Option[BackupRecord] = synchronized { items.get(id) }
  def list(): Seq[BackupRecord] = synchronized { items.values.toSeq }
}

// ---------------------------------------------------------------
// Sessions (sessions.rs:28-140)
// ---------------------------------------------------------------

final case class UserSession(userId: Long, createdAtMs: Long)

/** Server-side session liveness per (project, user) — the reference
  * bumps `created_at` on every tracked event and a sweeper deletes
  * sessions a callback deems expired (sessions.rs:75-133; the
  * ingester emits a synthetic session-end event when one dies). */
final class Sessions {
  private val byKey = mutable.LinkedHashMap.empty[(Long, Long), UserSession]

  def getByUserId(projectId: Long, userId: Long): Option[UserSession] =
    byKey.get((projectId, userId))

  /** Returns true when the session is NEW (first event for the user),
    * mirroring sessions.rs:75-102 set_current_time's is_new. */
  def setCurrentTime(projectId: Long, userId: Long, timeMs: Long): Boolean = {
    val isNew = !byKey.contains((projectId, userId))
    byKey((projectId, userId)) = UserSession(userId, timeMs)
    isNew
  }

  def clearProject(projectId: Long): Unit =
    byKey.keys.filter(_._1 == projectId).toSeq.foreach(byKey.remove)

  /** Delete every session of the project the callback marks expired;
    * returns the deleted sessions (the caller emits session-end
    * events for them, ingester executor.rs session handling). */
  def checkForDeletion(projectId: Long)(expired: UserSession => Boolean): Seq[UserSession] = {
    val dead = byKey.collect {
      case (k @ (pid, _), s) if pid == projectId && expired(s) => (k, s)
    }.toSeq
    dead.foreach { case (k, _) => byKey.remove(k) }
    dead.map(_._2)
  }
}
