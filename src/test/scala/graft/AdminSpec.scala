package graft

import graft.model.{Sessions, Settings, SettingsProvider, Teams}
import org.scalatest.funsuite.AnyFunSuite

/** Admin-plane registries (reference metadata/src/teams.rs,
  * settings.rs, sessions.rs) — org-scoped teams, validated settings,
  * session liveness with expiry sweep. */
class AdminSpec extends AnyFunSuite {

  test("teams: unique name per org, org-scoped lookups, rename, delete") {
    val teams = new Teams
    val a = teams.create(1L, "Growth", createdBy = 10L, now = 100L)
    val b = teams.create(1L, "Data", createdBy = 10L, now = 101L)
    // same name is fine in ANOTHER org; duplicate within the org rejects
    teams.create(2L, "Growth", createdBy = 20L, now = 102L)
    assertThrows[IllegalArgumentException](teams.create(1L, "Growth", 10L, 103L))

    assert(teams.list(1L).map(_.name) == Seq("Growth", "Data"))
    // a valid id under the wrong org is invisible (no cross-tenant read)
    assert(teams.get(2L, a.id).isEmpty)
    assert(teams.get(1L, a.id).contains(a))

    val renamed = teams.update(1L, b.id, updatedBy = 11L, now = 200L,
      name = Some("Platform"))
    assert(renamed.name == "Platform" && renamed.updatedBy.contains(11L))
    assertThrows[IllegalArgumentException](
      teams.update(1L, b.id, 11L, 201L, name = Some("Growth")))

    teams.delete(1L, a.id)
    assert(teams.list(1L).map(_.name) == Seq("Platform"))
    assertThrows[RuntimeException](teams.delete(1L, a.id))
  }

  test("settings: provider-conditional validation like the reference") {
    val p = new SettingsProvider
    assert(p.load() == Settings())                       // defaults
    // encryption on requires a password
    assertThrows[IllegalArgumentException](
      p.save(Settings(backupEncryptionEnabled = true)))
    // s3 requires bucket/region/keys, field by field
    assertThrows[IllegalArgumentException](p.save(Settings(backupProvider = "s3")))
    assertThrows[IllegalArgumentException](p.save(Settings(backupProvider = "s3",
      backupProviderS3Bucket = "b", backupProviderS3Region = "r")))
    p.save(Settings(backupProvider = "s3", backupProviderS3Bucket = "b",
      backupProviderS3Region = "r", backupProviderS3AccessKey = "ak",
      backupProviderS3SecretKey = "sk"))
    assert(p.load().backupProviderS3Bucket == "b")
    // gcp requires bucket + key; unknown providers reject
    assertThrows[IllegalArgumentException](p.save(Settings(backupProvider = "gcp")))
    assertThrows[IllegalArgumentException](p.save(Settings(backupProvider = "ftp")))
    p.save(Settings(backupProvider = "gcp", backupProviderGcpBucket = "b",
      backupProviderGcpKey = "k"))
    // a failed save leaves the last good document in place
    assertThrows[IllegalArgumentException](p.save(Settings(backupProvider = "ftp")))
    assert(p.load().backupProvider == "gcp")
  }

  test("sessions: is-new semantics, liveness bump, expiry sweep, project clear") {
    val s = new Sessions
    assert(s.setCurrentTime(1L, 7L, 1000L))              // first event → new
    assert(!s.setCurrentTime(1L, 7L, 2000L))             // bump → not new
    assert(s.setCurrentTime(2L, 7L, 1500L))              // same user, other project
    assert(s.getByUserId(1L, 7L).get.createdAtMs == 2000L)

    s.setCurrentTime(1L, 8L, 500L)
    // sweep project 1 with a 1000ms horizon: user 8 (500) dies, 7 (2000) lives
    val dead = s.checkForDeletion(1L)(_.createdAtMs < 1000L)
    assert(dead.map(_.userId) == Seq(8L))
    assert(s.getByUserId(1L, 8L).isEmpty && s.getByUserId(1L, 7L).isDefined)
    assert(s.getByUserId(2L, 7L).isDefined, "sweep is project-scoped")

    s.clearProject(1L)
    assert(s.getByUserId(1L, 7L).isEmpty)
    assert(s.getByUserId(2L, 7L).isDefined)
  }
}
