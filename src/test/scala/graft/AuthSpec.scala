package graft

import java.nio.charset.StandardCharsets

import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Tenancy + auth registries (reference metadata/src/organizations.rs,
  * projects.rs, accounts.rs; platform/src/auth). Pure JVM — no Spark. */
class AuthSpec extends AnyFunSuite {

  private val key = "test-signing-key".getBytes(StandardCharsets.UTF_8)
  private val salt = Array.fill[Byte](16)(7)

  private def tenancyWithAccount(): (Tenancy, Account) = {
    val t = new Tenancy
    val acc = t.createAccount("o@example.com", "Str0ng!pass", Some("Owner"),
      now = 1000L, salt = Some(salt))
    (t, acc)
  }

  test("password hash verifies and rejects the wrong password") {
    val h = Password.hash("Str0ng!pass", salt)
    assert(h.startsWith("pbkdf2-sha512$"))
    assert(Password.verify("Str0ng!pass", h))
    assert(!Password.verify("Str0ng!pas", h))
    assert(!Password.verify("Str0ng!pass", "garbage"))
    // deterministic given the salt (tests can pin fixtures)
    assert(Password.hash("Str0ng!pass", salt) == h)
  }

  test("password complexity mirrors the reference's zxcvbn gate") {
    assert(Password.checkComplexity("short", Seq()).isLeft)
    assert(Password.checkComplexity("alllowercase", Seq()).isLeft)   // 1 class
    assert(Password.checkComplexity("Str0ng!pass", Seq()).isRight)
    // contains the email local part → rejected (provider.rs:63 user_inputs)
    assert(Password.checkComplexity("alice!A1x", Seq("alice@example.com")).isLeft)
  }

  test("HS512 JWT round-trips; tampering and expiry are rejected") {
    val tok = Token.makeAccess(accountId = 7, organizationId = 3,
      expiresAtSec = 2000, key = key)
    assert(tok.count(_ == '.') == 2)
    val claims = Token.parseAccess(tok, key, nowSec = 1000).toOption.get
    assert(claims.accountId == 7 && claims.organizationId == 3 && claims.exp == 2000)
    assert(Token.parseAccess(tok, key, nowSec = 3000) == Left("token expired"))
    assert(Token.parseAccess(tok, "other-key".getBytes, 1000) == Left("invalid signature"))
    val Array(h, c, s) = tok.split('.')
    val forged = Seq(h, java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(
      """{"exp":99999,"accountId":1,"organizationId":0}""".getBytes), s).mkString(".")
    assert(Token.parseAccess(forged, key, 1000) == Left("invalid signature"))
    // a refresh token is not accepted where an access token is required
    val refresh = Token.makeRefresh(7, 2000, key)
    assert(Token.parseAccess(refresh, key, 1000) == Left("not an access token"))
  }

  test("organizations enforce unique names and mirror membership onto accounts") {
    val (t, owner) = tenancyWithAccount()
    val org = t.createOrganization("Acme", owner.id, now = 2000L)
    assert(org.members == Seq(owner.id -> "owner"))
    assert(t.account(owner.id).get.organizations == Seq(org.id -> "owner"))
    assertThrows[IllegalArgumentException](t.createOrganization("Acme", owner.id, 0L))

    val bob = t.createAccount("b@example.com", "Str0ng!pass", None, 0L, Some(salt))
    t.addMember(org.id, bob.id, "member")
    assert(t.organization(org.id).get.roleOf(bob.id).contains("member"))
    assert(t.account(bob.id).get.organizations == Seq(org.id -> "member"))
    assertThrows[IllegalArgumentException](t.addMember(org.id, bob.id, "member"))

    t.changeMemberRole(org.id, bob.id, "admin")
    assert(t.organization(org.id).get.roleOf(bob.id).contains("admin"))
    assert(t.account(bob.id).get.organizations == Seq(org.id -> "admin"))

    t.removeMember(org.id, bob.id)
    assert(!t.organization(org.id).get.isMember(bob.id))
    assert(t.account(bob.id).get.organizations.isEmpty)
  }

  test("projects enforce unique name+token, resolve by token, count events") {
    val (t, owner) = tenancyWithAccount()
    val org = t.createOrganization("Acme", owner.id, 0L)
    val p = t.createProject(org.id, "Shop", "t_shop", owner.id, now = 3000L)
    assertThrows[IllegalArgumentException](
      t.createProject(org.id, "Shop", "t_other", owner.id, 0L))
    assertThrows[IllegalArgumentException](
      t.createProject(org.id, "Other", "t_shop", owner.id, 0L))
    assert(t.projectByToken("t_shop").map(_.id).contains(p.id))
    assert(t.projectByToken("nope").isEmpty)
    t.incrementEventsCounter(p.id, by = 5)
    assert(t.project(p.id).get.eventsCount == 5)
    // deleting an org with live projects is refused; after project delete it works
    assertThrows[IllegalArgumentException](t.deleteOrganization(org.id))
    t.deleteProject(p.id)
    t.deleteOrganization(org.id)
    assert(t.organization(org.id).isEmpty)
    assert(t.account(owner.id).get.organizations.isEmpty)
  }

  test("sign-up, log-in, refresh, and switch-organization flows") {
    val (t, owner) = tenancyWithAccount()
    val org = t.createOrganization("Acme", owner.id, 0L)
    var now = 1000L
    val auth = new Auth(t, key, accessSeconds = 60, refreshSeconds = 600,
      clock = () => now)

    val tokens = auth.logIn("o@example.com", "Str0ng!pass", orgId = Some(org.id))
    val claims = auth.authenticate(tokens.accessToken).toOption.get
    assert(claims.accountId == owner.id && claims.organizationId == org.id)

    // wrong password and unknown email raise the same opaque error
    val e1 = intercept[IllegalArgumentException](auth.logIn("o@example.com", "bad"))
    val e2 = intercept[IllegalArgumentException](auth.logIn("x@example.com", "bad"))
    assert(e1.getMessage == "invalid credentials" && e2.getMessage == e1.getMessage)

    // requesting an org the account is not a member of degrades to org 0
    val stranger = auth.signUp("s@example.com", "Str0ng!pass2", None)
    assert(auth.authenticate(stranger.accessToken).toOption.get.organizationId == 0L)
    val t2 = auth.logIn("s@example.com", "Str0ng!pass2", orgId = Some(org.id))
    assert(auth.authenticate(t2.accessToken).toOption.get.organizationId == 0L)
    assertThrows[IllegalArgumentException](
      auth.switchOrganization(t2.accessToken, org.id))

    // access token expires at 60s; refresh mints a new pair
    now += 120
    assert(auth.authenticate(tokens.accessToken) == Left("token expired"))
    val renewed = auth.refresh(tokens.refreshToken)
    assert(auth.authenticate(renewed.accessToken).toOption.get.accountId == owner.id)
    now += 600
    assertThrows[IllegalArgumentException](auth.refresh(tokens.refreshToken))
  }

  test("project access walks project roles then organization roles") {
    val (t, owner) = tenancyWithAccount()
    val org = t.createOrganization("Acme", owner.id, 0L)
    val p = t.createProject(org.id, "Shop", "t_shop", owner.id, 0L)
    val reader = t.createAccount("r@example.com", "Str0ng!pass", None, 0L, Some(salt))
    val outsider = t.createAccount("x@example.com", "Str0ng!pass", None, 0L, Some(salt))

    assert(t.canExploreProject(owner.id, p.id))       // org owner
    assert(!t.canExploreProject(reader.id, p.id))
    t.addProjectRole(reader.id, p.id, "reader")
    assert(t.canExploreProject(reader.id, p.id))      // project reader may explore
    assert(!t.canExploreProject(outsider.id, p.id))
    t.addMember(org.id, outsider.id, "member")        // org member ≠ project access
    assert(!t.canExploreProject(outsider.id, p.id))
    assertThrows[IllegalArgumentException](t.addProjectRole(reader.id, p.id, "reader"))
    assertThrows[IllegalArgumentException](t.addProjectRole(reader.id, 999L, "reader"))
  }

  test("global admin role short-circuits project walks; deleteAccount scrubs orgs") {
    val (t, owner) = tenancyWithAccount()
    val org = t.createOrganization("Acme", owner.id, 0L)
    val p = t.createProject(org.id, "Shop", "t_shop", owner.id, 0L)
    val outsider = t.createAccount("x@example.com", "Str0ng!pass", None, 0L, Some(salt))
    assert(!t.canExploreProject(outsider.id, p.id))
    // admin reaches every project and schema with no membership at all
    t.setAccountRole(outsider.id, Some("admin"), 0L)
    assert(t.canExploreProject(outsider.id, p.id))
    assert(t.canManageSchema(outsider.id, p.id))
    assertThrows[IllegalArgumentException](
      t.setAccountRole(outsider.id, Some("sudo"), 0L))
    t.setAccountRole(outsider.id, None, 0L)
    assert(!t.canExploreProject(outsider.id, p.id))
    // deleting a member account removes it from org member lists
    t.addMember(org.id, outsider.id, "member")
    t.deleteAccount(outsider.id)
    assert(t.organization(org.id).exists(!_.isMember(outsider.id)))
  }

  test("deleteProject scrubs mirrored project roles from accounts") {
    val (t, owner) = tenancyWithAccount()
    val org = t.createOrganization("Acme", owner.id, 0L)
    val p = t.createProject(org.id, "Shop", "t_shop", owner.id, 0L)
    val reader = t.createAccount("r@example.com", "Str0ng!pass", None, 0L, Some(salt))
    t.addProjectRole(reader.id, p.id, "reader")
    t.deleteProject(p.id)
    // no stale grant survives its project (mirrors deleteOrganization)
    assert(t.account(reader.id).get.projects.isEmpty)
    assert(!t.canExploreProject(reader.id, p.id))
  }

  test("account creation validates email, uniqueness, and complexity") {
    val t = new Tenancy
    assertThrows[IllegalArgumentException](
      t.createAccount("not-an-email", "Str0ng!pass", None, 0L))
    assertThrows[IllegalArgumentException](
      t.createAccount("a@example.com", "weak", None, 0L))
    t.createAccount("a@example.com", "Str0ng!pass", None, 0L, Some(salt))
    assertThrows[IllegalArgumentException](
      t.createAccount("a@example.com", "Str0ng!pass", None, 0L, Some(salt)))
  }
}
