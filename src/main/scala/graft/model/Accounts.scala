package graft.model

import java.nio.charset.StandardCharsets
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}
import javax.crypto.SecretKeyFactory

import scala.collection.mutable

/** Organizations / projects / accounts / auth — the reference's tenancy
  * and identity registries (reference metadata/src/organizations.rs:43-229,
  * projects.rs:46-197, accounts.rs:45-177; auth platform/src/auth/
  * provider.rs, token.rs, password.rs; RBAC common/src/rbac.rs).
  *
  * Like [[Reports]], these are driver-side tiny (the reference keeps
  * them in RocksDB): plain in-memory registries with the same unique
  * indexes (org name; project name AND ingest token; account email),
  * the same id sequences, and the same cross-registry bookkeeping
  * (org membership mirrored onto the account, organizations.rs:88-89).
  * The data-scale enforcement point stays where it always was — every
  * query plan carries `Exprs.tenantScope(project_id)`; these registries
  * decide WHICH project id a caller may use.
  *
  * Divergences, deliberate and documented:
  *  - passwords: the reference hashes with Argon2 (password.rs:7-17);
  *    this build uses the JDK's PBKDF2-HmacSHA512 (no new dependency),
  *    same salted-verify contract.
  *  - token: the reference signs HS512 JWTs (token.rs:32-42 via
  *    jsonwebtoken); this build emits real RFC 7519 JWTs with an
  *    HmacSHA512 signature over base64url(header).base64url(claims) —
  *    interoperable shape, JDK crypto only.
  *  - complexity: the reference scores with zxcvbn (<3 rejected,
  *    password.rs:23-36); this build uses a deterministic heuristic
  *    (length + character classes + not-containing-email).
  */
object Rbac {
  // common/src/rbac.rs:32-36, 54-59
  val OrgRoles: Set[String] = Set("owner", "admin", "member")
  val ProjectRoles: Set[String] = Set("owner", "admin", "member", "reader")

  /** Role → permission expansion, common/src/rbac.rs:62-96. "all"
    * short-circuits membership tests. */
  val orgPermissions: Map[String, Set[String]] = Map(
    "owner" -> Set("all"),
    "admin" -> Set("manage_projects"),
    "member" -> Set.empty)

  val projectPermissions: Map[String, Set[String]] = Map(
    "owner" -> Set("all"),
    "admin" -> Set("manage_project", "invite_members", "manage_members",
      "explore_reports", "manage_reports", "view_schema", "manage_schema"),
    "member" -> Set("explore_reports", "manage_reports", "view_schema"),
    "reader" -> Set("explore_reports", "view_schema"))

  def orgAllows(role: String, permission: String): Boolean = {
    val ps = orgPermissions.getOrElse(role, Set.empty)
    ps.contains("all") || ps.contains(permission)
  }
  def projectAllows(role: String, permission: String): Boolean = {
    val ps = projectPermissions.getOrElse(role, Set.empty)
    ps.contains("all") || ps.contains(permission)
  }
}

final case class Organization(
    id: Long, name: String, createdBy: Long,
    members: Seq[(Long, String)],      // (accountId, org role)
    createdAt: Long = 0L, updatedAt: Option[Long] = None,
    updatedBy: Option[Long] = None) {
  def isMember(accountId: Long): Boolean = members.exists(_._1 == accountId)
  def roleOf(accountId: Long): Option[String] =
    members.find(_._1 == accountId).map(_._2)
}

final case class Project(
    id: Long, organizationId: Long, name: String, token: String,
    createdBy: Long, sessionDurationSeconds: Long = 3600L,
    description: Option[String] = None, tags: Seq[String] = Nil,
    eventsCount: Long = 0L,
    createdAt: Long = 0L, updatedAt: Option[Long] = None)

final case class Account(
    id: Long, email: String, name: Option[String], passwordHash: String,
    /** GLOBAL role (reference common/src/rbac.rs:63 `PERMISSIONS` —
      * only Admin exists, granting Permission::All; context.rs
      * check_permission consults it before any org/project walk).
      * The first admin is bootstrapped programmatically, like the
      * reference's init-time admin account. */
    role: Option[String] = None,
    organizations: Seq[(Long, String)] = Nil,  // (orgId, org role)
    projects: Seq[(Long, String)] = Nil,       // (projectId, project role)
    forceUpdatePassword: Boolean = false, forceUpdateEmail: Boolean = false,
    createdAt: Long = 0L, updatedAt: Option[Long] = None)

object Password {
  private val Iterations = 120000
  private val KeyBits = 512

  /** Salted PBKDF2-HmacSHA512, self-describing format
    * `pbkdf2-sha512$iter$saltB64$hashB64` (the reference's Argon2 PHC
    * string plays the same role, password.rs:14-16). Salt is
    * caller-suppliable so tests stay deterministic. */
  def hash(password: String,
           salt: Array[Byte] = randomSalt()): String = {
    val dk = derive(password, salt, Iterations)
    val b64 = Base64.getEncoder
    s"pbkdf2-sha512$$$Iterations$$${b64.encodeToString(salt)}$$${b64.encodeToString(dk)}"
  }

  def verify(password: String, stored: String): Boolean =
    stored.split('$') match {
      case Array("pbkdf2-sha512", iter, saltB64, hashB64) =>
        val b64 = Base64.getDecoder
        val expect = b64.decode(hashB64)
        val got = derive(password, b64.decode(saltB64), iter.toInt)
        java.security.MessageDigest.isEqual(expect, got) // constant-time
      case _ => false
    }

  /** Reference: zxcvbn score < 3 is "too simple" (password.rs:23-36);
    * deterministic stand-in: ≥8 chars, ≥3 character classes, must not
    * contain any user input (the email's local part, provider.rs:63). */
  def checkComplexity(password: String, userInputs: Seq[String]): Either[String, Unit] = {
    if (password.length < 8) return Left("password is too simple")
    val classes = Seq(password.exists(_.isLower),
      password.exists(_.isUpper), password.exists(_.isDigit),
      password.exists(c => !c.isLetterOrDigit)).count(identity)
    if (classes < 3) return Left("password is too simple")
    val lower = password.toLowerCase
    val hit = userInputs.iterator.map(_.toLowerCase)
      .flatMap(s => Seq(s) ++ s.split('@').headOption)
      .filter(_.length >= 4).find(lower.contains)
    if (hit.isDefined) Left("password contains personal information")
    else Right(())
  }

  private def derive(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, KeyBits)
    SecretKeyFactory.getInstance("PBKDF2WithHmacSHA512")
      .generateSecret(spec).getEncoded
  }

  private def randomSalt(): Array[Byte] = {
    val b = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(b)
    b
  }
}

/** HS512 JWTs, shape-compatible with the reference's jsonwebtoken output
  * (token.rs:15-30: access claims {exp, accountId, organizationId},
  * refresh claims {exp, accountId}, camelCase). */
object Token {
  final case class AccessClaims(exp: Long, accountId: Long, organizationId: Long)
  final case class RefreshClaims(exp: Long, accountId: Long)

  private val Header = b64url("""{"alg":"HS512","typ":"JWT"}""".getBytes(StandardCharsets.UTF_8))

  def makeAccess(accountId: Long, organizationId: Long, expiresAtSec: Long,
                 key: Array[Byte]): String =
    sign(s"""{"exp":$expiresAtSec,"accountId":$accountId,"organizationId":$organizationId}""", key)

  def makeRefresh(accountId: Long, expiresAtSec: Long, key: Array[Byte]): String =
    sign(s"""{"exp":$expiresAtSec,"accountId":$accountId}""", key)

  def parseAccess(token: String, key: Array[Byte], nowSec: Long): Either[String, AccessClaims] =
    payload(token, key, nowSec).flatMap { j =>
      (j.asOpt("accountId"), j.asOpt("organizationId")) match {
        case (Some(a), Some(o)) =>
          Right(AccessClaims((j / "exp").long, a.long, o.long))
        case _ => Left("not an access token")
      }
    }

  def parseRefresh(token: String, key: Array[Byte], nowSec: Long): Either[String, RefreshClaims] =
    payload(token, key, nowSec).flatMap { j =>
      j.asOpt("accountId") match {
        case Some(a) => Right(RefreshClaims((j / "exp").long, a.long))
        case None    => Left("not a refresh token")
      }
    }

  private def sign(claimsJson: String, key: Array[Byte]): String = {
    val body = Header + "." + b64url(claimsJson.getBytes(StandardCharsets.UTF_8))
    body + "." + b64url(hmac(body, key))
  }

  private def payload(token: String, key: Array[Byte], nowSec: Long): Either[String, Json.JValue] =
    token.split('.') match {
      case Array(h, c, s) =>
        // decode/parse failures are a property of the TOKEN, not the
        // request shape — fold them into the same Left the signature
        // check produces so callers map every bad token to 401, never
        // a 400 with a decoder message
        try {
          val body = h + "." + c
          if (!java.security.MessageDigest.isEqual(
                Base64.getUrlDecoder.decode(s), hmac(body, key)))
            Left("invalid signature")
          else {
            val j = Json.parse(new String(Base64.getUrlDecoder.decode(c), StandardCharsets.UTF_8))
            if ((j / "exp").long < nowSec) Left("token expired") else Right(j)
          }
        } catch {
          case _: IllegalArgumentException | _: Json.JsonError =>
            Left("malformed token")
        }
      case _ => Left("malformed token")
    }

  private def hmac(body: String, key: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA512")
    mac.init(new SecretKeySpec(key, "HmacSHA512"))
    mac.doFinal(body.getBytes(StandardCharsets.UTF_8))
  }

  private def b64url(bytes: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)
}

/** The three registries plus the auth provider, one mutable façade like
  * [[Reports]]. Timestamps are caller-supplied for determinism. */
final class Tenancy {
  private var nextOrg = 0L
  private var nextProject = 0L
  private var nextAccount = 0L
  private val orgs = mutable.LinkedHashMap.empty[Long, Organization]
  private val projects = mutable.LinkedHashMap.empty[Long, Project]
  private val accounts = mutable.LinkedHashMap.empty[Long, Account]

  // ---- organizations (organizations.rs:64-228) ----

  def createOrganization(name: String, createdBy: Long, now: Long): Organization = {
    require(accounts.contains(createdBy), s"account $createdBy not found")
    require(!orgs.values.exists(_.name == name), s"organization $name already exists")
    nextOrg += 1
    val org = Organization(nextOrg, name, createdBy,
      members = Seq(createdBy -> "owner"), createdAt = now)
    orgs(org.id) = org
    mirrorOrgOntoAccount(createdBy, org.id, "owner")
    org
  }

  def organization(id: Long): Option[Organization] = orgs.get(id)
  def listOrganizations(): Seq[Organization] = orgs.values.toSeq

  def renameOrganization(id: Long, name: String, updatedBy: Long, now: Long): Organization = {
    val cur = orgs.getOrElse(id, sys.error(s"organization $id not found"))
    require(!orgs.values.exists(o => o.id != id && o.name == name),
      s"organization $name already exists")
    val next = cur.copy(name = name, updatedAt = Some(now), updatedBy = Some(updatedBy))
    orgs(id) = next
    next
  }

  def addMember(orgId: Long, accountId: Long, role: String): Unit = {
    require(Rbac.OrgRoles.contains(role), s"unknown org role: $role")
    val org = orgs.getOrElse(orgId, sys.error(s"organization $orgId not found"))
    require(accounts.contains(accountId), s"account $accountId not found")
    require(!org.isMember(accountId), s"member $accountId already exists")
    orgs(orgId) = org.copy(members = org.members :+ (accountId -> role))
    mirrorOrgOntoAccount(accountId, orgId, role)
  }

  def removeMember(orgId: Long, accountId: Long): Unit = {
    val org = orgs.getOrElse(orgId, sys.error(s"organization $orgId not found"))
    require(org.isMember(accountId), s"member $accountId not found")
    orgs(orgId) = org.copy(members = org.members.filterNot(_._1 == accountId))
    accounts.get(accountId).foreach { a =>
      accounts(accountId) = a.copy(organizations = a.organizations.filterNot(_._1 == orgId))
    }
  }

  def changeMemberRole(orgId: Long, accountId: Long, role: String): Unit = {
    require(Rbac.OrgRoles.contains(role), s"unknown org role: $role")
    val org = orgs.getOrElse(orgId, sys.error(s"organization $orgId not found"))
    require(org.isMember(accountId), s"member $accountId not found")
    orgs(orgId) = org.copy(members = org.members.map {
      case (id, _) if id == accountId => id -> role
      case other                      => other
    })
    accounts.get(accountId).foreach { a =>
      accounts(accountId) = a.copy(organizations = a.organizations.map {
        case (id, _) if id == orgId => id -> role
        case other                  => other
      })
    }
  }

  def deleteOrganization(id: Long): Organization = {
    val org = orgs.getOrElse(id, sys.error(s"organization $id not found"))
    require(!projects.values.exists(_.organizationId == id),
      s"organization $id still has projects")
    orgs.remove(id)
    org.members.foreach { case (accId, _) =>
      accounts.get(accId).foreach { a =>
        accounts(accId) = a.copy(organizations = a.organizations.filterNot(_._1 == id))
      }
    }
    org
  }

  // ---- projects (projects.rs:66-196) ----

  def createProject(organizationId: Long, name: String, token: String,
                    createdBy: Long, now: Long,
                    sessionDurationSeconds: Long = 3600L,
                    description: Option[String] = None,
                    tags: Seq[String] = Nil): Project = {
    require(orgs.contains(organizationId), s"organization $organizationId not found")
    require(!projects.values.exists(_.name == name), s"project $name already exists")
    require(!projects.values.exists(_.token == token), s"project token already in use")
    nextProject += 1
    val p = Project(nextProject, organizationId, name, token, createdBy,
      sessionDurationSeconds, description, tags, createdAt = now)
    projects(p.id) = p
    p
  }

  def project(id: Long): Option[Project] = projects.get(id)

  /** Ingest-token resolution — the ingester's per-request entry point
    * (projects.rs:101-109 get_by_token; ingester/src/executor.rs:123). */
  def projectByToken(token: String): Option[Project] =
    projects.values.find(_.token == token)

  def listProjects(organizationId: Long): Seq[Project] =
    projects.values.filter(_.organizationId == organizationId).toSeq

  /** All projects across organizations (projects.rs:119-127 list). */
  def listProjects(): Seq[Project] = projects.values.toSeq

  def updateProject(id: Long, updatedBy: Long, now: Long,
                    name: Option[String] = None, token: Option[String] = None,
                    description: Option[Option[String]] = None,
                    sessionDurationSeconds: Option[Long] = None): Project = {
    val cur = projects.getOrElse(id, sys.error(s"project $id not found"))
    name.foreach(n => require(!projects.values.exists(p => p.id != id && p.name == n),
      s"project $n already exists"))
    token.foreach(t => require(!projects.values.exists(p => p.id != id && p.token == t),
      "project token already in use"))
    val next = cur.copy(
      name = name.getOrElse(cur.name), token = token.getOrElse(cur.token),
      description = description.getOrElse(cur.description),
      sessionDurationSeconds = sessionDurationSeconds.getOrElse(cur.sessionDurationSeconds),
      updatedAt = Some(now))
    projects(id) = next
    next
  }

  /** projects.rs:176-186 — the ingester bumps this per tracked event. */
  def incrementEventsCounter(id: Long, by: Long = 1L): Unit = {
    val cur = projects.getOrElse(id, sys.error(s"project $id not found"))
    projects(id) = cur.copy(eventsCount = cur.eventsCount + by)
  }

  def deleteProject(id: Long): Project = {
    val p = projects.getOrElse(id, sys.error(s"project $id not found"))
    projects.remove(id)
    // scrub mirrored (projectId, role) entries, same cleanup
    // deleteOrganization does for org memberships — ids are never
    // reused, but a stale grant must not outlive its project
    accounts.mapValuesInPlace { (_, a) =>
      if (a.projects.exists(_._1 == id))
        a.copy(projects = a.projects.filterNot(_._1 == id))
      else a
    }
    p
  }

  // ---- accounts (accounts.rs:64-177) ----

  def createAccount(email: String, password: String, name: Option[String],
                    now: Long, salt: Option[Array[Byte]] = None,
                    forceUpdatePassword: Boolean = false,
                    forceUpdateEmail: Boolean = false): Account = {
    require(email.matches("^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$"), "invalid email")
    require(!accounts.values.exists(_.email == email), "account already exists")
    Password.checkComplexity(password, Seq(email)) match {
      case Left(msg) => throw new IllegalArgumentException(msg)
      case Right(()) =>
    }
    nextAccount += 1
    val hash = salt.map(Password.hash(password, _)).getOrElse(Password.hash(password))
    val a = Account(nextAccount, email, name, hash, createdAt = now,
      forceUpdatePassword = forceUpdatePassword, forceUpdateEmail = forceUpdateEmail)
    accounts(a.id) = a
    a
  }

  /** Flip the first-login force flags (reference metadata
    * UpdateAccountRequest.force_update_password/email — admin
    * provisioning sets them, Auth.set_password/set_email clear them). */
  def setForceUpdateFlags(accountId: Long, password: Option[Boolean],
                          email: Option[Boolean], now: Long): Account = {
    val cur = accounts.getOrElse(accountId, sys.error(s"account $accountId not found"))
    val next = cur.copy(
      forceUpdatePassword = password.getOrElse(cur.forceUpdatePassword),
      forceUpdateEmail = email.getOrElse(cur.forceUpdateEmail),
      updatedAt = Some(now))
    accounts(accountId) = next
    next
  }

  def account(id: Long): Option[Account] = accounts.get(id)
  def accountByEmail(email: String): Option[Account] =
    accounts.values.find(_.email == email)
  def listAccounts(): Seq[Account] = accounts.values.toSeq

  /** Global role management (reference metadata/src/accounts.rs:253
    * `role: Option<Role>`; rbac.rs:63 Admin→All). */
  def setAccountRole(accountId: Long, role: Option[String], now: Long): Account = {
    role.foreach(r => require(r == "admin", s"unknown global role: $r"))
    val cur = accounts.getOrElse(accountId, sys.error(s"account $accountId not found"))
    val next = cur.copy(role = role, updatedAt = Some(now))
    accounts(accountId) = next
    next
  }

  def isGlobalAdmin(accountId: Long): Boolean =
    accounts.get(accountId).exists(_.role.contains("admin"))

  /** Delete an account and scrub its memberships from every
    * organization (the mirror of deleteOrganization's cleanup). */
  def deleteAccount(id: Long): Account = {
    val a = accounts.getOrElse(id, sys.error(s"account $id not found"))
    accounts.remove(id)
    orgs.mapValuesInPlace { (_, o) =>
      if (o.isMember(id)) o.copy(members = o.members.filterNot(_._1 == id)) else o
    }
    a
  }

  /** Profile self-service updates (reference auth/provider.rs:152-172
    * update_name, accounts.rs update paths). */
  def updateAccountName(accountId: Long, name: String, now: Long): Account = {
    require(name.nonEmpty, "empty name")
    val cur = accounts.getOrElse(accountId, sys.error(s"account $accountId not found"))
    val next = cur.copy(name = Some(name), updatedAt = Some(now))
    accounts(accountId) = next
    next
  }

  def updateAccountEmail(accountId: Long, email: String, now: Long): Account = {
    require(email.matches("^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$"), "invalid email")
    require(!accounts.values.exists(a => a.id != accountId && a.email == email),
      "account already exists")
    val cur = accounts.getOrElse(accountId, sys.error(s"account $accountId not found"))
    val next = cur.copy(email = email, updatedAt = Some(now))
    accounts(accountId) = next
    next
  }

  def setPassword(accountId: Long, password: String, now: Long,
                  salt: Option[Array[Byte]] = None): Account = {
    val cur = accounts.getOrElse(accountId, sys.error(s"account $accountId not found"))
    val hash = salt.map(Password.hash(password, _)).getOrElse(Password.hash(password))
    val next = cur.copy(passwordHash = hash, updatedAt = Some(now))
    accounts(accountId) = next
    next
  }

  def addProjectRole(accountId: Long, projectId: Long, role: String): Unit = {
    require(Rbac.ProjectRoles.contains(role), s"unknown project role: $role")
    require(projects.contains(projectId), s"project $projectId not found")
    val cur = accounts.getOrElse(accountId, sys.error(s"account $accountId not found"))
    require(!cur.projects.exists(_._1 == projectId),
      s"account $accountId already on project $projectId")
    accounts(accountId) = cur.copy(projects = cur.projects :+ (projectId -> role))
  }

  /** May `accountId` read project data? Walks account→project role, then
    * account→org role for the project's org (owner/admin of the org see
    * its projects; reference rbac.rs ORGANIZATION_PERMISSIONS +
    * PROJECT_PERMISSIONS). */
  def canExploreProject(accountId: Long, projectId: Long): Boolean =
    projects.get(projectId).exists { p =>
      // global admin short-circuits every walk (context.rs
      // check_permission runs before the org/project checks)
      isGlobalAdmin(accountId) || {
        val acc = accounts.get(accountId)
        val viaProject = acc.exists(_.projects.exists { case (pid, role) =>
          pid == projectId && Rbac.projectAllows(role, "explore_reports")
        })
        val viaOrg = acc.exists(_.organizations.exists { case (oid, role) =>
          oid == p.organizationId &&
            (Rbac.orgAllows(role, "manage_projects") || role == "owner")
        })
        viaProject || viaOrg
      }
    }

  /** May `accountId` mutate project schema (rename properties, add
    * event names)? Project admins/owners carry manage_schema
    * (rbac.rs PROJECT_PERMISSIONS); org owners and manage_projects
    * admins inherit it, same walk as [[canExploreProject]]. */
  def canManageSchema(accountId: Long, projectId: Long): Boolean =
    projects.get(projectId).exists { p =>
      isGlobalAdmin(accountId) || {
        val acc = accounts.get(accountId)
        val viaProject = acc.exists(_.projects.exists { case (pid, role) =>
          pid == projectId && Rbac.projectAllows(role, "manage_schema")
        })
        val viaOrg = acc.exists(_.organizations.exists { case (oid, role) =>
          oid == p.organizationId &&
            (Rbac.orgAllows(role, "manage_projects") || role == "owner")
        })
        viaProject || viaOrg
      }
    }

  private def mirrorOrgOntoAccount(accountId: Long, orgId: Long, role: String): Unit =
    accounts.get(accountId).foreach { a =>
      require(!a.organizations.exists(_._1 == orgId),
        s"member $accountId already in organization $orgId")
      accounts(accountId) = a.copy(organizations = a.organizations :+ (orgId -> role))
    }
}

/** Sign-up / log-in / refresh flows over [[Tenancy]] (reference
  * platform/src/auth/provider.rs:58-160). Clock and token key are
  * injected; durations default to the reference's config shape. */
object Auth {
  final case class Tokens(accessToken: String, refreshToken: String)
  /** 403-plane failure: the actor is authenticated but the action is
    * not permitted (reference PlatformError::Forbidden). */
  final class ForbiddenError(msg: String) extends RuntimeException(msg)
}

final class Auth(
    tenancy: Tenancy,
    key: Array[Byte],
    accessSeconds: Long = 3600L,
    refreshSeconds: Long = 30L * 24 * 3600,
    clock: () => Long = () => System.currentTimeMillis() / 1000) {
  import Auth.Tokens

  def signUp(email: String, password: String, name: Option[String]): Tokens = {
    val acc = tenancy.createAccount(email, password, name, now = clock() * 1000)
    makeTokens(acc.id, organizationId = 0L)
  }

  /** provider.rs:96-133: bad email or password → the same
    * "invalid credentials" (no account-existence oracle); a requested
    * org the account isn't a member of degrades to org 0. */
  def logIn(email: String, password: String, orgId: Option[Long] = None): Tokens = {
    val acc = tenancy.accountByEmail(email)
      .getOrElse(throw new IllegalArgumentException("invalid credentials"))
    if (!Password.verify(password, acc.passwordHash))
      throw new IllegalArgumentException("invalid credentials")
    val org = orgId.flatMap(tenancy.organization)
      .filter(_.isMember(acc.id)).map(_.id).getOrElse(0L)
    makeTokens(acc.id, org)
  }

  def refresh(refreshToken: String): Tokens =
    Token.parseRefresh(refreshToken, key, clock()) match {
      case Right(claims) => makeTokens(claims.accountId, 0L)
      case Left(msg)     => throw new IllegalArgumentException(msg)
    }

  def switchOrganization(accessToken: String, orgId: Long): Tokens =
    authenticate(accessToken) match {
      case Right(claims) =>
        val org = tenancy.organization(orgId)
          .getOrElse(throw new IllegalArgumentException(s"organization $orgId not found"))
        if (!org.isMember(claims.accountId))
          throw new IllegalArgumentException("not a member")
        makeTokens(claims.accountId, orgId)
      case Left(msg) => throw new IllegalArgumentException(msg)
    }

  def authenticate(accessToken: String): Either[String, Token.AccessClaims] =
    Token.parseAccess(accessToken, key, clock())

  // ---- profile self-service (reference auth/provider.rs:141-250;
  // routes http/auth.rs:217-220) ----

  def profile(accessToken: String): Account =
    withClaims(accessToken)(claims =>
      tenancy.account(claims.accountId)
        .getOrElse(throw new IllegalArgumentException(
          s"account ${claims.accountId} not found")))

  def updateName(accessToken: String, name: String): Account =
    withClaims(accessToken)(claims =>
      tenancy.updateAccountName(claims.accountId, name, clock() * 1000))

  /** Email change demands the CURRENT password (update_email
    * provider.rs:174-219) and rotates the token pair. */
  def updateEmail(accessToken: String, email: String, password: String): Tokens =
    withClaims(accessToken) { claims =>
      verifyCurrent(claims.accountId, password)
      tenancy.updateAccountEmail(claims.accountId, email, clock() * 1000)
      makeTokens(claims.accountId, claims.organizationId)
    }

  /** Password change verifies the current one, complexity-checks the
    * new one, and rotates the token pair (provider.rs:221-250). */
  def updatePassword(accessToken: String, current: String, newPassword: String): Tokens =
    withClaims(accessToken) { claims =>
      verifyCurrent(claims.accountId, current)
      Password.checkComplexity(newPassword, Seq.empty) match {
        case Left(msg) => throw new IllegalArgumentException(msg)
        case Right(()) =>
      }
      tenancy.setPassword(claims.accountId, newPassword, clock() * 1000)
      makeTokens(claims.accountId, claims.organizationId)
    }

  /** First-login password set for admin-provisioned accounts
    * (reference auth/provider.rs:262-295 set_password): permitted ONLY
    * while the account carries force_update_password — no current
    * password exists to verify. Setting it clears the flag and rotates
    * the token pair. */
  def setPassword(accessToken: String, password: String): Tokens =
    withClaims(accessToken) { claims =>
      val acc = tenancy.account(claims.accountId)
        .getOrElse(throw new IllegalArgumentException(
          s"account ${claims.accountId} not found"))
      if (!acc.forceUpdatePassword)
        throw new Auth.ForbiddenError("forbidden")
      // same personal-information rule as createAccount: the email is
      // in scope, so a first-login password may not contain it
      Password.checkComplexity(password, Seq(acc.email)) match {
        case Left(msg) => throw new IllegalArgumentException(msg)
        case Right(()) =>
      }
      tenancy.setPassword(claims.accountId, password, clock() * 1000)
      tenancy.setForceUpdateFlags(claims.accountId,
        password = Some(false), email = None, now = clock() * 1000)
      makeTokens(claims.accountId, claims.organizationId)
    }

  /** First-login email set (provider.rs:297-322 set_email): gated on
    * force_update_email, clears it, rotates tokens. Email format and
    * uniqueness are enforced by the tenancy update. */
  def setEmail(accessToken: String, email: String): Tokens =
    withClaims(accessToken) { claims =>
      val acc = tenancy.account(claims.accountId)
        .getOrElse(throw new IllegalArgumentException(
          s"account ${claims.accountId} not found"))
      if (!acc.forceUpdateEmail)
        throw new Auth.ForbiddenError("forbidden")
      tenancy.updateAccountEmail(claims.accountId, email, clock() * 1000)
      tenancy.setForceUpdateFlags(claims.accountId,
        password = None, email = Some(false), now = clock() * 1000)
      makeTokens(claims.accountId, claims.organizationId)
    }

  private def withClaims[A](accessToken: String)(f: Token.AccessClaims => A): A =
    authenticate(accessToken) match {
      case Right(claims) => f(claims)
      case Left(msg)     => throw new IllegalArgumentException(msg)
    }

  private def verifyCurrent(accountId: Long, password: String): Unit = {
    val acc = tenancy.account(accountId)
      .getOrElse(throw new IllegalArgumentException(s"account $accountId not found"))
    if (!Password.verify(password, acc.passwordHash))
      throw new IllegalArgumentException("invalid password")
  }

  private def makeTokens(accountId: Long, organizationId: Long): Tokens = Tokens(
    Token.makeAccess(accountId, organizationId, clock() + accessSeconds, key),
    Token.makeRefresh(accountId, clock() + refreshSeconds, key))
}
