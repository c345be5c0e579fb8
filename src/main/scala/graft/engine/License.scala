package graft.engine

import java.security.PublicKey

import scala.util.Try

/** Edition / license gating, re-expressing the reference's enterprise
  * feature manager (`/root/reference/src/enterprise/enterprise_features.h:
  * 30-68`, `license_mgr/license_manager.h:26-29`; behavior contract
  * `tests/integration/test_enterprise_gating.cpp`):
  *
  *   - a license is a signed JWT (RS256 against a configured public key)
  *     carrying a `features` claim (comma-separated set) and standard
  *     expiry; an INLINE key wins over a file path; an invalid/expired/
  *     absent license resolves to Core;
  *   - Core rejects the enterprise features with a license error while
  *     basic queries keep working; `GIZMOSQL_EDITION()` reports the
  *     edition ("Core" / "Enterprise");
  *   - divergence, declared: as an embeddable LIBRARY this engine defaults
  *     to [[License.Unrestricted]] (every feature available) when no
  *     licensing config is supplied — the reference BINARY always runs the
  *     license check. Deployments that want the reference's gating pass a
  *     [[License.Config]] to the server.
  */
object License {

  /** The reference's licensed feature names (`enterprise_features.h`). */
  val EnterpriseFeatures: Set[String] = Set(
    "kill_session", "session_tag", "query_tag", "instrumentation",
    "catalog_permissions", "external_auth", "statement_queue",
    "catalog_logging")

  sealed trait Mode {
    def editionName: String
    def isAvailable(feature: String): Boolean
  }

  /** Library default: everything available, no license machinery. */
  case object Unrestricted extends Mode {
    val editionName = "Enterprise"
    def isAvailable(feature: String): Boolean = true
  }

  /** No (valid) license: enterprise features unavailable. */
  case object Core extends Mode {
    val editionName = "Core"
    def isAvailable(feature: String): Boolean = !EnterpriseFeatures.contains(feature)
  }

  /** A validated license: exactly the licensed feature set (an empty
    * `features` claim licenses everything, the reference's site license).
    */
  final case class Licensed(subject: String, features: Set[String]) extends Mode {
    val editionName = "Enterprise"
    def isAvailable(feature: String): Boolean =
      features.isEmpty || features.contains(feature) ||
        !EnterpriseFeatures.contains(feature)
  }

  /** Server-side licensing config: verification key + inline key or file. */
  final case class Config(verifyKey: PublicKey,
      licenseKey: Option[String] = None, licenseFile: Option[String] = None)

  def requiredError(feature: String): String =
    s"The '$feature' feature requires a GizmoSQL Enterprise license"

  /** Parse an X.509 SubjectPublicKeyInfo PEM (`-----BEGIN PUBLIC KEY-----`)
    * into an RSA [[PublicKey]] — the shape a deployment exports its license
    * verification key in.
    */
  def parsePublicKeyPem(pem: String): Option[PublicKey] = Try {
    val b64 = pem.linesIterator
      .filterNot(l => l.startsWith("-----") || l.trim.isEmpty)
      .mkString
    val der = java.util.Base64.getMimeDecoder.decode(b64)
    java.security.KeyFactory.getInstance("RSA")
      .generatePublic(new java.security.spec.X509EncodedKeySpec(der))
  }.toOption

  /** Reference-binary resolution for a SERVER with no explicit
    * [[Config]]: key material from `GIZMOSQL_LICENSE_KEY` (inline JWT,
    * wins) / `GIZMOSQL_LICENSE_KEY_FILE` (`gizmosql_library.cpp:2012-2015`)
    * verified against `GIZMOSQL_LICENSE_VERIFY_KEY` (PEM public key — the
    * reference bakes its vendor key into the binary,
    * `license_mgr/license_public_key.h`; a rebuildable library takes it
    * from the environment instead). No verify key or no license ⇒ Core,
    * exactly like the reference binary without a license.
    */
  def fromEnv(env: String => Option[String] = k => sys.env.get(k).filter(_.nonEmpty)): Mode =
    env("GIZMOSQL_LICENSE_VERIFY_KEY").flatMap(parsePublicKeyPem) match {
      case None => Core
      case Some(key) => initialize(Config(key,
        licenseKey = env("GIZMOSQL_LICENSE_KEY"),
        licenseFile = env("GIZMOSQL_LICENSE_KEY_FILE")))
    }

  /** Resolve the mode from config. Inline key wins over the file; any
    * validation failure (bad signature, expiry, malformed) logs and
    * resolves to Core — a bad license must never take the server down.
    */
  def initialize(cfg: Config): Mode = {
    val raw: Option[String] = cfg.licenseKey.filter(_.nonEmpty).orElse(
      cfg.licenseFile.filter(_.nonEmpty).flatMap { p =>
        Try(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
          java.nio.charset.StandardCharsets.UTF_8).trim).toOption
      })
    raw match {
      case None => Core
      case Some(token) =>
        Try {
          val claims = io.jsonwebtoken.Jwts.parser()
            .verifyWith(cfg.verifyKey).build()
            .parseSignedClaims(token).getPayload
          val features = Option(claims.get("features", classOf[String]))
            .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
            .getOrElse(Set.empty[String])
          Licensed(Option(claims.getSubject).getOrElse(""), features)
        }.fold(
          e => {
            GraftLog.warn("license",
              s"invalid license — running as Core edition: ${e.getMessage}")
            Core
          },
          identity)
    }
  }
}
