package graft.engine

import io.jsonwebtoken.Jwts
import java.security.PublicKey
import java.util.UUID
import scala.util.Try

/** OIDC-style bootstrap-token authentication, re-implementing the
  * reference's external-JWT path (`/root/reference/src/common/
  * gizmosql_security.cpp:533-557, 560-700`): the client authenticates with
  * username `token` and an externally-minted JWT as the password; the server
  * verifies it against the identity provider's public key (static-cert mode
  * — the JWKS-fetch variant needs egress), checks issuer + audience + expiry,
  * maps the role claim (or a default role), applies the email allow-list,
  * and then mints its own internal session token via [[Auth]].
  */
object TokenAuth {

  final case class Config(
      issuer: String,
      audience: String,
      publicKey: PublicKey,
      roleClaim: String = "role",
      defaultRole: String = "user",
      allowedEmails: Set[String] = Set.empty)

  /** The magic username that routes Basic auth into the token path. */
  val TokenUsername = "token"

  /** Verify an external JWT and produce the internal identity. */
  def authenticate(cfg: Config, externalJwt: String, instanceId: String): Either[String, Auth.Identity] =
    Try {
      Jwts.parser()
        .verifyWith(cfg.publicKey)
        .requireIssuer(cfg.issuer)
        .requireAudience(cfg.audience)
        .build()
        .parseSignedClaims(externalJwt)
        .getPayload
    }.toEither.left.map(e => s"invalid bootstrap token: ${e.getMessage}")
      .flatMap(claimsToIdentity(cfg.roleClaim, cfg.defaultRole, cfg.allowedEmails,
        instanceId, _))

  /** JWKS-backed verification (the reference's live mode,
    * `jwks_manager.cpp`): the key is located by the token header's `kid`
    * from the [[JwksManager]]'s current set, so IdP key rotation works
    * without a server restart.
    */
  final case class JwksConfig(
      issuer: String,
      audience: String,
      jwks: JwksManager,
      roleClaim: String = "role",
      defaultRole: String = "user",
      allowedEmails: Set[String] = Set.empty)

  def authenticateJwks(cfg: JwksConfig, externalJwt: String,
      instanceId: String): Either[String, Auth.Identity] =
    Try {
      Jwts.parser()
        .keyLocator { header =>
          val kid = header match {
            case h: io.jsonwebtoken.JwsHeader => Option(h.getKeyId)
            case _ => None
          }
          cfg.jwks.keyFor(kid).getOrElse(throw new io.jsonwebtoken.security.InvalidKeyException(
            s"no JWKS key for kid '${kid.getOrElse("<absent>")}'" +
              cfg.jwks.lastError.map(e => s" (last JWKS load error: $e)").getOrElse("")))
        }
        .requireIssuer(cfg.issuer)
        .requireAudience(cfg.audience)
        .build()
        .parseSignedClaims(externalJwt)
        .getPayload
    }.toEither.left.map(e => s"invalid bootstrap token: ${e.getMessage}")
      .flatMap(claimsToIdentity(cfg.roleClaim, cfg.defaultRole, cfg.allowedEmails,
        instanceId, _))

  private def claimsToIdentity(roleClaim: String, defaultRole: String,
      allowedEmails: Set[String], instanceId: String,
      c: io.jsonwebtoken.Claims): Either[String, Auth.Identity] = {
    val email = Option(c.get("email", classOf[String])).getOrElse(c.getSubject)
    // jjwt only enforces expiry when the claim exists — a token without
    // `exp` would otherwise be a permanent credential.
    if (c.getExpiration == null)
      Left("bootstrap token has no expiration claim")
    else if (allowedEmails.nonEmpty && !allowedEmails.contains(email))
      Left(s"user '$email' is not on the allow-list")
    else {
      val role = Option(c.get(roleClaim, classOf[String])).getOrElse(defaultRole)
      Right(Auth.Identity(email, role, "oidc", instanceId, UUID.randomUUID().toString))
    }
  }

  /** Full bootstrap flow: external token in, internal HS256 session token
    * out (the header the reference returns from its auth middleware).
    */
  def bootstrap(cfg: Config, serverSecret: String, externalJwt: String,
      instanceId: String): Either[String, (Auth.Identity, String)] =
    authenticate(cfg, externalJwt, instanceId).map(mint(serverSecret, instanceId, _))

  /** As [[bootstrap]] with JWKS-located keys (rotation-safe). */
  def bootstrapJwks(cfg: JwksConfig, serverSecret: String, externalJwt: String,
      instanceId: String): Either[String, (Auth.Identity, String)] =
    authenticateJwks(cfg, externalJwt, instanceId).map(mint(serverSecret, instanceId, _))

  private def mint(serverSecret: String, instanceId: String,
      id: Auth.Identity): (Auth.Identity, String) =
    (id, Auth.mintToken(serverSecret, id.username, id.role, instanceId, id.sessionId,
      authMethod = "oidc"))
}
