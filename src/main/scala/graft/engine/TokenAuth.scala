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
    }.toEither.left.map(e => s"invalid bootstrap token: ${e.getMessage}").flatMap { c =>
      val email = Option(c.get("email", classOf[String])).getOrElse(c.getSubject)
      // jjwt only enforces expiry when the claim exists — a token without
      // `exp` would otherwise be a permanent credential.
      if (c.getExpiration == null)
        Left("bootstrap token has no expiration claim")
      else if (cfg.allowedEmails.nonEmpty && !cfg.allowedEmails.contains(email))
        Left(s"user '$email' is not on the allow-list")
      else {
        val role = Option(c.get(cfg.roleClaim, classOf[String])).getOrElse(cfg.defaultRole)
        Right(Auth.Identity(email, role, "oidc", instanceId, UUID.randomUUID().toString))
      }
    }

  /** Full bootstrap flow: external token in, internal HS256 session token
    * out (the header the reference returns from its auth middleware).
    */
  def bootstrap(cfg: Config, serverSecret: String, externalJwt: String,
      instanceId: String): Either[String, (Auth.Identity, String)] =
    authenticate(cfg, externalJwt, instanceId).map { id =>
      (id, Auth.mintToken(serverSecret, id.username, id.role, instanceId, id.sessionId,
        authMethod = "oidc"))
    }
}
