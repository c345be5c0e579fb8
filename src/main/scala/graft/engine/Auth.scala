package graft.engine

import io.jsonwebtoken.{Jwts, Claims}
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec
import java.nio.charset.StandardCharsets
import java.time.Instant
import java.util.{Date, UUID}
import scala.util.Try

/** Basic→JWT authentication, re-implementing the reference's design
  * (`/root/reference/src/common/gizmosql_security.cpp`): Basic credentials
  * are checked against an HMAC-SHA256-hashed password (`:245-259`), then an
  * HS256 JWT is minted (`:262-294`) with issuer `gizmosql`, 24h expiry, and
  * claims sub/role/auth_method/instance_id/session_id; bearer validation
  * binds the session from the `session_id` claim (`:932`) and rejects tokens
  * minted by other instances (`:844-848`).
  */
object Auth {
  val Issuer = "gizmosql"
  val TokenLifetimeSeconds: Long = 24 * 3600 // gizmosql_security.cpp:34

  final case class Identity(
      username: String, role: String, authMethod: String,
      instanceId: String, sessionId: String,
      // None = unrestricted; Some(set) = the enterprise catalog_access claim
      // (duckdb_statement.cpp:859-884) limiting visible/queryable stores.
      catalogAccess: Option[Set[String]] = None)

  /** Derive a 256-bit HS256 key from the shared secret (jjwt enforces the
    * RFC 7518 minimum key size, so short secrets are stretched via SHA-256).
    */
  private def hmacKey(secret: String) = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(secret.getBytes(StandardCharsets.UTF_8))
    new SecretKeySpec(digest, "HmacSHA256")
  }

  /** HMAC-SHA256 password digest (hex), as the reference hashes stored
    * passwords before compare.
    */
  def hashPassword(secret: String, password: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(hmacKey(secret))
    mac.doFinal(password.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
  }

  /** Constant-time compare of the Basic credentials against the stored hash. */
  def checkBasic(secret: String, password: String, storedHash: String): Boolean = {
    val a = hashPassword(secret, password).getBytes(StandardCharsets.UTF_8)
    val b = storedHash.getBytes(StandardCharsets.UTF_8)
    java.security.MessageDigest.isEqual(a, b)
  }

  /** Mint an HS256 bearer token for an authenticated user. */
  def mintToken(secret: String, username: String, role: String, instanceId: String,
      sessionId: String = UUID.randomUUID().toString,
      now: Instant = Instant.now(),
      authMethod: String = "basic",
      catalogAccess: Option[Seq[String]] = None): String = {
    val builder = Jwts.builder()
      .issuer(Issuer)
      .subject(username)
      .claim("role", role)
      .claim("auth_method", authMethod)
      .claim("instance_id", instanceId)
      .claim("session_id", sessionId)
      .issuedAt(Date.from(now))
      .expiration(Date.from(now.plusSeconds(TokenLifetimeSeconds)))
    // Absent claim = unrestricted; an empty grant ("") round-trips to an
    // empty set (the session sees nothing) rather than to unrestricted.
    catalogAccess.foreach(cs => builder.claim("catalog_access", cs.mkString(",")))
    builder.signWith(hmacKey(secret)).compact()
  }

  /** Validate a bearer token: signature, issuer, expiry, instance binding. */
  /** Validate a session JWT. `allowCrossInstance` is the reference's
    * relaxed cluster mode (`gizmosql_security.cpp:848-860`,
    * `test_cross_instance_tokens.cpp`): a token signed with the SAME
    * secret but minted by a different instance is accepted (load-balanced
    * fleet sharing one secret); the signature check always runs first, so
    * a wrong-secret token is rejected in either mode.
    */
  def validate(secret: String, token: String, instanceId: String,
      allowCrossInstance: Boolean = false): Either[String, Identity] =
    Try {
      val claims: Claims = Jwts.parser()
        .verifyWith(hmacKey(secret))
        .requireIssuer(Issuer)
        .build()
        .parseSignedClaims(token)
        .getPayload
      claims
    }.toEither.left.map(e => s"invalid token: ${e.getMessage}").flatMap { c =>
      val tokenInstance = c.get("instance_id", classOf[String])
      if (tokenInstance != instanceId && !allowCrossInstance)
        Left("token was issued by a different server instance")
      else
        Right(Identity(
          c.getSubject,
          c.get("role", classOf[String]),
          c.get("auth_method", classOf[String]),
          tokenInstance,
          c.get("session_id", classOf[String]),
          Option(c.get("catalog_access", classOf[String]))
            .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)))
    }
}
