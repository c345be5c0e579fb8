package graft.engine

import java.security.PublicKey
import scala.util.Try

/** RFC 7517 JWKS key-set management for the OIDC bootstrap path,
  * re-implementing the reference's JWKS manager
  * (`/root/reference/src/enterprise/jwks/jwks_manager.cpp`): a cached,
  * TTL-refreshed set of identity-provider public keys selected by the
  * JWT header's `kid`.
  *
  * The reference fetches the document over HTTPS; this environment has
  * zero egress, so the TRANSPORT is a pluggable `load: () => String`
  * supplier (a local file in practice — `fromFile` — or any closure that
  * produces the JWKS JSON). Everything else matches the reference's
  * semantics:
  *
  *  - the parsed key set is cached and re-loaded only after `refreshMs`;
  *  - a failed or unparseable reload KEEPS the previous keys (an IdP
  *    outage must not lock every user out — stale keys still verify);
  *  - rotation works without restart: a new `kid` published in the
  *    document verifies on the next refresh, a removed `kid` stops
  *    verifying;
  *  - `kid`-less tokens fall back to the single key if the set has
  *    exactly one entry (the common single-key IdP), otherwise fail.
  *
  * Parsing delegates to jjwt's RFC 7517 parser (the same library that
  * verifies the tokens), so RSA and EC keys both work.
  */
final class JwksManager(load: () => String, refreshMs: Long = 5 * 60 * 1000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  @volatile private var loadedOnce = false
  @volatile private var cachedAt: Long = 0L
  @volatile private var keys: Map[Option[String], PublicKey] = Map.empty
  @volatile private var lastErrorMsg: Option[String] = None

  /** Public keys by kid, refreshing if the TTL elapsed. */
  def current(): Map[Option[String], PublicKey] = {
    val now = clock()
    if (!loadedOnce || now - cachedAt >= refreshMs) refresh(now)
    keys
  }

  /** The verification key for a token's `kid` header (None = absent). */
  def keyFor(kid: Option[String]): Option[PublicKey] = {
    val ks = current()
    kid match {
      case Some(_) => ks.get(kid)
      case None =>
        // kid-less token: unambiguous only for a single-key set
        if (ks.size == 1) ks.headOption.map(_._2) else None
    }
  }

  def lastError: Option[String] = lastErrorMsg

  /** Force a reload now (also called by the TTL path). */
  def refresh(now: Long = clock()): Unit = synchronized {
    if (loadedOnce && now - cachedAt < refreshMs) return // raced refresh
    loadedOnce = true
    Try(parse(load())) match {
      case scala.util.Success(parsed) if parsed.nonEmpty =>
        keys = parsed; cachedAt = now; lastErrorMsg = None
      case scala.util.Success(_) =>
        // an empty key set is treated as a bad document: keep stale keys
        lastErrorMsg = Some("JWKS document contains no usable keys")
        cachedAt = now
      case scala.util.Failure(e) =>
        lastErrorMsg = Some(e.getMessage)
        cachedAt = now // don't hammer a broken source; retry after TTL
    }
  }

  private def parse(json: String): Map[Option[String], PublicKey] = {
    import scala.jdk.CollectionConverters._
    val set = io.jsonwebtoken.security.Jwks.setParser().build()
      .parse(new java.io.StringReader(json))
    set.getKeys.asScala.flatMap { jwk =>
      jwk.toKey match {
        case pk: PublicKey => Some(Option(jwk.getId) -> pk)
        case _ => None // private/symmetric entries never verify bootstrap JWTs
      }
    }.toMap
  }
}

object JwksManager {
  /** The no-egress stand-in for the reference's HTTPS fetch: a JWKS
    * document on local disk, re-read at each refresh (rotation = rewrite
    * the file).
    */
  def fromFile(path: String, refreshMs: Long = 5 * 60 * 1000L): JwksManager =
    new JwksManager(() => new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8), refreshMs)
}
