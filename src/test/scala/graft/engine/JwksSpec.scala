package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import java.math.BigInteger
import java.security.interfaces.RSAPublicKey
import java.util.Base64

/** JWKS key-set management for the OIDC bootstrap path: kid selection,
  * TTL refresh, rotation without restart, stale-on-error. Mirrors the
  * behavior of the reference's jwks_manager with the HTTPS fetch swapped
  * for a pluggable supplier (zero-egress environment).
  */
class JwksSpec extends AnyFunSuite {

  private def rsa() = {
    val g = java.security.KeyPairGenerator.getInstance("RSA")
    g.initialize(2048)
    g.generateKeyPair()
  }

  private def b64(bi: BigInteger): String = {
    val raw = bi.toByteArray
    val unsigned = if (raw.length > 1 && raw(0) == 0) raw.drop(1) else raw
    Base64.getUrlEncoder.withoutPadding.encodeToString(unsigned)
  }

  private def jwksJson(entries: (String, RSAPublicKey)*): String =
    entries.map { case (kid, k) =>
      s"""{"kty":"RSA","use":"sig","alg":"RS256","kid":"$kid",""" +
        s""""n":"${b64(k.getModulus)}","e":"${b64(k.getPublicExponent)}"}"""
    }.mkString("""{"keys":[""", ",", "]}")

  private def token(kp: java.security.KeyPair, kid: Option[String],
      issuer: String = "https://idp.example.com", audience: String = "graft"): String = {
    val b = io.jsonwebtoken.Jwts.builder()
    kid.foreach(k => b.header().keyId(k).and())
    b.issuer(issuer).audience().add(audience).and()
      .subject("alice@example.com").claim("email", "alice@example.com")
      .expiration(java.util.Date.from(java.time.Instant.now().plusSeconds(600)))
      .signWith(kp.getPrivate).compact()
  }

  test("kid selects the matching key from a multi-key set") {
    val (kp1, kp2) = (rsa(), rsa())
    val doc = jwksJson(
      "k1" -> kp1.getPublic.asInstanceOf[RSAPublicKey],
      "k2" -> kp2.getPublic.asInstanceOf[RSAPublicKey])
    val mgr = new JwksManager(() => doc)
    val cfg = TokenAuth.JwksConfig("https://idp.example.com", "graft", mgr)
    assert(TokenAuth.authenticateJwks(cfg, token(kp1, Some("k1")), "i").isRight)
    assert(TokenAuth.authenticateJwks(cfg, token(kp2, Some("k2")), "i").isRight)
    // right signature under the WRONG kid: the located key can't verify
    assert(TokenAuth.authenticateJwks(cfg, token(kp1, Some("k2")), "i").isLeft)
    // unknown kid: clear error
    val r = TokenAuth.authenticateJwks(cfg, token(kp1, Some("k9")), "i")
    assert(r.isLeft && r.left.exists(_.contains("k9")))
    // kid-less token is ambiguous against two keys
    assert(TokenAuth.authenticateJwks(cfg, token(kp1, None), "i").isLeft)
  }

  test("kid-less token verifies against a single-key set") {
    val kp = rsa()
    val mgr = new JwksManager(() => jwksJson("only" -> kp.getPublic.asInstanceOf[RSAPublicKey]))
    val cfg = TokenAuth.JwksConfig("https://idp.example.com", "graft", mgr)
    assert(TokenAuth.authenticateJwks(cfg, token(kp, None), "i").isRight)
  }

  test("rotation: a republished set takes effect at the next refresh, no restart") {
    val (oldKp, newKp) = (rsa(), rsa())
    @volatile var doc = jwksJson("old" -> oldKp.getPublic.asInstanceOf[RSAPublicKey])
    var now = 0L
    val mgr = new JwksManager(() => doc, refreshMs = 1000L, clock = () => now)
    val cfg = TokenAuth.JwksConfig("https://idp.example.com", "graft", mgr)
    assert(TokenAuth.authenticateJwks(cfg, token(oldKp, Some("old")), "i").isRight)
    // IdP rotates; inside the TTL the cached set still serves
    doc = jwksJson("new" -> newKp.getPublic.asInstanceOf[RSAPublicKey])
    now = 500L
    assert(TokenAuth.authenticateJwks(cfg, token(oldKp, Some("old")), "i").isRight)
    assert(TokenAuth.authenticateJwks(cfg, token(newKp, Some("new")), "i").isLeft)
    // TTL elapses: the new key verifies, the retired one stops
    now = 1500L
    assert(TokenAuth.authenticateJwks(cfg, token(newKp, Some("new")), "i").isRight)
    assert(TokenAuth.authenticateJwks(cfg, token(oldKp, Some("old")), "i").isLeft)
  }

  test("a broken reload keeps the previous keys (IdP outage must not lock users out)") {
    val kp = rsa()
    @volatile var doc = jwksJson("k" -> kp.getPublic.asInstanceOf[RSAPublicKey])
    var now = 0L
    val mgr = new JwksManager(() => doc, refreshMs = 1000L, clock = () => now)
    val cfg = TokenAuth.JwksConfig("https://idp.example.com", "graft", mgr)
    assert(TokenAuth.authenticateJwks(cfg, token(kp, Some("k")), "i").isRight)
    doc = "{ not json"
    now = 1500L
    assert(TokenAuth.authenticateJwks(cfg, token(kp, Some("k")), "i").isRight,
      "stale keys must keep verifying through a broken reload")
    assert(mgr.lastError.nonEmpty)
    // source recovers with a rotated set
    val kp2 = rsa()
    doc = jwksJson("k2" -> kp2.getPublic.asInstanceOf[RSAPublicKey])
    now = 3000L
    assert(TokenAuth.authenticateJwks(cfg, token(kp2, Some("k2")), "i").isRight)
    assert(mgr.lastError.isEmpty)
  }

  test("fromFile reads a JWKS document off disk (the zero-egress transport)") {
    val kp = rsa()
    val f = java.nio.file.Files.createTempFile("graft-jwks", ".json")
    java.nio.file.Files.write(f,
      jwksJson("fk" -> kp.getPublic.asInstanceOf[RSAPublicKey]).getBytes("UTF-8"))
    val mgr = JwksManager.fromFile(f.toString)
    val cfg = TokenAuth.JwksConfig("https://idp.example.com", "graft", mgr)
    assert(TokenAuth.authenticateJwks(cfg, token(kp, Some("fk")), "i").isRight)
  }
}
