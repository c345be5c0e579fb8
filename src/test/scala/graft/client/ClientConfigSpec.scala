package graft.client

import org.scalatest.funsuite.AnyFunSuite

/** Client connection-config resolution (reference
  * `client_config.cpp:79-260`, `test_client_config.cpp`).
  */
class ClientConfigSpec extends AnyFunSuite {

  private def env(pairs: (String, String)*): String => Option[String] = {
    val m = pairs.toMap
    k => m.get(k).filter(_.nonEmpty)
  }

  test("GIZMOSQL_USER wins over GIZMOSQL_USERNAME; USERNAME is the fallback") {
    val both = ClientConfig.resolveEnv(ClientConfig(),
      env("GIZMOSQL_USER" -> "alice", "GIZMOSQL_USERNAME" -> "bob"))
    assert(both.username == "alice")
    val fallback = ClientConfig.resolveEnv(ClientConfig(),
      env("GIZMOSQL_USERNAME" -> "bob"))
    assert(fallback.username == "bob")
  }

  test("env fills only fields still at their defaults — explicit values win") {
    val c = ClientConfig(host = "db.example", port = 443, username = "carol")
    val out = ClientConfig.resolveEnv(c, env(
      "GIZMOSQL_HOST" -> "other", "GIZMOSQL_PORT" -> "1234",
      "GIZMOSQL_USER" -> "mallory", "GIZMOSQL_PASSWORD" -> "pw"))
    assert(out.host == "db.example" && out.port == 443 && out.username == "carol")
    assert(out.password == "pw" && out.passwordProvided, "password was unset — env fills it")
    val defaults = ClientConfig.resolveEnv(ClientConfig(), env(
      "GIZMOSQL_HOST" -> "other", "GIZMOSQL_PORT" -> "1234"))
    assert(defaults.host == "other" && defaults.port == 1234)
  }

  test("GIZMOSQL_TLS enables TLS like the reference client " +
      "(client_config.cpp:120-125); explicit useTls wins") {
    assert(ClientConfig.resolveEnv(ClientConfig(), env("GIZMOSQL_TLS" -> "1")).useTls)
    assert(ClientConfig.resolveEnv(ClientConfig(), env("GIZMOSQL_TLS" -> "true")).useTls)
    assert(!ClientConfig.resolveEnv(ClientConfig(), env("GIZMOSQL_TLS" -> "0")).useTls)
    assert(!ClientConfig.resolveEnv(ClientConfig(), env()).useTls)
    // skip-verify alone must not silently downgrade to plaintext reasoning:
    // TLS comes from GIZMOSQL_TLS, not from the skip-verify flag
    val skipOnly = ClientConfig.resolveEnv(ClientConfig(),
      env("GIZMOSQL_TLS_SKIP_VERIFY" -> "1"))
    assert(skipOnly.tlsSkipVerify && !skipOnly.useTls)
  }

  test("gizmosql:// URI: host:port + JDBC-style query params; bad port errors") {
    val Right(c) = ClientConfig.parseUri(
      "gizmosql://db.example:31338?username=alice&useEncryption=true&disableCertificateVerification=1"): @unchecked
    assert(c.host == "db.example" && c.port == 31338)
    assert(c.username == "alice" && c.useTls && c.tlsSkipVerify)
    assert(ClientConfig.parseUri("gizmosql://h:notaport").isLeft)
    val Right(bare) = ClientConfig.parseUri("gizmosql://justhost"): @unchecked
    assert(bare.host == "justhost" && bare.port == ClientConfig.DefaultPort)
  }

  test("display URI never includes the password") {
    val c = ClientConfig(host = "h", port = 1, username = "u",
      password = "s3cret", passwordProvided = true, useTls = true)
    val uri = ClientConfig.buildUri(c)
    assert(uri == "gizmosql://h:1?username=u&useEncryption=true")
    assert(!uri.contains("s3cret"))
  }
}
