package graft.engine

import graft.SparkTestHarness
import org.scalatest.funsuite.AnyFunSuite

/** Edition / license gating (`enterprise_features.h`,
  * `test_enterprise_gating.cpp`, `test_inline_license_key.cpp`): Core
  * rejects enterprise features with a license error while basic queries
  * keep working; a validated RS256 license JWT unlocks its feature set;
  * the inline key wins over the file; bad licenses resolve to Core.
  */
class LicenseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private val keys = {
    val g = java.security.KeyPairGenerator.getInstance("RSA")
    g.initialize(2048); g.generateKeyPair()
  }
  private val otherKeys = {
    val g = java.security.KeyPairGenerator.getInstance("RSA")
    g.initialize(2048); g.generateKeyPair()
  }

  private def mint(features: String, expiresInS: Long = 3600,
      key: java.security.PrivateKey = keys.getPrivate): String =
    io.jsonwebtoken.Jwts.builder()
      .subject("acme-corp").claim("features", features)
      .issuedAt(new java.util.Date())
      .expiration(java.util.Date.from(java.time.Instant.now().plusSeconds(expiresInS)))
      .signWith(key).compact()

  test("initialize: valid license -> Licensed feature set; empty features " +
      "claim licenses everything; non-enterprise features always available") {
    val m = License.initialize(License.Config(keys.getPublic,
      licenseKey = Some(mint("kill_session,session_tag"))))
    assert(m.editionName == "Enterprise")
    assert(m.isAvailable("kill_session") && m.isAvailable("session_tag"))
    assert(!m.isAvailable("query_tag"), "unlisted enterprise feature stays gated")
    assert(m.isAvailable("basic_sql"), "non-enterprise features are never gated")
    val site = License.initialize(License.Config(keys.getPublic,
      licenseKey = Some(mint(""))))
    assert(License.EnterpriseFeatures.forall(site.isAvailable))
  }

  test("initialize: absent / wrong-key / expired licenses resolve to Core") {
    assert(License.initialize(License.Config(keys.getPublic)) == License.Core)
    assert(License.initialize(License.Config(keys.getPublic,
      licenseKey = Some(mint("kill_session", key = otherKeys.getPrivate)))) == License.Core)
    assert(License.initialize(License.Config(keys.getPublic,
      licenseKey = Some(mint("kill_session", expiresInS = -10)))) == License.Core)
  }

  test("inline key wins over the file; the file alone works") {
    val f = java.nio.file.Files.createTempFile("graft-license", ".jwt")
    java.nio.file.Files.write(f, mint("kill_session").getBytes("UTF-8"))
    val fromFile = License.initialize(License.Config(keys.getPublic,
      licenseFile = Some(f.toString)))
    assert(fromFile.isAvailable("kill_session"))
    val inlineWins = License.initialize(License.Config(keys.getPublic,
      licenseKey = Some(mint("session_tag")), licenseFile = Some(f.toString)))
    assert(inlineWins.isAvailable("session_tag") && !inlineWins.isAvailable("kill_session"))
  }

  test("Core edition: KILL SESSION and tag SETs rejected with a license " +
      "error; basic queries work; edition pseudo-function reports Core") {
    val global = new GlobalSettings
    val sessions = new SessionManager(spark, global)
    sessions.license = License.Core
    val admin = sessions.getOrCreate("lic-admin", "alice", "admin")
    def run(sql: String) = Statement.create(sessions, admin, global, sql)
    val e1 = intercept[SecurityException](
      run("KILL SESSION '00000000-0000-0000-0000-000000000000'"))
    assert(e1.getMessage.toLowerCase.contains("license"))
    val e2 = intercept[SecurityException](run("SET gizmosql.session_tag = 'x'"))
    assert(e2.getMessage.toLowerCase.contains("license"))
    val e3 = intercept[SecurityException](run("SET gizmosql.query_tag = 'y'"))
    assert(e3.getMessage.toLowerCase.contains("license"))
    // basic queries and non-gated settings still work
    assert(run("SELECT 1 AS v").collect()(0).getInt(0) == 1)
    run("SET gizmosql.query_timeout = 0")
    // edition surfaces through the pseudo-function
    Statement.registerPseudoFunctions(admin, "lic-inst", "lic-clus",
      sessions.license.editionName)
    assert(admin.spark.sql("SELECT gizmosql_edition() AS e")
      .collect()(0).getString(0) == "Core")
  }

  test("Licensed mode unlocks exactly the granted features") {
    val global = new GlobalSettings
    val sessions = new SessionManager(spark, global)
    sessions.license = License.initialize(License.Config(keys.getPublic,
      licenseKey = Some(mint("kill_session"))))
    val admin = sessions.getOrCreate("lic2-admin", "alice", "admin")
    def run(sql: String) = Statement.create(sessions, admin, global, sql)
    // kill_session licensed: passes the license gate (the kill itself is
    // idempotent on unknown ids and reports success)
    assert(run("KILL SESSION '00000000-0000-0000-0000-000000000000'")
      .collect()(0).getString(0).contains("killed"))
    // session_tag NOT licensed
    val e = intercept[SecurityException](run("SET gizmosql.session_tag = 'x'"))
    assert(e.getMessage.toLowerCase.contains("license"))
  }

  test("fromEnv: no verify key -> Core; PEM verify key + valid inline " +
      "license -> Licensed; verify key without license -> Core") {
    def env(pairs: (String, String)*): String => Option[String] = {
      val m = pairs.toMap; k => m.get(k)
    }
    assert(License.fromEnv(env()) == License.Core)
    val pem = "-----BEGIN PUBLIC KEY-----\n" +
      java.util.Base64.getMimeEncoder(64, "\n".getBytes)
        .encodeToString(keys.getPublic.getEncoded) +
      "\n-----END PUBLIC KEY-----\n"
    assert(License.fromEnv(env("GIZMOSQL_LICENSE_VERIFY_KEY" -> pem)) == License.Core)
    val m = License.fromEnv(env(
      "GIZMOSQL_LICENSE_VERIFY_KEY" -> pem,
      "GIZMOSQL_LICENSE_KEY" -> mint("kill_session")))
    assert(m.isAvailable("kill_session") && !m.isAvailable("session_tag"))
    // garbage verify key never throws — Core
    assert(License.fromEnv(env("GIZMOSQL_LICENSE_VERIFY_KEY" -> "not-pem")) == License.Core)
  }

  test("server default is Core-unless-licensed like the reference binary " +
      "(r16 verdict #5): over the wire, KILL SESSION yields the license " +
      "error while SQL works; unrestrictedLicense opts out") {
    val server = new graft.server.GraftHttpServer(spark, "lic-srv-secret",
      Auth.hashPassword("lic-srv-secret", "pw"))
    assert(server.sessions.license == License.Core,
      "a server constructed without license config must run as Core " +
        "(container has no GIZMOSQL_LICENSE_* env)")
    val port = server.start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def post(path: String, body: String, headers: (String, String)*) = {
        val b = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port$path"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        headers.foreach { case (k, v) => b.header(k, v) }
        client.send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      val basic = "Basic " + java.util.Base64.getEncoder.encodeToString(
        "gizmosql_username:pw".getBytes("UTF-8"))
      val auth = post("/auth", "", "Authorization" -> basic)
      assert(auth.statusCode() == 200)
      val token = auth.body().split("\"token\":\"")(1).split("\"")(0)
      val ok = post("/sql", "SELECT 1 AS one", "Authorization" -> s"Bearer $token",
        "Accept" -> "application/json")
      assert(ok.statusCode() == 200, "basic SQL must keep working under Core")
      val kill = post("/sql", "KILL SESSION '00000000-0000-0000-0000-000000000000'",
        "Authorization" -> s"Bearer $token", "Accept" -> "application/json")
      assert(kill.statusCode() != 200, "kill_session must be license-gated")
      assert(kill.body().toLowerCase.contains("license"), kill.body())
    } finally server.close()
    // embedder opt-out restores the library default
    val open = new graft.server.GraftHttpServer(spark, "lic-srv-secret2",
      Auth.hashPassword("lic-srv-secret2", "pw"), unrestrictedLicense = true)
    try assert(open.sessions.license == License.Unrestricted)
    finally open.close()
  }
}
