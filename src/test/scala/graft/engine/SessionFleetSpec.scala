package graft.engine

import java.nio.charset.StandardCharsets
import java.util.Base64

import graft.SparkTestHarness
import org.scalatest.funsuite.AnyFunSuite

/** Active-session accounting and cross-instance token modes (reference
  * `test_active_session_count.cpp`, `test_cross_instance_tokens.cpp`).
  */
class SessionFleetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("activeCount tracks connect / close / kill exactly") {
    val m = new SessionManager(spark, new GlobalSettings)
    assert(m.activeCount == 0)
    m.getOrCreate("fleet-a", "u1", "user")
    m.getOrCreate("fleet-b", "u2", "user")
    assert(m.activeCount == 2)
    m.getOrCreate("fleet-a", "u1", "user") // same id — no new session
    assert(m.activeCount == 2)
    m.close("fleet-a")
    assert(m.activeCount == 1)
    m.kill("fleet-b")
    assert(m.activeCount == 0)
  }

  test("strict mode rejects foreign-instance tokens; relaxed accepts them; " +
      "a wrong secret is rejected in BOTH modes") {
    val t = Auth.mintToken("shared-secret", "alice", "admin", "instance-A")
    // same instance: fine either way
    assert(Auth.validate("shared-secret", t, "instance-A").isRight)
    assert(Auth.validate("shared-secret", t, "instance-A", allowCrossInstance = true).isRight)
    // different instance: strict rejects, relaxed accepts
    val strict = Auth.validate("shared-secret", t, "instance-B")
    assert(strict.isLeft && strict.left.exists(_.contains("different server instance")))
    val relaxed = Auth.validate("shared-secret", t, "instance-B", allowCrossInstance = true)
    assert(relaxed.exists(_.username == "alice"))
    // wrong secret: the signature check runs first — rejected in both modes
    assert(Auth.validate("other-secret", t, "instance-B").isLeft)
    assert(Auth.validate("other-secret", t, "instance-B", allowCrossInstance = true).isLeft)
  }

  test("over the wire: a relaxed server serves a foreign-instance token; " +
      "a strict server 401s it; /metrics reports active_sessions") {
    val secret = "fleet-secret"
    val pw = "pw"
    def mkServer(relaxed: Boolean) = {
      val s = new graft.server.GraftHttpServer(spark, secret,
        Auth.hashPassword(secret, pw), instanceId = "instance-B",
        allowCrossInstanceTokens = relaxed)
      (s, s.start())
    }
    val client = java.net.http.HttpClient.newHttpClient()
    def post(port: Int, path: String, body: String, headers: (String, String)*) = {
      val b = java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"http://127.0.0.1:$port$path"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      headers.foreach { case (k, v) => b.header(k, v) }
      client.send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
    }
    // a token minted by ANOTHER instance of the same fleet (same secret)
    val foreign = Auth.mintToken(secret, "gizmosql_username", "admin", "instance-A")

    val (strictServer, strictPort) = mkServer(relaxed = false)
    try {
      val r = post(strictPort, "/sql", "SELECT 1 AS one",
        "Authorization" -> s"Bearer $foreign", "Accept" -> "application/json")
      assert(r.statusCode() == 401 && r.body().contains("different server instance"))
    } finally strictServer.close()

    val (relaxedServer, relaxedPort) = mkServer(relaxed = true)
    try {
      val r = post(relaxedPort, "/sql", "SELECT 1 AS one",
        "Authorization" -> s"Bearer $foreign", "Accept" -> "application/json")
      assert(r.statusCode() == 200, s"relaxed server must serve it: ${r.body()}")
      val m = post(relaxedPort, "/metrics", "", "Authorization" -> s"Bearer $foreign")
      assert(m.statusCode() == 200 && m.body().contains("\"active_sessions\":"))
      val n = "\"active_sessions\":(\\d+)".r.findFirstMatchIn(m.body()).get.group(1).toInt
      assert(n >= 1, s"the foreign token's session is live, got $n")
    } finally relaxedServer.close()
  }
}
