package graft.server

import graft.{SparkTestHarness, Tables}
import graft.engine.{Auth, OAuthFlow, TokenAuth}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.Base64
import org.scalatest.funsuite.AnyFunSuite

/** Socket-level tests of the embedded OAuth2 login flow, mirroring the
  * reference's `tests/integration/test_oauth_server.cpp` cases
  * (SuccessfulOAuthFlow, InitiateEndpointReturnsValidJson,
  * InvalidAuthorizationCode, UnauthorizedEmail, TokenPollNotFound,
  * PendingSessionPoll, DuplicateSessionRejected, MissingSessionParameter)
  * plus the discovery header (`gizmosql_security.cpp:297-313`).
  *
  * The IdP is faked locally (zero egress): the exchange function maps known
  * authorization codes to RSA-signed ID tokens, exactly the role the real
  * token endpoint plays; the end-to-end case then authenticates the polled
  * token through the server's real OIDC path and runs SQL with the minted
  * session JWT.
  */
class OAuthServerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val secret = "oauth-spec-secret"
  private val password = "pw"

  private val idpKeys = {
    val g = java.security.KeyPairGenerator.getInstance("RSA")
    g.initialize(2048)
    g.generateKeyPair()
  }
  private def idToken(email: String): String =
    io.jsonwebtoken.Jwts.builder()
      .issuer("https://idp.example.com").audience().add("graft").and()
      .subject(email).claim("email", email)
      .issuedAt(new java.util.Date())
      .expiration(java.util.Date.from(java.time.Instant.now().plusSeconds(600)))
      .signWith(idpKeys.getPrivate).compact()

  // the fake IdP token endpoint: code -> id_token
  private val stubExchange: OAuthFlow.ExchangeFn = {
    case "good-code" => Right(idToken("alice@example.com"))
    case "outsider-code" => Right(idToken("mallory@evil.example"))
    case code => Left(s"token exchange error: invalid_grant: unknown code '$code'")
  }

  private lazy val (server, port) = {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val s = new GraftHttpServer(spark, secret, Auth.hashPassword(secret, password),
      onSessionCreate = Tables.ensure(_, SparkTestHarness.sfDir),
      oidc = Some(TokenAuth.Config(
        issuer = "https://idp.example.com", audience = "graft",
        publicKey = idpKeys.getPublic)),
      oauth = Some(OAuthFlow.Config(
        clientId = "graft-client", clientSecret = "graft-client-secret",
        authorizationEndpoint = "https://idp.example.com/authorize",
        tokenEndpoint = "https://idp.example.com/token",
        secretKey = secret,
        authorizedEmailPatterns = Seq("*@example.com"),
        exchange = Some(stubExchange))))
    (s, s.start())
  }
  private lazy val client = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NEVER).build()

  private def get(path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(path: String, body: String, headers: (String, String)*): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def field(json: String, name: String): Option[String] = {
    val m = ("\"" + name + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
    m.findFirstMatchIn(json).map(_.group(1).replace("\\/", "/"))
  }

  private def initiate(): (String, String, String) = {
    val r = get("/oauth/initiate")
    assert(r.statusCode() == 200)
    val uuid = field(r.body(), "session_uuid").get
    val url = field(r.body(), "auth_url").get
    val state = url.split("state=")(1).split("&")(0)
    (uuid, url, java.net.URLDecoder.decode(state, StandardCharsets.UTF_8))
  }

  test("initiate returns valid JSON with uuid + IdP auth URL") {
    val (uuid, url, state) = initiate()
    assert(uuid.matches("[a-f0-9\\-]{36}"))
    assert(url.startsWith("https://idp.example.com/authorize?response_type=code"))
    assert(url.contains("client_id=graft-client"))
    assert(url.contains("redirect_uri=http%3A%2F%2Flocalhost%3A" + port + "%2Foauth%2Fcallback"))
    assert(url.contains("scope=openid+email"))
    // state is the HMAC session hash, never the raw uuid
    assert(state == OAuthFlow.hmacSha256Hex(secret, uuid))
    assert(state != uuid)
  }

  test("discovery: every response advertises x-gizmosql-oauth-url") {
    val r = get("/healthz")
    assert(r.headers().firstValue("x-gizmosql-oauth-url").orElse("") ==
      s"http://localhost:$port/oauth")
    // unauthenticated /sql also carries it (how a cold ADBC client learns
    // where to send the browser)
    val unauth = post("/sql", "SELECT 1")
    assert(unauth.statusCode() == 401)
    assert(unauth.headers().firstValue("x-gizmosql-oauth-url").isPresent)
  }

  test("successful flow end-to-end: initiate -> callback -> poll -> /auth -> SQL") {
    val (uuid, _, state) = initiate()
    // poll before the IdP redirects back: pending
    val p0 = get(s"/oauth/token/$uuid")
    assert(p0.statusCode() == 200 && field(p0.body(), "status").contains("pending"))
    // IdP redirects the browser to the callback with the code
    val cb = get(s"/oauth/callback?code=good-code&state=$state")
    assert(cb.statusCode() == 200 && cb.body().contains("Authentication successful"))
    // poll retrieves the ID token (one-time)
    val p1 = get(s"/oauth/token/$uuid")
    assert(field(p1.body(), "status").contains("complete"))
    val tok = field(p1.body(), "token").get
    val p2 = get(s"/oauth/token/$uuid")
    assert(p2.statusCode() == 404, "token retrieval is one-time")
    // the ID token authenticates through the real OIDC path
    val basic = "Basic " + Base64.getEncoder.encodeToString(
      s"${TokenAuth.TokenUsername}:$tok".getBytes(StandardCharsets.UTF_8))
    val auth = post("/auth", "", "Authorization" -> basic)
    assert(auth.statusCode() == 200)
    val session = field(auth.body(), "token").get
    val rows = post("/sql", "SELECT COUNT(*) AS n FROM region",
      "Authorization" -> s"Bearer $session", "Accept" -> "application/json")
    assert(rows.statusCode() == 200 && rows.body().contains("\"n\":5"))
  }

  test("browser entry: /oauth/start redirects to the IdP; duplicate session 409; missing 400") {
    val hash = OAuthFlow.hmacSha256Hex(secret, java.util.UUID.randomUUID().toString)
    val r = get(s"/oauth/start?session=$hash")
    assert(r.statusCode() == 302)
    val loc = r.headers().firstValue("Location").orElse("")
    assert(loc.startsWith("https://idp.example.com/authorize") && loc.contains(hash))
    val dup = get(s"/oauth/start?session=$hash")
    assert(dup.statusCode() == 409 && dup.body().contains("already in progress"))
    val missing = get("/oauth/start")
    assert(missing.statusCode() == 400 && missing.body().contains("Missing session parameter"))
  }

  test("invalid authorization code: error page + error status on poll") {
    val (uuid, _, state) = initiate()
    val cb = get(s"/oauth/callback?code=bogus&state=$state")
    assert(cb.body().contains("Authentication failed"))
    val p = get(s"/oauth/token/$uuid")
    assert(field(p.body(), "status").contains("error"))
    assert(field(p.body(), "error").exists(_.contains("invalid_grant")))
  }

  test("unauthorized email is rejected at the callback (early, pre-crypto)") {
    val (uuid, _, state) = initiate()
    val cb = get(s"/oauth/callback?code=outsider-code&state=$state")
    assert(cb.body().contains("not authorized"))
    val p = get(s"/oauth/token/$uuid")
    assert(field(p.body(), "status").contains("error"))
    assert(field(p.body(), "error").exists(_.contains("mallory@evil.example")))
  }

  test("IdP-reported error propagates to the session") {
    val (uuid, _, state) = initiate()
    val cb = get(s"/oauth/callback?error=access_denied&error_description=user+cancelled&state=$state")
    assert(cb.body().contains("user cancelled"))
    val p = get(s"/oauth/token/$uuid")
    assert(field(p.body(), "status").contains("error"))
  }

  test("token poll for an unknown uuid: 404 not_found") {
    val r = get(s"/oauth/token/${java.util.UUID.randomUUID().toString}")
    assert(r.statusCode() == 404 && field(r.body(), "status").contains("not_found"))
    // malformed uuid shapes 404 too (route guard)
    assert(get("/oauth/token/not-a-uuid").statusCode() == 404)
  }

  test("callback with unknown/expired state renders the expired page; " +
      "completed session cannot be re-completed") {
    val bogusState = OAuthFlow.hmacSha256Hex(secret, java.util.UUID.randomUUID().toString)
    val cb = get(s"/oauth/callback?code=good-code&state=$bogusState")
    assert(cb.body().contains("expired"))
    // complete one, then hit the callback again: 409
    val (_, _, state) = initiate()
    assert(get(s"/oauth/callback?code=good-code&state=$state").statusCode() == 200)
    val again = get(s"/oauth/callback?code=good-code&state=$state")
    assert(again.statusCode() == 409 && again.body().contains("already completed"))
  }

  test("pending sessions expire after the challenge timeout (clock-injected)") {
    var now = 1000L
    val flow = new OAuthFlow(OAuthFlow.Config(
      clientId = "c", clientSecret = "s",
      authorizationEndpoint = "https://idp/authorize", tokenEndpoint = "https://idp/token",
      secretKey = "k", exchange = Some(stubExchange)), clock = () => now)
    val init = new String(flow.initiate()._3, StandardCharsets.UTF_8)
    val uuid = field(init, "session_uuid").get
    assert(flow.pendingCount == 1)
    now += 14 * 60 * 1000L // still inside the 15-minute window
    assert(new String(flow.tokenPoll(uuid)._3, StandardCharsets.UTF_8).contains("pending"))
    now += 2 * 60 * 1000L // past it
    assert(flow.pendingCount == 0)
    val polled = flow.tokenPoll(uuid)
    assert(polled._1 == 404)
  }

  test("email pattern matching: exact, suffix, wildcard, case-insensitive") {
    import OAuthFlow.emailAuthorized
    assert(emailAuthorized(Nil, "anyone@anywhere"))
    assert(emailAuthorized(Seq("*"), "anyone@anywhere"))
    assert(emailAuthorized(Seq("*@corp.com"), "A.User@Corp.COM"))
    assert(!emailAuthorized(Seq("*@corp.com"), "user@other.com"))
    assert(emailAuthorized(Seq("exact@x.com"), "EXACT@x.com"))
    assert(!emailAuthorized(Seq("exact@x.com"), "other@x.com"))
  }
}
