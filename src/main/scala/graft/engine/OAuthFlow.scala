package graft.engine

import java.nio.charset.StandardCharsets
import java.util.UUID

/** OAuth2 authorization-code login flow hosted by the engine's HTTP server —
  * the reference's embedded OAuth server re-expressed for the JDK transport
  * (`/root/reference/src/enterprise/oauth/oauth_http_server.cpp`; flow
  * contract in `oauth_http_server.h:33-40`):
  *
  *   1. client GETs `/oauth/initiate` → `{session_uuid, auth_url}`; the
  *      server registers a pending auth keyed by
  *      HMAC-SHA256(secret_key, uuid) — the client never reveals the uuid
  *      to the browser, only the hash rides in `state`;
  *   2. (alternative entry) browser GETs `/oauth/start?session=HASH` →
  *      302 redirect to the IdP authorization endpoint (409 on duplicate);
  *   3. IdP redirects back to `/oauth/callback?code=…&state=HASH`; the
  *      server exchanges the code for an ID token at the IdP token
  *      endpoint, then pre-checks the email allow-list (decode-only, no
  *      crypto — full JWKS/issuer/audience verification happens later in
  *      [[TokenAuth]], same split as the reference's
  *      `VerifyAndDecodeBootstrapToken`) and renders a success page;
  *   4. client polls `/oauth/token/<uuid>` until `{"status":"complete",
  *      "token":…}` (one-time: the entry is erased on retrieval);
  *   5. client sends the ID token via Basic auth (username `token`) to
  *      `/auth`, which mints the internal HS256 session JWT.
  *
  * Pending auths expire after 15 minutes (`kChallengeTimeoutMinutes`);
  * expiry here is enforced lazily at each touch instead of by a sweeper
  * thread — same observable behavior, no thread lifecycle.
  *
  * The IdP token-endpoint call is a pluggable `exchange` function: the
  * default posts a `grant_type=authorization_code` form over
  * `java.net.http` (a real IdP, or a loopback stub in this zero-egress
  * environment — the same supplier pattern as [[JwksManager.fromFile]]).
  */
object OAuthFlow {

  /** code => Right(raw ID token) | Left(error). */
  type ExchangeFn = String => Either[String, String]

  final case class Config(
      clientId: String,
      clientSecret: String,
      authorizationEndpoint: String,
      tokenEndpoint: String,
      secretKey: String,
      scopes: String = "openid email",
      redirectUri: String = "", // auto-constructed by the server at bind time
      instanceId: String = "", // optional state prefix for proxy routing
      authorizedEmailPatterns: Seq[String] = Nil,
      challengeTimeoutMs: Long = 15 * 60 * 1000L,
      exchange: Option[ExchangeFn] = None)

  /** Default code exchange (`oauth_http_server.cpp:374-441`): POST the
    * authorization-code grant as a form, expect `id_token` in the JSON.
    */
  def httpExchange(cfg: Config): ExchangeFn = { code =>
    try {
      val form = Seq(
        "grant_type" -> "authorization_code", "code" -> code,
        "redirect_uri" -> cfg.redirectUri, "client_id" -> cfg.clientId,
        "client_secret" -> cfg.clientSecret)
        .map { case (k, v) => s"$k=${urlEncode(v)}" }.mkString("&")
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(10)).build()
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(cfg.tokenEndpoint))
        .timeout(java.time.Duration.ofSeconds(10))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(form))
        .build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        Left(s"token endpoint returned status ${resp.statusCode()}: ${resp.body()}")
      else jsonStrField(resp.body(), "error") match {
        case Some(err) =>
          val desc = jsonStrField(resp.body(), "error_description").fold("")(d => s": $d")
          Left(s"token exchange error: $err$desc")
        case None => jsonStrField(resp.body(), "id_token")
            .toRight("token endpoint response missing 'id_token' field")
      }
    } catch {
      case scala.util.control.NonFatal(e) => Left(s"token exchange failed: ${e.getMessage}")
    }
  }

  def urlEncode(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)

  def hmacSha256Hex(key: String, msg: String): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    mac.doFinal(msg.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
  }

  /** Minimal top-level string-field extraction from a JSON object — enough
    * for the token-endpoint response and ID-token payload (full documents
    * never route through this; engine JSON functions handle user data).
    */
  private[graft] def jsonStrField(json: String, name: String): Option[String] = {
    val key = "\"" + name + "\""
    var i = json.indexOf(key)
    while (i >= 0) {
      var j = i + key.length
      while (j < json.length && json(j).isWhitespace) j += 1
      if (j < json.length && json(j) == ':') {
        j += 1
        while (j < json.length && json(j).isWhitespace) j += 1
        if (j < json.length && json(j) == '"') {
          val sb = new StringBuilder
          j += 1
          while (j < json.length && json(j) != '"') {
            if (json(j) == '\\' && j + 1 < json.length) {
              json(j + 1) match {
                case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
                case 'u' if j + 5 < json.length =>
                  sb += Integer.parseInt(json.substring(j + 2, j + 6), 16).toChar
                  j += 4
                case c => sb += c
              }
              j += 2
            } else { sb += json(j); j += 1 }
          }
          return Some(sb.toString)
        }
        return None // non-string value under this key
      }
      i = json.indexOf(key, i + 1)
    }
    None
  }

  /** Email (or `sub`) from an UNVERIFIED JWT payload — the early-rejection
    * check only (`oauth_http_server.cpp:443-479`); cryptographic
    * verification is [[TokenAuth]]'s job when the token reaches `/auth`.
    */
  private[graft] def emailOf(idToken: String): Either[String, String] =
    idToken.split('.') match {
      case parts if parts.length >= 2 =>
        try {
          val payload = new String(
            java.util.Base64.getUrlDecoder.decode(parts(1)), StandardCharsets.UTF_8)
          jsonStrField(payload, "email").orElse(jsonStrField(payload, "sub"))
            .toRight("ID token has neither email nor sub claim")
        } catch {
          case scala.util.control.NonFatal(e) => Left(s"failed to decode ID token: ${e.getMessage}")
        }
      case _ => Left("malformed ID token")
    }

  /** Case-insensitive allow-list match: `*`, `*@domain` suffix, or exact
    * (`oauth_http_server.cpp:481-504`). Empty list = everyone.
    */
  private[graft] def emailAuthorized(patterns: Seq[String], email: String): Boolean =
    patterns.isEmpty || {
      val e = email.toLowerCase
      patterns.map(_.toLowerCase).exists { p =>
        p == "*" || (p.startsWith("*") && e.endsWith(p.drop(1))) || e == p
      }
    }
}

final class OAuthFlow(val cfg: OAuthFlow.Config,
    clock: () => Long = () => System.currentTimeMillis()) {
  import OAuthFlow._

  private val exchangeFn: ExchangeFn = cfg.exchange.getOrElse(httpExchange(cfg))

  private final class Pending(val createdAt: Long) {
    var idToken: Option[String] = None
    var error: Option[String] = None
    // set under the flow lock BEFORE the out-of-lock code exchange: a
    // second callback for the same state must take the 409 path instead of
    // exchanging the same code twice (r15 ADVICE — the reference marks the
    // entry under one mutex before exchanging)
    var inFlight: Boolean = false
  }
  private val pending = new java.util.HashMap[String, Pending]()

  private def sweep(): Unit = {
    val cutoff = clock() - cfg.challengeTimeoutMs
    pending.entrySet().removeIf(e => e.getValue.createdAt < cutoff)
  }

  /** The IdP authorization URL for a session hash (state carries the hash,
    * optionally prefixed `instanceId.` for proxy routing).
    */
  private def authUrl(sessionHash: String): String = {
    val state = if (cfg.instanceId.nonEmpty) s"${cfg.instanceId}.$sessionHash" else sessionHash
    cfg.authorizationEndpoint +
      "?response_type=code" +
      s"&client_id=${urlEncode(cfg.clientId)}" +
      s"&redirect_uri=${urlEncode(cfg.redirectUri)}" +
      s"&scope=${urlEncode(cfg.scopes)}" +
      s"&state=${urlEncode(state)}"
  }

  private def stripInstancePrefix(state: String): String = {
    val prefix = cfg.instanceId + "."
    if (cfg.instanceId.nonEmpty && state.startsWith(prefix)) state.drop(prefix.length)
    else state
  }

  // ---- handlers (status, content-type, body) -------------------------------

  /** GET /oauth/initiate — mint uuid, register hash, return the auth URL. */
  def initiate(): (Int, String, Array[Byte]) = synchronized {
    sweep()
    val uuid = UUID.randomUUID().toString
    val hash = hmacSha256Hex(cfg.secretKey, uuid)
    pending.put(hash, new Pending(clock()))
    val body = s"""{"session_uuid":"$uuid","auth_url":"${authUrl(hash)}"}"""
    (200, "application/json", body.getBytes(StandardCharsets.UTF_8))
  }

  /** GET /oauth/start?session=HASH — register + 302 to the IdP. */
  def start(session: Option[String]): (Int, String, Array[Byte], Option[String]) =
    synchronized {
      sweep()
      session.filter(_.nonEmpty) match {
        case None =>
          (400, "text/html", errorPage("Missing session parameter"), None)
        case Some(hash) if pending.containsKey(hash) =>
          (409, "text/html", errorPage("Session already in progress"), None)
        case Some(hash) =>
          pending.put(hash, new Pending(clock()))
          (302, "text/html", Array.emptyByteArray, Some(authUrl(hash)))
      }
    }

  /** GET /oauth/callback?code&state (or ?error[&error_description]&state). */
  def callback(params: Map[String, String]): (Int, String, Array[Byte]) = {
    synchronized(sweep())
    params.get("error") match {
      case Some(err) =>
        val desc = params.getOrElse("error_description", err)
        synchronized {
          params.get("state").map(stripInstancePrefix).foreach { h =>
            Option(pending.get(h)).foreach(_.error = Some(desc))
          }
        }
        return (200, "text/html", errorPage(desc))
      case None =>
    }
    (params.get("code"), params.get("state").map(stripInstancePrefix)) match {
      case (Some(code), Some(hash)) =>
        // check-and-mark is ONE critical section: the in-flight flag is set
        // before the lock is released, so a concurrent duplicate callback
        // can never pass the completion check and exchange the same code
        // twice (the exchange itself still leaves the lock — a slow IdP
        // must not block polls)
        val state = synchronized {
          Option(pending.get(hash)) match {
            case None => Left((200, "text/html", expiredPage))
            case Some(p) if p.idToken.isDefined || p.error.isDefined || p.inFlight =>
              Left((409, "text/html", errorPage("Session already completed")))
            case Some(p) =>
              p.inFlight = true
              Right(p)
          }
        }
        state match {
          case Left(resp) => resp
          case Right(p) =>
            val outcome =
              try exchangeFn(code).flatMap { idToken =>
                emailOf(idToken).flatMap { email =>
                  if (emailAuthorized(cfg.authorizedEmailPatterns, email)) Right(idToken)
                  else Left(s"User '$email' is not authorized")
                }
              } catch {
                // an exchange that THROWS must not leave the entry wedged
                // in-flight forever (poll would read "pending" until expiry)
                case scala.util.control.NonFatal(e) =>
                  Left(s"token exchange failed: ${e.getMessage}")
              }
            outcome match {
              case Left(err) =>
                synchronized { p.error = Some(err); p.inFlight = false }
                (200, "text/html", errorPage(err))
              case Right(idToken) =>
                synchronized { p.idToken = Some(idToken); p.inFlight = false }
                (200, "text/html", successPage)
            }
        }
      case _ => (400, "text/html", errorPage("Missing code or state parameter"))
    }
  }

  /** GET /oauth/token/&lt;uuid&gt; — one-time poll for the completed auth. */
  def tokenPoll(uuid: String): (Int, String, Array[Byte]) = synchronized {
    sweep()
    val hash = hmacSha256Hex(cfg.secretKey, uuid)
    val (status, body) = Option(pending.get(hash)) match {
      case None => (404, """{"status":"not_found"}""")
      case Some(p) if p.error.isDefined =>
        (200, s"""{"status":"error","error":${jsonQuote(p.error.get)}}""")
      case Some(p) if p.idToken.isDefined =>
        pending.remove(hash) // one-time use
        (200, s"""{"status":"complete","token":${jsonQuote(p.idToken.get)}}""")
      case Some(_) => (200, """{"status":"pending"}""")
    }
    (status, "application/json", body.getBytes(StandardCharsets.UTF_8))
  }

  /** Pending-session count (tests/metrics). */
  def pendingCount: Int = synchronized { sweep(); pending.size() }

  private def jsonQuote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"; case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  // ---- pages (own minimal rendering; reference ships styled templates in
  // oauth_html_templates.h — the CONTRACT is content-type + the message) ----

  private def page(title: String, msg: String): Array[Byte] =
    (s"<!DOCTYPE html><html><head><title>$title</title></head><body>" +
      s"<h1>$title</h1><p>${escapeHtml(msg)}</p></body></html>")
      .getBytes(StandardCharsets.UTF_8)

  private def escapeHtml(s: String): String =
    s.flatMap {
      case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
      case '"' => "&quot;"; case c => c.toString
    }

  private def errorPage(err: String): Array[Byte] =
    page("Authentication failed", err)
  private val successPage: Array[Byte] =
    page("Authentication successful", "You may close this window and return to the client.")
  private val expiredPage: Array[Byte] =
    page("Session expired", "The sign-in session expired or does not exist. Start again.")
}
