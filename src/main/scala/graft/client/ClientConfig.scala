package graft.client

/** CLI connection config, re-expressing the reference client's resolution
  * rules (`/root/reference/src/client/client_config.cpp:79-170` env
  * resolution, `:173-260` `gizmosql://` URI parsing,
  * `tests/integration/test_client_config.cpp`):
  *
  *   - env vars fill only fields still at their defaults (explicit flags
  *     win); `GIZMOSQL_USER` wins over `GIZMOSQL_USERNAME` (the server's
  *     spelling is accepted as a fallback so one env setup serves both);
  *   - `gizmosql://host:port?username=…&useEncryption=…` URIs override
  *     host/port and carry JDBC-style query params;
  *   - the display URI never includes the password.
  */
final case class ClientConfig(
    host: String = "localhost",
    port: Int = 31337,
    username: String = "",
    password: String = "",
    passwordProvided: Boolean = false,
    useTls: Boolean = false,
    tlsSkipVerify: Boolean = false)

object ClientConfig {

  val DefaultHost = "localhost"
  val DefaultPort = 31337

  /** Fill defaults from the environment (injectable for tests). */
  def resolveEnv(c: ClientConfig,
      env: String => Option[String] = k => sys.env.get(k).filter(_.nonEmpty)): ClientConfig = {
    var out = c
    if (out.host == DefaultHost)
      env("GIZMOSQL_HOST").foreach(h => out = out.copy(host = h))
    if (out.port == DefaultPort)
      env("GIZMOSQL_PORT").flatMap(_.toIntOption).foreach(p => out = out.copy(port = p))
    if (out.username.isEmpty)
      env("GIZMOSQL_USER").orElse(env("GIZMOSQL_USERNAME"))
        .foreach(u => out = out.copy(username = u))
    if (!out.passwordProvided)
      env("GIZMOSQL_PASSWORD")
        .foreach(p => out = out.copy(password = p, passwordProvided = true))
    // GIZMOSQL_TLS enables TLS like the reference client (client_config.cpp:120-125);
    // only applied while the field is still at its default so explicit flags win.
    if (!out.useTls && env("GIZMOSQL_TLS").exists(parseBool))
      out = out.copy(useTls = true)
    if (env("GIZMOSQL_TLS_SKIP_VERIFY").exists(v => v == "1" || v.equalsIgnoreCase("true")))
      out = out.copy(tlsSkipVerify = true)
    out
  }

  private def parseBool(v: String): Boolean =
    v == "1" || v.equalsIgnoreCase("true") || v.equalsIgnoreCase("yes")

  /** Parse a `gizmosql://host:port?k=v&…` URI onto `base`. */
  def parseUri(uri: String, base: ClientConfig = ClientConfig()): Either[String, ClientConfig] = {
    var out = base
    var rest = uri
    val schemeEnd = rest.indexOf("://")
    if (schemeEnd >= 0) rest = rest.substring(schemeEnd + 3)
    val (hostPort, query) = rest.indexOf('?') match {
      case -1 => (rest, "")
      case i => (rest.substring(0, i), rest.substring(i + 1))
    }
    hostPort.lastIndexOf(':') match {
      case -1 => if (hostPort.nonEmpty) out = out.copy(host = hostPort)
      case i =>
        out = out.copy(host = hostPort.substring(0, i))
        hostPort.substring(i + 1).toIntOption match {
          case Some(p) => out = out.copy(port = p)
          case None => return Left("invalid port in URI")
        }
    }
    if (query.nonEmpty) {
      val params = query.split("&").iterator.map(_.split("=", 2)).collect {
        case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
      params.get("username").foreach(u => out = out.copy(username = u))
      params.get("password").foreach(p => out = out.copy(password = p, passwordProvided = true))
      params.get("useEncryption").foreach(v => out = out.copy(useTls = parseBool(v)))
      params.get("disableCertificateVerification")
        .foreach(v => out = out.copy(tlsSkipVerify = parseBool(v)))
    }
    Right(out)
  }

  /** Display URI — never includes the password. */
  def buildUri(c: ClientConfig): String = {
    val params = Seq(
      Option(c.username).filter(_.nonEmpty).map(u => s"username=$u"),
      if (c.useTls) Some("useEncryption=true") else None,
      if (c.tlsSkipVerify) Some("disableCertificateVerification=true") else None
    ).flatten
    s"gizmosql://${c.host}:${c.port}" +
      (if (params.nonEmpty) params.mkString("?", "&", "") else "")
  }
}
