package graft.server

import graft.{SparkTestHarness, Tables}
import graft.engine.Auth
import java.net.URI
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.security.cert.X509Certificate
import java.util.Base64
import javax.net.ssl.{HostnameVerifier, HttpsURLConnection, KeyManagerFactory, SSLContext, SSLSession, X509TrustManager}
import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** mTLS end-to-end over a real socket: a keytool-minted CA signs a client
  * certificate; the server (configured with the CA bundle, the reference's
  * `--mtls-ca-cert-path`, `/root/reference/src/common/gizmosql_library.cpp:569,
  * 716-720`) admits that client and refuses — at the handshake — both a
  * certless client and one presenting a certificate from a different CA.
  */
class MtlsServerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val secret = "mtls-spec-secret"
  private val password = "pw"
  private val ksPass = "changeit"

  private lazy val workDir = Files.createTempDirectory("graft-mtls").toFile
  private def p(name: String): String = new java.io.File(workDir, name).getAbsolutePath

  private def keytool(args: String*): Unit =
    assert((Seq("keytool") ++ args).! == 0, s"keytool ${args.head} failed")

  /** CA keypair + PEM export, server identity, CA-signed client identity. */
  private lazy val material: Unit = {
    keytool("-genkeypair", "-alias", "ca", "-keyalg", "RSA", "-keysize", "2048",
      "-storetype", "PKCS12", "-keystore", p("ca.p12"), "-storepass", ksPass,
      "-dname", "CN=GraftTestCA", "-ext", "bc:c", "-validity", "2")
    keytool("-exportcert", "-alias", "ca", "-keystore", p("ca.p12"),
      "-storepass", ksPass, "-rfc", "-file", p("ca.pem"))
    keytool("-genkeypair", "-alias", "server", "-keyalg", "RSA", "-keysize", "2048",
      "-storetype", "PKCS12", "-keystore", p("server.p12"), "-storepass", ksPass,
      "-dname", "CN=127.0.0.1", "-ext", "SAN=IP:127.0.0.1", "-validity", "2")
    keytool("-genkeypair", "-alias", "client", "-keyalg", "RSA", "-keysize", "2048",
      "-storetype", "PKCS12", "-keystore", p("client.p12"), "-storepass", ksPass,
      "-dname", "CN=graft-client", "-validity", "2")
    keytool("-certreq", "-alias", "client", "-keystore", p("client.p12"),
      "-storepass", ksPass, "-file", p("client.csr"))
    keytool("-gencert", "-alias", "ca", "-keystore", p("ca.p12"), "-storepass", ksPass,
      "-infile", p("client.csr"), "-outfile", p("client.crt"), "-rfc", "-validity", "2")
    keytool("-importcert", "-alias", "ca", "-keystore", p("client.p12"),
      "-storepass", ksPass, "-file", p("ca.pem"), "-noprompt")
    keytool("-importcert", "-alias", "client", "-keystore", p("client.p12"),
      "-storepass", ksPass, "-file", p("client.crt"))
  }

  private lazy val (server, port) = {
    material
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val tls = GraftHttpServer.Tls.fromKeystore(
      p("server.p12"), ksPass.toCharArray, mtlsCaCert = Some(p("ca.pem")))
    assert(tls.needClientAuth)
    val s = new GraftHttpServer(spark, secret, Auth.hashPassword(secret, password),
      onSessionCreate = Tables.ensure(_, SparkTestHarness.sfDir), tls = Some(tls))
    (s, s.start())
  }

  private val trustAllTm = new X509TrustManager {
    override def checkClientTrusted(c: Array[X509Certificate], a: String): Unit = ()
    override def checkServerTrusted(c: Array[X509Certificate], a: String): Unit = ()
    override def getAcceptedIssuers: Array[X509Certificate] = Array.empty
  }

  /** Client SSLContext with the given keystore as its identity (None = no
    * client certificate); server trust is trust-all (self-signed server).
    */
  private def clientCtx(keystorePath: Option[String]): SSLContext = {
    material // keystores must exist before loading an identity from them
    val kms = keystorePath.map { path =>
      val ks = java.security.KeyStore.getInstance("PKCS12")
      val in = Files.newInputStream(java.nio.file.Paths.get(path))
      try ks.load(in, ksPass.toCharArray) finally in.close()
      val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(ks, ksPass.toCharArray)
      kmf.getKeyManagers
    }.orNull
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kms, Array(trustAllTm), null)
    ctx
  }

  private def post(ctx: SSLContext, path: String, body: String,
      headers: (String, String)*): (Int, Array[Byte]) = {
    val conn = URI.create(s"https://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpsURLConnection]
    conn.setSSLSocketFactory(ctx.getSocketFactory)
    conn.setHostnameVerifier(new HostnameVerifier {
      override def verify(h: String, s: SSLSession): Boolean = true
    })
    conn.setRequestMethod("POST")
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val bytes = if (stream == null) Array.empty[Byte] else stream.readAllBytes()
    conn.disconnect()
    (code, bytes)
  }

  private def basic(user: String, pass: String): String =
    "Basic " + Base64.getEncoder.encodeToString(
      s"$user:$pass".getBytes(StandardCharsets.UTF_8))

  test("CA-signed client certificate is admitted and can auth + query") {
    val ctx = clientCtx(Some(p("client.p12")))
    val (code, body) = post(ctx, "/auth", "",
      "Authorization" -> basic("gizmosql_username", password))
    assert(code == 200)
    val token = new String(body, StandardCharsets.UTF_8)
      .split("\"token\":\"")(1).split("\"")(0)
    val (qCode, qBody) = post(ctx, "/sql", "SELECT COUNT(*) AS n FROM region",
      "Authorization" -> s"Bearer $token", "Accept" -> "application/json")
    assert(qCode == 200)
    assert(new String(qBody, StandardCharsets.UTF_8) == """[{"n":5}]""")
  }

  test("client without a certificate is refused at the handshake") {
    val ctx = clientCtx(None)
    intercept[java.io.IOException] {
      post(ctx, "/auth", "", "Authorization" -> basic("gizmosql_username", password))
    }
  }

  test("client certificate from a different CA is refused at the handshake") {
    // Self-signed identity: does not chain to the server's configured CA.
    keytool("-genkeypair", "-alias", "rogue", "-keyalg", "RSA", "-keysize", "2048",
      "-storetype", "PKCS12", "-keystore", p("rogue.p12"), "-storepass", ksPass,
      "-dname", "CN=rogue-client", "-validity", "2")
    val rogue = {
      val ks = java.security.KeyStore.getInstance("PKCS12")
      val in = Files.newInputStream(java.nio.file.Paths.get(p("rogue.p12")))
      try ks.load(in, ksPass.toCharArray) finally in.close()
      val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(ks, ksPass.toCharArray)
      val ctx = SSLContext.getInstance("TLS")
      ctx.init(kmf.getKeyManagers, Array(trustAllTm), null)
      ctx
    }
    intercept[java.io.IOException] {
      post(rogue, "/auth", "", "Authorization" -> basic("gizmosql_username", password))
    }
  }

  test("server closes cleanly") {
    server.close()
  }
}
