package graft.engine

import java.nio.charset.StandardCharsets
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pending-auth STORE semantics of [[OAuthFlow]] — the state machine under
  * the 11 socket tests (r15 verdict #8): expiry boundaries, duplicate-start
  * 409, one-time token retrieval, and the duplicate-callback race the r15
  * ADVICE flagged (two concurrent callbacks must not both exchange).
  */
class OAuthStoreSpec extends AnyFunSuite {

  private def b64url(s: String): String =
    java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(s.getBytes(StandardCharsets.UTF_8))

  /** Unsigned JWT-shaped token — emailOf only decodes the payload. */
  private def fakeToken(email: String): String =
    b64url("{}") + "." + b64url(s"""{"email":"$email"}""") + ".sig"

  private def cfg(exchange: OAuthFlow.ExchangeFn): OAuthFlow.Config =
    OAuthFlow.Config(
      clientId = "c", clientSecret = "s",
      authorizationEndpoint = "https://idp/authorize",
      tokenEndpoint = "https://idp/token",
      secretKey = "store-spec-key", exchange = Some(exchange))

  private def body(r: (Int, String, Array[Byte])): String =
    new String(r._3, StandardCharsets.UTF_8)

  private def uuidOf(flow: OAuthFlow): String = {
    val init = body(flow.initiate())
    OAuthFlow.jsonStrField(init, "session_uuid").get
  }

  private def stateOf(uuid: String): String =
    OAuthFlow.hmacSha256Hex("store-spec-key", uuid)

  test("concurrent duplicate callbacks: exactly one exchanges, the other " +
      "409s immediately (no double code exchange)") {
    val gate = new CountDownLatch(1)
    val entered = new CountDownLatch(1)
    val exchanges = new AtomicInteger(0)
    val flow = new OAuthFlow(cfg { _ =>
      exchanges.incrementAndGet()
      entered.countDown()
      gate.await(10, TimeUnit.SECONDS)
      Right(fakeToken("a@x.com"))
    })
    val uuid = uuidOf(flow)
    val state = stateOf(uuid)
    @volatile var r1: (Int, String, Array[Byte]) = null
    val t1 = new Thread(() => r1 = flow.callback(Map("code" -> "c1", "state" -> state)))
    t1.start()
    assert(entered.await(10, TimeUnit.SECONDS), "first callback reached the exchange")
    // second callback for the same state while the first is mid-exchange:
    // must take the 409 path without calling the exchange
    val r2 = flow.callback(Map("code" -> "c2", "state" -> state))
    assert(r2._1 == 409, s"expected 409, got ${r2._1}: ${body(r2)}")
    gate.countDown()
    t1.join(10000)
    assert(r1 != null && r1._1 == 200 && body(r1).toLowerCase.contains("success"))
    assert(exchanges.get == 1, "the authorization code was exchanged exactly once")
    // and the token is retrievable exactly once
    assert(body(flow.tokenPoll(uuid)).contains("\"status\":\"complete\""))
    assert(flow.tokenPoll(uuid)._1 == 404)
  }

  test("a THROWING exchange neither wedges the entry in-flight nor loses " +
      "the error") {
    val flow = new OAuthFlow(cfg(_ => throw new RuntimeException("idp down")))
    val uuid = uuidOf(flow)
    val r = flow.callback(Map("code" -> "c", "state" -> stateOf(uuid)))
    assert(r._1 == 200 && body(r).contains("idp down"))
    val polled = body(flow.tokenPoll(uuid))
    assert(polled.contains("\"status\":\"error\"") && polled.contains("idp down"))
  }

  test("property: random op sequences keep the store consistent with the " +
      "reference state machine") {
    // ops: 0=initiate 1=callback-good 2=callback-dup 3=poll 4=advance-14min
    //      5=advance-16min 6=start-dup
    val opGen = Gen.choose(0, 6)
    val seqGen = Gen.listOfN(40, opGen)
    val prop = Prop.forAllNoShrink(seqGen) { ops =>
      var now = 1_000_000L
      val flow = new OAuthFlow(cfg(_ => Right(fakeToken("a@x.com"))), clock = () => now)
      // model: uuid -> (createdAt, completed?)
      var live = Map.empty[String, (Long, Boolean)]
      val timeout = 15 * 60 * 1000L
      def sweepModel(): Unit = live = live.filter { case (_, (t, _)) => t >= now - timeout }
      var ok = true
      ops.foreach { op =>
        sweepModel()
        op match {
          case 0 =>
            val u = uuidOf(flow)
            live += u -> ((now, false))
          case 1 => live.find(!_._2._2) match {
              case Some((u, (t0, _))) =>
                val r = flow.callback(Map("code" -> "c", "state" -> stateOf(u)))
                ok &= r._1 == 200
                live += u -> ((t0, true))
              case None => // no live incomplete entry: an unknown state is "expired"
                val r = flow.callback(Map("code" -> "c", "state" -> "feed" * 16))
                ok &= body(r).toLowerCase.contains("expired")
            }
          case 2 => live.find(_._2._2).foreach { case (u, _) =>
              ok &= flow.callback(Map("code" -> "c", "state" -> stateOf(u)))._1 == 409
            }
          case 3 => live.headOption.foreach { case (u, (_, completed)) =>
              val b = body(flow.tokenPoll(u))
              if (completed) {
                ok &= b.contains("\"status\":\"complete\"")
                live -= u // one-time retrieval
                ok &= flow.tokenPoll(u)._1 == 404
              } else ok &= b.contains("\"status\":\"pending\"")
            }
          case 4 => now += 14 * 60 * 1000L
          case 5 => now += 16 * 60 * 1000L
          case 6 => live.headOption.foreach { case (u, _) =>
              // /oauth/start for an already-pending hash: 409
              ok &= flow.start(Some(stateOf(u)))._1 == 409
            }
        }
        sweepModel()
        ok &= flow.pendingCount == live.size
      }
      ok
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
