package graft.plans

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** The %-code → Java-pattern translation, checked against java.time
  * directly (randomized formats with shrinking) and on the documented
  * code table.
  */
class StrfTimeSpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // C-code → the strftime reference output for 1997-03-05 14:07:09.123456
  private val ts = LocalDateTime.of(1997, 3, 5, 14, 7, 9, 123456000)
  private val expected = Map(
    "%Y" -> "1997", "%y" -> "97", "%m" -> "03", "%d" -> "05",
    "%H" -> "14", "%I" -> "02", "%M" -> "07", "%S" -> "09",
    "%f" -> "123456", "%g" -> "123",
    "%j" -> "064", "%a" -> "Wed", "%A" -> "Wednesday",
    "%b" -> "Mar", "%B" -> "March", "%p" -> "PM")

  test("every supported code formats as C strftime does") {
    expected.foreach { case (code, want) =>
      val got = DateTimeFormatter.ofPattern(StrfTime.toJavaPattern(code),
        java.util.Locale.US).format(ts)
      assert(got == want, s"$code -> pattern ${StrfTime.toJavaPattern(code)} gave $got, want $want")
    }
  }

  test("property: literal runs survive verbatim around any code, quotes included") {
    val litGen = Gen.listOfN(6, Gen.oneOf(
      Gen.alphaChar, Gen.oneOf(' ', '-', '/', ':', '\'', '.', ','))).map(_.mkString)
    val codeGen = Gen.oneOf(expected.keys.toSeq)
    check(Prop.forAll(litGen, codeGen, litGen) { (pre, code, post) =>
      val fmt = pre + code + post
      val out = DateTimeFormatter.ofPattern(StrfTime.toJavaPattern(fmt),
        java.util.Locale.US).format(ts)
      out == pre + expected(code) + post
    })
  }

  test("%% escapes; unknown codes are rejected loudly") {
    assert(DateTimeFormatter.ofPattern(StrfTime.toJavaPattern("%d%%%m"),
      java.util.Locale.US).format(ts) == "05%03")
    val e = intercept[IllegalArgumentException](StrfTime.toJavaPattern("%Q"))
    assert(e.getMessage.contains("%Q"))
    // a trailing bare % is literal text, not a code
    assert(DateTimeFormatter.ofPattern(StrfTime.toJavaPattern("%d%"),
      java.util.Locale.US).format(ts) == "05%")
  }
}
