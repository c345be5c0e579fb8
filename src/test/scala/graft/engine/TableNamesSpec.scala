package graft.engine

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Canonical table-name collapse — every alias of one physical table must
  * map to one key (staging map, journal, locks, read-only gate).
  */
class TableNamesSpec extends AnyFunSuite {

  test("canonicalParts collapses case, backticks, catalog prefix, and bareness") {
    assert(TableNames.canonicalParts(Seq("t"), "att") == "att.t")
    assert(TableNames.canonicalParts(Seq("ATT", "T"), "default") == "att.t")
    assert(TableNames.canonicalParts(Seq("`att`", "`t`"), "default") == "att.t")
    assert(TableNames.canonicalParts(Seq("spark_catalog", "att", "t"), "default") == "att.t")
    assert(TableNames.canonicalParts(Seq("SPARK_CATALOG", "Att", "T"), "default") == "att.t")
    // 2-part spark_catalog.x is a db named spark_catalog, not a prefix
    assert(TableNames.canonicalParts(Seq("spark_catalog", "t"), "default") == "spark_catalog.t")
  }

  test("databaseOf resolves the segment the read-only gate must check") {
    assert(TableNames.databaseOf("t", "att") == "att")
    assert(TableNames.databaseOf("att.t", "default") == "att")
    assert(TableNames.databaseOf("ATT.T", "default") == "att")
    assert(TableNames.databaseOf("spark_catalog.att.t", "default") == "att")
  }

  test("manifestName keeps the bare spelling for default-db tables only") {
    assert(TableNames.manifestName("default.customer") == "customer")
    assert(TableNames.manifestName("att.t") == "att.t")
    assert(TableNames.manifestName("foo.bar") == "foo.bar")
  }

  test("property: every generated spelling of one table collapses to one " +
      "canonical key, and manifestName is stable across spellings (r16 " +
      "verdict #7 — the canonicalization is load-bearing for the read-only " +
      "gate, txn staging, journal, and locks)") {
    val ident: Gen[String] = for {
      n <- Gen.choose(1, 10)
      cs <- Gen.listOfN(n, Gen.alphaLowerChar)
    } yield cs.mkString
    // a random case-mangling: each char independently upper/lower
    def mangle(s: String, bits: Seq[Boolean]): String =
      s.zip(bits ++ Seq.fill(math.max(0, s.length - bits.length))(false))
        .map { case (c, up) => if (up) c.toUpper else c }.mkString
    val caseBits: Gen[Seq[Boolean]] = Gen.listOfN(10, Gen.oneOf(true, false))
    val caseGen = for {
      // weight in the two names with special handling: the default db
      // (manifestName bare spelling) and a db literally named spark_catalog
      db <- Gen.frequency((6, ident), (1, Gen.const("default")),
        (1, Gen.const("spark_catalog")))
      t <- ident; curDb <- ident
      useCatalog <- Gen.oneOf(true, false)
      catalogCase <- caseBits
      dbBits <- caseBits; tBits <- caseBits
      tickDb <- Gen.oneOf(true, false); tickT <- Gen.oneOf(true, false)
      bareAllowed <- Gen.oneOf(true, false)
    } yield {
      val effCur = if (bareAllowed) db else curDb // bare only valid when db IS the current db
      val bare = bareAllowed
      def q(s: String, tick: Boolean) = if (tick) s"`$s`" else s
      val spelled: Seq[String] =
        if (bare) Seq(q(mangle(t, tBits), tickT))
        else {
          val core = Seq(q(mangle(db, dbBits), tickDb), q(mangle(t, tBits), tickT))
          if (useCatalog) mangle("spark_catalog", catalogCase) +: core else core
        }
      (db, t, effCur.toLowerCase, spelled)
    }
    val prop = Prop.forAllNoShrink(caseGen) { case (db, t, curDb, spelled) =>
      val want = s"$db.$t"
      val got = TableNames.canonicalParts(spelled, curDb)
      val dbOk = TableNames.databaseOf(spelled.mkString("."), curDb) == db
      val manifestStable = TableNames.manifestName(got) == {
        if (db == "default") t else want
      }
      got == want && dbOk && manifestStable
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("shadowName: bare for default-db, mangled for attached") {
    assert(TxnDml.shadowName("default.customer") == "customer")
    assert(TxnDml.shadowName("att.t") == "graft_txn_shadow__att__t")
  }
}
