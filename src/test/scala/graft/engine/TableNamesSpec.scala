package graft.engine

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

  test("shadowName: bare for default-db, mangled for attached") {
    assert(TxnDml.shadowName("default.customer") == "customer")
    assert(TxnDml.shadowName("att.t") == "graft_txn_shadow__att__t")
  }
}
