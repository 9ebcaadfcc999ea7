package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtensionCatalog

/** CI form of the portable-twin audit (r12 verdict item 4): every
  * query the driver can only rows-check (no `oracleSql` entry) must
  * have a declared oracle-checked twin in
  * [[ExtensionCatalog.portableTwins]], so twin coverage can't silently
  * regress as ops are added — the mapping used to live only in SURVEY
  * prose. Pure map arithmetic: no SparkSession needed.
  */
class TwinCoverageSpec extends AnyFunSuite {

  private val queries = SparkEntry.queries.keySet
  private val withOracle = SparkEntry.oracleSql.keySet
  private val rowsOnly = queries -- withOracle
  private val twins = ExtensionCatalog.portableTwins

  test("every rows-only query has a declared portable twin") {
    val uncovered = rowsOnly -- twins.keySet
    assert(uncovered.isEmpty,
      s"rows-only queries with NO oracle-checked twin: $uncovered — " +
        "add a portable twin (the x43/x71/x72/x114/x120-x122 pattern) " +
        "and declare it in ExtensionCatalog.portableTwins")
  }

  test("every declared twin exists and is oracle-backed") {
    twins.foreach { case (sketch, twin) =>
      assert(queries.contains(twin),
        s"$sketch's twin $twin is not in SparkEntry.queries")
      assert(withOracle.contains(twin),
        s"$sketch's twin $twin has no oracleSql entry — a rows-only " +
          "twin verifies nothing")
    }
  }

  test("the twin map has no stale keys") {
    val stale = twins.keySet -- rowsOnly
    assert(stale.isEmpty,
      s"portableTwins entries whose key now HAS an oracle (or no " +
        s"longer exists): $stale — prune the map")
  }

  test("a twin is not itself rows-only-twinned (one level deep)") {
    val twinned = twins.values.toSet
    assert(twinned.intersect(twins.keySet).isEmpty,
      "a portable twin must terminate at an oracle-backed query")
  }

  test("every rows-only query has a pinned sf0.01 row-count constant") {
    // r19 (verdict item 4): Verify's no_oracle_twins.json sidecar
    // compares each dump against these constants — a rows-only query
    // without one would silently ship without its stability check
    assert(ExtensionCatalog.noOracleRowsSf001.keySet == rowsOnly,
      s"noOracleRowsSf001 keys must be exactly the rows-only set; " +
        s"missing: ${rowsOnly -- ExtensionCatalog.noOracleRowsSf001.keySet}, " +
        s"stale: ${ExtensionCatalog.noOracleRowsSf001.keySet -- rowsOnly}")
  }
}
