package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants (SURVEY.md §0 "Driver contract"). */
class EntryContractSpec extends AnyFunSuite with SparkSpec {

  /** Queries deliberately shipped without a DuckDB oracle (driver then
    * records a rows-only check): approx sketches are engine-specific.
    */
  private val noOracle = Set("q_agg_approx_distinct")

  test("every oracle has a query; only documented no-oracle queries lack one") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet == noOracle)
  }

  test("entry() returns rows on sf0.001 (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query returns rows on sf0.001 (no vacuous operators)") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      if (n == 0) Some(name) else None
    }
    // q_join_anti/q_setop_except legitimately depend on orphan orders which
    // exist at every sf; nothing should be empty.
    assert(empty.isEmpty, s"empty results: $empty")
  }
}
