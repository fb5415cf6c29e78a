package graft

/** The driver hash-matches parquet output, so every query must be
  * bit-deterministic across executions — unstable orderings (collect_set,
  * ties without a tiebreak, partition-dependent float folds) would pass once
  * and flake later. Run every query twice and require identical rows.
  */
import org.scalatest.funsuite.AnyFunSuite

class DeterminismSpec extends AnyFunSuite with SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("every query is run-to-run deterministic (collected rows identical)") {
    val diffs = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val a = fn(spark, d).collect().toSeq
      val b = fn(spark, d).collect().toSeq
      if (a == b) None else Some(name)
    }
    assert(diffs.isEmpty, s"nondeterministic queries: $diffs")
  }
}
