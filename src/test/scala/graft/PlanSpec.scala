package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests — the scale properties .explain review
  * found, pinned so refactors can't silently regress them: pushdown reaching
  * the scan, pruned read schemas, declared broadcasts, top-k without a global
  * sort, single-shuffle LWW, and no stray exchanges.
  */
class PlanSpec extends AnyFunSuite with SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, d)
    df.queryExecution.executedPlan.toString
  }
  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, d)
    org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
  }

  test("q_scan_project: filter is pushed to the parquet scan and columns pruned") {
    val df = SparkEntry.queries("q_scan_project")(spark, d)
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), scan)
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double,l_shipdate:timestamp"), scan)
  }

  test("q_join_broadcast: both dims broadcast, no shuffle of the fact side for the join") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_topk_files: top-k runs as TakeOrderedAndProject, not a global sort") {
    val p = plan("q_topk_files")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_compact_lww: single shuffle, partial+final aggregation, no window") {
    val p = plan("q_compact_lww")
    assert(!p.contains("Window"), p)
    // max_by over a struct buffer is not hash-aggregable, so Spark picks
    // SortAggregate — still partial (map-side) + final around ONE hash
    // exchange, which is the point: versions reduce before the shuffle.
    assert("SortAggregate".r.findAllIn(p).size >= 2, p)
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q_join_theta_range: range predicate rides the equi join, no BNLJ/cartesian") {
    val p = plan("q_join_theta_range")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_simsearch_topk: fused codegen cosine expression is in the plan") {
    val p = plan("q_simsearch_topk")
    assert(p.contains("graft_cosine_f32"), p)
  }

  test("whole-stage codegen covers the scan+filter+project pipeline of q_scan_project") {
    val s = formatted("q_scan_project")
    assert(s.contains("WholeStageCodegen"), s.take(500))
  }
}
