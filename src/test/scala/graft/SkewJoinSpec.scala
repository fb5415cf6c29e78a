package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.JoinQueries

/** The skew-salted join's contract: the two-path (hot salted / cold plain)
  * split is row-identical to the plain join for ANY hot-key set, so hot-key
  * DETECTION may be approximate. Proven here for both detection modes —
  * exact full count (fixture default) and the production seeded-sample
  * estimate behind `spark.graft.skew.sampleDetect` — against the plain
  * sort-merge join computed independently.
  */
class SkewJoinSpec extends AnyFunSuite with SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def plainJoin(s: org.apache.spark.sql.SparkSession) =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))

  test("exact hot-key detection (default): output row-identical to the plain join") {
    val got = JoinQueries.skewSaltedJoin(spark, d).collect().toSeq
    val want = plainJoin(spark).collect().toSeq
    assert(got == want)
  }

  test("sampled hot-key detection (spark.graft.skew.sampleDetect=true): output row-identical to the plain join") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.skew.sampleDetect", "true")
    val got = JoinQueries.skewSaltedJoin(s2, d).collect().toSeq
    val want = plainJoin(s2).collect().toSeq
    assert(got == want)
  }

  test("sampled detection is deterministic (seeded hash sample, not rand())") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.skew.sampleDetect", "true")
    val a = JoinQueries.skewSaltedJoin(s2, d).collect().toSeq
    val b = JoinQueries.skewSaltedJoin(s2, d).collect().toSeq
    assert(a == b)
  }

  test("sampled hot set is bounded by the resolution floor — never 'every sampled key'") {
    // Row-identity holds for ANY hot set, so the join-level tests above
    // cannot catch a degenerate estimator. Pin the estimator itself: the
    // exact detector finds hot keys on this fixture (~8+ rows each), while
    // the sampled detector — whose resolution floor is 4 sampled rows ≈ a
    // true count of 40 at rate 10 — must find NONE here (max true count is
    // far below the floor). A detector whose sampled hot set scaled with
    // the data (the "appeared once in the sample" bug) would return ~34%
    // of ALL keys and fail this hard.
    val exact = JoinQueries.skewHotKeys(spark, d, sampled = false).count()
    val sampled = JoinQueries.skewHotKeys(spark, d, sampled = true).count()
    assert(exact > 0, s"exact detector found no hot keys — fixture drifted?")
    assert(sampled == 0, s"sampled hot set should be empty below the resolution floor, got $sampled")
  }
}
