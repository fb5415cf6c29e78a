package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Round-21 optimization guard for q_recursive_chain: the frontier
  * recursion (WITH RECURSIVE, one equi join per level) was replaced by the
  * closed form its monotone running sum admits — order rn is walked iff
  * rn ≤ 8 and the previous cumulative spend is under the threshold, valid
  * because o_totalprice > 0 makes cum_c strictly increasing per customer.
  * This spec re-runs the ORIGINAL recursive-CTE spelling and pins row
  * equality, and separately asserts the positivity precondition on the
  * fixture (if a future fixture shipped non-positive order totals, the
  * closed form would be wrong — fail loudly here, not silently in the
  * oracle gate).
  */
class RecursiveChainSpec extends AnyFunSuite with SparkSpec {

  private def recursiveForm(d: String): Seq[String] = {
    val s2 = spark.newSession()
    Tables.orders(s2, d)
      .select(col("o_custkey"), col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("price_c"),
        row_number().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))).as("rn"))
      .createOrReplaceTempView("rec_ord_spec")
    s2.sql(
      """WITH RECURSIVE walk(custkey, rn, okey, cum_c) AS (
        |  SELECT o_custkey, rn, o_orderkey, price_c FROM rec_ord_spec WHERE rn = 1
        |  UNION ALL
        |  SELECT o.o_custkey, o.rn, o.o_orderkey, w.cum_c + o.price_c
        |  FROM walk w JOIN rec_ord_spec o
        |    ON o.o_custkey = w.custkey AND o.rn = w.rn + 1
        |  WHERE w.cum_c < 45000000 AND w.rn < 8
        |)
        |SELECT custkey, CAST(max(rn) AS BIGINT) AS hops,
        |       max_by(okey, rn) AS last_okey,
        |       max_by(cum_c, rn) AS cum_c,
        |       CAST(CASE WHEN max_by(cum_c, rn) >= 45000000 THEN 1 ELSE 0 END AS BIGINT) AS crossed
        |FROM walk GROUP BY custkey ORDER BY custkey""".stripMargin)
      .collect().map(_.toString).toSeq
  }

  for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"closed form equals the recursive CTE at $d") {
      val closed = SparkEntry.queries("q_recursive_chain")(spark, d)
        .collect().map(_.toString).toSeq
      val rec = recursiveForm(d)
      assert(closed.nonEmpty, "empty result defeats the comparison")
      assert(closed == rec, "closed form diverges from the recursive CTE")
    }

    test(s"positivity precondition holds at $d (cum_c strictly increasing)") {
      val minPrice = Tables.orders(spark, d)
        .agg(min((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")))
        .head().getLong(0)
      assert(minPrice > 0L,
        s"non-positive order total ($minPrice cents) breaks the closed-form rewrite")
    }
  }
}
