package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-21 optimization guards: the MinHash and SimHash signature builders
  * were rewritten from explode-N×-then-aggregate row form into single-pass
  * wide aggregations (one groupBy(doc_id) computing all hash/vote columns —
  * optimization guide §2.3/§2.4: no row amplification into the exchange, one
  * shuffle instead of two). The rewrite must be VALUE-invisible: this spec
  * re-derives both signatures with the old row-form spelling, inline, and
  * pins bit-equality on the fixture corpus, plus the band-key strings the
  * LSH pipelines derive from them (concat order must equal the old
  * sort_array(collect_list(struct(i, minh))) order).
  */
class WideSigSpec extends AnyFunSuite with SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("wide MinHash equals the row-form explode spelling, per (doc, i)") {
    import graft.functions.TextFns
    // Old spelling, reconstructed: explode i∈0..7 over distinct shingles,
    // min(affineHash) per (doc_id, i).
    val rowForm = Tables.documents(spark, d)
      .select(col("doc_id"),
        explode(array_distinct(TextFns.shinglesFromText(col("text"), 3))).as("sh"))
      .withColumn("h", TextFns.rollingHash(col("sh")))
      .withColumn("i", explode(sequence(lit(0), lit(7))))
      .groupBy(col("doc_id"), col("i"))
      .agg(min(TextFns.affineHash(col("h"), col("i"))).as("minh"))
    // New spelling, via its public consumer: q_dedup_minhash's band keys
    // are "m_{2b},m_{2b+1}" — reassemble the same strings from the row form
    // and compare the full bucket tables.
    val rowBuckets = rowForm
      .withColumn("band", (col("i") / 2).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("i"), col("minh")))),
        p => p.getField("minh").cast("string")), ",").as("bkey"))
      .select(col("doc_id"), col("band"), col("bkey"))
      .collect().map(_.toString).sorted.toSeq
    val wideBuckets = graft.operators.TextQueries.bandBuckets(spark, d)
      .select(col("doc_id"), col("band"), col("bkey"))
      .collect().map(_.toString).sorted.toSeq
    assert(rowBuckets.nonEmpty, "empty fixture defeats the comparison")
    assert(wideBuckets == rowBuckets, "wide MinHash band keys diverge from row-form")
  }

  test("wide SimHash equals the row-form two-level vote aggregation (16 and 60 bit)") {
    import graft.functions.TextFns
    for (nBits <- Seq(16, 60)) {
      val base = Tables.documents(spark, d)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("w"))
        .withColumn("h1", TextFns.rollingHash(col("w")))
        .withColumn("h2", TextFns.rollingHash(upper(col("w"))))
      val bitExpr =
        if (nBits <= 30) "shiftright(h1, j) % 2"
        else "(CASE WHEN j < 30 THEN shiftright(h1, j) ELSE shiftright(h2, j - 30) END) % 2"
      val rowForm = base
        .withColumn("j", explode(sequence(lit(0), lit(nBits - 1))))
        .withColumn("contrib", when(expr(bitExpr) === 1, lit(1)).otherwise(lit(-1)))
        .groupBy(col("doc_id"), col("j"))
        .agg(sum(col("contrib")).as("v"))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"))
          .otherwise(lit(0L))).as("sig"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val wide = graft.operators.TextQueries.simhashSigsN(spark, d, nBits, "sig")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(wide.nonEmpty && wide == rowForm, s"SimHash($nBits) diverges from row-form")
    }
  }
}
