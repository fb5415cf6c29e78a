package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFns

/** Pins the round-22 (doc_id, gram, cnt)-grain gram artifact against the
  * old occurrence-grain spellings: the exact-substring family's outputs are
  * re-derived here from the RAW occurrence stream (explode, no
  * pre-aggregation, countDistinct as before) and must match the declared
  * queries row-for-row. Guards the sum(cnt) ≡ count(occurrences) and
  * count(1)-over-unique-pairs ≡ countDistinct(doc_id) identities the
  * one-exchange consumers now rely on.
  */
class GramGrainSpec extends AnyFunSuite with SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def rawGrams(w: Int) =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextFns.shinglesFromText(col("text"), w)).as("gram"))

  test("q_dedup_substring equals the occurrence-grain spelling") {
    val old = rawGrams(10)
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("gram"))
      .limit(100)
      .collect()
    val now = SparkEntry.queries("q_dedup_substring")(spark, sfDir).collect()
    assert(now.toSeq === old.toSeq)
    assert(now.nonEmpty)
  }

  test("q_dedup_substring_frac equals the occurrence-grain spelling") {
    val grams = rawGrams(10)
    val perDoc = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_gram"))
    val dupGrams = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1).select(col("gram"))
    val dupPerDoc = grams.join(dupGrams, "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    val old = perDoc.join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_gram"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_frac", round(col("n_dup") / col("n_gram"), 4))
      .orderBy(col("dup_frac").desc, col("doc_id"))
      .limit(100)
      .collect()
    val now = SparkEntry.queries("q_dedup_substring_frac")(spark, sfDir).collect()
    assert(now.toSeq === old.toSeq)
    assert(now.nonEmpty)
  }

  test("q_text_decontam equals the countDistinct spelling") {
    val g = rawGrams(8).distinct()
    val evalSet = g.filter(col("doc_id") % 11 === 0)
      .groupBy(col("gram")).agg(countDistinct(col("doc_id")).as("edf"))
      .filter(col("edf") <= 20).select(col("gram"))
    val train = g.filter(col("doc_id") % 11 =!= 0)
    val tot = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_gram"))
    val hits = train.join(evalSet, "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    val old = tot.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_gram"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("hit_frac", round(col("n_hit") / col("n_gram"), 4))
      .withColumn("flagged", (col("n_hit") > 0).cast("long"))
      .orderBy(col("hit_frac").desc, col("doc_id"))
      .limit(100)
      .collect()
    val now = SparkEntry.queries("q_text_decontam")(spark, sfDir).collect()
    assert(now.toSeq === old.toSeq)
    assert(now.nonEmpty)
  }
}
