package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_text_editdist runs top-10-by-distance with lower-bound pruning: a
  * 10-pair probe sets T, pairs with length gap > T skip the DP, survivors
  * run the banded 3-arg levenshtein. The claim is EXACTNESS — identical
  * output to the naive full-DP spelling — which rests on |len(a)-len(b)|
  * being a true lower bound and T >= the 10th-smallest distance. Pin it by
  * running both spellings on the fixture.
  */
class EditDistPruneSpec extends AnyFunSuite with SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("pruned top-10 is row-identical to the naive full-DP spelling") {
    val pruned = SparkEntry.queries("q_text_editdist")(spark, d).collect().toSeq

    // Naive spelling: full O(len^2) levenshtein on every candidate edge —
    // the SAME memoized edge set the query consumes, so the only difference
    // under test is the pruning. Null texts are filtered identically to the
    // query (the spellings only agree on non-null text: the pruned form's
    // `dist >= 0` drops null distances, a naive asc sort puts them first).
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).where(col("text").isNotNull)
    val cand = graft.operators.TextQueries.candidateEdges(spark, d)
    val naive = cand
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("dist"))
      .orderBy(col("dist"), col("doc_a"), col("doc_b"))
      .limit(10).collect().toSeq

    assert(pruned == naive)
  }
}
