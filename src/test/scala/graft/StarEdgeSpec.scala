package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The clustering family reads star edges (one hub edge per bucket member)
  * instead of the C(sz,2) clique expansion. The claim is that over the SAME
  * band buckets the two edge sets have identical connected components —
  * within a bucket the star connects exactly the clique's member set. Pin
  * it end-to-end on the fixture: contraction labels from both edge sets
  * must be row-identical.
  */
class StarEdgeSpec extends AnyFunSuite with SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("star-edge contraction labels == clique-edge contraction labels") {
    def labelsOf(edges: org.apache.spark.sql.DataFrame) =
      operators.Components.labels(
        edges.select(col("doc_a").as("u"), col("doc_b").as("v")))
        .select(col("v").as("doc_id"), col("lbl"))
        .orderBy(col("doc_id")).collect().toSeq

    val viaStar = labelsOf(operators.TextQueries.starEdges(spark, d))
    val viaClique = labelsOf(operators.TextQueries.candidateEdges(spark, d))
    assert(viaStar.nonEmpty)
    assert(viaStar == viaClique)
  }

  test("star edges are strictly fewer than clique edges and share the vertex set") {
    val star = operators.TextQueries.starEdges(spark, d)
    val clique = operators.TextQueries.candidateEdges(spark, d)
    assert(star.count() <= clique.count())
    val vs = star.select(explode(array(col("doc_a"), col("doc_b"))).as("v")).distinct()
    val vc = clique.select(explode(array(col("doc_a"), col("doc_b"))).as("v")).distinct()
    assert(vs.exceptAll(vc).isEmpty && vc.exceptAll(vs).isEmpty)
  }
}
