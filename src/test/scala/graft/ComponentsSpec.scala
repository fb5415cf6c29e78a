package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Components

class ComponentsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Reference labels by plain union-find. */
  private def ufLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> find(v)).toMap
  }

  private def sparkLabels(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] =
    Components.labels(edges.toDF("u", "v"), maxIter)
      .as[(Long, Long)].collect().toMap

  test("property: star contraction equals union-find on random graphs") {
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 8) {
      val n = 10 + rnd.nextInt(40)
      val m = 5 + rnd.nextInt(60)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val got = sparkLabels(edges)
        val want = ufLabels(edges)
        assert(got == want, s"trial $trial: $edges")
      }
    }
  }

  test("long path converges to the min root in O(log n) rounds") {
    // A 200-node path has diameter 199 — min-label propagation at the old
    // 20-round cap would return silently-partial labels; star contraction
    // must finish (and label everything 0) well inside 25 rounds.
    val edges = (0L until 199L).map(i => (i, i + 1))
    val got = sparkLabels(edges)
    assert(got.size == 200 && got.values.forall(_ == 0L))
  }

  test("exhausting the iteration cap throws instead of returning partial labels") {
    val edges = (0L until 63L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException](sparkLabels(edges, maxIter = 1))
    assert(e.getMessage.contains("did not converge"))
  }

  test("edge digest separates sets the old (count, sum, sum) triple confused") {
    // {(3,1),(4,2)} and {(4,1),(3,2)} share count=2, sum(u)=7, sum(v)=3 —
    // the collision ADVICE flagged. The hash-XOR digest must tell them
    // apart, and must be order-insensitive for a permuted equal set.
    val a = Seq((3L, 1L), (4L, 2L)).toDF("u", "v")
    val b = Seq((4L, 1L), (3L, 2L)).toDF("u", "v")
    val aPermuted = Seq((4L, 2L), (3L, 1L)).toDF("u", "v")
    assert(Components.edgeDigest(a) != Components.edgeDigest(b))
    assert(Components.edgeDigest(a) == Components.edgeDigest(aPermuted))
  }

  test("self-loops and duplicate/reversed edges are normalized away") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 2L), (1L, 2L), (4L, 3L))
    assert(sparkLabels(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("canonical=true equals the normalizing path on pre-canonical edges") {
    // Round 22: callers with construction-canonical inputs (u > v strict,
    // distinct, materialized) skip the normalization exchange + checkpoint.
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
      .map(e => (math.max(e._1, e._2), math.min(e._1, e._2)))
      .distinct
    val df = edges.toDF("u", "v").localCheckpoint()
    val fast = Components.labels(df, canonical = true)
      .as[(Long, Long)].collect().toMap
    val slow = Components.labels(df).as[(Long, Long)].collect().toMap
    assert(fast == slow && fast == ufLabels(edges))
  }

  test("incremental fold equals full recontraction over the same edge set") {
    // The q_dedup_cluster_incremental claim, stated directly: folding the
    // new snapshot's edges into the corpus label store (contracting only
    // the quotient graph) must produce EXACTLY the labels a from-scratch
    // contraction of corpus ∪ new edges produces.
    val d = "/root/testdata/sf0.001"
    val fold = SparkEntry.queries("q_dedup_cluster_incremental")(spark, d)
      .as[(Long, Long)].collect().toMap
    // Branches share base-plan lineage, which trips Union constraint
    // rewriting in a direct unionAll here — materialize the (tiny,
    // spec-only) edge lists and re-parallelize instead.
    val edges =
      (graft.operators.TextQueries.incCorpusEdges(spark, d).as[(Long, Long)].collect() ++
        graft.operators.TextQueries.incNewEdges(spark, d).as[(Long, Long)].collect())
        .toSeq.toDF("u", "v")
    val full = Components.labels(edges).as[(Long, Long)].collect().toMap
    assert(fold.nonEmpty && fold == full)
  }
}
