package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucket-marking pre-pass (TextQueries.markBuckets) has two spellings
  * — window aggregate (default) and groupBy+join-back (the
  * `-Dgraft.markBuckets=groupjoin` A/B arm, DevProbe `bucketmark`). They
  * must produce identical ROWS on every consumer, or the A/B compares two
  * different queries. Pinned end-to-end on a fixture with both small and
  * over-cap buckets so the clique phase, the star phase, and the size
  * boundary all execute under both spellings.
  */
class MarkBucketsSpec extends AnyFunSuite with SparkSpec {

  private def withVariant[A](v: String)(body: => A): A = {
    sys.props("graft.markBuckets") = v
    try body finally sys.props.remove("graft.markBuckets")
  }

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("markbuckets").toString
    // 110 clones (over-cap bucket) + three 2-doc near-dup families (small
    // buckets) + noise singletons.
    val template = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = (0L until 110L).map(i => (i, template)) ++
      (0 until 3).flatMap { f =>
        val base = s"family$f one$f two$f three$f four$f five$f six$f seven$f"
        Seq((200L + 2 * f, base), (201L + 2 * f, base + s" tail$f"))
      } ++
      (0 until 5).map(i => (300L + i, s"noise$i only$i tokens$i here$i none$i match$i ever$i"))
    docs.map { case (id, t) => (id, t, "en", "test", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  // The three consumers that rebuild their marking per call (the memoized
  // star/candidate caches would serve variant A's result to variant B).
  private val consumers = Seq("q_dedup_minhash", "q_dedup_prefix", "q_dedup_simhash_pairs")

  test("groupjoin marking emits exactly the window marking's rows on every consumer") {
    for (q <- consumers) {
      val viaWindow = withVariant("window") {
        SparkEntry.queries(q)(spark, dir).collect().map(_.toString).sorted.toSeq
      }
      val viaGroupJoin = withVariant("groupjoin") {
        SparkEntry.queries(q)(spark, dir).collect().map(_.toString).sorted.toSeq
      }
      assert(viaWindow.nonEmpty, s"$q: empty result defeats the comparison")
      assert(viaWindow == viaGroupJoin, s"$q: spellings disagree")
    }
  }

  test("the fixture actually exercises the over-cap star phase") {
    val audit = SparkEntry.queries("q_dedup_cap_audit")(spark, dir)
      .filter(col("pipeline") === "minhash_pairs").collect()
    assert(audit.length == 1 && audit.head.getLong(3) >= 1L,
      s"no over-cap minhash bucket: ${audit.toSeq}")
  }
}
