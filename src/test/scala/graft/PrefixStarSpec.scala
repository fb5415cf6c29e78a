package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q_dedup_prefix over-cap bucket semantics: a bucket with >100 members
  * must emit a verified STAR around its minimum doc_id (O(sz) edges, the
  * connectivity-preserving shape), never the C(sz,2) expansion and never
  * nothing (the silent drop it replaced).
  */
class PrefixStarSpec extends AnyFunSuite with SparkSpec {

  test("over-cap bucket emits sz-1 verified star edges to the min-id rep; small buckets still all-pairs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prefixstar").toString
    // 120 identical docs (every prefix-token bucket holds all 120 → over
    // cap) + one small family of 3 near-identical docs (its rare tokens
    // bucket at sz=3 → all-pairs path) + noise docs with unique tokens.
    val template = "alpha beta gamma delta epsilon zeta eta theta"
    val family = Seq("quux corge grault garply template shared",
      "quux corge grault garply template shared extra",
      "quux corge grault garply template shared other")
    val docs =
      (0L until 120L).map(i => (i, template)) ++
        family.zipWithIndex.map { case (t, i) => (200L + i, t) } ++
        Seq((300L, "unique1 only2 here3 nothing4 shared5 never6"))
    docs.map { case (id, t) => (id, t, "en", "test", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_dedup_prefix")(spark, dir).collect()
    val starPairs = out.filter(_.getLong(0) == 0L)
    val familyPairs = out.filter(r => r.getLong(0) >= 200L && r.getLong(0) < 300L)
    // star: exactly one edge per non-rep member of the 120-clone bucket,
    // all with Jaccard 1.0, and NOT the 7140-pair quadratic expansion
    assert(starPairs.length == 119, s"star edges: ${starPairs.length}")
    assert(starPairs.forall(_.getDouble(3) == 1.0))
    assert(out.count(r => r.getLong(0) < 120L && r.getLong(1) < 120L) == 119)
    // small bucket keeps exact all-pairs semantics: C(3,2) = 3 candidates,
    // of which the θ=0.6 verify keeps the true matches (6/7, 6/7, 6/8)
    assert(familyPairs.length == 3, s"family pairs: ${familyPairs.length}")
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
  }
}
