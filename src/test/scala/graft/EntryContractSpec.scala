package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants (SURVEY.md §0 "Driver contract"). */
class EntryContractSpec extends AnyFunSuite with SparkSpec {

  /** Queries deliberately shipped without a DuckDB oracle (driver then
    * records a rows-only check). Empty since round 5: the last holdout
    * (q_agg_approx_distinct) now oracles its bounded-error contract —
    * each engine checks its own sketch against the ±5% envelope.
    */
  private val noOracle = Set.empty[String]

  test("every oracle has a query; only documented no-oracle queries lack one") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet == noOracle)
  }

  test("entry() returns rows on sf0.001 (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query returns rows on sf0.001 (no vacuous operators)") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      if (n == 0) Some(name) else None
    }
    // q_join_anti/q_setop_except legitimately depend on orphan orders which
    // exist at every sf; nothing should be empty.
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("q_pack_sequences phase 2 conserves tokens and improves bin utilization") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val packed = SparkEntry.queries("q_pack_sequences")(spark, d)
      .agg(sum(col("seq_tokens")).as("tok"), count(lit(1)).as("n_seqs"))
      .collect().head
    // single-phase reference: pack within (lang, shard) only — what the
    // query produced before tail compaction
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
    val single = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), (col("doc_id") / 200).cast("long").as("shard"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("seq_id", floor((col("cum") - col("n_tok")) / lit(4096)).cast("long"))
      .groupBy(col("lang"), col("shard"), col("seq_id"))
      .agg(sum(col("n_tok")).as("seq_tokens"))
      .agg(sum(col("seq_tokens")).as("tok"), count(lit(1)).as("n_seqs"))
      .collect().head
    assert(packed.getLong(0) == single.getLong(0), "token conservation")
    assert(packed.getLong(1) <= single.getLong(1),
      s"compaction must not increase sequence count: ${packed.getLong(1)} vs ${single.getLong(1)}")
  }
}
