package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Dev scratchpad: time alternative formulations of hot queries at a given
  * sf. Not part of the library surface.
  */
object DevProbe {
  private def pairAgg(sh: DataFrame): DataFrame =
    sh.as("x")
      .join(sh.as("y"), col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n_sh").as("na"), col("y.n_sh").as("nb"))
      .agg(count(lit(1)).as("shared"))
      .select(col("doc_a"), col("doc_b"),
        round(col("shared") / (col("na") + col("nb") - col("shared")), 4).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.tuned("local[32]", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, d)

    // v1: current — HOF shingles; split(text) re-evaluated inside the lambda
    def v1 = {
      val sh = docs.select(col("doc_id"),
          array_distinct(TextFns.shinglesHof(TextFns.tokens(col("text")), 3)).as("shs"))
        .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
      pairAgg(sh)
    }

    // v2: HOF shingles but tokens materialized through a repartition barrier
    def v2 = {
      val base = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .repartition(32, col("doc_id"))
      val sh = base.select(col("doc_id"),
          array_distinct(TextFns.shinglesHof(col("toks"), 3)).as("shs"))
        .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
      pairAgg(sh)
    }

    // v3: codegen path — posexplode + lead window, no HOFs at all
    def v3 = {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val sh0 = docs
        .select(col("doc_id"), posexplode(TextFns.tokens(col("text"))).as(Seq("pos", "w")))
        .select(col("doc_id"), col("pos"),
          concat_ws(" ", col("w"), lead("w", 1).over(w), lead("w", 2).over(w)).as("sh"),
          lead("w", 2).over(w).as("guard"))
        .filter(col("guard").isNotNull)
        .select(col("doc_id"), col("sh")).distinct()
      val sh = sh0.withColumn("n_sh",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      pairAgg(sh)
    }

    // v4: opaque TokenShingles expression — no barrier, recompute-safe
    def v4 = {
      val sh = docs.select(col("doc_id"),
          array_distinct(TextFns.shinglesFromText(col("text"), 3)).as("shs"))
        .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
      pairAgg(sh)
    }

    // time mode: repeated interleaved timing of named registry queries on
    // `d` — args(1)=time, args(2)=comma-separated names, args(3)=reps.
    // Long-running reps give jstack something to sample.
    if (args.lift(1).contains("time")) {
      val qs = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq("q_dedup_lsh_sweep"))
      val reps = args.lift(3).map(_.toInt).getOrElse(5)
      for (rep <- 1 to reps; name <- qs) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, d).count()
        println(f"[probe] $name%-28s rep$rep rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.stop(); return
    }

    // bucketmark A/B: the shared bucket-marking pre-pass (TextQueries
    // .markBuckets) spelled as a window aggregate vs groupBy+join-back,
    // interleaved same-JVM over the three NON-memoized consumers (memoized
    // paths — starEdges/candidateEdges — would cache variant A's edges and
    // poison variant B's timing; starEdgesOf's marking is the minhash
    // window minus the count, so q_dedup_minhash covers its shape). Run on
    // a hotbucket-amplified dir (ScaleProbe) so degenerate buckets dominate.
    if (args.lift(1).contains("bucketmark")) {
      val reps = args.lift(2).map(_.toInt).getOrElse(3)
      val qs = Seq("q_dedup_minhash", "q_dedup_prefix", "q_dedup_simhash_pairs")
      try
        for (rep <- 1 to reps; variant <- Seq("window", "groupjoin"); name <- qs) {
          sys.props("graft.markBuckets") = variant
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(name)(spark, d).count()
          println(f"[probe] bucketmark-$variant%-9s $name%-24s rep$rep rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      finally sys.props.remove("graft.markBuckets")
      spark.stop(); return
    }

    // editdist A/B: naive full-DP vs adaptive banded DP, same memoized
    // candidate edges, 3 reps each interleaved (run with args(1)=editdist).
    if (args.lift(1).contains("editdist")) {
      val texts = docs.select(col("doc_id"), col("text"))
      def joined = graft.operators.TextQueries.candidateEdges(spark, d)
        .join(texts.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
        .join(texts.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      def naive = joined
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("ta"), col("tb")).cast("long").as("dist"))
        .orderBy(col("dist"), col("doc_a"), col("doc_b")).limit(10)
      def adaptive = {
        val pairs = joined
          .withColumn("gap", abs(length(col("ta")) - length(col("tb"))))
          .localCheckpoint()
        val mlRow = pairs.agg(max(greatest(length(col("ta")), length(col("tb"))))).head()
        val maxLen = if (mlRow.isNullAt(0)) 0 else mlRow.getInt(0)
        def countWithin(t: Int): Long = pairs
          .where(col("gap") <= t)
          .where(levenshtein(col("ta"), col("tb"), t) >= 0).count()
        var t = math.min(2, math.max(maxLen, 1))
        var n = countWithin(t)
        while (n < 10 && t < maxLen) { t = math.min(t * 4, maxLen); n = countWithin(t) }
        pairs.where(col("gap") <= t)
          .select(col("doc_a"), col("doc_b"),
            levenshtein(col("ta"), col("tb"), t).cast("long").as("dist"))
          .where(col("dist") >= 0)
          .orderBy(col("dist"), col("doc_a"), col("doc_b")).limit(10)
      }
      // adaptive2: one banded pass at T=8, checkpoint ONLY qualifying rows
      def adaptive2 = {
        val mlRow = joined.agg(max(greatest(length(col("ta")), length(col("tb"))))).head()
        val maxLen = if (mlRow.isNullAt(0)) 0 else mlRow.getInt(0)
        def withinT(t: Int) = joined
          .where(abs(length(col("ta")) - length(col("tb"))) <= t)
          .select(col("doc_a"), col("doc_b"),
            levenshtein(col("ta"), col("tb"), t).cast("long").as("dist"))
          .where(col("dist") >= 0)
          .localCheckpoint()
        var t = math.min(8, math.max(maxLen, 1))
        var q = withinT(t)
        while (q.count() < 10 && t < maxLen) { t = math.min(t * 4, maxLen); q = withinT(t) }
        q.orderBy(col("dist"), col("doc_a"), col("doc_b")).limit(10)
      }
      // banded-expr: adaptive2 with the codegen BandedEditDistance
      // (prefix/suffix strip + char-banded DP) replacing the builtin
      def bandedExpr = {
        val mlRow = joined.agg(max(greatest(length(col("ta")), length(col("tb"))))).head()
        val maxLen = if (mlRow.isNullAt(0)) 0 else mlRow.getInt(0)
        def withinT(t: Int) = joined
          .where(abs(length(col("ta")) - length(col("tb"))) <= t)
          .select(col("doc_a"), col("doc_b"),
            TextFns.bandedEditDist(col("ta"), col("tb"), t).cast("long").as("dist"))
          .where(col("dist") >= 0)
          .localCheckpoint()
        var t = math.min(8, math.max(maxLen, 1))
        var q = withinT(t)
        while (q.count() < 10 && t < maxLen) { t = math.min(t * 4, maxLen); q = withinT(t) }
        q.orderBy(col("dist"), col("doc_a"), col("doc_b")).limit(10)
      }
      val variants =
        if (args.contains("all"))
          Seq("naive" -> (() => naive), "adaptive" -> (() => adaptive),
            "adaptive2" -> (() => adaptive2), "banded-expr" -> (() => bandedExpr))
        else Seq("adaptive2" -> (() => adaptive2), "banded-expr" -> (() => bandedExpr))
      for (rep <- 1 to 3; (name, q) <- variants) {
        val t0 = System.nanoTime()
        val n = q().count()
        println(f"[probe] editdist-$name rep$rep rows=$n ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      spark.stop(); return
    }

    for ((name, q) <- Seq("v1-hof" -> (() => v1), "v2-barrier" -> (() => v2),
        "v3-window" -> (() => v3), "v4-expr" -> (() => v4))) {
      val t0 = System.nanoTime()
      val n = q().count()
      println(f"[probe] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
