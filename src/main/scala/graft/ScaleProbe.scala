package graft

import org.apache.spark.sql.functions._

/** Dev scale soak (not part of the library surface): amplify the sf0.1
  * documents table K× with near-duplicate replicas — replica r of doc i
  * keeps the text plus one appended `rep<r>` token, so every replica
  * family is a genuine Jaccard≥0.6 near-dup cluster and every hot
  * template family becomes a K×-larger one — then run the dedup-family
  * queries UNCHANGED against the amplified directory and report wall
  * time + output size. This measures the question the fixtures can't:
  * do the capped/banded/star shapes stay near-linear when bucket sizes
  * blow past every cap, or does some path hide a quadratic?
  *
  * A second axis, `length` mode (4th arg): same doc COUNT, text repeated
  * K× per doc — the long-document direction row amplification can't test.
  * Real corpora run 10-100k chars/doc; every O(len) map stage should scale
  * ~K× here, and anything accidentally O(len²) (full-DP edit distance, a
  * quadratic regex) blows up at K=8 already. Near-dup structure is
  * preserved: repeating two near-dup texts K times keeps their shingle
  * sets near-identical.
  *
  * A third axis, `dims` mode: same 2 000 vectors, embedding TILED K×
  * (64 → 1024 dims at K=16) — the production-embedding-width direction.
  * Cosine is scale-invariant and L2 scales uniformly under tiling, so
  * neighbor rankings are preserved while per-element vector work grows K×.
  *
  * A fourth axis, `hotbucket` mode: the FIRST FIVE docs each get K
  * near-dup replicas (tail token per copy) while the rest of the corpus
  * rides along at 1× — the DEGENERATE-bucket direction uniform row
  * amplification can't isolate. At K=20 000 one template family's
  * shared prefix-token / minhash-band / simhash-band buckets hold ~K
  * members, far past every cap: exactly the single-aggregation-row
  * blowup the bounded-state shapes (window pre-truncation, relational
  * stars) exist to survive. Pass = bounded wall time, no OOM, cap audit
  * reporting max_bucket ≈ K with star_edges recovered.
  *
  * A COMBINED axis, `combo` mode (round 12): K× rows AND 8× length
  * together — the axes had only been soaked independently, and hot
  * buckets of LONG documents stress the prefix path's token-array joins
  * (and every pairwise verifier's per-pair cost) differently than either
  * axis alone: bucket membership grows with rows while each verify pays
  * the long-document price. Replica families stay genuine near-dup
  * clusters (rows-style tail token per replica) of 8×-repeated text
  * (length-style tail token per repeat). Embeddings/events ride at 1× —
  * the text path is the object under combined stress. Pass = per-query
  * wall time ≈ (rows factor) × (length mode cost at 8×), nothing
  * super-linear in the product.
  *
  * A FACTS axis, `facts` mode (round 15): orders and lineitem replicated
  * K× with fresh order keys (o_orderkey + rep·10⁹ on both sides, so the
  * orders⋈lineitem FK structure is preserved exactly and per-order line
  * groups stay intact) while customer/supplier/part/nation/region stay 1×
  * (dims stay dims — the star-schema shape at scale) and
  * documents/embeddings/events ride along unamplified. This is the axis
  * the other modes can't test: every prior soak amplified
  * documents/embeddings/events while the TPC-H-shaped heavy join/report
  * queries' fact tables "rode along unamplified" — their plans were
  * PlanSpec-pinned but never row-soaked. Replicating the FACTS makes the
  * big sort-merge joins, the grouped/windowed report aggregations, the
  * correlated subqueries and the frontier recursion each carry K× rows
  * through their shuffles; dims-side broadcasts must STAY broadcasts
  * (the dim cardinality is unchanged) and wall time must stay
  * at-or-below-linear in K. Note per-customer order counts grow K× (the
  * replicas keep o_custkey) — the hot-key direction for the
  * window/groupBy-on-custkey shapes, deliberate.
  *
  * Usage: runMain graft.ScaleProbe [sfDir] [K] [query,query,...] [rows|length|dims|hotbucket|combo|facts]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(20)
    // positional-ish: mode is whichever arg says length/rows (default rows);
    // the query list is whichever arg starts with "q_" — so a run can skip
    // the list without shell-quoting an empty placeholder
    val mode = args.find(Set("length", "rows", "dims", "hotbucket", "combo", "facts")).getOrElse("rows")
    // out=<dir>: keep/reuse the amplified corpus across probe runs (plan
    // iteration on one amplification instead of re-writing it per run); a
    // dir that already holds documents.parquet is reused as-is — the caller
    // owns ensuring it was amplified with the same (sf, K, mode).
    val out = args.find(_.startsWith("out=")).map(_.stripPrefix("out="))
      .getOrElse(java.nio.file.Files.createTempDirectory("scaleprobe").toString)
    val reuse = new java.io.File(s"$out/documents.parquet").exists
    // Reuse is only sound when the existing corpus was amplified with the
    // SAME (sf, K, mode): a mismatch would silently record soak evidence
    // under the wrong label. The manifest written at amplification time is
    // the proof; a corpus without one (pre-round-16) or with different
    // params fails loudly instead of mislabeling.
    val manifest = java.nio.file.Paths.get(s"$out/MANIFEST")
    val params = s"sf=$sf k=$k mode=$mode"
    if (reuse) {
      require(java.nio.file.Files.exists(manifest),
        s"$out holds an amplified corpus but no MANIFEST — re-amplify to a fresh dir (cannot verify it matches $params)")
      val recorded = java.nio.file.Files.readString(manifest).trim
      require(recorded == params,
        s"$out was amplified with '$recorded', this run asks for '$params' — params must match to reuse")
      println(s"[scaleprobe] reusing amplified corpus at $out (manifest verified: $params)")
    }
    // cpus=<n>: core count for the RUN phase (round 22, VERDICT r21 item 6 —
    // sf0.1 is too small to demonstrate parallel scaling: every 8-vs-32
    // bench ratio is ≤1 there because plan+schedule latency dominates. The
    // amplified corpus is where data-bound scaling is measurable: run the
    // same amplified dir at cpus=8 and cpus=32 — `out=` reuse keeps the
    // corpus identical — and record the ratios in BASELINE.md).
    val cpus = args.find(_.startsWith("cpus="))
      .map(_.stripPrefix("cpus=")).getOrElse("32")
    val spark = Sessions.tuned(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    if (!reuse) {
    val docs = Tables.documents(spark, sf)
    val reps = spark.range(k).select(col("id").as("rep"))
    // Replica id shifts are DERIVED (floored at the historical constants so
    // existing soak labels stay comparable): a fixed shift silently collides
    // with genuine ids once the base corpus outgrows it, corrupting the very
    // family structure the soak claims to preserve — the facts-mode
    // o_orderkey fix, applied to every amplified id column.
    def derivedShift(floor: Long, maxId: => Long): Long =
      math.max(floor, maxId + 1L)
    lazy val docShiftVal = derivedShift(10000000L,
      docs.agg(max(col("doc_id"))).head().getLong(0))
    val docShift = lit(if (mode == "length" || mode == "dims" || mode == "facts") 10000000L else docShiftVal)
    val amplifiedDocs =
      if (mode == "length")
        // K× LONGER, same ids: tail token "rep<r>" per copy keeps copies of
        // one doc from being bit-identical segments (substring-dedup would
        // otherwise see a degenerate corpus) while leaving cross-doc
        // near-dup pairs near-dup.
        docs.select(
          col("doc_id"),
          concat_ws(" ", transform(sequence(lit(0), lit(k - 1)),
            r => concat(col("text"), lit(" rep"), r))).as("text"),
          col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")).cast("long"))
      else if (mode == "dims") docs // vector axis only
      else if (mode == "facts") docs // star-schema axis: text rides at 1x
      else if (mode == "combo") {
        // K× rows of 8×-longer docs: length-axis construction first (8
        // repeats, tail token per repeat keeps repeats non-identical),
        // then the rows-axis replica fan-out on top. Replica families of
        // the long texts stay Jaccard-near-dup clusters.
        val longDocs = docs.select(
          col("doc_id"),
          concat_ws(" ", transform(sequence(lit(0), lit(7)),
            r => concat(col("text"), lit(" rep"), r))).as("text"),
          col("lang"), col("source"))
        longDocs.crossJoin(reps)
          .select(
            (col("doc_id") + col("rep") * docShift).as("doc_id"),
            when(col("rep") === 0, col("text"))
              .otherwise(concat(col("text"), lit(" xrep"), col("rep"))).as("text"),
            col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")).cast("long"))
      }
      else if (mode == "hotbucket")
        // Five template families of K near-dup replicas each (rep 0 keeps
        // the original text so the original ids stay present), rest of the
        // corpus unamplified: a targeted degenerate-bucket stress rather
        // than uniform growth.
        docs.filter(col("doc_id") < 5).crossJoin(reps)
          .select(
            (col("doc_id") + col("rep") * docShift).as("doc_id"),
            when(col("rep") === 0, col("text"))
              .otherwise(concat(col("text"), lit(" rep"), col("rep"))).as("text"),
            col("lang"), col("source"), col("n_chars"))
          .unionByName(docs.filter(col("doc_id") >= 5))
      else docs.crossJoin(reps)
        .select(
          (col("doc_id") + col("rep") * docShift).as("doc_id"),
          when(col("rep") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" rep"), col("rep"))).as("text"),
          col("lang"), col("source"), col("n_chars"))
    amplifiedDocs
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    // Embeddings. rows mode: replicas keep the vector (a replica IS a
    // near-dup) but get fresh ids — IVF cells, LSH buckets and top-k heaps
    // all grow Kx. dims mode: same 2 000 ids, vector TILED K× (64 → 64K
    // dims) — cosine is scale-invariant and L2 scales uniformly, so every
    // neighbor ranking is preserved while the per-element work (codegen dot
    // products, Lloyd iterations, PQ subquantizers) grows K×: the
    // production-embedding-width direction (real models emit 768-4096).
    // length mode leaves embeddings at 1×.
    val amplifiedEmb =
      if (mode == "dims")
        Tables.embeddings(spark, sf).select(col("vec_id"),
          flatten(array_repeat(col("embedding"), k)).as("embedding"), col("label"))
      else if (mode != "rows") Tables.embeddings(spark, sf) // length/hotbucket: text axis only
      else {
        val emb = Tables.embeddings(spark, sf)
        val vecShift = lit(derivedShift(10000000L,
          emb.agg(max(col("vec_id"))).head().getLong(0)))
        emb.crossJoin(reps)
          .select((col("vec_id") + col("rep") * vecShift).as("vec_id"),
            col("embedding"), col("label"))
      }
    amplifiedEmb
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // Events (rows mode only): replicas shift ts by rep seconds and take
    // fresh event ids but KEEP user_id — per-user event streams (sessions,
    // windows, LWW keys) become Kx denser, the hot-key direction that
    // stresses state.
    (if (mode == "rows") {
      val ev = Tables.events(spark, sf)
      val eventShift = lit(derivedShift(1000000000L,
        ev.agg(max(col("event_id"))).head().getLong(0)))
      ev.crossJoin(reps)
        .select((col("event_id") + col("rep") * eventShift).as("event_id"),
          (col("ts") + expr("make_interval(0, 0, 0, 0, 0, 0, rep)")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    } else Tables.events(spark, sf))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    // Star-schema tables: dims ALWAYS ride at 1× (dims stay dims); the fact
    // tables replicate K× in facts mode — fresh order keys on both join
    // sides keep the FK structure exact (replica r of order o joins exactly
    // the replicas of o's line items), o_custkey/l_partkey/l_suppkey are
    // kept so dim FKs stay valid and per-dim-key fact fan-out grows K×.
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      Tables.load(spark, sf, t).write.mode("overwrite").parquet(s"$out/$t.parquet")
    // Replica key shift derived from the data, not a constant: a fixed 1e9
    // collides with genuine keys once the base corpus's o_orderkey reaches
    // 1e9 (large sf), silently corrupting the FK structure the probe
    // claims to preserve exactly. max over BOTH join sides (an orphan
    // l_orderkey above max(o_orderkey) must not collide either), floored
    // at 1e9 so small-sf soak labels stay comparable across rounds.
    val factShiftVal =
      if (mode != "facts") 1000000000L
      else derivedShift(1000000000L, math.max(
        Tables.orders(spark, sf).agg(max(col("o_orderkey"))).head().getLong(0),
        Tables.lineitem(spark, sf).agg(max(col("l_orderkey"))).head().getLong(0)))
    val factShift = lit(factShiftVal)
    (if (mode == "facts")
      Tables.orders(spark, sf).crossJoin(reps)
        .withColumn("o_orderkey", col("o_orderkey") + col("rep") * factShift)
        .drop("rep")
    else Tables.orders(spark, sf))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    (if (mode == "facts")
      Tables.lineitem(spark, sf).crossJoin(reps)
        .withColumn("l_orderkey", col("l_orderkey") + col("rep") * factShift)
        .drop("rep")
    else Tables.lineitem(spark, sf))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    java.nio.file.Files.writeString(manifest, params + "\n")
    } // end !reuse amplification
    val stats = spark.read.parquet(s"$out/documents.parquet")
      .agg(count(lit(1)), avg(length(col("text")))).head()
    println(s"[scaleprobe] amplified corpus: ${stats.getLong(0)} docs, " +
      f"avg ${stats.getDouble(1)}%.0f chars (${k}x-$mode $sf)")
    if (mode == "facts")
      println(s"[scaleprobe] amplified facts: " +
        s"${spark.read.parquet(s"$out/orders.parquet").count()} orders, " +
        s"${spark.read.parquet(s"$out/lineitem.parquet").count()} lineitem rows (dims at 1x)")
    val dimsDefaults = Seq(
      // every vector-path consumer: brute-force top-k, LSH, IVF (Lloyd
      // training), PQ/IVF-PQ (subquantizer training + ADC), embedding dedup,
      // SemDeDup, recall harness
      "q_simsearch_topk", "q_simsearch_lsh", "q_simsearch_knn", "q_simsearch_ivf",
      "q_simsearch_pq", "q_simsearch_ivfpq", "q_dedup_embed", "q_dedup_semantic",
      "q_simsearch_recall")
    val lengthDefaults = Seq(
      // the per-doc O(len) map family plus every pairwise verifier
      "q_text_tokens", "q_text_stats", "q_text_repetition", "q_text_fingerprint",
      "q_text_winnow", "q_dedup_minhash", "q_dedup_near", "q_dedup_prefix",
      "q_dedup_simhash_pairs", "q_dedup_substring", "q_text_editdist",
      "q_text_bm25", "q_pack_sequences")
    val hotbucketDefaults = Seq(
      // every consumer of a capped/banded bucket expansion, plus the audit
      // that prices what the caps forgo at this scale
      "q_dedup_prefix", "q_dedup_minhash", "q_dedup_near",
      "q_dedup_simhash_pairs", "q_dedup_components", "q_dedup_keep",
      "q_dedup_cap_audit", "q_dedup_lsh_sweep", "q_text_editdist")
    val comboDefaults = Seq(
      // the pairwise-verifier + token-array-join family: where bucket
      // growth (rows) multiplies per-pair cost (length)
      "q_dedup_prefix", "q_dedup_minhash", "q_dedup_near",
      "q_dedup_simhash_pairs", "q_text_editdist", "q_dedup_substring",
      "q_text_bm25", "q_pack_sequences", "q_dedup_components",
      "q_dedup_cap_audit")
    val factsDefaults = Seq(
      // the TPC-H-shaped heavy join/report family whose facts never grew in
      // the other modes: multi-join reports, proration, correlated + nested
      // subqueries, frontier recursion, windowed supplier-wait ranking,
      // customer-distribution (hot-custkey direction: replicas keep custkey)
      "q_alloc_prorata", "q_report_multijoin", "q_report_suppwait",
      "q_subquery_corr", "q_subquery_nested", "q_recursive_chain",
      "q_report_custdist", "q_report_partvalue")
    val names = args.find(_.startsWith("q_")).map(_.split(",").toSeq)
      .getOrElse(if (mode == "length") lengthDefaults
      else if (mode == "dims") dimsDefaults
      else if (mode == "hotbucket") hotbucketDefaults
      else if (mode == "combo") comboDefaults
      else if (mode == "facts") factsDefaults
      else Seq(
      "q_dedup_exact", "q_dedup_minhash", "q_dedup_near",
      "q_dedup_components", "q_dedup_keep", "q_dedup_prefix",
      "q_dedup_simhash_pairs", "q_dedup_cap_audit", "q_text_editdist",
      "q_text_bm25",
      // vector family: Kx corpus, identical replica vectors
      "q_simsearch_topk", "q_simsearch_ivf", "q_simsearch_pq", "q_dedup_embed",
      "q_dedup_semantic",
      // event family: Kx-denser per-user streams (hot-key direction)
      "q_compact_lww", "q_window_session", "q_sessionize", "q_agg_salted_twophase",
      "q_join_skew_salted"))
    for (name <- names) {
      val t0 = System.nanoTime()
      val rows =
        try SparkEntry.queries(name)(spark, out).count()
        catch { case e: Throwable => println(s"[scaleprobe] $name FAILED: ${e.getMessage}"); -1L }
      println(f"[scaleprobe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }
    println("[scaleprobe] cap audit at amplified scale:")
    SparkEntry.queries("q_dedup_cap_audit")(spark, out).show(truncate = false)
    spark.stop()
  }
}
