package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.operators.Compaction

/** Structured-Streaming re-expression of the reference daemon loop
  * (/root/reference/src/main/java/com/qunar/dba/QHBaseCompact.java:135-195;
  * SURVEY.md §2.10). The reference is an unbounded program in control-flow
  * form — infinite poll loop, processing-time admission window, durable
  * cursor, one-region-per-tick pacing. The Spark-native mapping:
  *
  *   - poll loop → file-source `readStream` (new files discovered per trigger)
  *   - 60 s re-check sleep (ref :54) → `Trigger.ProcessingTime`
  *   - one region per tick (ref :146, README.md:8-9) → `maxFilesPerTrigger=1`
  *   - `regionindex` properties checkpoint (ref :102-115) → `checkpointLocation`
  *     (exactly-once progress, no hand-rolled cursor)
  *   - quickPoll completion detection (ref :62-73) → obsolete: a foreachBatch
  *     action's return IS completion
  *
  * Plus the event-time layer the reference lacks: watermark + windowed
  * aggregation with late-data handling.
  */
object StreamingDaemon {

  /** The streaming source: schema-pinned parquet file stream, one file per
    * trigger (the reference's one-region-per-round invariant).
    */
  def source(spark: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame =
    spark.readStream
      .schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)

  /** Admission gate — the reference's HH:mm:ss *string-compare* window
    * (QHBaseCompact.java:48-60) applied to event time. Processing-time
    * semantics in the reference; here usable on either clock.
    */
  def admissionGate(df: DataFrame, start: String, end: String): DataFrame =
    df.filter(date_format(col("ts"), "HH:mm:ss").between(start, end))

  /** Ingest drift histogram — the STREAMING arm of the batch q_drift_psi
    * gate: the same 10 clamped equi-width n_chars bins with the even/odd
    * doc_id side split, maintained incrementally across micro-batches
    * (complete-mode grouped counts; ≤10 groups, so the state is metadata-
    * scale no matter the corpus). A monitoring daemon reads the current
    * histogram each trigger and applies the PSI arithmetic (integer
    * µ-unit terms, as in the batch query) over the ≤10-row result —
    * detecting a shifted crawl WHILE it streams in, instead of after the
    * batch lands. StreamingSpec pins the incremental histogram equal to
    * the batch aggregation of the same files.
    */
  def driftHistogram(docs: DataFrame): DataFrame =
    docs.select(
        least(lit(9L), expr("n_chars div 64")).cast("long").as("bin"),
        when(col("doc_id") % 2 === 0, lit("a")).otherwise(lit("b")).as("side"))
      .groupBy(col("bin"))
      .agg(
        sum(when(col("side") === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("cb"))

  /** Event-time windowed aggregation with watermark (coverage the reference
    * lacks, SURVEY.md §2.10): 10-minute tumbling counts per event_type,
    * tolerating 1 hour of lateness.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** The daemon: per micro-batch, run the LWW compaction over the new file —
    * the reference's majorCompact call as a foreachBatch job. Checkpointed,
    * so a restart resumes from the last completed batch (the reference's
    * `storeNewConfig` cursor, minus the crash window between act and persist).
    *
    * foreachBatch is at-least-once: a crash after the write but before the
    * checkpoint commit replays the same batchId on restart. The sink is
    * idempotent per batch — each batch OVERWRITES its own `batch=$batchId`
    * directory (the standard batchId-keyed idempotence pattern), so a replay
    * rewrites identical rows instead of appending duplicates.
    */
  def compactionLoop(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      checkpointDir: String,
      keys: Seq[String],
      orderCols: Seq[String],
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val static = spark.read.parquet(inDir)
    source(spark, inDir, static)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Compaction
          .lastWriteWins(batch, keys, orderCols)
          .write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()
  }

  /** Current snapshot of the [[mergeSink]] store: the directory named by the
    * atomic LATEST pointer, or an empty frame of `schemaFrom`'s schema
    * before the first commit.
    */
  private[graft] def readMergeStore(
      spark: SparkSession, storeDir: String, schemaFrom: DataFrame): DataFrame = {
    val ptr = java.nio.file.Paths.get(s"$storeDir/LATEST")
    if (java.nio.file.Files.exists(ptr))
      spark.read.parquet(
        s"$storeDir/${new String(java.nio.file.Files.readAllBytes(ptr), "UTF-8").trim}")
    else schemaFrom.limit(0)
  }

  /** One exactly-once MERGE application of micro-batch `batchId`. Returns
    * false when the batch was already applied (the replay fast-path).
    *
    * Exactly-once from an at-least-once engine, two layers:
    *  1. an applied-batch LEDGER — marker file per batchId, committed AFTER
    *     the snapshot pointer swap — so a clean replay of batch N is skipped
    *     without touching data;
    *  2. CONVERGENT merge math for the torn window (crash between pointer
    *     swap and marker): the merge is keyed LWW upsert (batch rows
    *     replace same-key store rows; within-batch versions collapse by
    *     `orderCols` first), so re-merging the identical batch against the
    *     already-merged snapshot rewrites the same rows — content idempotent
    *     even when the ledger check cannot short-circuit.
    *
    * Each commit writes a NEW snapshot directory (`snap-N`) and swaps the
    * LATEST pointer atomically (tmp + ATOMIC_MOVE, the CursorCheckpoint
    * discipline) — readers never observe a half-written store, and the
    * prior snapshot stays valid for in-flight reads. Old snapshots are
    * retired by the compaction loop, not here.
    */
  private[graft] def applyMergeBatch(
      spark: SparkSession, storeDir: String,
      keys: Seq[String], orderCols: Seq[String],
      batch: DataFrame, batchId: Long): Boolean = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val marker = Paths.get(s"$storeDir/_applied/batch-$batchId")
    if (Files.exists(marker)) return false
    val prior = readMergeStore(spark, storeDir, batch)
    val batchLww = Compaction.lastWriteWins(batch, keys, orderCols)
    val merged = prior
      .join(batchLww.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(batchLww)
    // snapshot dirs are unique per APPLICATION, not per batch: a torn
    // replay of batch N re-merges while READING the snap its first attempt
    // pointed LATEST at — overwriting that same dir would corrupt the read.
    var snap = s"snap-$batchId"
    var attempt = 0
    while (Files.exists(Paths.get(s"$storeDir/$snap"))) {
      attempt += 1; snap = s"snap-$batchId-r$attempt"
    }
    merged.write.mode("overwrite").parquet(s"$storeDir/$snap")
    val tmp = Files.createTempFile(Paths.get(storeDir), ".latest", ".tmp")
    Files.write(tmp, snap.getBytes("UTF-8"))
    Files.move(tmp, Paths.get(s"$storeDir/LATEST"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    Files.createDirectories(marker.getParent)
    Files.write(marker, batchId.toString.getBytes("UTF-8"))
    true
  }

  /** The idempotent foreachBatch MERGE sink — [[compactionLoop]]'s
    * exactly-once twin: instead of one output dir per batch, every
    * micro-batch UPSERTS into a single keyed store (the batch
    * q_merge_upsert semantics), and replays are no-ops via
    * [[applyMergeBatch]]'s ledger + convergent merge. This is the stream →
    * serving-table bridge: the store is always one consistent LWW snapshot
    * of everything ingested so far.
    */
  def mergeSink(
      spark: SparkSession,
      inDir: String,
      storeDir: String,
      checkpointDir: String,
      keys: Seq[String],
      orderCols: Seq[String],
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(storeDir))
    val static = spark.read.parquet(inDir)
    source(spark, inDir, static)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyMergeBatch(spark, storeDir, keys, orderCols, batch, batchId)
        ()
      }
      .start()
  }

  /** Stateful per-key compaction state via flatMapGroupsWithState analog —
    * expressed with the simpler dropDuplicates-on-stream (state store keyed
    * dedup): keep first arrival per (key, version) within the watermark.
    */
  def streamingDedup(events: DataFrame, keys: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates(keys :+ "ts")

  /** Dedup on the BUSINESS keys alone within the watermark window —
    * [[streamingDedup]] treats (key, ts) as the identity, so the same key
    * re-emitted with a different event time passes; this form keeps only
    * the first arrival per key until the watermark ages the key's state
    * out. The crawl-ingest semantics (a re-fetched page has a new
    * timestamp but is the same document), with state still bounded by the
    * watermark horizon rather than growing with the stream.
    */
  def streamingDedupKeysOnly(events: DataFrame, keys: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(keys)

  /** One side of the dynamic signature store: `dir/batch=N` parquet written
    * per micro-batch. Reading the root infers the `batch` partition column;
    * `excludeBatch` drops the CURRENT batch's own directory so an
    * at-least-once replay of batch N is gated exactly as its first attempt
    * was — never against its own earlier partial write. Partition pruning
    * keeps the exclusion a metadata operation, not a scan.
    */
  private def readSigStore(
      spark: SparkSession, dir: String, empty: DataFrame,
      cols: Seq[String], excludeBatch: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // A batch= dir must hold a COMMITTED part file to count: a crash between
    // directory creation and commit leaves only _temporary inside, and
    // schema inference over zero footers would throw on every replay of
    // that batch — the at-least-once recovery path must tolerate the torn
    // write it exists to recover from (its own overwrite then repairs it).
    val hasCommitted = fs.exists(path) &&
      fs.listStatus(path).exists(s => s.getPath.getName.startsWith("batch=") &&
        fs.listStatus(s.getPath).exists(_.getPath.getName.endsWith(".parquet")))
    if (!hasCommitted) empty.select(cols.map(col): _*)
    else spark.read.parquet(dir)
      .filter(col("batch") =!= excludeBatch)
      .select(cols.map(col): _*)
  }

  /** Sign-LSH band keys over an embedding column — the batch q_dedup_embed
    * banding (8 bands × 8 sign bits) as a gate-side projection: one row per
    * (doc, band) with `ekey = band:bucket` and the embedding carried for
    * the exact-cosine confirmation. Deterministic, no RNG to persist.
    */
  def embedBandKeys(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("embedding"),
        posexplode(array((0 until 8).map(b =>
          graft.functions.VectorFns.signBucketAt(col("embedding"), b * 8, 8)): _*)))
      .select(col("doc_id"), col("embedding"),
        concat_ws(":", col("pos"), col("col")).as("ekey"))

  /** Streaming INGEST dedup — the LLM-crawl ingestion gate, the streaming
    * form of q_dedup_incremental: documents arrive as a file stream; each
    * micro-batch is (a) exact-deduped batch-locally on content hash
    * (deterministic keeper = min doc_id) and (b) anti-joined against the
    * PERSISTED corpus MinHash signature store PLUS the band keys and exact
    * hashes of every document ACCEPTED by prior batches — so a near-dup
    * arriving one batch after its original is rejected, not just near-dups
    * of the pre-existing corpus. After the write, the batch folds its own
    * accepted signatures back into the store (the exact-hash side also
    * covers docs too short to shingle, which produce no band keys at all).
    *
    * Per-batch cost: the band-key pipeline runs on the micro-batch only;
    * the store side is a skey/hash-keyed join whose prior-batch read prunes
    * on the `batch` partition column. In production the store is compacted
    * periodically into the bucketed signature table q_dedup_incremental
    * reads (TextQueries.sigTable), so the join stays Exchange-free on the
    * corpus side; the per-batch `batch=N` directories here are the
    * between-compactions delta. batchId-keyed overwrite of BOTH the data
    * and the signature directories makes replays idempotent (at-least-once
    * foreachBatch → exactly-once directory contents).
    *
    * `corpusEmbSigs` (optional): the corpus-side EMBEDDING sign-LSH index
    * (ekey, embedding) — when supplied, the gate also catches SEMANTIC
    * near-dups (novel text, same meaning): each batch doc's band keys probe
    * the corpus index, the `ekeys/batch=N` store of previously-accepted
    * embeddings, AND the rest of its own micro-batch (higher doc_id loses,
    * the exact-dedup min-keeper rule); a candidate is rejected only when
    * the exact cosine confirms (≥ `semanticCos`) — band collision alone is
    * a candidate signal, not a verdict, exactly the batch
    * q_dedup_embed/q_dedup_semantic two-phase discipline. Accepted
    * embeddings fold back into the store per batch like the text
    * signatures. (The TEXT near-dup arm stays store-only within a batch —
    * exact hash handles intra-batch text dups; the semantic arm covers the
    * mirror-page case exact hashing misses.) In production the hot band
    * values are capped (the 2–100 bucket rule) when the store is compacted.
    */
  def ingestDedupLoop(
      spark: SparkSession,
      inDir: String,
      corpusSigs: DataFrame,
      outDir: String,
      checkpointDir: String,
      sigStoreDir: String,
      corpusEmbSigs: Option[DataFrame] = None,
      semanticCos: Double = 0.95,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val static = spark.read.parquet(inDir)
    source(spark, inDir, static)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val exact = batch
          .withColumn("content_hash", sha2(col("text"), 256))
          .groupBy(col("content_hash"))
          .agg(min_by(
            struct(batch.columns.map(col) :+ col("content_hash"): _*),
            col("doc_id")).as("k"))
          .select(col("k.*"))
          .persist()
        val sigs = graft.operators.TextQueries.bandKeysOf(exact).persist()
        val bsigs = corpusEmbSigs.map(_ => embedBandKeys(exact).persist())
        try {
          val priorSkeys = readSigStore(spark, s"$sigStoreDir/skeys",
            spark.range(0).select(col("id").cast("string").as("skey")), Seq("skey"), batchId)
          val priorHashes = readSigStore(spark, s"$sigStoreDir/hashes",
            spark.range(0).select(col("id").cast("string").as("content_hash")),
            Seq("content_hash"), batchId)
          val nearDup = sigs
            .join(corpusSigs.select(col("skey")).union(priorSkeys), "skey")
            .select(col("doc_id"))
          val exactDup = exact
            .join(priorHashes, Seq("content_hash"), "left_semi")
            .select(col("doc_id"))
          val semDup = (corpusEmbSigs, bsigs) match {
            case (Some(corpusEmb), Some(bs)) =>
              import org.apache.spark.sql.expressions.Window
              val stored = corpusEmb.select(col("ekey"), col("embedding"))
                .union(readSigStore(spark, s"$sigStoreDir/ekeys",
                  corpusEmb.limit(0), Seq("ekey", "embedding"), batchId))
                .withColumnRenamed("embedding", "stored_emb")
              // Hot store-side band values (> 100 entries) are boilerplate
              // buckets and are excluded — the incNewEdges guard: without
              // it one saturated band value makes the probe join quadratic
              // in the store.
              val hot = stored.groupBy(col("ekey"))
                .agg(count(lit(1)).as("esz"))
                .filter(col("esz") > graft.operators.TextQueries.BucketCap).select(col("ekey"))
              // Dedup (batch doc, stored embedding) candidates ACROSS bands
              // before the cosine — up to 8 band collisions per pair must
              // pay the exact-cosine confirm once, the same groupBy+first
              // discipline as the intra-batch arm below.
              val vsStored = bs.join(hot, Seq("ekey"), "left_anti")
                .join(stored, "ekey")
                .groupBy(col("doc_id"), col("stored_emb"))
                .agg(first(col("embedding")).as("embedding"))
                .filter(graft.functions.VectorFns.cosine(
                  col("embedding"), col("stored_emb")) >= semanticCos)
                .select(col("doc_id"))
              // INTRA-batch semantic pairs: two novel-text mirror docs in
              // the same micro-batch collide on a band, confirm by cosine,
              // and the HIGHER doc_id loses — the same deterministic
              // min-keeper rule as the exact-hash dedup above. Without
              // this, a crawl batch full of mirror pages would pass the
              // gate untouched and pollute the ekeys store. Same 2–100
              // bucket cap as every banded pipeline (a mirror-flood batch
              // saturates all 8 bands — the motivating input must not go
              // quadratic on itself), and each surviving pair pays the
              // exact cosine ONCE (deduped across bands first).
              val sized = bs.withColumn("bsz",
                  count(lit(1)).over(Window.partitionBy(col("ekey"))))
                .filter(col("bsz").between(2, graft.operators.TextQueries.BucketCap))
              val vsBatch = sized.select(col("ekey"),
                  col("doc_id").as("doc_a"), col("embedding").as("ea"))
                .join(sized.select(col("ekey"),
                  col("doc_id").as("doc_b"), col("embedding").as("eb")), "ekey")
                .filter(col("doc_a") < col("doc_b"))
                .groupBy(col("doc_a"), col("doc_b"))
                .agg(first(col("ea")).as("ea"), first(col("eb")).as("eb"))
                .filter(graft.functions.VectorFns.cosine(
                  col("ea"), col("eb")) >= semanticCos)
                .select(col("doc_b").as("doc_id"))
              vsStored.union(vsBatch)
            case _ => spark.range(0).select(col("id").as("doc_id"))
          }
          val accepted = exact
            .join(nearDup.union(exactDup).union(semDup).distinct(),
              Seq("doc_id"), "left_anti")
            .persist()
          try {
            accepted.drop("content_hash")
              .write.mode("overwrite")
              .parquet(s"$outDir/batch=$batchId")
            sigs.join(accepted.select(col("doc_id")), "doc_id")
              .select(col("skey"))
              .write.mode("overwrite")
              .parquet(s"$sigStoreDir/skeys/batch=$batchId")
            accepted.select(col("content_hash"))
              .write.mode("overwrite")
              .parquet(s"$sigStoreDir/hashes/batch=$batchId")
            bsigs.foreach { bs =>
              bs.join(accepted.select(col("doc_id")), "doc_id")
                .select(col("ekey"), col("embedding"))
                .write.mode("overwrite")
                .parquet(s"$sigStoreDir/ekeys/batch=$batchId")
            }
          } finally accepted.unpersist() // a failed write must not pin the cache across retries
        } finally {
          bsigs.foreach(_.unpersist())
          sigs.unpersist()
          exact.unpersist()
        }
        ()
      }
      .start()
  }

  /** Stream-stream INTERVAL join (attribution): each purchase joins every
    * click by the SAME user in the 30 minutes before it — the click-to-
    * conversion attribution query, and the §2.10 surface the daemon lacked
    * (all prior joins were stream⋈static). Both sides carry a 1-hour
    * watermark and the join predicate bounds event time on BOTH ends, so
    * Spark can size the state store: click state is evicted once older than
    * watermark + the 30-minute range — O(recent window), never O(stream).
    * Without the time bound the state store grows forever; that shape is
    * the streaming analog of an uncapped shuffle and is deliberately
    * impossible here.
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
        col("event_id").as("click_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val p = purchases.select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "1 hour")
    p.join(c,
      col("c_user") === col("p_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("interval 30 minutes"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        unix_micros(col("p_ts")).as("p_ts_us"), unix_micros(col("c_ts")).as("c_ts_us"),
        col("value"))
  }

  // ---- custom state: streaming LWW via mapGroupsWithState ----

  case class EventIn(event_id: Long, ts_us: Long, user_id: Long, event_type: String, value: Double)

  /** Per-(user,event_type) state: the current newest version + a version
    * counter — the per-cell state HBase keeps implicitly and the reference's
    * daemon recomputes by re-listing files each round.
    */
  case class LwwState(eventId: Long, tsUs: Long, value: Double, versionsSeen: Long)

  case class LwwUpdate(user_id: Long, event_type: String, last_event_id: Long,
      ts_us: Long, last_value: Double, versions_seen: Long)

  /** Streaming LWW with explicit keyed state: each micro-batch folds its new
    * versions into the stored newest-version per key and emits the updated
    * row. Equivalent to re-running batch LWW over all data ever seen, but the
    * state store holds exactly one row per key — O(keys), not O(history),
    * which is the point at 100 TB of versioned cells.
    */
  def statefulLww(events: Dataset[EventIn]): Dataset[LwwUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState[LwwState, LwwUpdate](GroupStateTimeout.NoTimeout) {
        case ((uid, etype), batchIt, state: GroupState[LwwState]) =>
          val batch = batchIt.toSeq // per-key micro-batch; bounded
          val prev = state.getOption
          val candidates = batch.map(e => LwwState(e.event_id, e.ts_us, e.value, 0L)) ++ prev
          // newest by (ts, event_id) — the same deterministic order as batch LWW
          val newest = candidates.maxBy(s => (s.tsUs, s.eventId))
          val next = newest.copy(
            versionsSeen = prev.map(_.versionsSeen).getOrElse(0L) + batch.size)
          state.update(next)
          LwwUpdate(uid, etype, next.eventId, next.tsUs, next.value, next.versionsSeen)
      }
  }

  /** Output-mode helper for [[statefulLww]] sinks. */
  val statefulLwwOutputMode: OutputMode = OutputMode.Update()

  /** Change-only stream via flatMapGroupsWithState: emit 0 or 1 rows per key
    * per micro-batch — only when the newest version actually changed. This is
    * the streaming form of the reference's quickPoll "largest file name
    * differs" test (QHBaseCompact.java:171-184): downstream consumers see
    * deltas, not heartbeats.
    */
  def changeStream(events: Dataset[EventIn]): Dataset[LwwUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[LwwState, LwwUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case ((uid, etype), batchIt, state: GroupState[LwwState]) =>
          val batch = batchIt.toSeq
          val prev = state.getOption
          val candidates = batch.map(e => LwwState(e.event_id, e.ts_us, e.value, 0L)) ++ prev
          val newest = candidates.maxBy(s => (s.tsUs, s.eventId))
          val next = newest.copy(
            versionsSeen = prev.map(_.versionsSeen).getOrElse(0L) + batch.size)
          state.update(next)
          val changed = !prev.exists(p => p.eventId == next.eventId && p.tsUs == next.tsUs)
          if (changed)
            Iterator.single(LwwUpdate(uid, etype, next.eventId, next.tsUs, next.value, next.versionsSeen))
          else Iterator.empty
      }
  }

  // ---- custom state with EVENT-TIME TIMEOUT: gap-closed sessions ----

  /** Open-session state: bounds + counters, O(1) per live user. */
  case class SessState(startUs: Long, endUs: Long, n: Long, purchases: Long)

  case class SessionClosed(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, n_purchases: Long, closed_by: String)

  /** Gap-closed sessions via flatMapGroupsWithState + EventTimeTimeout —
    * the streaming twin of the batch 30-minute gap rule (q_sessionize).
    * Two close paths, both exercised by StreamingSpec:
    *  - "gap": a new event lands more than `gapUs` after the open session's
    *    end — the old session closes in the data callback and a fresh one
    *    opens from that event;
    *  - "timeout": the watermark passes end + gap with no new data — the
    *    state store fires the timeout callback, the session is emitted and
    *    the state REMOVED (this is what bounds state to live users; without
    *    event-time timeout an idle user's state lives forever).
    * State is O(live users) regardless of history length; emitted rows are
    * final (Append mode) because a closed session can never reopen — the
    * watermark guarantees no event at or before its end is still in flight.
    */
  def sessionCloseStream(events: Dataset[EventIn], gapUs: Long): Dataset[SessionClosed] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "10 minutes")
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionClosed](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, batchIt, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionClosed(uid, s.startUs, s.endUs, s.n, s.purchases, "timeout"))
          } else {
            // fold the micro-batch in event order (bounded per key+batch)
            val batch = batchIt.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val closed = Seq.newBuilder[SessionClosed]
            var open = state.getOption
            batch.foreach { e =>
              open match {
                case Some(s) if e.ts_us - s.endUs > gapUs =>
                  closed += SessionClosed(uid, s.startUs, s.endUs, s.n, s.purchases, "gap")
                  open = Some(SessState(e.ts_us, e.ts_us, 1L,
                    if (e.event_type == "purchase") 1L else 0L))
                case Some(s) =>
                  open = Some(SessState(s.startUs, math.max(s.endUs, e.ts_us), s.n + 1L,
                    s.purchases + (if (e.event_type == "purchase") 1L else 0L)))
                case None =>
                  open = Some(SessState(e.ts_us, e.ts_us, 1L,
                    if (e.event_type == "purchase") 1L else 0L))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.endUs + gapUs) / 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
