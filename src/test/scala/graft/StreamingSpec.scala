package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Compaction
import graft.streaming.StreamingDaemon

class StreamingSpec extends AnyFunSuite with SparkSpec {

  private def tmp(tag: String) = Files.createTempDirectory(tag).toString

  test("mergeSink is exactly-once: upserts converge, batch replay is a no-op, torn replay converges") {
    val in    = tmp("merge-in")
    val store = tmp("merge-store")
    val ckp   = tmp("merge-ckp")
    val keys = Seq("user_id", "event_type"); val ord = Seq("ts", "event_id")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.coalesce(1).write.mode("append").parquet(in)

    StreamingDaemon.mergeSink(spark, in, store, ckp, keys, ord).awaitTermination()

    // the store is ONE consistent LWW snapshot of everything ingested
    val want = Compaction.lastWriteWins(ev, keys, ord)
      .orderBy("user_id", "event_type").collect().toSeq
    def snapshot() = StreamingDaemon.readMergeStore(spark, store, ev)
      .orderBy("user_id", "event_type").collect().toSeq
    assert(snapshot() == want)
    val ptr = java.nio.file.Paths.get(s"$store/LATEST")
    val ptrAfterRun = new String(java.nio.file.Files.readAllBytes(ptr), "UTF-8")

    // CLEAN REPLAY (engine redelivers batch 0 after a crash before the
    // checkpoint commit): the applied-batch ledger short-circuits — no new
    // snapshot, pointer untouched.
    val applied = StreamingDaemon.applyMergeBatch(
      spark, store, keys, ord, spark.read.parquet(in), batchId = 0L)
    assert(!applied, "replayed batchId must be skipped by the ledger")
    assert(new String(java.nio.file.Files.readAllBytes(ptr), "UTF-8") == ptrAfterRun)
    assert(snapshot() == want)

    // TORN REPLAY (crash AFTER the pointer swap but BEFORE the marker):
    // simulate by deleting the marker — the merge re-runs against the
    // already-merged store and must converge to identical content.
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$store/_applied/batch-0"))
    assert(StreamingDaemon.applyMergeBatch(
      spark, store, keys, ord, spark.read.parquet(in), batchId = 0L))
    assert(snapshot() == want, "re-merging the same batch must be content-idempotent")

    // a LATER batch with newer versions UPSERTS: bump ts on a key subset
    val delta = ev.filter(col("user_id") % 5 === 0)
      .withColumn("ts", col("ts") + expr("INTERVAL 10 DAYS"))
      .withColumn("value", col("value") + 1000.0)
    assert(StreamingDaemon.applyMergeBatch(spark, store, keys, ord, delta, batchId = 1L))
    val merged = Compaction.lastWriteWins(ev.unionByName(delta), keys, ord)
      .orderBy("user_id", "event_type").collect().toSeq
    assert(snapshot() == merged)
    assert(snapshot() != want, "the delta must actually change some rows")
  }

  test("compactionLoop consumes files one per trigger and matches batch LWW") {
    val in  = tmp("stream-in")
    val out = tmp("stream-out")
    val ckp = tmp("stream-ckp")
    // two "store files" arriving: two halves of sf0.001 events
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.filter(col("event_id") % 2 === 0).coalesce(1).write.mode("append").parquet(in)
    ev.filter(col("event_id") % 2 === 1).coalesce(1).write.mode("append").parquet(in)

    val q = StreamingDaemon.compactionLoop(
      spark, in, out, ckp, Seq("user_id", "event_type"), Seq("ts", "event_id"))
    q.awaitTermination()

    // each per-batch output is itself LWW-compacted
    val batches = new java.io.File(out).listFiles().filter(_.getName.startsWith("batch="))
    assert(batches.length >= 1)
    batches.foreach { b =>
      val df = spark.read.parquet(b.getPath)
      assert(df.count() == df.select("user_id", "event_type").distinct().count())
    }
    // union of batches re-compacted equals batch-mode LWW over the full input
    val streamed = Compaction.lastWriteWins(
      spark.read.parquet(s"$out/batch=*"), Seq("user_id", "event_type"), Seq("ts", "event_id"))
    val batch = Compaction.lastWriteWins(ev, Seq("user_id", "event_type"), Seq("ts", "event_id"))
    assert(streamed.orderBy("user_id", "event_type").collect().toSeq ==
      batch.orderBy("user_id", "event_type").collect().toSeq)
  }

  test("compactionLoop restart-from-checkpoint: resumes at the next batch, prior output untouched, torn batch dir repaired") {
    // The reference's crash-resumable-cursor semantics
    // (QHBaseCompact.java:102-115,133) end to end: the daemon dies between
    // polls (run 1 drains and stops), a new file lands AND a half-written
    // output of the never-committed next batch is left behind (crash after
    // the data write began, before the checkpoint commit); the restarted
    // daemon must resume from checkpointLocation — reprocessing nothing it
    // committed, repairing the torn directory via the batchId-keyed
    // overwrite.
    val in  = tmp("restart-in")
    val out = tmp("restart-out")
    val ckp = tmp("restart-ckp")
    val keys = Seq("user_id", "event_type"); val ord = Seq("ts", "event_id")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val half1 = ev.filter(col("event_id") % 2 === 0)
    val half2 = ev.filter(col("event_id") % 2 === 1)
    half1.coalesce(1).write.mode("append").parquet(in)

    StreamingDaemon.compactionLoop(spark, in, out, ckp, keys, ord).awaitTermination()
    def fileSig(dir: String): Map[String, (Long, Long)] =
      new java.io.File(dir).listFiles().filter(_.isFile)
        .map(f => f.getName -> (f.length, f.lastModified)).toMap
    assert(new java.io.File(s"$out/batch=0").exists, "run 1 must commit batch 0")
    val b0sig = fileSig(s"$out/batch=0")

    // while the daemon is down: a new input file lands, and a TORN write of
    // the next batch sits in the output (wrong rows — a failed overwrite
    // would be detectable, unlike an empty placeholder)
    half2.coalesce(1).write.mode("append").parquet(in)
    half2.limit(3).withColumn("value", lit(-999.0))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/batch=1")

    StreamingDaemon.compactionLoop(spark, in, out, ckp, keys, ord).awaitTermination()
    // batch 0 was not reprocessed — byte-identical file listing
    assert(fileSig(s"$out/batch=0") == b0sig, "restart reprocessed a committed batch")
    // the torn batch=1 was repaired: exactly the LWW of the new file
    val b1 = spark.read.parquet(s"$out/batch=1")
    assert(b1.filter(col("value") === -999.0).count() == 0, "torn write survived the replay")
    assert(b1.orderBy("user_id", "event_type").collect().toSeq ==
      Compaction.lastWriteWins(half2, keys, ord).orderBy("user_id", "event_type").collect().toSeq)
    // resumed output re-compacted equals batch truth over everything
    val streamed = Compaction.lastWriteWins(spark.read.parquet(s"$out/batch=*"), keys, ord)
    assert(streamed.orderBy("user_id", "event_type").collect().toSeq ==
      Compaction.lastWriteWins(ev, keys, ord).orderBy("user_id", "event_type").collect().toSeq)

    // a third restart with no new input: nothing new, nothing rewritten
    val allSig = fileSig(s"$out/batch=0") ++ fileSig(s"$out/batch=1").map { case (k, v) => s"b1/$k" -> v }
    StreamingDaemon.compactionLoop(spark, in, out, ckp, keys, ord).awaitTermination()
    assert(new java.io.File(out).listFiles().count(_.getName.startsWith("batch=")) == 2)
    assert(fileSig(s"$out/batch=0") ++ fileSig(s"$out/batch=1").map { case (k, v) => s"b1/$k" -> v } == allSig)
  }

  test("ingestDedupLoop restart-from-checkpoint: dedup state persists across the process death") {
    // The cross-batch gating test's scenario, but with the daemon KILLED and
    // RESTARTED between the two batches: batch 2's near-dup of a batch-1
    // admission must still be rejected, which proves the persisted signature
    // store + checkpoint (not in-memory state) carry the dedup across
    // restarts.
    val sf = "/root/testdata/sf0.001"
    val in  = tmp("ri-in")
    val out = tmp("ri-out")
    val ckp = tmp("ri-ckp")
    val sig = tmp("ri-sig")
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val fresh  = docs.filter(col("doc_id") % 10 === 7)
    val corpusSigs = graft.operators.TextQueries.bandKeysOf(corpus)
      .withColumnRenamed("doc_id", "corpus_doc").localCheckpoint()
    val expected1 = fresh
      .join(graft.operators.TextQueries.bandKeysOf(fresh)
          .join(corpusSigs, "skey").select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet

    fresh.coalesce(1).write.mode("append").parquet(in)
    StreamingDaemon.ingestDedupLoop(spark, in, corpusSigs, out, ckp, sig).awaitTermination()
    val kept1 = spark.read.parquet(s"$out/batch=*").select("doc_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    assert(kept1 == expected1)

    // daemon down; batch 2 lands: an exact clone of an admitted batch-1 doc
    // plus a genuinely novel document
    val keeper = docs.filter(col("doc_id") === expected1.min)
    val novelText = (1 to 60).map(i => s"rst${i}blick").mkString(" ")
    keeper.withColumn("doc_id", col("doc_id") + 2000000L)
      .union(keeper
        .withColumn("doc_id", col("doc_id") + 3000000L)
        .withColumn("text", lit(novelText)))
      .coalesce(1).write.mode("append").parquet(in)

    StreamingDaemon.ingestDedupLoop(spark, in, corpusSigs, out, ckp, sig).awaitTermination()
    val kept = spark.read.parquet(s"$out/batch=*").select("doc_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    // batch 1's output is untouched and still exactly expected1
    assert(kept.filter(_ < 2000000L) == expected1)
    // the clone of a PRE-RESTART admission was rejected by the persisted store
    assert(!kept.exists(id => id >= 2000000L && id < 3000000L),
      "near-dup of a pre-restart admission was re-admitted — state lost across restart")
    // while the novel doc of the same post-restart batch was admitted
    assert(kept.exists(_ >= 3000000L), "novel post-restart doc wrongly rejected")
  }

  test("streamingDedupKeysOnly keeps one row per key across differing event times") {
    val in = tmp("dwk-in")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    ev.coalesce(1).write.mode("append").parquet(in)

    val q = StreamingDaemon
      .streamingDedupKeysOnly(
        StreamingDaemon.source(spark, in, spark.read.parquet(in)),
        Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dwk_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val out = spark.table("dwk_out")
    // the fixture has many (user, type) repeats at different ts; keys-only
    // dedup collapses each to a single survivor.
    // LOAD-BEARING: dropDuplicatesWithinWatermark only guarantees dedup of
    // re-arrivals within the watermark delay — the exact-count assert holds
    // because AvailableNow over ONE input file yields a single micro-batch,
    // so every repeat is seen before any state could age out. A fixture
    // spanning >1h of event time across SEVERAL batches would legitimately
    // re-emit keys; that is the documented API semantics, not a bug.
    assert(ev.select("user_id", "event_type").distinct().count() == out.count())
    assert(out.select("user_id", "event_type").distinct().count() == out.count())
    assert(out.count() < ev.count()) // it actually dropped same-key re-arrivals
  }

  test("attributionJoin (stream-stream interval join) matches the batch interval join") {
    val in  = tmp("attr-in")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    // two arrival files so the join spans micro-batches
    ev.filter(col("event_id") % 2 === 0).coalesce(1).write.mode("append").parquet(in)
    ev.filter(col("event_id") % 2 === 1).coalesce(1).write.mode("append").parquet(in)

    val stream = StreamingDaemon.source(spark, in, ev)
    val joined = StreamingDaemon.attributionJoin(
      stream.filter(col("event_type") === "click"),
      stream.filter(col("event_type") === "purchase"))
    val q = joined.writeStream
      .format("memory").queryName("attr_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("attr_out")
      .select("purchase_id", "click_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = StreamingDaemon.attributionJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"))
      .select("purchase_id", "click_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty)         // the fixture actually exercises the window
    assert(streamed == batch)      // stream-stream join = batch interval join
  }

  test("ingestDedupLoop drops in-batch exact dups and corpus near-dups, keeps the rest") {
    val sf = "/root/testdata/sf0.001"
    val in  = tmp("ingest-in")
    val out = tmp("ingest-out")
    val ckp = tmp("ingest-ckp")
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val fresh  = docs.filter(col("doc_id") % 10 === 7)
    // arriving snapshot: the fresh docs PLUS an exact copy of one of them
    // under a new id (must be exact-deduped inside the batch)
    val cloned = fresh.limit(1)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    fresh.union(cloned).coalesce(1).write.mode("append").parquet(in)

    val corpusSigs = graft.operators.TextQueries.bandKeysOf(corpus)
      .withColumnRenamed("doc_id", "corpus_doc").localCheckpoint()
    val q = StreamingDaemon.ingestDedupLoop(spark, in, corpusSigs, out, ckp, tmp("ingest-sig"))
    q.awaitTermination()

    val kept = spark.read.parquet(s"$out/batch=*").select("doc_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    // batch-mode expectation: fresh docs whose band keys miss the corpus store
    val expected = fresh
      .join(graft.operators.TextQueries.bandKeysOf(fresh)
          .join(corpusSigs, "skey").select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    assert(kept == expected)
    // the exact clone lost to its lower-id original
    assert(!kept.exists(_ >= 1000000L))
    // and the gate kept a non-trivial survivor set
    assert(kept.nonEmpty)
  }

  test("ingestDedupLoop gates batch N+1 against batch N's accepted docs") {
    val sf = "/root/testdata/sf0.001"
    val in  = tmp("xingest-in")
    val out = tmp("xingest-out")
    val ckp = tmp("xingest-ckp")
    val sig = tmp("xingest-sig")
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val fresh  = docs.filter(col("doc_id") % 10 === 7)

    val corpusSigs = graft.operators.TextQueries.bandKeysOf(corpus)
      .withColumnRenamed("doc_id", "corpus_doc").localCheckpoint()
    // batch-mode expectation for batch 1 (the single-batch gate), computed
    // up front so batch 2's clone provably duplicates an ADMITTED doc —
    // the round-3 gap was exactly near-dups of prior-batch admissions.
    val expected1 = fresh
      .join(graft.operators.TextQueries.bandKeysOf(fresh)
          .join(corpusSigs, "skey").select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    val keeper = docs.filter(col("doc_id") === expected1.min)

    // batch 1: the fresh split. batch 2: an exact copy of that admitted doc
    // under a new id, plus a genuinely novel document.
    val novelText = (1 to 60).map(i => s"zqx${i}glorp").mkString(" ")
    val b2 = keeper.withColumn("doc_id", col("doc_id") + 2000000L)
      .union(keeper
        .withColumn("doc_id", col("doc_id") + 3000000L)
        .withColumn("text", lit(novelText)))
    def partFiles() = new java.io.File(in).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).toSet
    fresh.coalesce(1).write.mode("append").parquet(in)
    val files1 = partFiles()
    b2.coalesce(1).write.mode("append").parquet(in)
    val files2 = partFiles() -- files1
    // file source orders by mtime — force batch 1 strictly before batch 2
    val t0 = System.currentTimeMillis() - 60000
    files1.foreach(_.setLastModified(t0))
    files2.foreach(_.setLastModified(t0 + 30000))

    val q = StreamingDaemon.ingestDedupLoop(spark, in, corpusSigs, out, ckp, sig)
    q.awaitTermination()

    val kept = spark.read.parquet(s"$out/batch=*").select("doc_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    // the cross-batch clone lost to its batch-1 original...
    assert(!kept.exists(id => id >= 2000000L && id < 3000000L),
      s"cross-batch near-dup admitted: ${kept.filter(id => id >= 2000000L && id < 3000000L)}")
    // ...while the novel doc of the SAME later batch was admitted
    assert(kept.exists(_ >= 3000000L), "novel batch-2 doc was wrongly rejected")
    // and batch 1 behaves exactly like the single-batch gate
    assert(kept.filter(_ < 2000000L) == expected1)
  }

  test("ingestDedupLoop semantic gate rejects embedding near-dups, batch-equal") {
    val sf = "/root/testdata/sf0.001"
    val in  = tmp("semingest-in")
    val out = tmp("semingest-out")
    val ckp = tmp("semingest-ckp")
    val sig = tmp("semingest-sig")
    val docs = Tables.documents(spark, sf)
      .join(Tables.embeddings(spark, sf).select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 7).localCheckpoint()
    val fresh  = docs.filter(col("doc_id") % 10 === 7).localCheckpoint()

    val corpusSigs = graft.operators.TextQueries.bandKeysOf(corpus)
      .withColumnRenamed("doc_id", "corpus_doc").localCheckpoint()
    val corpusEmb = StreamingDaemon.embedBandKeys(corpus)
      .select(col("ekey"), col("embedding")).localCheckpoint()

    // batch-gate expectation for the plain fresh docs: text near-dups drop;
    // no fixture embedding pair reaches cos 0.99 (ceiling ~0.47), so the
    // semantic arm must not reject any of them
    val expected1 = fresh
      .join(graft.operators.TextQueries.bandKeysOf(fresh)
          .join(corpusSigs, "skey").select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet

    // batch 1: fresh docs + a SEMANTIC dup of a corpus doc — novel text
    // (passes the MinHash gate) but the corpus doc's exact embedding
    val novelText  = (1 to 60).map(i => s"qwz${i}fleem").mkString(" ")
    val novelText2 = (1 to 60).map(i => s"vrb${i}snork").mkString(" ")
    val corpusOne = corpus.orderBy(col("doc_id")).limit(1)
    val semDupOfCorpus = corpusOne
      .withColumn("doc_id", lit(5000000L))
      .withColumn("text", lit(novelText))
    // an INTRA-batch mirror pair: two docs in the same micro-batch with
    // distinct novel texts but identical embeddings (orthogonal to every
    // fixture embedding pattern) — lower doc_id must win, higher must lose
    val mirrorEmb = array((0 until 64).map(i =>
      lit(if (i % 4 < 2) 0.02f else -0.02f)): _*)
    val mirror1 = corpusOne.withColumn("doc_id", lit(8000000L))
      .withColumn("text", lit((1 to 60).map(i => s"mra${i}zilt").mkString(" ")))
      .withColumn("embedding", mirrorEmb)
    val mirror2 = corpusOne.withColumn("doc_id", lit(8000001L))
      .withColumn("text", lit((1 to 60).map(i => s"mrb${i}quop").mkString(" ")))
      .withColumn("embedding", mirrorEmb)
    fresh.unionByName(semDupOfCorpus).unionByName(mirror1).unionByName(mirror2)
      .coalesce(1).write.mode("append").parquet(in)
    // batch 2: a semantic dup of an ADMITTED batch-1 doc (tests the ekeys
    // store fold-back) + a genuinely novel doc (text AND embedding)
    val keeper = fresh.filter(col("doc_id") === expected1.min)
    val semDupOfAccepted = keeper
      .withColumn("doc_id", lit(6000000L))
      .withColumn("text", lit(novelText2))
    val novelDoc = keeper
      .withColumn("doc_id", lit(7000000L))
      .withColumn("text", lit((1 to 60).map(i => s"xlp${i}crumb").mkString(" ")))
      .withColumn("embedding",
        array((0 until 64).map(i => lit(if (i % 2 == 0) 0.01f else -0.01f)): _*))
    def partFiles() = new java.io.File(in).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).toSet
    val files1 = partFiles()
    semDupOfAccepted.unionByName(novelDoc).coalesce(1).write.mode("append").parquet(in)
    val files2 = partFiles() -- files1
    val t0 = System.currentTimeMillis() - 60000
    files1.foreach(_.setLastModified(t0))
    files2.foreach(_.setLastModified(t0 + 30000))

    val q = StreamingDaemon.ingestDedupLoop(spark, in, corpusSigs, out, ckp, sig,
      corpusEmbSigs = Some(corpusEmb), semanticCos = 0.99)
    q.awaitTermination()

    val kept = spark.read.parquet(s"$out/batch=*").select("doc_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    // the semantic dup of a CORPUS doc was rejected despite novel text
    assert(!kept.contains(5000000L), "corpus semantic near-dup admitted")
    // the semantic dup of an ADMITTED batch-1 doc was rejected (ekeys store)
    assert(!kept.contains(6000000L), "prior-batch semantic near-dup admitted")
    // the genuinely novel doc passed both gates
    assert(kept.contains(7000000L), "novel doc wrongly rejected")
    // intra-batch mirror pair: min-keeper admitted, its mirror rejected
    assert(kept.contains(8000000L), "intra-batch mirror keeper wrongly rejected")
    assert(!kept.contains(8000001L), "intra-batch semantic mirror admitted")
    // and the plain fresh docs behave exactly like the batch text gate —
    // the semantic arm rejected nothing below the cosine threshold
    assert(kept.filter(_ < 5000000L) == expected1)
  }

  test("statefulLww folds new versions into O(keys) state across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDaemon.{EventIn, LwwUpdate}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[EventIn]
    val q = StreamingDaemon.statefulLww(input.toDS())
      .writeStream.format("memory").queryName("lww_updates")
      .outputMode(StreamingDaemon.statefulLwwOutputMode)
      .start()
    try {
      // batch 1: two versions for key (1, click) — newest is event 2
      input.addData(
        EventIn(1L, 100L, 1L, "click", 1.0),
        EventIn(2L, 200L, 1L, "click", 2.0))
      q.processAllAvailable()
      val b1 = spark.table("lww_updates").as[LwwUpdate].collect()
      assert(b1.toSeq == Seq(LwwUpdate(1L, "click", 2L, 200L, 2.0, 2L)))

      // batch 2: an OLDER version arrives late — state must not regress,
      // but the version counter advances
      input.addData(EventIn(3L, 150L, 1L, "click", 3.0))
      q.processAllAvailable()
      val b2 = spark.table("lww_updates").as[LwwUpdate].collect()
      assert(b2.last == LwwUpdate(1L, "click", 2L, 200L, 2.0, 3L))
    } finally q.stop()
  }

  test("sessionCloseStream: gap closes in the data callback, idle users close by event-time timeout, state removed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDaemon.{EventIn, SessionClosed}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val M = 60L * 1000000L // one minute in µs
    val gap = 30L * M
    val B = 1000 * M // base offset: a ts equal to the initial watermark (0) is dropped as late
    val input = MemoryStream[EventIn]
    val q = StreamingDaemon.sessionCloseStream(input.toDS(), gap)
      .writeStream.format("memory").queryName("sess_closed")
      .outputMode("append")
      .start()
    try {
      // batch 1: user 1 has a 2-event session; user 2 a 1-event session
      input.addData(
        EventIn(1L, B, 1L, "view", 0.0),
        EventIn(2L, B + 5 * M, 1L, "purchase", 1.0),
        EventIn(3L, B, 2L, "view", 0.0))
      q.processAllAvailable()
      assert(spark.table("sess_closed").count() == 0) // nothing closed yet

      // batch 2: user 1 returns 85 min after their session end — the open
      // session closes in the DATA callback ("gap") and a new one opens.
      // The same event advances the watermark to B+80m (90m − 10m delay),
      // past user 2's timeout (B+30m): processAllAvailable runs the
      // follow-up no-data micro-batch where user 2's TIMEOUT callback
      // fires and its state is removed.
      input.addData(EventIn(4L, B + 90 * M, 1L, "view", 0.0))
      q.processAllAvailable()
      val afterGap = spark.table("sess_closed").as[SessionClosed].collect().toSet
      assert(afterGap == Set(
        SessionClosed(1L, B, B + 5 * M, 2L, 1L, "gap"),
        SessionClosed(2L, B, B, 1L, 0L, "timeout")))

      // batch 3: an unrelated user far ahead pushes the watermark past
      // user 1's SECOND session's timeout (B+90m end + 30m gap = B+120m) —
      // it closes by timeout too, so no session is ever silently stuck.
      input.addData(EventIn(5L, B + 200 * M, 3L, "view", 0.0))
      q.processAllAvailable()
      val afterTimeout = spark.table("sess_closed").as[SessionClosed].collect().toSet
      assert(afterTimeout ==
        afterGap + SessionClosed(1L, B + 90 * M, B + 90 * M, 1L, 0L, "timeout"))

      // a re-appearing timed-out user starts FRESH — no resurrected state
      input.addData(EventIn(6L, B + 210 * M, 2L, "view", 0.0))
      q.processAllAvailable()
      val s4 = spark.table("sess_closed").as[SessionClosed].collect()
      assert(s4.count(_.user_id == 2L) == 1) // still only the timed-out close
    } finally q.stop()
  }

  test("changeStream emits only when the newest version changes (flatMapGroupsWithState)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDaemon.{EventIn, LwwUpdate}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[EventIn]
    val q = StreamingDaemon.changeStream(input.toDS())
      .writeStream.format("memory").queryName("change_stream")
      .outputMode("append")
      .start()
    try {
      input.addData(EventIn(1L, 100L, 1L, "click", 1.0))
      q.processAllAvailable()
      input.addData(EventIn(2L, 50L, 1L, "click", 2.0)) // older — no change
      q.processAllAvailable()
      input.addData(EventIn(3L, 200L, 1L, "click", 3.0)) // newer — change
      q.processAllAvailable()
      val got = spark.table("change_stream").as[LwwUpdate].collect().toSeq
      assert(got.map(_.last_event_id) == Seq(1L, 3L)) // batch 2 emitted nothing
    } finally q.stop()
  }

  test("watermark drops late rows beyond the tolerance in streaming aggregation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = StreamingDaemon.windowedCounts(
      input.toDS().toDF("ts", "value").withColumn("event_type", org.apache.spark.sql.functions.lit("x")))
    val q = agg.writeStream.format("memory").queryName("late_agg").outputMode("update").start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      input.addData((ts(0), 1.0))   // window 10:00
      q.processAllAvailable()
      input.addData((ts(30), 1.0))  // advances watermark to 09:30
      q.processAllAvailable()
      // 3 hours late (far beyond the 1h tolerance): must be dropped
      input.addData((java.sql.Timestamp.valueOf("2024-01-01 07:00:00"), 99.0))
      q.processAllAvailable()
      val rows = spark.table("late_agg")
        .select("window.start", "n").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
      assert(!rows.exists(_._1.startsWith("2024-01-01 07:")), rows.toString)
    } finally q.stop()
  }

  test("late-data accounting: batch-2 rows older than the watermark are dropped, counts pinned vs batch truth") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    // Batch 1: 3 rows in window 10:00 + 2 in 10:30 → watermark advances to
    // max(10:35) − 1h = 09:35 for the NEXT batch.
    val batch1 = Seq(ts("10:05:00") -> 1.0, ts("10:06:00") -> 2.0,
      ts("10:07:00") -> 3.0, ts("10:35:00") -> 4.0, ts("10:36:00") -> 5.0)
    // Batch 2: 2 on-time rows (10:15 ≥ watermark) + 2 LATE rows at 08:00,
    // 95 minutes beyond the 1h tolerance → exactly these two must drop.
    val onTime2 = Seq(ts("10:15:00") -> 6.0, ts("10:16:00") -> 7.0)
    val late2 = Seq(ts("08:00:00") -> 98.0, ts("08:01:00") -> 99.0)

    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = StreamingDaemon.windowedCounts(
      input.toDS().toDF("ts", "value").withColumn("event_type", lit("x")))
    val q = agg.writeStream.format("memory").queryName("late_acct")
      .outputMode("update").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(onTime2 ++ late2: _*)
      q.processAllAvailable()

      // final state per window = last update emitted (n grows monotonically)
      val streamed = spark.table("late_acct")
        .groupBy(col("window.start").as("w"))
        .agg(max(col("n")).as("n"))
        .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap

      // batch truth over ONLY the accepted rows — the stream must equal it...
      val acceptedTruth = StreamingDaemon.windowedCounts(
        (batch1 ++ onTime2).toDF("ts", "value").withColumn("event_type", lit("x")))
        .select(col("window.start").as("w"), col("n"))
        .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      assert(streamed == acceptedTruth, s"streamed=$streamed truth=$acceptedTruth")

      // ...and the accounting closes exactly: 9 in, 7 accepted, 2 dropped.
      val totalIn = (batch1 ++ onTime2 ++ late2).size
      val accepted = streamed.values.sum
      assert(accepted == 7L)
      assert(totalIn - accepted == late2.size, s"dropped=${totalIn - accepted}")
      // the late rows' own window never materialized
      assert(!streamed.keySet.exists(_.startsWith("2024-01-01 08:")), streamed.toString)
    } finally q.stop()
  }

  test("windowedCounts aggregates event-time windows with a watermark") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    // batch execution of the same expression tree validates the plan shape
    val agg = StreamingDaemon.windowedCounts(ev)
    assert(agg.columns.toSeq == Seq("window", "event_type", "n", "total"))
    assert(agg.count() > 0)
  }

  test("admission gate preserves the reference's string-compare semantics (overnight window admits nothing)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(StreamingDaemon.admissionGate(ev, "23:00:00", "01:00:00").count() == 0)
    assert(StreamingDaemon.admissionGate(ev, "00:00:00", "23:59:59").count() == ev.count())
  }

  test("driftHistogram maintained across micro-batches equals the batch binning (q_drift_psi arm)") {
    val in = tmp("drift-in")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_chars")
    // two arrivals → two triggers (maxFilesPerTrigger=1): the complete-mode
    // histogram must fold batch 2 INTO batch 1's counts, not replace them
    docs.filter(col("doc_id") % 3 =!= 0).coalesce(1).write.mode("append").parquet(in)
    docs.filter(col("doc_id") % 3 === 0).coalesce(1).write.mode("append").parquet(in)

    val q = StreamingDaemon
      .driftHistogram(StreamingDaemon.source(spark, in, spark.read.parquet(in)))
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("drift_out")
      .orderBy("bin").collect().toSeq
    val batch = StreamingDaemon.driftHistogram(docs)
      .orderBy("bin").collect().toSeq
    assert(streamed == batch)
    // side totals conserve the corpus — no row lost between triggers
    val total = spark.table("drift_out")
      .agg(sum(col("ca") + col("cb"))).head.getLong(0)
    assert(total == docs.count())
  }
}
