package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** Shared staleness-proof memoization for per-snapshot artifacts (LSH edge
  * sets, cluster labels, trained centroids, persisted signature tables).
  *
  * Two hazards this fixes over a bare TrieMap keyed on the sfDir path:
  *
  *  - STALENESS: a fixture regenerated in-JVM under the same path would be
  *    served the previous snapshot's artifact. The key therefore embeds a
  *    fingerprint of the source parquet (size + mtime — the same guard
  *    [[PartitionedLayout.eventsByDay]] introduced, factored here) and the
  *    owning SparkContext's identity (localCheckpoint'ed DataFrames die
  *    with their context; a new session in the same JVM must never be
  *    handed another context's checkpoints).
  *  - RACES: TrieMap.getOrElseUpdate is not atomic for side effects — two
  *    concurrent first callers could both run an expensive pipeline, or
  *    both DROP/CREATE the same warehouse table.
  *    ConcurrentHashMap.computeIfAbsent runs the compute at most once per
  *    key, with later callers for that key blocking until it finishes.
  */
object Memo {

  /** Fingerprint of `table`'s source parquet under `sfDir`. Stable across
    * sessions; changes whenever the source is regenerated.
    *
    *  - Single FILE (the driver fixtures): size + mtime — cheap (one stat)
    *    and sufficient, since a rewrite changes at least the mtime tick.
    *  - DIRECTORY (a Spark-written parquet dir, the daemon posture): the
    *    directory's own length is meaningless and its mtime only moves
    *    when DIRECT children are added/removed — an in-place part-file
    *    rewrite under the same names would fingerprint identically. The
    *    fingerprint therefore digests the RECURSIVE listing
    *    (relative name, length, mtime per file, sorted): any
    *    re-materialization changes part-file names (task UUIDs) and
    *    mtimes, so it can never be served stale. Cost is one listing walk
    *    per lookup — the price of correctness for multi-file sources; the
    *    bench fixtures are single files and never pay it.
    */
  def fingerprint(sfDir: String, table: String): String = {
    val src = new java.io.File(new java.io.File(sfDir).getAbsolutePath, s"$table.parquet")
    // Fail loudly on a missing source: java.io.File stats resolve ONLY the
    // driver's local filesystem, and a path that doesn't exist there (typo,
    // or an HDFS/S3 URI this local variant cannot see) would silently
    // fingerprint as the constant "0:0" — every regeneration would then
    // collide on one memo key and serve stale artifacts with no error.
    // Remote sources need a Hadoop-FileSystem fingerprint, not a constant.
    require(src.exists,
      s"Memo.fingerprint: $src does not exist on the driver's local filesystem " +
        "(a non-local source must not be fingerprinted by this java.io.File variant)")
    if (!src.isDirectory) s"${src.length}:${src.lastModified}"
    else {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      def walk(f: java.io.File, rel: String): Unit =
        if (f.isDirectory) {
          val kids = f.listFiles()
          if (kids != null)
            kids.sortBy(_.getName).foreach(k => walk(k, s"$rel/${k.getName}"))
        } else digest.update(s"$rel:${f.length}:${f.lastModified}\n".getBytes("UTF-8"))
      walk(src, "")
      s"dir:${digest.digest().take(8).map("%02x".format(_)).mkString}"
    }
  }

  /** Memo key for an artifact derived from `table` under `sfDir`, owned by
    * session `s`: absolute path + source fingerprint + context identity.
    */
  def key(s: SparkSession, sfDir: String, table: String): String = {
    val abs = new java.io.File(sfDir).getAbsolutePath
    // applicationId + startTime is unique per context for the JVM's life —
    // identityHashCode is NOT (identity hashes recycle after GC, and a
    // collision would hand a new context a dead context's localCheckpoints).
    s"$abs/$table|${fingerprint(sfDir, table)}" +
      s"|sc@${s.sparkContext.applicationId}:${s.sparkContext.startTime}"
  }

  /** Family/version split of a memo key. [[key]] produces
    * `<abs>/<table>|<fingerprint>|sc@<app>:<start>` (call sites may append
    * `#suffix` to the END), where `<fingerprint>` is either the single-file
    * `<size>:<mtime>` form or the directory `dir:<hash>` form of
    * [[fingerprint]] — neither contains '|', so the split is unambiguous:
    * segment 1 is the source FINGERPRINT (version);
    * everything else — path, context identity, suffix — is the FAMILY. Two
    * keys of one family are the same artifact for two snapshots of its
    * source; only one can be current. A key without a fingerprint segment
    * is its own family (no rotation).
    */
  def splitKey(key: String): (String, String) = {
    val parts = key.split('|')
    if (parts.length < 2) (key, "")
    else ((parts.take(1) ++ parts.drop(2)).mkString("|"), parts(1))
  }

  /** Per-key-atomic memo with SUPERSEDED-VERSION eviction: when a compute
    * lands a new version of a family (the source fingerprint rotated), the
    * family's previous entry is removed and handed to `onEvict` — for
    * pinned DataFrames that's [[releasePin]], which frees the checkpoint
    * blocks/files a strong map reference would otherwise keep alive for
    * the JVM's life (a long-lived daemon regenerating snapshots would leak
    * executor disk otherwise). Eviction fires only when a NEW key is
    * actually computed, i.e. once per source regeneration; by then every
    * new lookup resolves to the new fingerprint, so the evicted snapshot
    * has no future readers (in-flight jobs over the OLD snapshot must not
    * race a regeneration — same contract as the fixture rotation itself).
    */
  final class Cache[V](onEvict: V => Unit = (_: V) => ()) {
    private val m = new java.util.concurrent.ConcurrentHashMap[String, V]()
    private val live = new java.util.concurrent.ConcurrentHashMap[String, String]()
    def get(key: String)(compute: => V): V = {
      var inserted = false
      val v = m.computeIfAbsent(key, _ => { inserted = true; compute })
      if (inserted) {
        val (family, version) = splitKey(key)
        if (version.nonEmpty) {
          val prev = live.put(family, key)
          if (prev != null && prev != key) {
            val old = m.remove(prev)
            if (old != null)
              try onEvict(old)
              catch { case e: Throwable =>
                System.err.println(s"[memo] WARN: evict of superseded $prev failed: ${e.getMessage}")
              }
          }
        }
      }
      v
    }
    /** Live (non-evicted) entry count — spec hook for the bounded-size claim. */
    def size: Int = m.size
  }

  /** Per-SESSION memo for artifacts that are session-bound, not merely
    * context-bound — e.g. the [[graft.Tables]] DataFrame reads: a Dataset
    * remembers the SparkSession that created it, and
    * `createOrReplaceTempView` registers in THAT session's catalog, so a
    * DataFrame memoized under one session must never be served to a
    * `newSession()` sibling (round-13 regression: six SQL queries register
    * temp views in an isolated newSession; a context-keyed load cache
    * registered them in the parent session instead →
    * TABLE_OR_VIEW_NOT_FOUND).
    *
    * Boundedness: the outer map is an access-ordered LRU capped at
    * `maxSessions`, NOT a WeakHashMap. Weak keys cannot work here — the
    * cached values (DataFrames) strongly reference the SparkSession that
    * created them, i.e. the map KEY, and a WeakHashMap entry whose value
    * reaches its own key is never collectable (the round-13 version had
    * exactly this leak: every short-lived `newSession()` isolation session
    * pinned itself, its SessionState and its DataFrames for the JVM's
    * life). The explicit LRU makes the lifetime deterministic instead:
    * long-lived sessions stay hot by being touched (the root session is
    * re-accessed on every query, so churn from one-shot isolation sessions
    * can only evict OTHER one-shot sessions), and in the long-lived-daemon
    * posture the retained set is at most `maxSessions` sessions' worth of
    * resolved reads.
    */
  final class SessionCache[V](maxSessions: Int = 8) {
    private type Inner = java.util.concurrent.ConcurrentHashMap[String, V]
    private val outer =
      new java.util.LinkedHashMap[SparkSession, Inner](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[SparkSession, Inner]): Boolean =
          size > maxSessions
      }
    def get(s: SparkSession, key: String)(compute: => V): V = {
      val inner = outer.synchronized {
        var m = outer.get(s)
        if (m == null) { m = new Inner(); outer.put(s, m) }
        m
      }
      inner.computeIfAbsent(key, _ => compute)
    }
    /** Retained session count — spec hook for the bounded-growth claim. */
    def sessionCount: Int = outer.synchronized(outer.size)
    /** True iff `s` currently holds a memo entry set (without touching the
      * LRU access order — spec hook).
      */
    def retains(s: SparkSession): Boolean = outer.synchronized {
      val it = outer.keySet.iterator
      var found = false
      while (it.hasNext && !found) found = it.next() eq s
      found
    }
  }

  /** Materialization PIN for per-run intermediates (`ds.pin()` via
    * [[PinOps]]) — the one switch between the two Spark checkpoint
    * flavors, governing every pipeline call site:
    *
    *  - `spark.graft.checkpoint.mode=local` (default):
    *    `Dataset.localCheckpoint()` — blocks stored on EXECUTOR
    *    local disk/memory. Right for local mode and for clusters where a
    *    lost executor may simply recompute-fail the query (the artifacts
    *    pinned here are per-run intermediates, cheap to rebuild by
    *    re-running). The failure semantics on a real cluster: the
    *    checkpointed blocks die with their executor, and any job that
    *    still references them FAILS (Spark cannot recompute a truncated
    *    lineage) — the query must be re-run from source.
    *  - `spark.graft.checkpoint.mode=reliable`:
    *    `Dataset.checkpoint()` — blocks written to the fault-tolerant
    *    `SparkContext.setCheckpointDir` filesystem (HDFS/S3). Executor
    *    loss is survivable; the cost is a distributed-FS write per pin.
    *    The dataset is persisted around the checkpoint call: Spark's
    *    reliable checkpoint writes files in a SECOND pass after the
    *    eager action, which would recompute the whole un-cached lineage
    *    (doubling every pin — fatal for iterative consumers like the
    *    [[graft.operators.Components]] contraction loop); the transient
    *    cache makes that pass a block read, and is dropped once the
    *    checkpoint files exist. Required for long multi-stage production
    *    runs (the 100 TB posture) where re-running from source on one
    *    lost executor is unacceptable. The checkpoint dir must be set or
    *    `pin()` throws with instructions rather than silently falling
    *    back. Operational note: reliable checkpoint files accumulate for
    *    the application's life unless
    *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` (GC-driven
    *    cleanup) — size/lifecycle the directory for the run.
    *
    * Both flavors are eager and truncate lineage — plan shape downstream
    * is identical (an RDD scan), so the switch never changes results or
    * downstream optimization; MemoSpec pins result-equality across modes
    * on a real consumer.
    */
  def pin[T](ds: Dataset[T]): Dataset[T] = {
    val s = ds.sparkSession
    s.conf.get("spark.graft.checkpoint.mode", "local") match {
      case "local" => ds.localCheckpoint()
      case "reliable" =>
        if (s.sparkContext.getCheckpointDir.isEmpty)
          throw new IllegalStateException(
            "spark.graft.checkpoint.mode=reliable requires " +
              "SparkContext.setCheckpointDir (a fault-tolerant path, e.g. HDFS/S3)")
        val cached = ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try cached.checkpoint() // eager: files exist when this returns
        finally cached.unpersist(blocking = false)
      case other =>
        throw new IllegalArgumentException(
          s"spark.graft.checkpoint.mode=$other (expected 'local' or 'reliable')")
    }
  }

  /** `ds.pin()` — the pipeline spelling of [[pin]]. */
  implicit final class PinOps[T](private val ds: Dataset[T]) extends AnyVal {
    def pin(): Dataset[T] = Memo.pin(ds)
  }

  /** Release the materialization behind a SUPERSEDED pinned Dataset — the
    * [[Cache]] `onEvict` hook for DataFrame caches.
    *
    * A `pin()` result's analyzed plan is a bare `LogicalRDD` whose RDD is
    * the checkpointed one: `unpersist` frees the localCheckpoint blocks
    * (local mode), and deleting `getCheckpointFile` removes the reliable
    * checkpoint directory (reliable mode) — deterministic cleanup instead
    * of waiting on GC + ContextCleaner. A cache value that is NOT a bare
    * pin root (some caches store a cheap view over another family's pin)
    * is left alone: releasing a leaf under it could kill a LIVE pin owned
    * by a different family, so those fall back to the GC-driven path
    * (`spark.cleaner.referenceTracking.cleanCheckpoints`, on in
    * [[graft.Sessions.tuned]]).
    */
  def releasePin(ds: Dataset[_]): Unit = ds.queryExecution.analyzed match {
    case l: org.apache.spark.sql.execution.LogicalRDD =>
      val rdd = l.rdd
      rdd.getCheckpointFile.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        try p.getFileSystem(ds.sparkSession.sparkContext.hadoopConfiguration).delete(p, true)
        catch { case e: Throwable =>
          System.err.println(s"[memo] WARN: checkpoint dir $f not deleted: ${e.getMessage}")
        }
      }
      rdd.unpersist(blocking = false)
    case _ => ()
  }
}
