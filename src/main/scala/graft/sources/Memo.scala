package graft.sources

import org.apache.spark.sql.SparkSession

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

  /** Fingerprint of `table`'s source parquet under `sfDir`: size + mtime.
    * Stable across sessions; changes whenever the file is regenerated.
    */
  def fingerprint(sfDir: String, table: String): String = {
    val src = new java.io.File(new java.io.File(sfDir).getAbsolutePath, s"$table.parquet")
    s"${src.length}:${src.lastModified}"
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

  /** Per-key-atomic memo. Entries for superseded fingerprints linger until
    * JVM exit — bounded by (fixtures × regenerations), which is tiny; the
    * correctness property is only that a stale key is never READ.
    */
  final class Cache[V] {
    private val m = new java.util.concurrent.ConcurrentHashMap[String, V]()
    def get(key: String)(compute: => V): V = m.computeIfAbsent(key, _ => compute)
  }
}
