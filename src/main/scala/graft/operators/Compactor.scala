package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The full compaction job (SURVEY.md §2.1 S5 + §3.2): what the reference
  * triggers remotely via `hadmin.majorCompact`
  * (/root/reference/src/main/java/com/qunar/dba/QHBaseCompact.java:167) —
  * merge a store's many files into few, keep only the newest cell versions,
  * preserve the sorted-run invariant — expressed as one declarative Spark
  * write:
  *
  *   read → LWW dedup (one hash-agg shuffle, map-side partial) →
  *   repartitionByRange(k, key) (range shards ≙ HBase regions) →
  *   sortWithinPartitions(key) (HFile sorted-run invariant) →
  *   write maxRecordsPerFile
  *
  * At 100 TB: range partitioning gives balanced shards via sampled bounds,
  * the sort is per-partition (no global sort barrier), and the output file
  * count derives from data size like the reference's dead `marjorfilesize`
  * knob intended (QHBaseCompact.java:97-98, README.md:23-24).
  */
object Compactor {

  /** One compaction pass over a keyed, versioned table. Returns the compacted
    * frame (also written to `outDir` if given).
    */
  def compact(
      df: DataFrame,
      keys: Seq[String],
      orderCols: Seq[String],
      numFiles: Int,
      outDir: Option[String] = None,
      maxRecordsPerFile: Long = 0L): DataFrame = {
    val deduped = Compaction.lastWriteWins(df, keys, orderCols)
    val keyCols = keys.map(col)
    val shaped = deduped
      .repartitionByRange(math.max(numFiles, 1), keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
    outDir.foreach { dir =>
      val w = shaped.write.mode(SaveMode.Overwrite)
      (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile) else w)
        .parquet(dir)
    }
    shaped
  }

  /** Target output file count from total bytes — the size-based planning the
    * reference documented but never wired (README.md:23-24).
    */
  def planFileCount(totalBytes: Long, targetFileBytes: Long): Int =
    math.max(1, math.ceil(totalBytes.toDouble / math.max(targetFileBytes, 1L)).toInt)
}
