package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Materialized partitioned layouts (SURVEY.md §2.1 S2): the Hive-style
  * `day=YYYY-MM-DD` directory scheme that turns a date filter into partition
  * pruning at the scan — at 100 TB the difference between reading one day
  * and reading three years. The reference's analog is HBase's region/store
  * directory layout (one directory per region, QHBaseCompact.java:139-149);
  * here the layout is written once per scale factor and reused.
  */
object PartitionedLayout {

  /** Day-partitioned copy of `events` for `sfDir`, built lazily and reused
    * across queries/runs (the parquet committer's _SUCCESS marker gates
    * re-writes, so a torn first write is redone, never half-read).
    */
  def eventsByDay(s: SparkSession, sfDir: String): String = synchronized {
    val name = new java.io.File(sfDir).getName
    val dir = s"/tmp/graft_layouts/$name/events_by_day"
    if (!Files.exists(Paths.get(dir, "_SUCCESS"))) {
      graft.Tables.events(s, sfDir)
        .withColumn("day", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("day").parquet(dir)
    }
    dir
  }
}
