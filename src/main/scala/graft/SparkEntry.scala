package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries and their DuckDB oracles live in [[graft.operators.QueryPack]]s;
  * this object only aggregates them.
  */
object SparkEntry {
  private val packs: Seq[QueryPack] =
    Seq(MetaQueries, JoinQueries, AnalyticsQueries, TextQueries, VectorQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * LWW compaction — the reference's core data semantics (SURVEY.md §2.4 A5).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_compact_lww")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
