package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of (query, DuckDB-oracle) pairs. [[graft.SparkEntry]]
  * aggregates all packs; the driver hash-matches each query's parquet output
  * against its oracle SQL on the same tables (bare table names — the driver
  * resolves them to the sf dir).
  *
  * Oracle discipline (SURVEY.md §5.2): every oracle-able query ends in an
  * explicit total ORDER BY with a unique tiebreak; aggregated doubles are
  * rounded identically in both dialects; timestamps are emitted as epoch
  * micros (BIGINT) to dodge parquet timestamp-encoding deltas; DuckDB integer
  * sums are cast to BIGINT (DuckDB widens to HUGEINT, Spark stays LongType).
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]

  /** DuckDB SQL per query key; omit a key for non-SQL-expressible ops (the
    * driver then records a weaker rows-only check).
    */
  def oracles: Map[String, String]
}
