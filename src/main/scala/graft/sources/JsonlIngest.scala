package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-pinned JSONL ingestion with corrupt-record quarantine — the crawl
  * dump's entry point into the engine (SURVEY.md §2.1 sources family; crawl
  * archives arrive as JSON-lines shards, and at 100 TB a few malformed
  * records per shard are a certainty, not an edge case).
  *
  * Design choices, all load-bearing at scale:
  *
  *   - The schema is PINNED by the caller, never inferred: inference costs a
  *     full extra pass over the data, and on a 100 TB drop it also races the
  *     producer (mixed-schema shards infer a union schema that silently
  *     nulls fields). A pinned schema reads once and deterministically.
  *   - PERMISSIVE mode with a `_corrupt_record` column: a bad line becomes a
  *     quarantine ROW instead of a failed task (FAILFAST would kill the job
  *     on line 1 of 10¹¹) or a silent drop (DROPMALFORMED loses the
  *     evidence). The clean/quarantine split is two filters over ONE scan.
  *   - Quarantined rows keep the raw line, so the producer can be debugged
  *     and the rows replayed after a parser fix — the dead-letter-queue
  *     pattern.
  */
object JsonlIngest {

  val CorruptCol = "_graft_corrupt"

  /** Read `path` as JSONL against `schema`. Returns the parsed frame with
    * [[CorruptCol]] appended: null for clean rows, the raw line for rows
    * that failed to parse or type-check. PERSIST the result before calling
    * [[clean]] / [[quarantine]]: Spark refuses a corrupt-column-only
    * projection straight off a JSON file scan (the parse that would fill it
    * gets pruned away), and operationally the point is one parse pass
    * feeding both outputs — persist (or write) the parse, then split.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Rows that parsed fully against the pinned schema. */
  def clean(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The dead-letter split: raw lines that failed parse/type-check, with a
    * deterministic fingerprint for dedup-on-replay.
    */
  def quarantine(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"),
        sha2(col(CorruptCol), 256).as("line_hash"))
}
