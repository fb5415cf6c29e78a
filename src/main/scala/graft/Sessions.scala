package graft

import org.apache.spark.sql.SparkSession

/** One tuned SparkSession builder for Verify/Bench/tests so every entry point
  * runs with identical semantics: UTC (oracle discipline, SURVEY.md §5.2),
  * shuffle partitions sized to cores (not 200 — right for local[n]; on a real
  * cluster AQE coalescing makes the initial number a ceiling, not a cost),
  * nanosAsLong (the only way Spark 4 reads the ns-precision events.ts), and
  * AQE left on for runtime re-planning / skew handling.
  */
object Sessions {
  def tuned(master: String, cpus: String): SparkSession =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // GC-driven backstop for checkpoint files whose pin is dropped
      // without going through Memo.Cache eviction (releasePin is the
      // deterministic path; this catches non-root-pin cache values)
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", "/tmp/graft-warehouse"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
