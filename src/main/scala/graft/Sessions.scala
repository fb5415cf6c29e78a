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

  /** The multi-JVM probe session ([[ClusterProbe]], [[StreamClusterProbe]]):
    * `local-cluster[2,2,1024]` — a REAL standalone scheduler with two
    * separate executor JVM processes, the only in-sandbox posture where an
    * executor can actually die. Executors are spawned by the Worker, so they
    * need the app classes (same machine → extraClassPath of this JVM's
    * classpath) and the same JDK17 --add-opens set the driver runs with.
    * Requires SPARK_SCALA_VERSION=2.13 in the environment (the Worker builds
    * the executor command through the launcher library, whose Scala-version
    * probe otherwise dies with "Cannot find any build directories" when
    * SPARK_HOME is a bare dist without launcher/target).
    */
  def localCluster(extraConf: Map[String, String] = Map.empty): SparkSession = {
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    val b = SparkSession.builder()
      .master("local-cluster[2,2,1024]")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
    extraConf.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }.getOrCreate()
  }
}
