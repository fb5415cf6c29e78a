package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY.md §4.3): persisting
  * both sides of a recurring fact⋈fact join bucketed (and sorted) by the
  * join key lets sort-merge join read co-located, pre-sorted buckets — no
  * Exchange, no Sort at query time. At 100 TB this converts the recurring
  * shuffle (the single largest cost of lineitem⋈orders-shaped joins) into a
  * one-time write-side layout decision, exactly like HBase's region
  * pre-split strategy the reference relies on.
  */
object BucketedTables {

  /** Persist `df` bucketed+sorted by `key` as managed table `name`.
    *
    * The in-memory catalog forgets tables between sessions while the
    * warehouse directory persists, and Overwrite refuses a location the
    * catalog doesn't own (LOCATION_ALREADY_EXISTS) — so drop both the
    * registration and any orphaned location first.
    */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int): Unit = {
    // The name is interpolated into SQL and joined onto the warehouse path
    // below — restrict it to identifier characters so a crafted name can
    // neither escape the DROP statement nor point the recursive delete
    // outside the warehouse; the leading character must be non-numeric
    // because a digit-led identifier ("1tbl") fails the unquoted DROP/CREATE
    // parse instead of this require. Lowercased because the catalog
    // lowercases managed-table locations; a mixed-case name would miss the
    // orphan dir.
    require(name.matches("[a-zA-Z_][a-zA-Z0-9_]*"), s"invalid table name: $name")
    val table = name.toLowerCase(java.util.Locale.ROOT)
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(loc)
    }
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Bucket-local join of two tables persisted with [[writeBucketed]] on the
    * same key and bucket count.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
