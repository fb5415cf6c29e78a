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
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, name)
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
      .saveAsTable(name)
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
