package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout pruning: a date-partitioned events copy must be read
  * with PartitionFilters at the scan — at 100 TB this is the difference
  * between scanning one day and scanning three years.
  */
class PartitionPruningSpec extends AnyFunSuite with SparkSpec {

  test("day-partitioned layout prunes at the scan") {
    val dir = Files.createTempDirectory("events-by-day").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [isnotnull(day"), scan)
    assert(scan.contains("2024-01-05"), scan)
    assert(q.count() > 0)

    // pruning actually limits files read: one day's partition only
    val allDays = spark.read.parquet(dir).select("day").distinct().count()
    assert(allDays > 1) // layout really is multi-partition
  }

  test("q_scan_pruned reads the materialized layout with PartitionFilters at the scan") {
    val df = SparkEntry.queries("q_scan_pruned")(spark, "/root/testdata/sf0.001")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.contains("2024-01-05"), scan)
    assert(df.count() > 0)
  }
}
