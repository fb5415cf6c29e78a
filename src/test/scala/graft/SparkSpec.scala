package graft

import org.apache.spark.sql.SparkSession

/** Shared session for all suites (one JVM under Test/fork). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = Sessions.tuned("local[4]", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec {
  lazy val spark: SparkSession = TestSession.spark
}
