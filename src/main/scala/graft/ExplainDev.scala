package graft
object ExplainDev {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tuned("local[4]", "4")
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
