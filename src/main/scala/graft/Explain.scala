package graft

/** Dev tool: print the formatted physical plan for named queries (all if no
  * names given) — the feedback loop for the scale review: PushedFilters
  * reaching the parquet scan, ReadSchema pruned, broadcasts on dim sides,
  * WholeStageCodegen spans, no stray shuffles.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val spark = Sessions.tuned("local[8]", "8")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.isEmpty || names(name)) {
        println(s"\n========== $name ==========")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
