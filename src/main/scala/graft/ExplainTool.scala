package graft

/** Dev utility: `sbt "runMain graft.ExplainTool <query> [query ...]"`
  * prints the formatted physical plan of registry queries at sf0.001 —
  * the plan-iteration loop BUILD_NOTES prescribes after each operator. */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-explain", 8)
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      println(s"==== $n ====")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
