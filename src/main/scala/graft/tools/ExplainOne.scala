package graft.tools

/** Ad-hoc plan dump: runMain graft.tools.ExplainOne <name> [sfDir]. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = plan.split("\n").count(_.trim.startsWith("+- Exchange") )
    println(s"[explain] $name")
    df.explain("formatted")
    spark.stop()
  }
}
