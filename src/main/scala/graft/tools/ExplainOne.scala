package graft.tools

/** Ad-hoc plan dump: runMain graft.tools.ExplainOne <name>[,name...] [sfDir].
  * Multiple comma-separated names share one session so a plan sweep
  * does not pay JVM+session startup per query.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"===== $name =====")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
    }
    spark.stop()
  }
}
