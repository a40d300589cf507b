package graft.tools

/** Ad-hoc plan dump: runMain graft.tools.ExplainOne <name>[,name...] [sfDir].
  * Multiple comma-separated names share one session so a plan sweep
  * does not pay JVM+session startup per query.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    // tokens are trimmed (a stray space or trailing comma must not
    // become a lookup miss) and each name's explain is isolated: one
    // unknown/failing name reports and the sweep continues (ADVICE r13)
    val names = args(0).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try names.foreach { name =>
      println(s"===== $name =====")
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.explain("formatted")
      } catch {
        case t: Throwable =>
          println(s"ExplainOne: $name failed: ${t.getClass.getName}: ${t.getMessage}")
      }
    } finally spark.stop()
  }
}
