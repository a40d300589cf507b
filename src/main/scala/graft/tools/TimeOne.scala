package graft.tools

/** Ad-hoc repeat-timing: runMain graft.tools.TimeOne <name> [reps] [sfDir].
  * Same warmup + median protocol as graft.Bench, one query. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the measurement tools must hear the stop-band audit too —
    // a cap engaging during a census is the loudest place to say so
    graft.GraftSession.registerObservationLog(spark)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // same timed action switch as graft.Bench (noop computes every
    // column; count lets the optimizer prune — guide §1.4)
    val action = sys.env.getOrElse("GRAFT_BENCH_ACTION", "noop")
    val times = (1 to reps).map { rep =>
      graft.operators.Dedup.clearLabelCache()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (action == "count") df.count()
      else df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name rep$rep $s%.3f s")
      s
    }
    println(f"[time] $name median ${times.sorted.apply(reps / 2)}%.3f s")
    spark.stop()
  }
}
