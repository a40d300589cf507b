package graft.tools

/** Ad-hoc asof timing: reps of q_asof vs q_asof_native vs tolerance. */
object AsofBench {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    for (name <- Seq("q_asof", "q_asof_native", "q_asof_tolerance"); rep <- 1 to 5) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[asof] $name rep$rep ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
