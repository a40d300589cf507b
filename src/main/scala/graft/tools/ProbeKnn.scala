package graft.tools

/** knnGraph quantizer-width cost probe: wall-clock the
  * [[graft.operators.Similarity.knnGraph]] build at each candidate
  * nCentroids (0 = the adaptive default) — the measurement behind the
  * coarse-quantizer rule's constant.
  *
  * Usage: runMain graft.tools.ProbeKnn DIR nc [nc ...]
  */
object ProbeKnn {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val ncs = args.drop(1).map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the measurement tools must hear the stop-band audit too —
    // a cap engaging during a census is the loudest place to say so
    graft.GraftSession.registerObservationLog(spark)
    ncs.foreach { nc =>
      val t0 = System.nanoTime()
      val rows = graft.operators.Similarity.knnGraph(spark, dir,
        nCentroids = if (nc > 0) nc else -1).count()
      println(f"[probe-knn] nc=$nc rows=$rows wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
