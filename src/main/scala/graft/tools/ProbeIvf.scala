package graft.tools

import org.apache.spark.sql.functions._

/** IVF recall/cost sweep: for each `nc:np` pair, recall@5 of
  * [[graft.operators.Similarity.ivfTopK]] against the brute-force
  * ground truth on the same query set, plus the probed corpus
  * fraction — the measurement behind the adaptive (nCentroids,
  * nProbe) rule.
  *
  * Usage: runMain graft.tools.ProbeIvf DIR nc:np [nc:np ...]
  * (nc or np of 0 = the operator's adaptive default)
  */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val combos = args.drop(1).map { s =>
      val Array(a, b) = s.split(":"); (a.toInt, b.toInt)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the measurement tools must hear the stop-band audit too —
    // a cap engaging during a census is the loudest place to say so
    graft.GraftSession.registerObservationLog(spark)
    import spark.implicits._
    val truth = graft.operators.Similarity.bruteTopK(spark, dir)
      .select($"query_id", $"neighbor_id").cache()
    val nTrue = truth.count()
    combos.foreach { case (nc, np) =>
      val t0 = System.nanoTime()
      val got = graft.operators.Similarity.ivfTopK(spark, dir,
          nCentroids = if (nc > 0) nc else -1, nProbe = if (np > 0) np else -1)
        .select($"query_id", $"neighbor_id", lit(1L).as("hit"))
      val found = truth.join(got, Seq("query_id", "neighbor_id"), "left")
        .agg(sum(coalesce($"hit", lit(0L)))).head().getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probe-ivf] nc=$nc np=$np recall=${found.toDouble / nTrue}%.4f " +
        f"($found/$nTrue) wall=$secs%.1f s")
    }
    spark.stop()
  }
}
