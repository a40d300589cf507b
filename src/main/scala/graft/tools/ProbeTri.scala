package graft.tools

import org.apache.spark.sql.functions._

/** Triangle-plan mass probe: pair count, degree profile, and the
  * oriented wedge mass (Σ out-deg²) of the duplicate graph — the
  * numbers that decide whether [[graft.operators.Dedup.triangles]]'
  * wedge join is tractable on a corpus.
  * runMain graft.tools.ProbeTri <sfDir> */
object ProbeTri {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.registerObservationLog(spark)
    import spark.implicits._
    val pairs = graft.operators.Dedup.minhash(spark, dir)
      .select($"doc_a", $"doc_b")
      .persist()
    println(s"[probetri] pairs=${pairs.count()}")
    val und = pairs.select($"doc_a".as("u"), $"doc_b".as("v"))
    val deg = und.select($"u".as("node")).union(und.select($"v".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("d"))
    deg.agg(count(lit(1)).as("nodes"), max($"d").as("max_deg"),
      sum($"d" * $"d").as("sum_deg2")).show(false)
    val j = und
      .join(deg.select($"node".as("u"), $"d".as("du")), "u")
      .join(deg.select($"node".as("v"), $"d".as("dv")), "v")
    val fwd = $"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v")
    val outd = j.select(when(fwd, $"u").otherwise($"v").as("src"))
      .groupBy($"src").agg(count(lit(1)).as("od"))
    outd.agg(sum($"od" * $"od").as("wedge_mass"), max($"od").as("max_out_deg"))
      .show(false)
    spark.stop()
  }
}
