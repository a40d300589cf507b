package graft.tools

import org.apache.spark.sql.functions._

/** Aggregate-recall probe for the eval-harness keys:
  * runMain graft.tools.RecallOne <name> [sfDir].
  * Runs SparkEntry.queries(name) and prints micro recall
  * (sum found / sum true) plus the per-query mean, so the scale
  * generators' corpora can be measured without the oracle plumbing.
  */
object RecallOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the measurement tools must hear the stop-band audit too —
    // a cap engaging during a census is the loudest place to say so
    graft.GraftSession.registerObservationLog(spark)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val cols = df.columns.toSet
    val (t, f) =
      if (cols("n_true")) ("n_true", "n_found")
      else if (cols("n_true_pairs")) ("n_true_pairs", "n_found_pairs")
      else sys.exit { println(s"[recall] $name has no n_true column"); 1 }
    val row = df.agg(sum(col(t)).as("t"), sum(col(f)).as("f"),
      avg(col("recall")).as("mean"), count(lit(1)).as("q")).head()
    val (tt, ff) = (row.getLong(0), row.getLong(1))
    println(f"[recall] $name micro=${ff.toDouble / tt}%.4f " +
      f"($ff/$tt) mean=${row.getDouble(2)}%.4f queries=${row.getLong(3)}")
    spark.stop()
  }
}
