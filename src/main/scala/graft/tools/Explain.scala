package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints formatted physical plans for the queries
  * named on the command line, so the pushdown / pruning / broadcast
  * claims in SURVEY §6 are inspectable on demand. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // dedup_clusters/dedup_apply excluded: constructing their
    // DataFrame executes the iterative propagation (checkpoint
    // actions), so "explaining" them would run the whole pipeline
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_topk", "q5_multijoin", "q_asof", "q_asof_native",
        "q_asof_tolerance", "dedup_minhash", "ann_ivf", "q_sketch_distinct",
        "q_skewjoin", "q_quantiles", "q_quantiles_approx", "text_repetition",
        "frame_wire", "status_delayed", "config_gate", "mm_framesample",
        "corpus_pipeline")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
