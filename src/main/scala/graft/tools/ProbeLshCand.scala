package graft.tools

import org.apache.spark.sql.functions._

/** Candidate-volume probe for the multi-table LSH tier, computed from
  * the BUCKET CENSUS alone (no pair join): raw candidate occurrences
  * = Σ over (t, sig, mask) of bc(sig) · bc(sig^mask), minus the
  * mask-0 self pairs — exact, and costs a census self-join of ~L·2^p
  * rows instead of the hundreds-of-millions-row probe join. Prints
  * the volume at Hamming radius 1, 2 and 3 so the probe-depth knob
  * can be priced BEFORE running it.
  *
  * runMain graft.tools.ProbeLshCand DIR
  */
object ProbeLshCand {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Similarity
    val planes = Similarity.adaptivePlanes(spark, dir)
    val tables = Similarity.adaptiveTables(planes)
    println(s"[probe-cand] planes=$planes tables=$tables " +
      s"cap=${Similarity.multiCap(Similarity.corpusN(spark, dir))}")
    val census = Similarity.sigBucketsMulti(spark, dir, -1)
      .groupBy($"t", $"sig").agg(count(lit(1)).as("bc")).cache()
    val nIdx = census.agg(sum($"bc")).head().getLong(0)
    println(s"[probe-cand] index_rows=$nIdx buckets=${census.count()}")
    def volume(radius: Int): Long = {
      val masks = (0 until planes).combinations _
      val ms: Seq[Long] = 0L +: (1 to radius).flatMap(r =>
        (0 until planes).combinations(r).map(_.map(1L << _).reduce(_ | _)).toSeq)
      val probed = census.select($"t", $"bc",
        explode(array(ms.map(m => $"sig".bitwiseXOR(lit(m))): _*)).as("sig"))
      val tot = probed.as("a")
        .join(census.select($"t", $"sig", $"bc".as("bc_b")).as("b"), Seq("t", "sig"))
        .agg(sum($"bc" * $"bc_b")).head().getLong(0)
      tot - nIdx // mask-0 self pairs
    }
    Seq(1, 2, 3).foreach { r =>
      println(f"[probe-cand] radius=$r raw_candidates=${volume(r)}%,d")
    }
    spark.stop()
  }
}
