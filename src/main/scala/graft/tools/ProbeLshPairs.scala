package graft.tools

import org.apache.spark.sql.functions._

/** Candidate-pair structure probe for the multi-table LSH tier: how
  * many raw (query, neighbor) collision OCCURRENCES the probe join
  * produces vs how many DISTINCT pairs survive a collapse — the
  * duplication factor that decides whether scoring distinct pairs
  * (instead of every occurrence) repays the extra exchange at the
  * 100x census scale.
  *
  * Usage: runMain graft.tools.ProbeLshPairs DIR [hamming3]
  */
object ProbeLshPairs {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.registerObservationLog(spark)
    import spark.implicits._
    import graft.operators.Similarity
    val planes = Similarity.adaptivePlanes(spark, dir)
    println(s"[probe-pairs] planes=$planes tables=${Similarity.adaptiveTables(planes)}")
    val idx = Similarity.sigBucketsMulti(spark, dir, -1)
      .select($"vec_id", $"t", $"sig")
    val masks = Similarity.probeMasks(planes)
    println(s"[probe-pairs] probes_per_table=${masks.length}")
    val probes = idx.select($"vec_id", $"t",
      explode(array(masks.map(m => $"sig".bitwiseXOR(lit(m))): _*)).as("sig"))
    val cand = probes.as("a").join(idx.as("b"), Seq("t", "sig"))
      .where($"a.vec_id" =!= $"b.vec_id")
      .select($"a.vec_id".as("query_id"), $"b.vec_id".as("neighbor_id"))
    var t0 = System.nanoTime()
    val raw = cand.count()
    println(f"[probe-pairs] raw_occurrences=$raw in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    t0 = System.nanoTime()
    val distinct = cand.distinct().count()
    println(f"[probe-pairs] distinct_pairs=$distinct (dup factor ${raw.toDouble / distinct}%.2f) in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
