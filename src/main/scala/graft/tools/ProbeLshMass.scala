package graft.tools

import org.apache.spark.sql.functions._

/** Multi-table LSH stop-band mass probe: per table, what fraction of
  * the corpus's (vec, table) rows sits in buckets ABOVE the
  * sigBucketsMulti cap — i.e. the index mass the stop-band silently
  * removes from the searchable index at this corpus density. High
  * dropped mass bounds recall from above no matter how many
  * tables/probes search the remainder.
  *
  * Usage: runMain graft.tools.ProbeLshMass DIR [cap ...]
  */
object ProbeLshMass {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val caps = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(800)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the measurement tools must hear the stop-band audit too —
    // a cap engaging during a census is the loudest place to say so
    graft.GraftSession.registerObservationLog(spark)
    import spark.implicits._
    val planes = graft.operators.Similarity.adaptivePlanes(spark, dir)
    val tables = graft.operators.Similarity.adaptiveTables(planes)
    println(s"[probe-lshmass] planes=$planes tables=$tables")
    val census = graft.operators.Similarity.sigBucketsMulti(spark, dir, nTables = -1,
        maxBucket = Int.MaxValue)
      .groupBy($"t", $"sig").agg(count(lit(1)).as("bc"))
      .cache()
    caps.foreach { cap =>
      val row = census.agg(
        sum(when($"bc" > cap, $"bc").otherwise(0L)).as("dropped"),
        sum($"bc").as("total"),
        sum(when($"bc" > cap, 1L).otherwise(0L)).as("hot_buckets"),
        count(lit(1)).as("buckets")).head()
      val (d, tot) = (row.getLong(0), row.getLong(1))
      println(f"[probe-lshmass] cap=$cap dropped_mass=${d.toDouble / tot}%.4f " +
        f"($d/$tot) hot=${row.getLong(2)}/${row.getLong(3)} buckets")
    }
    spark.stop()
  }
}
