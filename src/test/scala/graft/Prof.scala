package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling main (Test scope only). Args: variant names. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import spark.implicits._
    def t(name: String)(f: => Long): Unit = if (args.isEmpty || args.contains(name)) {
      val t0 = System.nanoTime(); val n = f
      println(s"PROF $name: ${(System.nanoTime() - t0) / 1e9} s, rows=$n")
      System.out.flush()
    }
    val wa = graft.operators.TextAnalysis.winnowArrays(spark, dir)
    t("base")(wa.count())
    t("fp")(wa.select($"doc_id", explode($"fps").as("fp")).count())
    t("winnow_op")(graft.operators.TextAnalysis.decontaminateWinnow(spark, dir).count())
    t("text_winnow")(graft.operators.TextAnalysis.winnow(spark, dir).count())
    t("winnow_only")(wa.agg(sum(size($"fps"))).as[Long].head())
    t("winnow_only2")(wa.agg(sum(size($"fps"))).as[Long].head())
    t("explode_only") {
      val ck = wa.localCheckpoint()
      val t1 = System.nanoTime()
      val n = ck.select($"doc_id", explode($"fps").as("fp")).count()
      println(s"PROF explode_inner: ${(System.nanoTime()-t1)/1e9} s"); n
    }
    t("stream_beacon")(graft.streaming.StreamBeacon.streamedBeacon(spark, dir).count())
    t("stream_beacon2")(graft.streaming.StreamBeacon.streamedBeacon(spark, dir).count())
    spark.stop()
  }
}
