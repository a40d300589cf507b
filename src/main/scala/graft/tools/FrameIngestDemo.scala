package graft.tools

import org.apache.spark.sql.functions._

/** Sample-code driver for the streaming serial-proxy path: pack
  * events into binary frames, persist, then stream-ingest with
  * native parse + watermarked 1 Hz dedup. Run:
  * `sbt 'runMain graft.tools.FrameIngestDemo [sfDir]'`
  */
object FrameIngestDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_demo_frames").toString
    val samples = transform(sequence(lit(0L), lit(6L)),
      i => ($"event_id" * 7 + i * 13 + floor($"value").cast("long")) % 32768)
    val frames = graft.sources.Tables.events(spark, sf).select($"event_id",
      graft.plans.Frame.pack($"user_id", expr("unix_micros(ts) div 1000000"), samples).as("frame"))
    graft.sources.Sinks.writeFrames(frames, out)
    val r1 = graft.streaming.StreamRelay.frameIngest(spark, out)
    val r2 = graft.streaming.StreamRelay.frameIngest(spark, out)
    println(s"INGEST1=${r1.count()} INGEST2=${r2.count()} " +
      s"DEVICES=${r1.select($"device").distinct().count()}")
    spark.stop()
  }
}
