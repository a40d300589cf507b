package graft

import org.apache.spark.sql.functions._
import graft.operators.{Frames, Multimodal, Telemetry}
import graft.streaming.StreamRelay

class FramesSpec extends SparkSpec {
  import spark.implicits._

  test("frame roundtrip preserves device, timestamp, and samples") {
    val rows = Frames.roundtrip(spark, sf).collect()
    assert(rows.length == 1000)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_samples") == 7L)
      val s = r.getAs[Long]("sample_sum")
      assert(s >= 0 && s < 7L * 32768)
    }
  }

  test("frame extract reads int16 LE fields within range") {
    Frames.extract(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("frame_bytes") == 24L)
      assert(r.getAs[Long]("first_sample") >= 0 && r.getAs[Long]("first_sample") < 32768)
      assert(r.getAs[Long]("last_sample") >= 0 && r.getAs[Long]("last_sample") < 32768)
    }
  }

  test("frame stats cover every device") {
    val df = Frames.stats(spark, sf)
    val nDevices = graft.sources.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(df.count() == nDevices)
    df.collect().foreach { r =>
      assert(r.getAs[Long]("sample_min") <= r.getAs[Long]("sample_max"))
    }
  }

  test("frame_wire round-trips the delimited wire format per device") {
    val wire = Frames.wire(spark, sf).collect()
      .map(r => r.getAs[Long]("device_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("sample_sum"), r.getAs[Boolean]("sync_ok"))).toMap
    val stats = Frames.stats(spark, sf).collect()
      .map(r => r.getAs[Long]("device_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("sample_sum"))).toMap
    assert(wire.keySet == stats.keySet)
    wire.foreach { case (d, (n, s, sync)) =>
      assert(sync, s"device $d lost frame sync")
      assert((n, s) == stats(d), s"device $d wire stats diverge from direct parse")
    }
  }

  test("wire split survives payload bytes equal to the delimiter") {
    import graft.plans.Frame
    // every sample is 58 == 0x3a — the delimiter byte — inside the
    // payload; the reference's search-based split (main.py split on
    // b':') would shred these frames, length-based framing must not
    val two = Seq((1L, 1600000000L)).toDF("device", "ts")
      .select(Frame.pack($"device", $"ts", array_repeat(lit(58L), 7)).as("f"))
      .select(concat($"f", lit(Array[Byte](0x3a)), $"f", lit(Array[Byte](0x3a))).as("wire"))
    val parsed = two.select(explode(transform(sequence(lit(0), lit(1)),
        i => $"wire".substr((i * 25 + 1).cast("int"), lit(24)))).as("frame"))
      .select(Frame.unpack($"frame").as("p"))
      .collect()
    assert(parsed.length == 2)
    parsed.foreach { r =>
      assert(!r.isNullAt(0), "frame with delimiter-valued payload must still parse")
      assert(r.getStruct(0).getSeq[Int](2).forall(_ == 58))
    }
  }

  test("mm_meta blob metadata is consistent") {
    Multimodal.meta(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(r.getAs[Long]("width") >= 1 && r.getAs[Long]("width") <= 64)
      assert(r.getAs[Long]("height") >= 1 && r.getAs[Long]("height") <= 48)
      assert(r.getAs[Long]("payload_head_sum") > 0)
    }
  }

  test("windowed stream relay matches batch aggregation totals") {
    val streamed = StreamRelay.windowedRelay(spark, sf)
    val total = streamed.agg(sum($"n_events")).head().getLong(0)
    assert(total == graft.sources.Tables.events(spark, sf).count())
  }

  test("stateful streaming budget matches the batch dataBudget operator") {
    import spark.implicits._
    val evs = graft.sources.Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"value".as("kb"))
      .as[StreamRelay.RelayEvent]
    val emitted = StreamRelay.statefulBudget(evs, 5000.0)
    val batch = Telemetry.dataBudget(spark, sf)
    // same number of surviving events per user (double vs decimal
    // accumulation can differ at the exact cutoff boundary, so compare
    // counts not sums; identical here because values are 2-dp)
    val a = emitted.groupBy($"user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = batch.groupBy($"user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
