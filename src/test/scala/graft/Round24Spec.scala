package graft

import org.apache.spark.sql.functions._

import graft.operators.{Frames, Quality, Telemetry}

/** Round-8 continuation, milestone 24: nine streaming twins —
  * stream_m4 / stream_funnel3 / stream_freshness /
  * stream_completeness / stream_frame_stats / stream_basket /
  * stream_uptime / stream_diversity / stream_trend — each gated
  * against its batch operator and, where the cross-batch property is
  * subtle, against a hand-staged MemoryStream. */
class Round24Spec extends SparkSpec {
  import spark.implicits._

  private def optL(r: org.apache.spark.sql.Row, c: String): Option[Long] =
    if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c))
  private def optD(r: org.apache.spark.sql.Row, c: String): Option[Double] =
    if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Double](c))
  private def optT(r: org.apache.spark.sql.Row, c: String): Option[Long] =
    Option(r.getAs[java.sql.Timestamp](c)).map(_.getTime)

  test("stream_m4 equals the batch ts_m4") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (optL(r, "user_id"), optT(r, "bucket"),
        r.getAs[Long]("n_points"), r.getAs[Double]("v_first"),
        r.getAs[Double]("v_last"), r.getAs[Double]("v_min"),
        r.getAs[Double]("v_max")))
      .sortBy(t => (t._1, t._2)).toSeq
    val batch = canon(Telemetry.m4(spark, sf))
    val streamed = canon(graft.streaming.StreamM4.streamedM4(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_funnel3 equals the batch events_funnel3") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (optL(r, "user_id"), optT(r, "signup_ts"),
        optT(r, "view_ts"), optT(r, "purchase_ts"),
        r.getAs[Long]("reached_step"), optL(r, "total_delay_us")))
      .sortBy(_._1).toSeq
    val batch = canon(Telemetry.funnel3(spark, sf))
    val streamed = canon(graft.streaming.StreamFunnel3.streamedFunnel3(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_funnel3: a batch-2 earlier signup promotes views AND re-qualifies purchases") {
    import graft.streaming.StreamFunnel3
    import StreamFunnel3.{Ev, F3Out}
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = StreamFunnel3.funnel3Stream(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("f3_out").start()
    try {
      // user 1: purchase and view land BEFORE any signup is known
      mem.addData(Ev(Some(1L), 100L, "purchase", sentinel = false),
        Ev(Some(1L), 50L, "view", sentinel = false),
        // user 2: view precedes its signup forever — never qualifies
        Ev(Some(2L), 30L, "view", sentinel = false),
        Ev(Some(2L), 40L, "signup", sentinel = false),
        Ev(Some(2L), 35L, "purchase", sentinel = false))
      q.processAllAvailable()
      assert(spark.table("f3_out").count() == 0L, "no flush before the barrier")
      // the retroactive chain: an EARLIER signup lands in batch 2
      mem.addData(Ev(Some(1L), 40L, "signup", sentinel = false))
      mem.addData(Ev(Some(1L), 0L, "S", sentinel = true),
        Ev(Some(2L), 0L, "S", sentinel = true))
      q.processAllAvailable()
      val out = spark.table("f3_out").as[F3Out].collect().toSet
      assert(out == Set(
        F3Out(Some(1L), 40L, Some(50L), Some(100L)),
        F3Out(Some(2L), 40L, None, None)))
    } finally q.stop()
  }

  test("stream_freshness equals the batch dq_freshness") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (Option(r.getAs[String]("event_type")), optT(r, "last_ts"),
        r.getAs[Long]("n_events"), r.getAs[Long]("n_last_day"),
        r.getAs[Long]("lag_seconds"), r.getAs[Boolean]("is_stale")))
      .sortBy(_._1).toSeq
    val batch = canon(Quality.freshness(spark, sf))
    val streamed = canon(graft.streaming.StreamFreshness.streamedFreshness(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_freshness: an advancing max prunes the 24h buffer across the cut") {
    import graft.streaming.StreamFreshness
    import StreamFreshness.{Ev, Out}
    implicit val sqlCtx = spark.sqlContext
    val day = 86400000000L
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = StreamFreshness.census(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("fresh_out").start()
    try {
      mem.addData(Ev(Some("A"), 0L, sentinel = false))
      q.processAllAvailable()
      // batch 2: the type max jumps 10 days — the day-0 entry expires
      mem.addData(Ev(Some("A"), 10L * day, sentinel = false))
      mem.addData(Ev(Some("A"), 0L, sentinel = true))
      q.processAllAvailable()
      val out = spark.table("fresh_out").as[Out].collect().toSeq
      assert(out == Seq(Out(Some("A"), 10L * day, 2L, Seq(10L * day))),
        s"buffer must prune to the last-24h slice, got $out")
    } finally q.stop()
  }

  test("stream_completeness equals the batch dq_completeness") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("column_name"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_null"), r.getAs[Long]("n_blank"),
        r.getAs[Double]("populated_frac")))
      .sortBy(_._1).toSeq
    val batch = canon(Quality.completeness(spark, sf))
    val streamed = canon(
      graft.streaming.StreamCompleteness.streamedCompleteness(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_completeness: shard counters accumulate across the cut") {
    import graft.streaming.StreamCompleteness
    import StreamCompleteness.{Flags, Out}
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Flags]
    val q = StreamCompleteness.census(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("compl_out").start()
    try {
      mem.addData(Flags(0L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, sentinel = false))
      q.processAllAvailable()
      mem.addData(Flags(0L, 0L, 1L, 0L, 1L, 0L, 0L, 0L, sentinel = false))
      mem.addData(Flags(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, sentinel = true))
      q.processAllAvailable()
      val out = spark.table("compl_out").as[Out].collect().toSeq
      assert(out == Seq(Out(0L, 2L, 1L, 1L, 0L, 1L, 0L, 0L, 0L)))
    } finally q.stop()
  }

  test("stream_frame_stats equals the batch frame_stats") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (optL(r, "device_id"), r.getAs[Long]("n_frames"),
        r.getAs[Long]("sample_sum"), r.getAs[Long]("sample_min"),
        r.getAs[Long]("sample_max"), r.getAs[Double]("sample_avg")))
      .sortBy(_._1).toSeq
    val batch = canon(Frames.stats(spark, sf))
    val streamed = canon(
      graft.streaming.StreamFrameStats.streamedFrameStats(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_basket equals the batch events_basket") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_ab"),
        r.getAs[Double]("lift")))
      .sortBy(t => (t._1, t._2)).toSeq
    val batch = canon(Telemetry.basket(spark, sf))
    val streamed = canon(graft.streaming.StreamBasket.streamedBasket(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_basket: a cell hit on both sides of the cut emits once") {
    import graft.streaming.StreamBasket
    import StreamBasket.{Cell, Ev}
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = StreamBasket.cells(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("basket_out").start()
    try {
      mem.addData(Ev(Some(1L), Some("a")), Ev(Some(1L), Some("a")))
      q.processAllAvailable()
      mem.addData(Ev(Some(1L), Some("a")), Ev(Some(1L), Some("b")))
      q.processAllAvailable()
      val out = spark.table("basket_out").as[Cell].collect().toSeq
      assert(out.size == 2 &&
        out.toSet == Set(Cell(Some(1L), Some("a")), Cell(Some(1L), Some("b"))))
    } finally q.stop()
  }

  test("stream_uptime equals the batch events_uptime") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (optL(r, "user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_slots_active"), r.getAs[Long]("n_slots_span"),
        r.getAs[Double]("uptime_frac")))
      .sortBy(_._1).toSeq
    val batch = canon(Telemetry.uptime(spark, sf))
    val streamed = canon(graft.streaming.StreamUptime.streamedUptime(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_diversity equals the batch events_diversity") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (optL(r, "user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_types"), r.getAs[Long]("collisions"),
        r.getAs[Long]("pairs"), optD(r, "effective_types")))
      .sortBy(_._1).toSeq
    val batch = canon(Telemetry.diversity(spark, sf))
    val streamed = canon(
      graft.streaming.StreamDiversity.streamedDiversity(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_diversity: a census cell split across the cut folds into one counter") {
    import graft.streaming.StreamDiversity
    import StreamDiversity.{Ev, Out}
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = StreamDiversity.census(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("div_out").start()
    try {
      mem.addData(Ev(Some(1L), Some("a"), sentinel = false))
      q.processAllAvailable()
      mem.addData(Ev(Some(1L), Some("a"), sentinel = false),
        Ev(Some(1L), Some("b"), sentinel = false))
      mem.addData(Ev(Some(1L), None, sentinel = true))
      q.processAllAvailable()
      val out = spark.table("div_out").as[Out].collect().toSet
      assert(out == Set(Out(Some(1L), Some("a"), 2L), Out(Some(1L), Some("b"), 1L)))
    } finally q.stop()
  }

  test("stream_trend equals the batch ts_trend") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (Option(r.getAs[String]("event_type")), r.getAs[Long]("n_hours"),
        r.getAs[Long]("n_events"), r.getAs[Long]("slope_num"),
        r.getAs[Long]("slope_den"), r.getAs[Double]("slope_per_hour")))
      .sortBy(_._1).toSeq
    val batch = canon(Telemetry.trend(spark, sf))
    val streamed = canon(graft.streaming.StreamTrend.streamedTrend(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }
}
