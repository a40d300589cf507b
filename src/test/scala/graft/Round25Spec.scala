package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quality, Telemetry}

/** Round-8 continuation, milestone 25: five more streaming twins —
  * stream_autocorr / stream_forecast / stream_uniqueness /
  * stream_orphans / stream_keyskew. */
class Round25Spec extends SparkSpec {
  import spark.implicits._

  private def optL(r: org.apache.spark.sql.Row, c: String): Option[Long] =
    if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c))

  test("stream_autocorr equals the batch ts_autocorr") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (Option(r.getAs[String]("event_type")),
        r.getAs[Long]("n_pairs"), r.getAs[Double]("autocorr")))
      .sortBy(_._1).toSeq
    val batch = canon(Telemetry.autocorr(spark, sf))
    val streamed = canon(graft.streaming.StreamAutocorr.streamedAutocorr(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_autocorr: a pair split across the cut comes out of cross-batch state") {
    import graft.streaming.StreamAutocorr
    import StreamAutocorr.{Ev, Pair}
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = StreamAutocorr.pairs(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("ac_out").start()
    try {
      mem.addData(Ev(Some("A"), 1L, 1L, Some(100L)),
        Ev(Some("A"), 2L, 2L, None))
      q.processAllAvailable()
      // the null reading occupies the delay slot: no pair emitted yet
      assert(spark.table("ac_out").as[Pair].collect().toSet ==
        Set(Pair(Some("A"), 100L, None)))
      mem.addData(Ev(Some("A"), 3L, 3L, Some(300L)))
      q.processAllAvailable()
      // x = the NULL predecessor → no new pair with x; the 300 pairs
      // against nothing until a successor arrives
      assert(spark.table("ac_out").as[Pair].collect().toSet ==
        Set(Pair(Some("A"), 100L, None)))
      mem.addData(Ev(Some("A"), 4L, 4L, Some(400L)))
      q.processAllAvailable()
      assert(spark.table("ac_out").as[Pair].collect().toSet ==
        Set(Pair(Some("A"), 100L, None), Pair(Some("A"), 300L, Some(400L))))
    } finally q.stop()
  }

  test("stream_forecast equals the batch ts_forecast") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (Option(r.getAs[String]("event_type")),
        r.getAs[java.sql.Timestamp]("day").getTime,
        r.getAs[Long]("n_events"), optL(r, "forecast"), optL(r, "abs_err")))
      .sortBy(t => (t._1, t._2)).toSeq
    val batch = canon(Telemetry.forecast(spark, sf))
    val streamed = canon(graft.streaming.StreamForecast.streamedForecast(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_uniqueness equals the batch dq_uniqueness") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("key_cols"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_keys"), r.getAs[Long]("n_dup_keys"),
        r.getAs[Long]("n_surplus_rows"), r.getAs[Long]("max_multiplicity")))
      .sortBy(_._1).toSeq
    val batch = canon(Quality.uniqueness(spark, sf))
    val streamed = canon(
      graft.streaming.StreamUniqueness.streamedUniqueness(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_uniqueness: a key split across the cut continues its multiplicity") {
    import graft.streaming.StreamUniqueness
    import StreamUniqueness.{Ev, Mult}
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = StreamUniqueness.multiplicities(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("uniq_out").start()
    try {
      mem.addData(Ev(0, Some(7L), None, None, None))
      q.processAllAvailable()
      mem.addData(Ev(0, Some(7L), None, None, None),
        Ev(0, Some(8L), None, None, None),
        // NULL key parts group as NULL = NULL (batch groupBy)
        Ev(1, None, None, None, Some(5L)),
        Ev(1, None, None, None, Some(5L)))
      q.processAllAvailable()
      val out = spark.table("uniq_out").as[Mult].collect().toSeq
        .groupBy(_.cand).view.mapValues(_.map(_.m).sorted).toMap
      assert(out(0) == Seq(1L, 1L, 2L), "key 7 must continue 1→2 across the cut")
      assert(out(1) == Seq(1L, 2L), "NULL uid cells must group as one key")
    } finally q.stop()
  }

  test("stream_orphans equals the batch dq_orphans") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("fk"), r.getAs[Long]("n_child"),
        r.getAs[Long]("n_orphans")))
      .sortBy(_._1).toSeq
    val batch = canon(Quality.orphans(spark, sf))
    val streamed = canon(graft.streaming.StreamOrphans.streamedOrphans(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_keyskew equals the batch dq_keyskew") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("user_id"),
        r.getAs[Long]("n"), r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("null_rows"), r.getAs[Double]("share"),
        r.getAs[Double]("skew_factor")))
      .sortBy(_._1).toSeq
    val batch = canon(Quality.keySkew(spark, sf))
    val streamed = canon(graft.streaming.StreamKeySkew.streamedKeySkew(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }
}
