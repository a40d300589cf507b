package graft

import org.apache.spark.sql.functions._

import graft.operators.Telemetry
import graft.sources.Tables

/** Round-7 additions, fourth batch: streaming OHLC candles. */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  test("stream_ohlc: append-mode candle emission + sink lag equals the batch ohlc exactly") {
    val streamed = graft.streaming.StreamOhlc.streamedOhlc(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = Telemetry.ohlc(spark, sf).collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stream_ohlc: candles straddle the micro-batch cut (the state-carry property is exercised)") {
    // the staged split cuts inside the busiest candle's own span; at
    // least one (type, day) candle must have events on both sides of
    // the cut, otherwise cross-batch window state was never exercised
    val cut = graft.streaming.StreamOhlc.straddlingCut(spark, sf)
      .getOrElse(fail("no multi-event candle in the corpus"))
    val straddling = Tables.events(spark, sf)
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(min(unix_micros($"ts")).as("lo"), max(unix_micros($"ts")).as("hi"))
      .filter($"lo" <= cut && $"hi" > cut)
      .count()
    assert(straddling > 0, "no candle straddles the staged cut - the gate is vacuous")
  }

  test("stream_attribution: per-purchase state attribution equals the batch running-last window") {
    val streamed = graft.streaming.StreamAttribution.streamedAttribution(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = Telemetry.attribution(spark, sf).collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stream_attribution: cross-batch (touch, purchase) pairs exist (state carry exercised)") {
    // some user must have a touch at-or-before the median cut whose
    // credited purchase arrives after it, else the staged gate never
    // exercises cross-batch state
    val ev = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("eus"), $"event_type")
    val b = ev.agg(min($"eus"), max($"eus")).head()
    val cut = (b.getLong(0) + b.getLong(1)) / 2
    val lookUs = 7L * 86400L * 1000000L
    val touched = ev.filter($"event_type".isin("click", "view") && $"eus" <= cut)
      .groupBy($"user_id").agg(max($"eus").as("t_us"))
    val crossPairs = ev.filter($"event_type" === "purchase" && $"eus" > cut)
      .join(touched, "user_id")
      .filter($"eus" - $"t_us" <= lookUs && $"eus" >= $"t_us")
      .count()
    assert(crossPairs > 0, "no purchase after the cut credits a touch before it")
  }

  test("embed_pca: projection is deterministic, corpus-complete, and orders like the dominant direction") {
    val out = graft.operators.Similarity.pca(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.length == n, "every vector scores")
    assert(out.forall(!_.isNullAt(2)), "no null projections")
    // bit-identical replay (the whole point of the integer pipeline)
    val again = graft.operators.Similarity.pca(spark, sf).collect().map(_.toSeq).toSet
    assert(again == out.map(_.toSeq).toSet)
    // the projection must separate the corpus: not all scores equal
    assert(out.map(_.getAs[Double]("pc1")).distinct.length > 1)
  }

  test("dq_drift: halves partition the corpus, chi-square terms well-formed, deterministic replay") {
    val out = graft.operators.Quality.drift(spark, sf).collect()
    assert(out.nonEmpty)
    val total = Tables.events(spark, sf).count()
    assert(out.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum == total,
      "every event lands in exactly one half")
    out.foreach { r =>
      assert(r.getAs[Double]("expected_b") > 0d)
      assert(r.getAs[Double]("chi2_term") >= 0d)
    }
    val again = graft.operators.Quality.drift(spark, sf).collect().map(_.toSeq).toSet
    assert(again == out.map(_.toSeq).toSet)
  }
}
