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

  test("queue_latency: percentile ladder is monotone, exact ranks, deterministic replay") {
    val out = Telemetry.queueLatency(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p50, p90, p99, mx) = (r.getAs[Long]("p50_us"), r.getAs[Long]("p90_us"),
        r.getAs[Long]("p99_us"), r.getAs[Long]("max_us"))
      assert(p50 >= 0L && p50 <= p90 && p90 <= p99 && p99 <= mx,
        s"non-monotone ladder: $p50 / $p90 / $p99 / $mx")
      assert(r.getAs[Long]("n_waits") > 0L)
    }
    val again = Telemetry.queueLatency(spark, sf).collect().map(_.toSeq).toSet
    assert(again == out.map(_.toSeq).toSet)
  }

  test("ts_forecast: calendar-aligned seasonal naive - week-1 days have no forecast, later days do") {
    val out = Telemetry.forecast(spark, sf).collect()
    assert(out.nonEmpty)
    val minDay = out.map(_.getAs[java.sql.Timestamp]("day").getTime).min
    out.foreach { r =>
      val dayMs = r.getAs[java.sql.Timestamp]("day").getTime
      if (dayMs - minDay < 7L * 86400000L)
        assert(r.isNullAt(r.fieldIndex("forecast")),
          s"day within the first week cannot have a prior-week forecast")
      if (!r.isNullAt(r.fieldIndex("forecast")))
        assert(r.getAs[Long]("abs_err") ==
          math.abs(r.getAs[Long]("n_events") - r.getAs[Long]("forecast")))
    }
    // the corpus spans >1 week, so some forecasts must exist
    assert(out.exists(!_.isNullAt(3)))
  }

  test("ann_pq_trained: every (vector, subspace) gets a code, seeds self-assign round 1, training moves codes") {
    val out = graft.operators.Similarity.pqTrain(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.length == n * 4, "m=4 codes per vector")
    out.foreach { r =>
      assert(r.getAs[Long]("c1") >= 0L && r.getAs[Long]("c1") < 16L)
      assert(r.getAs[Long]("code") >= 0L && r.getAs[Long]("code") < 16L)
      // seed vectors are their own nearest centroid in round 1
      if (r.getAs[Long]("vec_id") < 16L)
        assert(r.getAs[Long]("c1") == r.getAs[Long]("vec_id"))
    }
    // Lloyd's must actually refine something somewhere
    assert(out.exists(_.getAs[Boolean]("moved")))
    val again = graft.operators.Similarity.pqTrain(spark, sf).collect().map(_.toSeq).toSet
    assert(again == out.map(_.toSeq).toSet)
  }

  test("q_asof_forward: next-at-or-after semantics via the negated-time merge exec") {
    import graft.operators.Relational
    val out = Relational.qAsOfForward(spark, sf)
    val rows = out.collect()
    val nLeft = Tables.events(spark, sf).filter($"event_type" =!= "purchase").count()
    assert(rows.length == nLeft, "left join preserves every non-purchase event")
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("next_purchase_ts"))) {
        assert(!r.getAs[java.sql.Timestamp]("next_purchase_ts")
          .before(r.getAs[java.sql.Timestamp]("ts")), "match is never before the event")
        assert(r.getAs[Long]("wait_us") >= 0L)
      }
    }
    assert(rows.exists(!_.isNullAt(3)), "some events have a following purchase")
    assert(rows.exists(_.isNullAt(3)), "events after the user's last purchase have none")
    // independent composed parity: the min following purchase instant
    // per event, computed by the banded union+window-free formulation
    val ev = Tables.events(spark, sf)
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), unix_micros($"ts").as("pus"))
    val expect = ev.filter($"event_type" =!= "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("eus"))
      .join(p, $"user_id" === $"pu" && $"pus" >= $"eus", "left")
      .groupBy($"event_id").agg(min($"pus").as("want_us"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(1)) null else r.getAs[Long]("want_us"))).toMap
    rows.foreach { r =>
      val got = if (r.isNullAt(3)) null
        else Long.box(r.getAs[java.sql.Timestamp]("next_purchase_ts").getTime * 1000L +
          r.getAs[java.sql.Timestamp]("next_purchase_ts").getNanos / 1000 % 1000)
      assert(expect(r.getAs[Long]("event_id")) == got,
        s"event ${r.getAs[Long]("event_id")} elected the wrong next purchase")
    }
  }

  test("events_basket: pair counts bounded by marginals, lift consistent with counts") {
    val out = graft.operators.Telemetry.basket(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (na, nb, nab) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_ab"))
      assert(nab <= math.min(na, nb), "co-occurrence cannot exceed either marginal")
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"), "unordered pairs emitted once")
    }
  }

  test("frame_resync: fixed-length split quarantines exactly the corrupted frames") {
    val out = graft.operators.Frames.resync(spark, sf).collect()
    assert(out.nonEmpty)
    val perDevice = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum(when($"event_id" % 97 === 0, 1L).otherwise(0L)).as("bad"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n"), r.getAs[Long]("bad"))).toMap
    out.foreach { r =>
      val (n, bad) = perDevice(r.getAs[Long]("device_id"))
      assert(r.getAs[Long]("n_frames") == n, "positional split sees every slot")
      assert(r.getAs[Long]("n_corrupted") == bad, "exactly the flipped frames quarantine")
      assert(r.getAs[Long]("n_recovered") == n - bad)
    }
    // corruption must actually occur somewhere or the gate is vacuous
    assert(out.map(_.getAs[Long]("n_corrupted")).sum > 0)
  }

  test("queue_drain: depth saws up between good slots and resets at them") {
    val out = graft.operators.Telemetry.queueDrain(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("max_backlog") >= 0L)
      assert(r.getAs[Long]("final_backlog") >= 0L)
      assert(r.getAs[Long]("final_backlog") <= r.getAs[Long]("max_backlog"))
      assert(!r.isNullAt(r.fieldIndex("first_peak_ts")))
      assert(r.getAs[Long]("max_backlog") < r.getAs[Long]("n_msgs"))
    }
    // some stream must actually have backlog > 0 (lost sends exist)
    assert(out.exists(_.getAs[Long]("max_backlog") > 0L))
  }
}
