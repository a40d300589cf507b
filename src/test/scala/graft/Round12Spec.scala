package graft

import org.apache.spark.sql.functions._

import graft.operators.Telemetry
import graft.sources.Tables

/** Round-7 additions: queue TTL lifetime accounting and per-EventType
  * status-report filtering (the last two reference gaps from
  * serial_streaming.lua's v2.0.0 changelog). */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  test("queue_ttl: outcomes partition the stream; sent is always delivered") {
    val ttl = Telemetry.queueTtl(spark, sf).collect()
    val byType = Tables.events(spark, sf).groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ttl.nonEmpty && ttl.length == byType.size)
    ttl.foreach { r =>
      val total = r.getAs[Long]("n_delivered") + r.getAs[Long]("n_expired") +
        r.getAs[Long]("n_lost")
      assert(total == byType(r.getAs[String]("event_type")),
        "delivered+expired+lost must cover every message")
    }
    // the loss marker k>50 is ~half the corpus: both failure classes
    // and the delivered class must all be populated somewhere
    assert(ttl.map(_.getAs[Long]("n_delivered")).sum > 0)
    assert(ttl.map(_.getAs[Long]("n_expired")).sum +
      ttl.map(_.getAs[Long]("n_lost")).sum > 0)
  }

  test("queue_ttl: a tight TTL expires every lost message, a loose one expires only tail orphans") {
    // TTL = 0: any lost message with a strictly-later service slot is
    // expired; 'lost' requires svc at the SAME instant (impossible
    // for distinct µs timestamps) so n_lost must be 0
    val tight = Telemetry.queueTtl(spark, sf, ttlSecs = 0L).collect()
    assert(tight.map(_.getAs[Long]("n_lost")).sum == 0)
    // TTL = 10 years: nothing can exceed it, so expired only counts
    // the stream-tail messages with NO later good slot at all
    val loose = Telemetry.queueTtl(spark, sf, ttlSecs = 315360000L)
    val tail = loose.collect()
    assert(tail.map(_.getAs[Long]("n_lost")).sum > 0)
    // per stream, the no-later-slot orphans are a (possibly empty)
    // suffix — strictly fewer than the lost class overall
    assert(tail.map(_.getAs[Long]("n_expired")).sum <
      tight.map(_.getAs[Long]("n_expired")).sum)
  }

  test("status_notify: notification gate follows the per-type config exactly") {
    val rows = Telemetry.statusNotify(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val expectOn = t.map(_.toInt).sum % 2 == 0
      assert(r.getAs[Boolean]("notify_on") == expectOn, s"config parity for $t")
      if (expectOn) {
        assert(r.getAs[Long]("n_notified") == r.getAs[Long]("n_loss_events"))
        assert(r.getAs[java.sql.Timestamp]("first_notified") != null)
      } else {
        assert(r.getAs[Long]("n_notified") == 0L)
        assert(r.isNullAt(r.fieldIndex("first_notified")))
      }
    }
    // the 5-type corpus splits 3 notify-on / 2 notify-off
    assert(rows.count(_.getAs[Boolean]("notify_on")) == 3)
    assert(rows.count(!_.getAs[Boolean]("notify_on")) == 2)
  }

  test("status_notify: config side is broadcast, no shuffle on the fact side beyond the rollup") {
    val plan = Telemetry.statusNotify(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"config dimension must broadcast:\n$plan")
  }

  test("text_gopher: integer rules agree with a recomputed reference on every doc") {
    val rows = operators.TextAnalysis.gopherRules(spark, sf).collect()
    val texts = Tables.documents(spark, sf).select($"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    val stops = Set("a", "the", "be", "to", "of", "and", "that", "have", "with")
    rows.foreach { r =>
      val words = texts(r.getAs[Long]("doc_id")).split("\\s+").filter(_.nonEmpty)
      assert(r.getAs[Long]("n_words") == words.length)
      assert(r.getAs[Long]("sum_word_chars") == words.map(_.length.toLong).sum)
      assert(r.getAs[Long]("n_alpha_words") ==
        words.count(_.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))))
      assert(r.getAs[Long]("n_stop_hits") == words.map(_.toLowerCase).toSet.count(stops))
      val expectPass = words.length >= 5 && words.length <= 100000 &&
        words.map(_.length.toLong).sum >= words.length * 3L &&
        words.map(_.length.toLong).sum <= words.length * 10L &&
        words.count(w => w.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) * 10L >= words.length * 8L &&
        words.map(_.toLowerCase).toSet.count(stops) >= 2
      assert(r.getAs[Boolean]("pass") == expectPass, s"doc ${r.getAs[Long]("doc_id")}")
    }
    // the synthetic corpus must exercise both verdicts
    assert(rows.exists(_.getAs[Boolean]("pass")) && rows.exists(!_.getAs[Boolean]("pass")))
  }

  test("text_dsir: English docs score above non-English on target affinity") {
    val scored = operators.TextAnalysis.dsir(spark, sf)
      .join(Tables.documents(spark, sf).select($"doc_id", $"lang"), "doc_id")
      .collect()
    assert(scored.length == Tables.documents(spark, sf).count())
    val (en, rest) = scored.partition(_.getAs[String]("lang") == "en")
    def selRate(rs: Array[org.apache.spark.sql.Row]) =
      rs.count(_.getAs[Boolean]("selected")).toDouble / rs.length
    // the importance sampler must prefer the target domain
    assert(selRate(en) > selRate(rest),
      s"en rate ${selRate(en)} must beat non-en ${selRate(rest)}")
    assert(scored.forall(r => r.getAs[Long]("corpus_evidence") >= r.getAs[Long]("target_evidence")))
  }

  test("text_dsir: freq tables broadcast; only corpus-scale shuffle is the per-doc rollup") {
    val plan = operators.TextAnalysis.dsir(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"bucket freq table must broadcast:\n$plan")
  }

  test("corpus_select: distributed budget cut equals the single-window reference") {
    val rows = operators.TextAnalysis.corpusSelect(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum <= 8000L)
    // the selected set is a PREFIX of the global score ordering: every
    // selected doc outranks every rejected one
    val selected = rows.map(r => (r.getAs[Long]("score"), r.getAs[Long]("doc_id"))).toSet
    val all = operators.TextAnalysis.corpusSelect(spark, sf, budgetTokens = Long.MaxValue)
      .collect().map(r => (r.getAs[Long]("score"), r.getAs[Long]("doc_id")))
    val ordered = all.sortBy { case (s, id) => (-s, id) }
    val prefix = ordered.takeWhile(selected.contains).length
    assert(prefix == selected.size,
      s"selection must be the top-$prefix prefix, got ${selected.size} docs")
    // cum_tokens is the true running total in score order
    val cums = rows.sortBy(r => (-r.getAs[Long]("score"), r.getAs[Long]("doc_id")))
    assert(cums.map(_.getAs[Long]("n_tokens")).scanLeft(0L)(_ + _).drop(1)
      .sameElements(cums.map(_.getAs[Long]("cum_tokens"))))
  }

  test("embed_knn_eval: one prediction per query, votes bounded by k, majority honored") {
    val rows = operators.Similarity.knnEval(spark, sf).collect()
    assert(rows.length == 50)
    assert(rows.map(_.getAs[Long]("query_id")).distinct.length == 50)
    rows.foreach { r =>
      val votes = r.getAs[Long]("n_votes")
      assert(votes >= 1L && votes <= 5L, "winner's votes within k")
      assert(r.getAs[Boolean]("correct") ==
        (r.getAs[Int]("pred_label") == r.getAs[Int]("true_label")))
    }
    // the synthetic labels are RANDOM (no geometric signal), so the
    // probe's value here is mechanical: predictions come from the
    // label domain and the reported accuracy is the chance floor —
    // which is itself the correct reading for this corpus
    val labels = Tables.embeddings(spark, sf).select($"label").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(rows.forall(r => labels.contains(r.getAs[Int]("pred_label"))))
  }

  test("events_attribution: channels partition the purchase stream") {
    val rows = Telemetry.attribution(spark, sf).collect()
    val channels = rows.map(_.getAs[String]("attributed")).toSet
    assert(channels.subsetOf(Set("click", "view", "direct")))
    val purchases = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == purchases.count())
    val total = purchases.agg(sum($"value".cast("decimal(18,2)"))).head().getDecimal(0)
    val attributed = rows.map(r => BigDecimal(r.getAs[Double]("attributed_value"))).sum
    assert((BigDecimal(total) - attributed).abs < BigDecimal("0.01"))
    // both a real channel and the no-prior-touch fallback must occur
    assert(channels.contains("direct") && (channels - "direct").nonEmpty)
  }

  test("port_config: rs232 frame math and validity gating") {
    val rows = Telemetry.portConfig(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parity = r.getAs[String]("parity")
      if (parity == "BAD") {
        assert(r.getAs[Long]("n_valid") == 0L)
        assert(r.isNullAt(r.fieldIndex("min_eff_bps")))
      } else {
        assert(r.getAs[Long]("n_valid") == r.getAs[Long]("n_devices"))
        assert(r.getAs[Long]("min_eff_bps") <= r.getAs[Long]("max_eff_bps"))
        // effective Bps can never exceed baud/10 for 8-data-bit frames
        // nor baud/7 for the shortest legal frame (5N1)
        assert(r.getAs[Long]("max_eff_bps") * 7L <= r.getAs[Int]("baud").toLong)
      }
    }
    // the reference's own config class must be present: 115200 baud
    // devices exist and an 8N1 frame yields exactly 11520 B/s
    val ref = rows.filter(r => r.getAs[Int]("baud") == 115200 && r.getAs[String]("parity") == "NONE")
    assert(ref.nonEmpty)
    // device_id ≡ 0 mod 5 (baud 115200) ∩ ≡ 0 mod 4 (NONE): data_bits
    // = 5 + id%4 = 5, stop = 1 + id%2; frame = 1+5+0+stop
    assert(ref.forall { r =>
      val mx = r.getAs[Long]("max_eff_bps")
      mx == 115200L / 7L || mx == 115200L / 8L
    })
  }

  test("stream_ttl: stateful streaming twin matches the batch queue_ttl exactly") {
    def key(r: org.apache.spark.sql.Row) = r.getAs[String]("event_type")
    def canon(r: org.apache.spark.sql.Row) = (
      r.getAs[Long]("n_delivered"), r.getAs[Long]("n_expired"), r.getAs[Long]("n_lost"),
      r.getAs[Double]("bytes_delivered"), r.getAs[Double]("bytes_expired"),
      r.getAs[Double]("bytes_lost"),
      if (r.isNullAt(r.fieldIndex("max_lost_wait_us"))) -1L
      else r.getAs[Long]("max_lost_wait_us"))
    val batch = Telemetry.queueTtl(spark, sf).collect().map(r => key(r) -> canon(r)).toMap
    val streamed = graft.streaming.StreamTtl.streamedTtl(spark, sf)
      .collect().map(r => key(r) -> canon(r)).toMap
    assert(streamed.keySet == batch.keySet)
    // bit-exact per stream: counts, byte sums, and the worst lost-wait
    // must survive the micro-batch cut (pending state carried across)
    assert(streamed == batch)
    // the cut guarantees SOME pending state straddles batches only if
    // both failure classes exist — assert the corpus exercises them
    assert(batch.values.map(_._2).sum > 0 && batch.values.map(_._3).sum > 0)
  }
}
