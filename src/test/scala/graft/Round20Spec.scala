package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Quality, Relational, Similarity, Telemetry, TextAnalysis}

/** Round-9 additions: mode/nearest-as-of relational ops, seasonal +
  * inter-arrival telemetry profiles, Rényi-2 text diversity, column
  * completeness, quality-aware keeper election, bounded k-core,
  * cluster-bounded k-NN graph, and three streaming twins
  * (downsample / ratecap / paths). */
class Round20Spec extends SparkSpec {
  import spark.implicits._

  test("q_mode: winner matches a brute-force census; totals add up") {
    val got = Relational.qMode(spark, sf).collect()
      .map(r => r.getAs[String]("n_name") ->
        ((r.getAs[String]("mode_segment"), r.getAs[Long]("n_mode"),
          r.getAs[Long]("n_customers"), r.getAs[Long]("n_segments")))).toMap
    val cust = graft.sources.Tables.customer(spark, sf)
      .join(graft.sources.Tables.nation(spark, sf),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"c_mktsegment").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byNation = cust.groupBy(_._1)
    assert(got.keySet == byNation.keySet)
    byNation.foreach { case (nation, rows) =>
      val census = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val (seg, n) = census.toSeq.minBy { case (s, c) => (-c, s) }
      val (gSeg, gN, gTot, gSegs) = got(nation)
      assert(gSeg == seg && gN == n)
      assert(gTot == rows.size.toLong && gSegs == census.size.toLong)
    }
  }

  test("q_asof_nearest: picks the closer of back/fwd; ties break backward") {
    val daily = graft.sources.Tables.orders(spark, sf)
      .groupBy($"o_custkey", $"o_orderdate").count()
      .select($"o_custkey",
        unix_micros($"o_orderdate".cast("timestamp")).as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byUser = daily.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = Relational.qAsOfNearest(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val t = r.getAs[java.sql.Timestamp]("ts").getTime * 1000L +
        (r.getAs[java.sql.Timestamp]("ts").getNanos / 1000L) % 1000L
      val cands = byUser.getOrElse(u, Array.empty[Long])
      if (cands.isEmpty) {
        assert(r.isNullAt(r.fieldIndex("near_order_date")))
        assert(r.isNullAt(r.fieldIndex("direction")))
      } else {
        val back = cands.filter(_ <= t).lastOption
        val fwd = cands.filter(_ > t).headOption
        val expect = (back, fwd) match {
          case (Some(b), Some(f)) => if (t - b <= f - t) ("back", b) else ("fwd", f)
          case (Some(b), None) => ("back", b)
          case (None, Some(f)) => ("fwd", f)
          case _ => fail("unreachable")
        }
        val od = r.getAs[java.sql.Timestamp]("near_order_date")
        val odUs = od.getTime * 1000L + (od.getNanos / 1000L) % 1000L
        assert(r.getAs[String]("direction") == expect._1,
          s"user $u at $t: back=$back fwd=$fwd")
        assert(odUs == expect._2)
      }
    }
  }

  test("ts_seasonal: cells cover every event; index averages to 1 per type") {
    val rows = Telemetry.seasonal(spark, sf).collect()
    assert(rows.forall { r =>
      val h = r.getAs[Long]("hod"); h >= 0 && h < 24
    })
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val nEvents = graft.sources.Tables.events(spark, sf)
      .filter($"ts".isNotNull && $"event_type".isNotNull).count()
    assert(byType.values.map(_.map(_.getAs[Long]("n_events")).sum).sum == nEvents)
    byType.values.foreach { cells =>
      val tot = cells.map(_.getAs[Long]("n_events")).sum
      cells.foreach { c =>
        assert(c.getAs[Double]("seasonal_idx") ==
          c.getAs[Long]("n_events") * 24L.toDouble / tot)
        assert(c.getAs[Long]("n_days") >= 1 &&
          c.getAs[Long]("n_days") <= c.getAs[Long]("n_events"))
      }
    }
  }

  test("events_interarrival: rank percentiles match a brute-force sort") {
    val got = Telemetry.interarrival(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_gaps"), r.getAs[Long]("p50_us"),
          r.getAs[Long]("p90_us"), r.getAs[Long]("p99_us"),
          r.getAs[Long]("max_us")))).toMap
    val ev = graft.sources.Tables.events(spark, sf)
      .filter($"ts".isNotNull && $"event_type".isNotNull)
      .select($"event_type", unix_micros($"ts"), $"event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    ev.groupBy(_._1).foreach { case (tp, rows) =>
      val ts = rows.map(t => (t._2, t._3)).sorted
      val gaps = ts.zip(ts.tail).map { case ((a, _), (b, _)) => b - a }.sorted
      if (gaps.nonEmpty) {
        val (n, p50, p90, p99, mx) = got(tp)
        assert(n == gaps.length)
        def rank(num: Long, den: Long) = gaps(((num * n + num) / den - 1).toInt)
        assert(p50 == rank(1, 2) && p90 == rank(9, 10) && p99 == rank(99, 100))
        assert(mx == gaps.max)
      } else assert(!got.contains(tp))
    }
  }

  test("text_entropy: engineered invariants and an exact spot check") {
    val rows = TextAnalysis.entropy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_cps"); val d = r.getAs[Long]("n_distinct")
      val cp = r.getAs[Long]("coll_pairs")
      assert(d >= 1 && d <= n && cp >= 0 && cp <= n * (n - 1))
      if (cp > 0) {
        val eff = r.getAs[Double]("eff_alphabet")
        // Rényi-2 effective alphabet is at most the distinct count
        // (equality iff uniform) and at least 1
        assert(eff >= 1.0 - 1e-12 && eff <= d.toDouble + 1e-9)
      }
    }
    // exact recomputation for the first few docs
    val texts = graft.sources.Tables.documents(spark, sf)
      .filter(length($"text") > 0).select($"doc_id", $"text")
      .limit(5).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    texts.foreach { case (id, text) =>
      val counts = text.split("").filter(_.nonEmpty)
        .groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val coll = counts.map(c => c * (c - 1)).sum
      val r = byId(id)
      assert(r.getAs[Long]("n_cps") == n)
      assert(r.getAs[Long]("n_distinct") == counts.size.toLong)
      assert(r.getAs[Long]("coll_pairs") == coll)
    }
  }

  test("dq_completeness: per-column nulls match direct counts") {
    val rows = Quality.completeness(spark, sf).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(rows.keySet == Set("ts", "user_id", "event_type", "value", "props"))
    val ev = graft.sources.Tables.events(spark, sf)
    val n = ev.count()
    Seq("ts", "user_id", "event_type", "value", "props").foreach { c =>
      val r = rows(c)
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_null") == ev.filter(col(c).isNull).count())
      assert(r.getAs[Double]("populated_frac") ==
        (n - r.getAs[Long]("n_null") - r.getAs[Long]("n_blank")).toDouble / n)
    }
  }

  test("dedup_keep_best: keeper is the longest member of its cluster") {
    val clusters = Dedup.clusters(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size")))
    val chars = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Dedup.keepBest(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("keeper_id"), r.getAs[Long]("keeper_chars"),
          r.getAs[Long]("cluster_size")))).toMap
    val byCluster = clusters.groupBy(_._2)
    assert(got.keySet == byCluster.keySet && got.nonEmpty)
    byCluster.foreach { case (cid, members) =>
      val best = members.map(_._1).minBy(id => (-chars(id), id))
      val (kid, kchars, ksize) = got(cid)
      assert(kid == best && kchars == chars(best))
      assert(ksize == members.head._3)
    }
  }

  test("graph_kcore: survival depths match an in-memory peel") {
    val pairs = Dedup.minhash(spark, sf).select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = (pairs ++ pairs.map(p => (p._2, p._1))).toSet
    val nodes = edges.map(_._1)
    val survived = scala.collection.mutable.Map(nodes.toSeq.map(_ -> 0L): _*)
    for (_ <- 1 to 3) {
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 2).keySet
      keep.foreach(nd => survived(nd) += 1)
      edges = edges.filter(e => keep(e._1) && keep(e._2))
    }
    val finalDeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = Dedup.kcore(spark, sf).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSet == nodes)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("rounds_survived") == survived(id))
      assert(r.getAs[Boolean]("in_core") == (survived(id) == 3L))
      assert(r.getAs[Long]("final_degree") == finalDeg.getOrElse(id, 0L))
    }
  }

  test("ann_knn_graph: neighbors stay in-cluster, ranks dense, cosines sorted") {
    val rows = Similarity.knnGraph(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (q, rs) =>
      assert(q % 10 == 0)
      val ranks = rs.map(_.getAs[Long]("rnk")).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq)
      val cos = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
    }
  }

  test("q_percent_rank: total order makes pr/cume exact rank ratios") {
    val rows = Relational.qPercentRank(spark, sf).collect()
    val byNation = rows.groupBy(_.getAs[Number]("c_nationkey").longValue())
    byNation.values.foreach { rs =>
      val n = rs.length
      val sorted = rs.sortBy(r => (r.getAs[Double]("c_acctbal"), r.getAs[Long]("c_custkey")))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val pr = if (n == 1) 0.0 else i.toDouble / (n - 1).toDouble
        assert(r.getAs[Double]("pct_rank") == pr)
        assert(r.getAs[Double]("cume") == (i + 1).toDouble / n.toDouble)
      }
    }
  }

  test("text_novelty: doc 0 is fully novel; fractions bounded; census consistent") {
    val rows = TextAnalysis.novelty(spark, sf).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("n_seen_before") == 0L &&
      first.getAs[Double]("novelty_frac") == 1.0)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_grams"); val seen = r.getAs[Long]("n_seen_before")
      assert(n >= 1 && seen >= 0 && seen <= n)
      assert(r.getAs[Double]("novelty_frac") == 1.0 - seen.toDouble / n.toDouble)
    }
  }

  test("ann_recall: agrees with a direct brute-vs-ivf set comparison") {
    val truth = Similarity.bruteTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.ivfTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = Similarity.annRecall(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val trueK = truth.filter(_._1 == q)
      val hits = trueK.count(ivf.contains)
      assert(r.getAs[Long]("n_true") == trueK.size.toLong)
      assert(r.getAs[Long]("n_found") == hits.toLong)
      assert(r.getAs[Double]("recall") == hits.toDouble / trueK.size.toDouble)
    }
  }

  test("embed_truncate_eval: 64-dim truncation is perfect recall; shape holds at 16") {
    // truncating to the FULL width must reproduce the ground truth
    // exactly — recall 1.0 for every query — while the 16-dim default
    // stays a valid recall in [0, 1] over the same query set
    val full = Similarity.truncateEval(spark, sf, dims = 64).collect()
    assert(full.nonEmpty)
    full.foreach(r => assert(r.getAs[Double]("recall") == 1.0))
    val t16 = Similarity.truncateEval(spark, sf).collect()
    assert(t16.map(_.getAs[Long]("query_id")).toSet ==
      full.map(_.getAs[Long]("query_id")).toSet)
    t16.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_found") <= r.getAs[Long]("n_true"))
    }
  }

  test("dedup_report: histogram masses reconcile with the cluster assignment") {
    val clusters = Dedup.clusters(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size"), r.getAs[Boolean]("is_keeper")))
    val chars = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val report = Dedup.dedupReport(spark, sf).collect()
    val bySize = clusters.groupBy(_._3)
    assert(report.map(_.getAs[Long]("cluster_size")).toSet == bySize.keySet)
    report.foreach { r =>
      val sz = r.getAs[Long]("cluster_size")
      val members = bySize(sz)
      val nClusters = members.map(_._2).distinct.length.toLong
      assert(r.getAs[Long]("n_clusters") == nClusters)
      assert(r.getAs[Long]("n_docs") == members.length.toLong)
      assert(r.getAs[Long]("n_losers") == (members.length - nClusters).toLong)
      assert(r.getAs[Long]("chars_total") == members.map(m => chars(m._1)).sum)
      assert(r.getAs[Long]("chars_dropped") ==
        members.filterNot(_._4).map(m => chars(m._1)).sum)
    }
  }

  test("stream_interarrival equals the batch events_interarrival") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_gaps"),
        r.getAs[Long]("p50_us"), r.getAs[Long]("p90_us"),
        r.getAs[Long]("p99_us"), r.getAs[Long]("max_us"))).sortBy(_._1).toSeq
    val batch = canon(Telemetry.interarrival(spark, sf))
    val streamed = canon(graft.streaming.StreamInterarrival.streamedInterarrival(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_seasonal equals the batch ts_seasonal") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hod"),
        r.getAs[Long]("n_events"), r.getAs[Long]("n_days"),
        r.getAs[Double]("seasonal_idx"))).sortBy(t => (t._1, t._2)).toSeq
    val batch = canon(Telemetry.seasonal(spark, sf))
    val streamed = canon(graft.streaming.StreamSeasonal.streamedSeasonal(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("corpus_curriculum: two-phase rank equals a global sort; phases quartile-cut") {
    val got = Curation.curriculum(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("difficulty"),
        r.getAs[Long]("pos"), r.getAs[Long]("phase")))
    val n = got.length
    assert(n > 0)
    val expected = got.map(g => (g._2, g._1)).sorted.zipWithIndex
      .map { case ((_, id), i) => id -> i.toLong }.toMap
    got.foreach { case (id, _, pos, phase) =>
      assert(pos == expected(id))
      assert(phase == 4L * pos / n)
    }
  }

  test("events_ltv: cumulative revenue is the running sum of weekly revenue") {
    val rows = Telemetry.ltv(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[java.sql.Timestamp]("cohort_week")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("week_offset"))
      var cum = BigDecimal(0)
      sorted.foreach { r =>
        cum += BigDecimal(r.getAs[Double]("revenue"))
        assert(math.abs(r.getAs[Double]("cum_revenue") - cum.toDouble) < 1e-6)
        assert(r.getAs[Long]("n_buyers") >= 1)
      }
    }
  }

  test("mm_av_sync: durations match the single-modality operators row-for-row") {
    val audio = graft.operators.Multimodal.audio(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("duration_us")).toMap
    val video = graft.operators.Multimodal.video(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("duration_us")).toMap
    val got = graft.operators.Multimodal.avSync(spark, sf).collect()
    assert(got.nonEmpty && got.length == audio.size)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("audio_us") == audio(id))
      assert(r.getAs[Long]("video_us") == video(id))
      assert(r.getAs[Long]("drift_us") == video(id) - audio(id))
      assert(r.getAs[Boolean]("in_sync") == (math.abs(video(id) - audio(id)) <= 1000000L))
    }
  }

  test("mm_dedup_clusters: components consistent with the phash pair graph") {
    val pairs = graft.operators.Multimodal.phash(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val got = graft.operators.Multimodal.phashClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_keeper"),
          r.getAs[Long]("cluster_size")))).toMap
    assert(got.nonEmpty)
    // every paired doc labeled; both endpoints of every edge share a cluster
    pairs.foreach { case (a, b) =>
      assert(got.contains(a) && got.contains(b))
      assert(got(a)._1 == got(b)._1, s"edge ($a, $b) split across clusters")
    }
    // keeper = min id of its cluster; sizes = member counts
    got.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(cid == members.keys.min)
      members.foreach { case (id, (_, keeper, size)) =>
        assert(keeper == (id == cid))
        assert(size == members.size.toLong)
      }
    }
  }

  test("dedup_sensitivity: counts monotone non-increasing in threshold; 0.2 = all pairs") {
    val pairs = Dedup.minhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
    val got = Dedup.sensitivity(spark, sf).collect()
      .map(r => (r.getAs[Double]("threshold"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs"))).sortBy(_._1)
    assert(got.nonEmpty)
    got.foreach { case (t, np, nd) =>
      val surv = pairs.filter(_._3 >= t)
      assert(np == surv.length.toLong)
      assert(nd == surv.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong)
    }
    val ps = got.map(_._2)
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
    assert(got.head._1 == 0.2 && got.head._2 == pairs.length.toLong)
  }

  test("stream_retention equals the batch events_retention") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[java.sql.Timestamp]("cohort_week").getTime,
        r.getAs[Long]("week_offset"), r.getAs[Long]("n_active"))).sorted.toSeq
    val batch = canon(Telemetry.retention(spark, sf))
    val streamed = canon(graft.streaming.StreamRetention.streamedRetention(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_novelty equals the batch text_novelty") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_seen_before"), r.getAs[Double]("novelty_frac")))
      .sortBy(_._1).toSeq
    val batch = canon(TextAnalysis.novelty(spark, sf))
    val streamed = canon(graft.streaming.StreamNovelty.streamedNovelty(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_downsample equals the batch downsample_1hz") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        Option(r.getAs[java.sql.Timestamp]("sec")).map(_.getTime),
        r.getAs[Double]("value"))).sortBy(_._1).toSeq
    val batch = canon(Telemetry.downsample1Hz(spark, sf))
    val streamed = canon(graft.streaming.StreamDownsample.streamedDownsample(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_ratecap equals the batch events_ratecap") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("user_id"),
        Option(r.getAs[java.sql.Timestamp]("day")).map(_.getTime),
        r.getAs[Long]("rnk"), r.getAs[Long]("event_id"),
        r.getAs[Long]("n_total"))).sorted.toSeq
    val batch = canon(Telemetry.rateCap(spark, sf))
    val streamed = canon(graft.streaming.StreamRatecap.streamedRatecap(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("stream_paths equals the batch events_paths") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (Option(r.getAs[String]("from_type")), r.getAs[String]("to_type"),
        r.getAs[Long]("n_transitions"), r.getAs[Long]("n_users"))).sorted.toSeq
    val batch = canon(Telemetry.paths(spark, sf))
    val streamed = canon(graft.streaming.StreamPaths.streamedPaths(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }
}
