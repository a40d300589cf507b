package graft

import org.apache.spark.sql.functions._

/** Round-8 additions: correlated subquery, per-group argmax, MAD
  * outliers, linear interpolation, 3-step funnel, substring dedup,
  * z-order layout, incremental MV refresh, column profiler. */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  // --- q_corr_subquery ---------------------------------------------------

  test("corr subquery: small-item revenue is a strict subset of total revenue") {
    val li = sources.Tables.lineitem(spark, sf)
    val total = li.agg(sum(operators.dec($"l_extendedprice")).cast("double")).head.getDouble(0)
    val rows = operators.Relational.qCorrSubquery(spark, sf).collect()
    assert(rows.nonEmpty)
    val small = rows.map(_.getDouble(2)).sum
    assert(small > 0 && small < total,
      s"below-20%%-of-average items must be a strict revenue subset ($small vs $total)")
  }

  test("corr subquery: part dim joins as a broadcast") {
    val plan = operators.Relational.qCorrSubquery(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "part dim must broadcast")
  }

  // --- q_argmax ----------------------------------------------------------

  test("argmax: elected winner matches the windowed formulation, without a Window") {
    val cust = sources.Tables.customer(spark, sf)
    val nat = sources.Tables.nation(spark, sf)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey".asc)
    val expect = cust.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .join(nat, $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"c_custkey", $"c_acctbal")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = operators.Relational.qArgmax(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect, "struct-max election must equal the window rank-1 result")
    val plan = operators.Relational.qArgmax(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "argmax is a partial-aggregated max(struct), never a per-group sort")
  }

  // --- events_funnel3 ----------------------------------------------------

  test("funnel3: step order is respected and the population matches funnel") {
    val f3 = operators.Telemetry.funnel3(spark, sf).collect()
    assert(f3.nonEmpty)
    f3.foreach { r =>
      val step = r.getLong(4)
      val hasView = !r.isNullAt(2)
      val hasPurchase = !r.isNullAt(3)
      assert(hasPurchase == (step == 3L) && (hasView || step == 1L),
        s"reached_step must encode exactly which stages completed: $r")
      if (hasView) assert(!r.isNullAt(1) &&
        r.getTimestamp(2).getTime >= r.getTimestamp(1).getTime,
        "a counted view cannot precede the first signup")
      if (hasPurchase) assert(
        r.getTimestamp(3).getTime >= r.getTimestamp(2).getTime,
        "a counted purchase cannot precede the first counted view")
    }
    val f1Users = operators.Telemetry.funnel(spark, sf)
      .select($"user_id").collect().map(_.getLong(0)).toSet
    assert(f3.map(_.getLong(0)).toSet == f1Users,
      "both funnels anchor on the same signup population")
  }

  // --- ts_interp ---------------------------------------------------------

  test("interp: interpolants stay within each user's observed value range") {
    val ev = sources.Tables.events(spark, sf).filter($"value".isNotNull)
    val bounds = ev.groupBy($"user_id")
      .agg(min($"value").as("lo"), max($"value").as("hi"))
    val bad = operators.Telemetry.interp(spark, sf)
      .filter($"n_interp" > 0)
      .join(bounds, "user_id")
      // micro-sum of n interpolants each within [lo, hi] must lie in
      // [n*floor(lo*1e6) - n, n*ceil(hi*1e6)] (floor slack per term)
      .filter($"interp_micro_sum" > $"n_interp" * ceil($"hi" * 1000000.0) ||
        $"interp_micro_sum" < $"n_interp" * (floor($"lo" * 1000000.0) - 1))
      .count()
    assert(bad == 0, "linear interpolation cannot exit the neighbor value range")
  }

  test("interp: grid matches gapfill's active-hour grid exactly") {
    val g = operators.Telemetry.gapfill(spark, sf)
      .select($"user_id", $"hour_ts").collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val i = operators.Telemetry.interp(spark, sf)
      .select($"user_id", $"hour_ts").collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(i == g, "both resamplers materialize the same ACTIVE (user, hour) grid")
  }

  // --- ts_mad ------------------------------------------------------------

  test("mad: flags are deterministic and never the whole stream") {
    val out = operators.Telemetry.madOutliers(spark, sf)
    val n = out.count()
    val flagged = out.filter($"is_outlier").count()
    assert(flagged < n / 2, "a majority can never sit 3 MADs from the median")
    val again = operators.Telemetry.madOutliers(spark, sf).collect().toSet
    assert(out.collect().toSet == again, "rank medians must be rerun-stable")
  }

  test("mad: one scan, one exchange — medians are window columns, not join branches") {
    val plan = operators.Telemetry.madOutliers(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = plan.split("\n").count(_.contains("Scan parquet"))
    val exchanges = plan.split("\n").count(l =>
      l.contains("Exchange") && !l.contains("Broadcast") && !l.contains("Reused"))
    assert(scans == 1, s"expected 1 fact scan, saw $scans")
    assert(exchanges == 1, s"expected 1 shuffle (hash on user), saw $exchanges")
  }

  // --- dedup_substring ---------------------------------------------------

  test("substring dedup: detects shared spans at ANY alignment; exact copies score 1.0") {
    // engineered corpus: B quotes A's tokens 4..11 (8 tokens) at a
    // DIFFERENT offset — the alignment fixed chunking misses; C is
    // unrelated; D and E are exact copies of each other
    val shared = (4 to 11).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, (0 to 19).map(i => s"w$i").mkString(" "), "en", "s0", 100L),
      (1L, s"intro tokens here then $shared and a tail", "en", "s1", 100L),
      (2L, (0 to 19).map(i => s"u$i").mkString(" "), "en", "s2", 100L),
      (3L, (0 to 9).map(i => s"v$i").mkString(" "), "en", "s3", 100L),
      (4L, (0 to 9).map(i => s"v$i").mkString(" "), "en", "s4", 100L))
    val tmp = java.nio.file.Files.createTempDirectory("subdup").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = operators.Dedup.substringDup(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0L)._2 == 1L && got(1L)._2 == 1L,
      "one 8-token window in each doc covers the quoted span, regardless of offset")
    assert(got(2L)._2 == 0L, "the unrelated document shares nothing")
    assert(got(3L)._3 == 1.0d && got(4L)._3 == 1.0d,
      "every position of an exactly-duplicated document is duplicated")
  }

  // --- corpus_zorder -----------------------------------------------------

  test("zorder: manifest covers the corpus in disjoint curve ranges") {
    val docs = sources.Tables.documents(spark, sf).count()
    val m = operators.Curation.zorder(spark, sf).orderBy($"file_id").collect()
    assert(m.map(_.getLong(1)).sum == docs, "every document lands in exactly one file")
    m.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(6) >= a.getLong(7),
          s"file z-ranges must not interleave: ${a} vs ${b}")
      case _ =>
    }
    m.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(4) <= r.getLong(5),
        "per-file dim bounds must be ordered")
    }
  }

  // --- corpus_mv_refresh ---------------------------------------------------

  test("mv refresh: incremental result equals the full recompute") {
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang", octet_length($"text").cast("long").as("n_bytes"))
    val merged = docs.filter($"doc_id" % 11 =!= 0)
      .select($"lang",
        when($"doc_id" % 7 === 0, $"n_bytes" + 7L).otherwise($"n_bytes").as("n_bytes"))
      .unionByName(docs.filter($"doc_id" % 13 === 0).select($"lang", $"n_bytes"))
    val full = merged.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_bytes").as("total_bytes"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val inc = operators.Curation.mvRefresh(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == full, "delta maintenance must be invisible vs recompute")
  }

  // --- stream_budget -------------------------------------------------------

  test("stream budget: two-batch replay equals the batch running budget exactly") {
    val batch = operators.Telemetry.dataBudget(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3))).toSet
    val streamed = streaming.StreamRelay.streamedBudget(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3))).toSet
    assert(streamed == batch,
      "per-user cents state must reproduce the decimal window sum bit-for-bit")
  }

  // --- stream_join ---------------------------------------------------------

  test("stream join: watermarked interval join equals the batch range join") {
    val ev = sources.Tables.events(spark, sf).filter($"ts".isNotNull)
    val ctl = ev.filter($"event_type".isin("signup", "error"))
      .select($"event_id".as("cid"), $"user_id".as("cu"), $"ts".as("cts"))
    val expect = ev.filter(!$"event_type".isin("signup", "error"))
      .join(ctl, $"user_id" === $"cu" &&
        unix_micros($"cts") >= unix_micros($"ts") - 600000000L &&
        unix_micros($"cts") <= unix_micros($"ts"))
      .select($"event_id", $"cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = streaming.StreamJoin.streamedJoin(spark, sf).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(3))).toSet == expect,
      "the streamed match set must equal the batch interval join")
    got.foreach(r => assert(r.getLong(5) >= 0L && r.getLong(5) <= 600000000L,
      "every delay must sit inside the interval bound"))
  }

  // --- corpus_prune --------------------------------------------------------

  test("prune demo: the z-order layout prunes strictly more files than linear") {
    val m = operators.Curation.pruneDemo(spark, sf).collect()
    val byLayout = m.groupBy(_.getString(0))
    assert(byLayout.keySet == Set("zorder", "linear"))
    val docs = sources.Tables.documents(spark, sf).count()
    byLayout.values.foreach(fs =>
      assert(fs.map(_.getLong(2)).sum == docs, "each layout covers the corpus"))
    def prunedFiles(l: String) = byLayout(l).count(_.getBoolean(3))
    assert(prunedFiles("zorder") > prunedFiles("linear"),
      s"the curve must beat snapshot order on a two-predicate scan: " +
        s"z=${prunedFiles("zorder")} linear=${prunedFiles("linear")}")
  }

  // --- graph_cneighbors ----------------------------------------------------

  test("common neighbors: edge-level counts aggregate to 3x the triangle count") {
    val edgeSum = operators.Dedup.commonNeighbors(spark, sf)
      .agg(sum($"n_common")).head.getLong(0)
    val nodeSum = operators.Dedup.triangles(spark, sf)
      .agg(sum($"n_triangles")).head.getLong(0)
    // each triangle contributes one common neighbor to each of its 3
    // edges AND one participation to each of its 3 nodes
    assert(edgeSum == nodeSum,
      s"edge common-neighbor mass ($edgeSum) must equal node triangle mass ($nodeSum)")
  }

  // --- ann_refine ----------------------------------------------------------

  test("refine: re-ranked scores are EXACT (identical to brute force on the same pairs)") {
    val brute = operators.Similarity.bruteTopK(spark, sf, k = 1500).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val refined = operators.Similarity.refineTopK(spark, sf).collect()
    assert(refined.nonEmpty && refined.forall(_.getLong(3) <= 5L))
    refined.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute(key) == r.getDouble(2),
        s"refined cosine must be bit-identical to the exact score for $key")
    }
    val cand = operators.Similarity.ivfpqTopK(spark, sf, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(refined.forall(r => cand((r.getLong(0), r.getLong(1)))),
      "refine only re-scores ADC candidates — it never widens the search")
  }

  // --- quantile family -------------------------------------------------------

  test("quantile family: cont interpolates, hist bounds error by one bucket width") {
    val exact = operators.Relational.qQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    operators.Relational.qQuantilesCont(spark, sf).collect().foreach { r =>
      val (p50, p95) = exact(r.getString(0))
      assert(r.getDouble(1) <= r.getDouble(2), "p50 <= p95")
      // the interpolated value can differ from the discrete rank
      // statistic by at most one inter-element gap; loosely: it stays
      // within the exact p50/p95 bracket widened by either neighbor
      assert(math.abs(r.getDouble(1) - p50) <= p50 * 0.01,
        s"cont p50 must sit near the discrete p50: ${r.getDouble(1)} vs $p50")
      assert(math.abs(r.getDouble(2) - p95) <= p95 * 0.01)
    }
    operators.Relational.qQuantilesHist(spark, sf).collect().foreach { r =>
      val (p50, p95) = exact(r.getString(0))
      val (e50, e95) = (r.getDouble(1), r.getDouble(2))
      assert(e50 >= p50 && e50 <= p50 + 500.0,
        s"hist p50 is the covering bucket's upper bound: $e50 vs exact $p50")
      assert(e95 >= p95 && e95 <= p95 + 500.0)
    }
  }

  // --- events_heatmap --------------------------------------------------------

  test("heatmap: 7x24 calendar cells cover every event; dow matches Spark's calendar") {
    val ev = sources.Tables.events(spark, sf).filter($"ts".isNotNull)
    val cells = operators.Telemetry.heatmap(spark, sf).collect()
    assert(cells.map(_.getLong(2)).sum == ev.count())
    cells.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 6 && r.getLong(1) >= 0 && r.getLong(1) <= 23)
    }
    // integer-µs weekday must agree with Spark's own calendar function
    // (dayofweek: 1 = Sunday … 7 = Saturday, in the session UTC zone)
    val disagree = ev.select(
      pmod(expr("unix_micros(ts) div 86400000000") + 4L, lit(7L)).as("a"),
      (dayofweek($"ts") - 1).cast("long").as("b"))
      .filter($"a" =!= $"b").count()
    assert(disagree == 0, "integer dow formula must equal dayofweek()-1 under UTC")
  }

  // --- text_lexdiv -----------------------------------------------------------

  test("lexdiv: types/hapax on an engineered doc; invariants corpus-wide") {
    val tmp = java.nio.file.Files.createTempDirectory("lexdiv").toString
    Seq((0L, "x x y", "en", "s", 5L), (1L, "a b c d", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = operators.TextAnalysis.lexdiv(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == ((3L, 2L, 1L)), "'x x y': 3 tokens, 2 types, 1 hapax")
    assert(got(1L) == ((4L, 4L, 4L)), "all-distinct doc: every token is a hapax")
    operators.TextAnalysis.lexdiv(spark, sf).collect().foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(1),
        "hapax <= types <= tokens")
    }
  }

  // --- corpus_vacuum ---------------------------------------------------------

  test("vacuum: only pre-cutoff superseded revisions are deletable") {
    val m = operators.Curation.vacuum(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // retained snapshots (>= 2) read rev 2 and rev 3 directly — never deletable
    assert(m(2L)._2 == 0L && m(3L)._2 == 0L,
      "revisions at or above the cutoff stay reachable")
    // a rev-1 copy is deletable exactly when rev 2 superseded it (%7 docs)
    val revised = sources.Tables.documents(spark, sf)
      .filter($"doc_id" % 7 === 0).count()
    assert(m(1L)._2 == revised,
      s"rev-1 deletables must equal the rev-2 revision count: ${m(1L)._2} vs $revised")
  }

  // --- mm_audio_stats --------------------------------------------------------

  test("audio stats: signed s16le walk — engineered samples, sign flip on high bytes") {
    val tmp = java.nio.file.Files.createTempDirectory("pcm").toString
    // doc 0 (1 channel): "AB" -> one sample 0x4241 = 16961, quiet;
    // doc 2 (1 channel): the euro sign (UTF-8 E2 82 AC, truncated to
    // one frame) -> raw 0x82E2 = 33506 -> signed -32030 -> loud
    Seq((0L, "AB", "en", "s", 2L), (2L, "€", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = operators.Multimodal.audioStats(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(got(0L) == ((1L, 16961L, 0L)), "little-endian pair: 0x41 + 256*0x42")
    assert(got(2L) == ((1L, 32030L, 1L)), "high byte 0x82 flips the sign: |‑32030| is loud")
    // the lowercase-text corpus can never reach the loud band
    // (high byte <= 'z' = 0x7a caps |s| at 31354)
    val loud = operators.Multimodal.audioStats(spark, sf).agg(sum($"n_loud")).head.getLong(0)
    assert(loud == 0L, "lowercase-text payloads cap below the loud threshold")
  }

  // --- q_partition_prune ---------------------------------------------------

  test("partition prune: rollup matches the unpartitioned query and the scan prunes") {
    val ev = sources.Tables.events(spark, sf)
    val expect = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val df = sources.Sinks.partitionPrunedRollup(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect, "partitioned layout must not change the answer")
    val filters = sources.Sinks.partitionFilters(df).getOrElse("")
    assert(filters.contains("event_type"),
      s"the partition filter must reach the scan, not a post-scan Filter: [$filters]")
  }

  test("partition prune: a degraded layout fails loudly, not slowly") {
    // filtering on a NON-partition value through the same surface still
    // prunes (the guard checks the executed filter, not the keep value);
    // the loud-failure path is exercised by construction: a read with no
    // partition filter must throw
    val tmp = java.nio.file.Files.createTempDirectory("graft_ppart_t_")
    sources.Sinks.writePartitioned(
      sources.Tables.events(spark, sf)
        .select($"event_id", $"user_id", $"value", $"event_type"),
      tmp.toString, partitionCols = Seq("event_type"), sortCols = Seq("user_id"))
    val unpruned = spark.read.parquet(tmp.toString)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
    val filters = sources.Sinks.partitionFilters(unpruned)
    assert(filters.exists(_.trim.isEmpty),
      s"sanity: the no-filter read must show an empty PartitionFilters, got $filters")
  }

  // --- corpus_profile ------------------------------------------------------

  test("profile: one scan, exact counts, no nulls in the synthetic corpus") {
    val docs = sources.Tables.documents(spark, sf)
    val n = docs.count()
    val byCol = operators.Curation.profile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(byCol.keySet == Set("doc_id", "lang", "source", "n_chars", "text"))
    byCol.values.foreach { r =>
      assert(r.getLong(1) == n && r.getLong(2) == 0L,
        s"row count must match and the corpus has no nulls: $r")
    }
    assert(byCol("doc_id").getLong(3) == n, "doc_id is unique")
    val scans = operators.Curation.profile(spark, sf)
      .queryExecution.executedPlan.toString
      .split("\n").count(_.contains("Scan parquet"))
    assert(scans == 1, s"the profiler must read the corpus ONCE, saw $scans scans")
  }
}
