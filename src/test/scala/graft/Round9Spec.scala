package graft

import org.apache.spark.sql.functions._

/** Round-9 additions: bounded-heap per-group top-k, frame-blob
  * secondary index, weighted sampling, feature hashing, int8
  * embedding quantization. */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  // --- q_topk_group --------------------------------------------------------

  test("topk group: bounded-heap result equals the window formulation, Window-free") {
    val cust = sources.Tables.customer(spark, sf)
    val nat = sources.Tables.nation(spark, sf)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey".asc)
    val expect = cust.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .join(nat, $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"rn".cast("long"), $"c_custkey", $"c_acctbal")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val df = operators.Relational.qTopKGroup(spark, sf)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expect, "heap election must equal the window rank<=k result")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "top-k is a partial-aggregated bounded heap, never a per-group sort")
    assert(plan.contains("ObjectHashAggregate"),
      "the typed aggregate must run in partial/final mode (map-side combine)")
  }

  test("topk buffer: eviction and merge keep at most k pairs, best first") {
    // drive the aggregate through real grouped data: one group, many
    // rows, k=2 — exercises update-evict and partial merge across
    // the 4 shuffle partitions
    val rows = (1L to 100L).map(i => ("g", i.toDouble % 17, i))
    val out = rows.toDF("g", "v", "id")
      .groupBy($"g").agg(plans.Sketch.topKPairs($"v", $"id", 2).as("top"))
      .select(explode($"top")).select($"col.key", $"col.value")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // v = i mod 17: max value 16.0 first at id 16, then id 33
    assert(out.toSeq == Seq((16L, 16.0), (33L, 16.0)),
      s"exactly k pairs, value desc then key asc: ${out.toSeq}")
  }

  // --- frame_lookup --------------------------------------------------------

  test("frame lookup: indexed window result equals the direct events query") {
    val loSec = 1704412800L; val hiSec = 1704672000L
    val expect = sources.Tables.events(spark, sf)
      .filter(expr("unix_micros(ts) div 1000000") >= loSec &&
        expr("unix_micros(ts) div 1000000") < hiSec)
      .select($"user_id".as("device_id"),
        aggregate(transform(sequence(lit(0L), lit(6L)),
            i => ($"event_id" * 7 + i * 13 + floor($"value").cast("long")) % 32768),
          lit(0L), _ + _).as("fs"))
      .groupBy($"device_id")
      .agg(count(lit(1)).as("n_frames"), sum($"fs").as("sample_sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = operators.Frames.lookup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, "blob-index lookup must not change the answer")
  }

  test("frame lookup: a window spanning everything fails loudly (no pruning)") {
    val e = intercept[IllegalStateException] {
      operators.Frames.lookup(spark, sf, loSec = 0L, hiSec = Long.MaxValue).collect()
    }
    assert(e.getMessage.contains("did not prune"))
  }

  // --- q_nullskew_join -----------------------------------------------------

  test("nullskew join: split result equals the plain left join, nulls bypass the exchange") {
    val li = sources.Tables.lineitem(spark, sf)
      .select(when($"l_suppkey" % 10 === 0, lit(null).cast("long"))
          .otherwise($"l_suppkey").as("k"), $"l_quantity")
    val sup = sources.Tables.supplier(spark, sf).select($"s_suppkey", $"s_nationkey")
    val expect = li.join(sup, $"k" === $"s_suppkey", "left")
      .groupBy(coalesce($"s_nationkey".cast("long"), lit(-1L)).as("nationkey"))
      .agg(count(lit(1)).as("n"), sum(operators.dec($"l_quantity")).cast("double").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val df = operators.Relational.qNullSkewJoin(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect, "routing nulls around the join must not change the answer")
    // the join input must be null-free: the null-key branch (Catalyst
    // rewrites k IS NULL into a CASE over l_suppkey) rejoins by Union
    // AROUND the join, never through it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Join") && plan.contains("Union") &&
      plan.contains("isnull(l_suppkey"),
      s"null keys must route around the join by union, not through it:\n$plan")
  }

  // --- events_ratecap ------------------------------------------------------

  test("ratecap: heap-elected first-k equals the window formulation, Window-free") {
    import org.apache.spark.sql.expressions.Window
    val ev = sources.Tables.events(spark, sf)
      .withColumn("day", date_trunc("day", $"ts"))
    val w = Window.partitionBy($"user_id", $"day").orderBy($"ts".asc, $"event_id".asc)
    val expect = ev
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n_total", count(lit(1)).over(Window.partitionBy($"user_id", $"day")))
      .filter($"rnk" <= 5)
      .select($"user_id", $"day", $"rnk", $"event_id", $"n_total")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val df = operators.Telemetry.rateCap(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet
    assert(got == expect)
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "the cap elects map-side; it must not sort the hot device it throttles")
  }

  // --- stream_enrich -------------------------------------------------------

  test("stream enrich: streamed rollup equals the batch join, profile broadcast") {
    val ev = sources.Tables.events(spark, sf)
    val prof = ev.groupBy($"user_id")
      .agg(count(lit(1)).as("hist_events"),
        sum(operators.dec($"value")).cast("double").as("hist_value"))
    val expect = ev.filter($"event_type" === "purchase")
      .join(prof, Seq("user_id"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_purchases"),
        max($"hist_events").as("hist_events"), max($"hist_value").as("hist_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val got = streaming.StreamEnrich.streamedEnrich(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expect, "per-micro-batch static join must equal the batch join")
  }

  // --- sample_weighted -----------------------------------------------------

  test("weighted sampling: threshold formula holds and the subset is deterministic") {
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars",
        pmod(functions.HashFns.polyHash($"text"), lit(1000L)).as("h"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val kept = operators.TextAnalysis.sampleWeighted(spark, sf).collect()
    assert(kept.nonEmpty && kept.length < docs.size,
      "length-weighted sampling keeps a strict, non-empty subset")
    kept.foreach { r =>
      val (nChars, h) = docs(r.getLong(0))
      val w = math.min(1000L, nChars * 1000L / 600L)
      assert(r.getLong(3) == w && h < w,
        s"kept doc must satisfy hash < least(1000, n_chars*1000 div 600): $r")
    }
    // every doc the formula admits is present — determinism, no rand()
    val expectIds = docs.collect {
      case (id, (n, h)) if h < math.min(1000L, n * 1000L / 600L) => id
    }.toSet
    assert(kept.map(_.getLong(0)).toSet == expectIds)
  }

  // --- text_hashvec --------------------------------------------------------

  test("hashvec: fixed feature space, mass conservation, df bounded by tf") {
    val rows = operators.TextAnalysis.hashVec(spark, sf).collect()
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64),
      "buckets live in the fixed 64-wide feature space")
    val bySource = rows.groupBy(_.getString(0))
    bySource.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).distinct.length == rs.length,
        "one row per (source, bucket)")
      rs.foreach(r => assert(r.getLong(3) <= r.getLong(2),
        "distinct docs containing a bucket can never exceed its term count"))
    }
    val totalTf = rows.map(_.getLong(2)).sum
    val totalTokens = sources.Tables.documents(spark, sf)
      .select(size(functions.TextFns.tokens($"text")).cast("long").as("n"))
      .agg(sum($"n")).head.getLong(0)
    assert(totalTf == totalTokens,
      s"hashing reassigns tokens, never drops them: $totalTf vs $totalTokens")
  }

  // --- q_hll_distinct ------------------------------------------------------

  test("hll: estimate within standard error of exact, registers bounded") {
    val rows = operators.Relational.qHllDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est, buckets) = (r.getLong(1), r.getDouble(4), r.getLong(3))
      assert(buckets >= 1L && buckets <= 32L, "at most m = 32 registers")
      // 1.04/sqrt(32) = 18.4% standard error; allow 3 sigma
      val rel = math.abs(est - exact) / exact
      assert(rel < 0.55, s"HLL estimate off by ${rel * 100}%: est=$est exact=$exact")
    }
    // the exact reference must agree with a direct distinct count
    val direct = sources.Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"event_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == direct(r.getString(0))))
  }

  test("hll: rho via bin-length equals the bit-twiddling definition") {
    // 27 - length(bin(w)) == (leading zeros of w in its 26-bit
    // window) + 1 — the HLL rank definition
    for (w <- Seq(1L, 2L, 3L, 7L, 8L, 1L << 24, (1L << 26) - 1)) {
      val viaBin = 27 - java.lang.Long.toBinaryString(w).length
      val viaClz = (java.lang.Long.numberOfLeadingZeros(w) - (64 - 26)) + 1
      assert(viaBin == viaClz, s"w=$w: bin-length rho must equal clz rho")
    }
  }

  // --- sample_pergroup -----------------------------------------------------

  test("sample pergroup: exactly k per source, smallest hashes, Window-free") {
    val df = operators.TextAnalysis.samplePerGroup(spark, sf)
    val rows = df.collect()
    val bySource = rows.groupBy(_.getString(0))
    val nGroups = sources.Tables.documents(spark, sf)
      .select($"source").distinct().count()
    assert(bySource.size == nGroups)
    bySource.foreach { case (src, rs) =>
      val nGroup = rs.head.getLong(4)
      assert(rs.length == math.min(10L, nGroup),
        s"$src: exactly min(k, group size) sampled")
      val hs = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(hs.sameElements(hs.sorted), "rank order is ascending hash order")
    }
    // the sample is the k smallest hashes — verify one source directly
    val (src0, rs0) = bySource.head
    val all0 = sources.Tables.documents(spark, sf).filter($"source" === src0)
      .select(functions.HashFns.polyHash($"text").as("h")).collect().map(_.getLong(0)).sorted
    assert(rs0.map(_.getLong(3)).toSet == all0.take(rs0.length).toSet)
    assert(!df.queryExecution.executedPlan.toString.contains("Window"))
  }

  // --- events_quarantine / dq_orphans --------------------------------------

  test("quarantine: one scan, flags sum correctly, any >= each constraint") {
    val rows = operators.Quality.quarantine(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val n = sources.Tables.events(spark, sf).count()
    assert(rows.values.forall(_._2 == n), "n_rows is the full scan count")
    val lowValue = sources.Tables.events(spark, sf).filter($"value" < 1.0).count()
    assert(rows("low_value")._1 == lowValue && lowValue > 0,
      "the low-value expectation must fire on real data")
    assert(rows("unknown_type")._1 == 0 && rows("invalid_user")._1 == 0 &&
      rows("out_of_window")._1 == 0, "the holding expectations must report clean")
    assert(rows("any")._1 >= rows.filterKeys(_ != "any").values.map(_._1).max,
      "the dead-letter volume dominates every single constraint")
    val scans = operators.Quality.quarantine(spark, sf)
      .queryExecution.executedPlan.toString.split("\n")
      .count(_.contains("Scan parquet"))
    assert(scans == 1, s"k expectations must cost ONE read, saw $scans scans")
  }

  test("orphans: healthy FKs report zero orphans with exact child volumes") {
    val got = operators.Quality.orphans(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set("lineitem->orders", "orders->customer", "events->customer"))
    assert(got.values.forall(_._2 == 0L), "synthetic FKs are clean")
    assert(got("lineitem->orders")._1 == sources.Tables.lineitem(spark, sf).count())
    assert(got("events->customer")._1 == sources.Tables.events(spark, sf).count())
    // a corrupted child set must surface: shift half the keys out of range
    val ord = sources.Tables.orders(spark, sf)
    val bad = ord.select(when($"o_orderkey" % 2 === 0, $"o_custkey" + 1000000L)
        .otherwise($"o_custkey").as("k"))
      .groupBy($"k").agg(count(lit(1)).as("cnt"))
    val cust = sources.Tables.customer(spark, sf).select($"c_custkey".as("pk"))
    val orphaned = bad.join(cust, $"k" === $"pk", "left")
      .agg(sum(when($"pk".isNull, $"cnt"))).head.getLong(0)
    assert(orphaned == ord.filter($"o_orderkey" % 2 === 0).count(),
      "the audit shape detects exactly the corrupted rows")
  }

  // --- q_dpp_join ----------------------------------------------------------

  test("dpp join: runtime pruning reaches the fact scan and preserves the answer") {
    val df = sources.Sinks.dppJoinRollup(spark, sf)
    val expect = sources.Tables.events(spark, sf)
      .filter($"event_type".isin("purchase", "signup"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect, "dynamic pruning must not change the answer")
    assert(df.queryExecution.executedPlan.toString.contains("dynamicpruning"),
      "the dim filter must prune fact partitions at runtime")
  }

  // --- corpus_upsert -------------------------------------------------------

  test("upsert: merge semantics hold row-by-row against a driver-side replay") {
    val snap = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"source", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // replay the merge in plain Scala: mod-10 update/delete/insert
    val merged = snap.flatMap { case (id, text, src, n) =>
      id % 10 match {
        case 0 => Seq((src, text + " v2", n + 3))
        case 1 => Seq.empty
        case 2 => Seq((src, text, n), (src, "copy: " + text, n + 6))
        case _ => Seq((src, text, n))
      }
    }
    val expect = merged.groupBy(_._1).map { case (srcKey, rs) =>
      (srcKey, rs.size.toLong, rs.map(_._3).sum)
    }.toSet
    val got = operators.Curation.upsert(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, "distributed merge must equal the sequential replay")
    // the anti-join must run against a broadcast of the changed keys —
    // the snapshot side never shuffles
    val plan = operators.Curation.upsert(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      "retiring old versions must be a map-side broadcast anti-join")
  }

  // --- embed_quantize ------------------------------------------------------

  test("quantize: codes bounded, reconstruction within half a step, zero-safe") {
    val raw = sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val out = operators.Similarity.quantize(spark, sf).collect()
    assert(out.length == raw.size)
    out.foreach { r =>
      val (id, scale) = (r.getLong(0), r.getDouble(1))
      assert(r.getLong(3) >= -127L && r.getLong(4) <= 127L,
        "codes stay in the symmetric int8 range")
      val xs = raw(id).map(_.toDouble)
      val ma = xs.map(math.abs).max
      assert(scale == ma / 127.0, "scale is max|x|/127 exactly")
      if (ma > 0) {
        // recompute the codes and check q_sum + max reconstruction error
        val qs = xs.map(x => math.floor(x * 127.0 / ma + 0.5).toLong)
        assert(r.getLong(2) == qs.sum, s"q_sum mismatch for vec $id")
        val maxErr = xs.zip(qs).map { case (x, q) => math.abs(x - q * scale) }.max
        assert(maxErr <= scale / 2 + 1e-12,
          s"round-to-nearest keeps error within half a quantization step: $maxErr")
      } else {
        assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 0L)
      }
    }
  }
}
