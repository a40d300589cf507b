package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Relational, Telemetry, TextAnalysis}
import graft.sources.Tables

/** Round-7 additions, fifth batch: streaming moment accumulation,
  * perplexity terciles, Bloom-prefiltered join, audio VAD windows. */
class Round16Spec extends SparkSpec {
  import spark.implicits._

  test("stream_anomaly: streamed moments + scoring join equal the batch outlier gate") {
    val streamed = graft.streaming.StreamAnomaly.streamedAnomaly(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = Telemetry.anomaly(spark, sf).collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stream_anomaly: the median cut splits at least one user's events across batches") {
    val b = Tables.events(spark, sf)
      .agg(min(unix_micros($"ts")), max(unix_micros($"ts"))).head()
    val cut = (b.getLong(0) + b.getLong(1)) / 2
    val straddling = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(min(unix_micros($"ts")).as("lo"), max(unix_micros($"ts")).as("hi"))
      .filter($"lo" <= cut && $"hi" > cut)
      .count()
    assert(straddling > 0, "no user straddles the staged cut - the gate is vacuous")
  }

  test("text_ppl_bucket: two-phase rank tercile equals the direct NTILE(3) window") {
    val got = TextAnalysis.pplBucket(spark, sf)
      .select($"doc_id", $"bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference shape: the single-window NTILE the operator avoids
    val w = Window.partitionBy($"lang").orderBy($"lm_score".asc, $"doc_id".asc)
    val want = TextAnalysis.ngramLm(spark, sf).select($"doc_id", $"lm_score")
      .join(Tables.documents(spark, sf).select($"doc_id", $"lang"), "doc_id")
      .withColumn("bucket", ntile(3).over(w).cast("long"))
      .select($"doc_id", $"bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got == want)
  }

  test("text_ppl_bucket: terciles are balanced and score-ordered within each language") {
    val rows = TextAnalysis.pplBucket(spark, sf).collect()
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_.getLong(3)).view.mapValues(_.size).toMap
      assert(sizes.keySet.subsetOf(Set(1L, 2L, 3L)), s"$lang: bucket out of range")
      if (rs.length >= 3)
        assert(sizes.values.max - sizes.values.min <= 1, s"$lang: unbalanced terciles $sizes")
      // every head score <= every middle score <= every tail score
      for (b <- 1L to 2L if sizes.contains(b) && sizes.contains(b + 1)) {
        val hi = rs.filter(_.getLong(3) == b).map(_.getDouble(2)).max
        val lo = rs.filter(_.getLong(3) == b + 1).map(_.getDouble(2)).min
        assert(hi <= lo, s"$lang: bucket $b max $hi > bucket ${b + 1} min $lo")
      }
    }
  }

  test("text_ppl_bucket: plan has no window partitioned by lang alone (the skew shape)") {
    val plan = TextAnalysis.pplBucket(spark, sf).queryExecution.executedPlan.toString
    // the only corpus-wide window keys on (lang, b); a [lang#..]-only
    // partition spec would put a whole language in one task
    assert(!plan.matches("(?s).*Window .*partitionBy.*\\[lang#\\d+\\]\\s*,\\s*\\[lm_score.*"),
      "per-language window crept back in")
    assert(plan.contains("Window"), "expected the two-phase local window")
  }

  test("q_bloom_join: the might_contain probe sits in the fact scan stage, below the join") {
    val plan = Relational.qBloomJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("BloomFilterMightContain"),
      "bloom probe missing from the physical plan")
    // the probe must filter BEFORE the exchange: a Filter above the
    // join would shuffle the whole fact side first
    val filterIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("SortMergeJoin") max plan.indexOf("BroadcastHashJoin") max
      plan.indexOf("ShuffledHashJoin")
    assert(joinIdx >= 0, "no join in plan")
    assert(filterIdx > joinIdx,
      "probe should appear below (after, in toString order) the join operator")
  }

  test("q_sketch_setops: merged pair sketch equals the sketch of the union, estimates track exact") {
    import graft.functions.HashFns
    val rows = Relational.qSketchSetops(spark, sf).collect()
    assert(rows.nonEmpty)
    val ut = Tables.events(spark, sf).select($"event_type", $"user_id").distinct()
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      // mergeability: the k-min of the merged per-type sketches must
      // equal the k-min computed over the union audience directly
      val direct = ut.filter($"event_type" === a || $"event_type" === b)
        .select($"user_id").distinct()
        .agg(graft.plans.Sketch.kMinValues(
          HashFns.polyHash($"user_id".cast("string")), 256).as("kmv"))
        .head().getSeq[Long](0)
      val estDirect =
        if (direct.length < 256) direct.length.toDouble
        else 255.0 * HashFns.P.toDouble / direct(255).toDouble
      assert(math.abs(estDirect - r.getDouble(6)) < 1e-9,
        s"($a,$b): merged-sketch estimate ${r.getDouble(6)} != direct $estDirect")
      // estimation quality: within 20% of the exact union at k=256
      val exact = r.getLong(5).toDouble
      assert(math.abs(r.getDouble(6) - exact) <= 0.2 * exact,
        s"($a,$b): est_union ${r.getDouble(6)} vs exact $exact")
    }
  }

  test("q_bloom_join: bloom-prefiltered result equals the plain join exactly") {
    val got = Relational.qBloomJoin(spark, sf).collect().map(_.toSeq).toSet
    val want = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter($"o_orderpriority" === "1-URGENT"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_items"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("revenue"))
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got == want)
  }

  test("ReverseTailFrames: tail min frame rewrites to the incremental mirror, same results") {
    import org.apache.spark.sql.expressions.{Window => W}
    val df = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("tus"), $"value")
    val tail = W.partitionBy($"user_id").orderBy($"tus".asc)
      .rowsBetween(1, W.unboundedFollowing)
    val q = df.withColumn("next_min", min($"value").over(tail))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("AND UNBOUNDED FOLLOWING"),
      s"tail frame survived the rewrite:\n${plan.linesIterator.filter(_.contains("windowspecdefinition")).mkString("\n")}")
    // ground truth: per user, min of values strictly after by tus
    val rows = df.collect().groupBy(_.getLong(0))
    q.collect().foreach { r =>
      val later = rows(r.getLong(0)).filter(_.getLong(1) > r.getLong(1)).map(_.getDouble(2))
      val expect = if (later.isEmpty) null else Double.box(later.min)
      val got = if (r.isNullAt(3)) null else Double.box(r.getDouble(3))
      assert(got == expect, s"user ${r.getLong(0)} tus ${r.getLong(1)}: $got != $expect")
    }
  }

  test("ReverseTailFrames: an order-sensitive sibling vetoes the node") {
    import org.apache.spark.sql.expressions.{Window => W}
    val df = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("tus"), $"value")
    val spec = W.partitionBy($"user_id").orderBy($"tus".asc)
    val q = df
      .withColumn("rn", row_number().over(spec))
      .withColumn("next_min",
        min($"value").over(spec.rowsBetween(1, W.unboundedFollowing)))
    // row_number shares the (partition, order) spec; if Catalyst fuses
    // both into one Window node the rule must veto it — either way the
    // VALUES must be the untouched semantics
    val rows = df.collect().groupBy(_.getLong(0))
    q.collect().foreach { r =>
      val later = rows(r.getLong(0)).filter(_.getLong(1) > r.getLong(1)).map(_.getDouble(2))
      val expect = if (later.isEmpty) null else Double.box(later.min)
      val got = if (r.isNullAt(4)) null else Double.box(r.getDouble(4))
      assert(got == expect)
      val rank = rows(r.getLong(0)).count(_.getLong(1) <= r.getLong(1))
      assert(r.getInt(3) == rank, "row_number must keep the ASC order")
    }
  }

  test("mm_audio_vad: engineered payload - loud and quiet windows land where constructed") {
    import graft.plans.Audio
    // 64 samples = 2 windows of 32: window 0 all 0x7a7a (abs 31354,
    // sum 1003328 > 640000 -> active), window 1 all 0x2020 (abs 8224,
    // sum 263168 -> inactive)
    val payload = Array.fill(64)(0x7a.toByte) ++ Array.fill(64)(0x20.toByte)
    val blob = Audio.packWav(1, 8000, payload)
    val r = Seq(blob).toDF("blob")
      .withColumn("m", Audio.decode($"blob"))
      .withColumn("v", Audio.pcmVad($"blob",
        $"m.payload_off".cast("long"), $"m.data_len".cast("long")))
      .select($"v.n_windows", $"v.n_active", $"v.max_win_sum", $"v.first_active")
      .head()
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) == 1L)
    assert(r.getLong(2) == 31354L * 32)
    assert(r.getLong(3) == 0L)
  }

  test("stream_cdc: incremental compaction equals the batch changelog apply") {
    val streamed = graft.streaming.StreamCdc.streamedCdc(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.Changelog.cdcApply(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stream_cdc: some key's winning op arrives in batch 2 (election crosses the cut)") {
    val b = Tables.events(spark, sf)
      .agg(min(unix_micros($"ts")), max(unix_micros($"ts"))).head()
    val cut = (b.getLong(0) + b.getLong(1)) / 2
    // keys active on both sides whose LATEST op is after the cut must
    // exist, otherwise batch-2 never has to beat batch-1 state
    val contested = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(min(unix_micros($"ts")).as("lo"), max(unix_micros($"ts")).as("hi"))
      .filter($"lo" <= cut && $"hi" > cut)
      .count()
    assert(contested > 0, "no key's election crosses the staged cut - the gate is vacuous")
  }

  test("ts_m4: the four elected points bound every raw point in the bucket") {
    val raw = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("tus"), $"value").collect()
      .groupBy(r => (r.getLong(0), r.getLong(1) / 21600000000L))
    val m4 = Telemetry.m4(spark, sf).collect()
    assert(m4.nonEmpty)
    m4.foreach { r =>
      val key = (r.getLong(0), r.getTimestamp(1).toInstant.toEpochMilli * 1000 / 21600000000L)
      val pts = raw(key).sortBy(_.getLong(1))
      assert(r.getLong(2) == pts.length)
      assert(r.getDouble(3) == pts.head.getDouble(2), "v_first is the earliest point")
      assert(r.getDouble(4) == pts.last.getDouble(2), "v_last is the latest point")
      assert(r.getDouble(5) == pts.map(_.getDouble(2)).min)
      assert(r.getDouble(6) == pts.map(_.getDouble(2)).max)
    }
  }

  test("dq_volume: flags are the 2-sigma rule over exact integer daily counts") {
    val rows = graft.operators.Quality.volume(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val counts = rs.map(_.getLong(2).toDouble)
      val n = counts.length.toDouble
      val mu = counts.sum / n
      val m2 = counts.map(c => c * c).sum / n
      rs.foreach { r =>
        val d = r.getLong(2) - mu
        assert(r.getBoolean(4) == (d * d > 4.0 * (m2 - mu * mu)))
        assert(r.getLong(3) == counts.length)
      }
    }
  }

  test("mm_audio_vad: corpus invariants - counts bound each other, first_active consistent") {
    val rows = Multimodal.audioVad(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, na, fa) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(na >= 0 && na <= nw)
      if (na == 0) assert(fa == -1L) else assert(fa >= 0 && fa < nw)
    }
  }
}
