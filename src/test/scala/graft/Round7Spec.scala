package graft

import org.apache.spark.sql.functions._

/** Round-7 additions: compaction planning, snapshot diff, grouped
  * histograms, sliding-window engagement. */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  // --- corpus_compact ----------------------------------------------------------

  test("compaction manifest covers every document exactly once") {
    val docs = sources.Tables.documents(spark, sf)
    val nDocs = docs.count()
    val totBytes = docs.agg(sum(octet_length($"text"))).head.getLong(0)
    val m = operators.Curation.compact(spark, sf).collect()
    assert(m.map(_.getLong(1)).sum == nDocs, "sum(n_docs) must equal the corpus")
    assert(m.map(_.getLong(2)).sum == totBytes, "sum(file_bytes) must equal corpus bytes")
  }

  test("compaction files are contiguous, ordered, and near the target size") {
    val target = 4096L
    val m = operators.Curation.compact(spark, sf).collect()
      .sortBy(_.getLong(0))
    // dense file ids from 0
    assert(m.map(_.getLong(0)).toSeq == (0L until m.length).toSeq)
    // id ranges must not overlap and must follow file order (the
    // min/max stats a planner would prune on)
    m.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) < b.getLong(3),
        s"file ${a.getLong(0)} id range overlaps file ${b.getLong(0)}")
      case _ => ()
    }
    // first-fit bound: a file exceeds the target by at most one doc
    val maxDoc = sources.Tables.documents(spark, sf)
      .agg(max(octet_length($"text"))).head.getInt(0).toLong
    m.foreach(r => assert(r.getLong(2) < target + maxDoc,
      s"file ${r.getLong(0)} is ${r.getLong(2)} bytes"))
  }

  test("compaction offsets come from the broadcast two-phase prefix sum") {
    val plan = operators.Curation.compact(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"per-block base offsets must come back broadcast, not shuffled:\n$plan")
  }

  // --- corpus_diff -------------------------------------------------------------

  test("snapshot diff classifies added/removed/changed/unchanged exactly") {
    val ids = sources.Tables.documents(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val expRemoved = ids.count(_ % 11 == 0)
    val expAdded = ids.count(_ % 13 == 0)
    val expChanged = ids.count(i => i % 7 == 0 && i % 11 != 0)
    val got = operators.Curation.snapshotDiff(spark, sf).collect()
      .groupBy(_.getString(3)).view.mapValues(_.length).toMap
    assert(got.getOrElse("removed", 0) == expRemoved)
    assert(got.getOrElse("added", 0) == expAdded)
    assert(got.getOrElse("changed", 0) == expChanged)
    assert(got.values.sum == ids.size + expAdded,
      "output = base corpus + newly added ids")
  }

  test("snapshot diff carries both sides' sizes for changed docs") {
    val changed = operators.Curation.snapshotDiff(spark, sf)
      .filter($"status" === "changed").collect()
    assert(changed.nonEmpty)
    changed.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2))
      assert(r.getLong(2) == r.getLong(1) + 7L, "the simulated revision adds 7 bytes")
    }
  }

  // --- q_histogram -------------------------------------------------------------

  test("histogram buckets partition the fact table") {
    val li = sources.Tables.lineitem(spark, sf)
    val n = li.count()
    val h = operators.Relational.qHistogram(spark, sf).collect()
    assert(h.map(_.getLong(2)).sum == n, "every row lands in exactly one bucket")
    // spot-check one cell against a direct filter
    val r = h.maxBy(_.getLong(2))
    val (flag, bucket) = (r.getString(0), r.getLong(1))
    val direct = li.filter($"l_returnflag" === flag &&
      floor($"l_extendedprice" / 500.0d) === bucket).count()
    assert(direct == r.getLong(2))
  }

  test("histogram is one partial-aggregated pass — no sort, no join") {
    val df = operators.Relational.qHistogram(spark, sf)
    df.collect() // finalize the adaptive plan so codegen spans appear
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("SortAggregate") && !plan.contains("Join"), plan)
    // "*(n)" is the WholeStageCodegen stage marker in plan strings
    assert(plan.contains("*(1)"), s"fell out of whole-stage codegen:\n$plan")
  }

  // --- events_sliding ----------------------------------------------------------

  test("sliding windows see each event exactly window/slide = 4 times") {
    val nEvents = sources.Tables.events(spark, sf)
      .filter($"ts".isNotNull).count()
    val w = operators.Telemetry.sliding(spark, sf).collect()
    assert(w.map(_.getLong(1)).sum == 4L * nEvents)
    w.foreach(r => assert(r.getLong(2) <= r.getLong(1), "n_users <= n_events"))
  }

  test("sliding slot fan-out is scan-local (Expand, not a slot join)") {
    val plan = operators.Telemetry.sliding(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"native window() should expand slots in-plan:\n$plan")
    assert(!plan.contains("Join"), plan)
  }

  // --- corpus_timetravel -------------------------------------------------------

  test("time travel reads latest-below-cutoff, not latest") {
    val ids = sources.Tables.documents(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val rows = operators.Curation.timeTravel(spark, sf, asOfRev = 2L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    // every doc revised at rev 2 reads rev 2 even when a rev 3 exists
    ids.filter(_ % 21 == 0).foreach { i =>
      assert(rows(i) == (2L, 2L), s"doc $i must read rev 2 and see 2 visible versions")
    }
    ids.filter(i => i % 7 == 0 && i % 21 != 0).foreach(i => assert(rows(i)._1 == 2L))
    ids.filter(i => i % 7 != 0).foreach(i => assert(rows(i)._1 == 1L))
    // rev-2 discoveries exist; nothing else does
    assert(rows.keySet == ids ++ ids.filter(_ % 13 == 0).map(_ + 100000L))
  }

  test("time travel at rev 1 excludes later discoveries entirely") {
    val ids = sources.Tables.documents(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val asOf1 = operators.Curation.timeTravel(spark, sf, asOfRev = 1L).collect()
    assert(asOf1.map(_.getLong(0)).toSet == ids, "rev-2 discoveries must not exist yet")
    assert(asOf1.forall(_.getLong(1) == 1L))
  }

  // --- q_stringagg -------------------------------------------------------------

  test("string aggregation is chronologically ordered and deterministic") {
    val df = operators.Relational.qStringAgg(spark, sf)
    val rows = df.collect()
    val nCust = sources.Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count()
    assert(rows.length == nCust)
    // spot-check the busiest customer against a driver-side sort
    val busiest = rows.maxBy(_.getLong(1))
    val expected = sources.Tables.orders(spark, sf)
      .filter($"o_custkey" === busiest.getLong(0))
      .select(unix_micros($"o_orderdate".cast("timestamp")), $"o_orderkey",
        $"o_orderstatus").collect()
      .sortBy(r => (r.getLong(0), r.getLong(1)))
      .map(_.getString(2)).mkString(",")
    assert(busiest.getString(2) == expected)
    // rerun must be bit-identical (collect_list alone would not be)
    val again = operators.Relational.qStringAgg(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getString(2)))
  }

  // --- graph_degrees -----------------------------------------------------------

  test("degree distribution accounts for every edge endpoint") {
    val nEdges = operators.Dedup.minhash(spark, sf).count()
    val dist = operators.Dedup.degreeDist(spark, sf).collect()
    // sum(degree * n_nodes) counts each edge at both endpoints
    assert(dist.map(r => r.getLong(0) * r.getLong(1)).sum == 2L * nEdges)
    assert(dist.forall(_.getLong(0) >= 1L))
  }

  test("a sliding slot matches the direct count of its hour") {
    val w = operators.Telemetry.sliding(spark, sf).collect()
      .maxBy(_.getLong(1))
    val start = w.getTimestamp(0)
    val direct = sources.Tables.events(spark, sf)
      .filter($"ts" >= lit(start) &&
        $"ts" < lit(new java.sql.Timestamp(start.getTime + 3600L * 1000L)))
      .count()
    assert(direct == w.getLong(1))
  }
}
