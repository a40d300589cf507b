package graft

import org.apache.spark.sql.functions._

/** Round-5 additions: bucketed co-located joins, the TokenWindows
  * generator, and the batch of new curation/relational operators. */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  // --- bucketed co-located join ------------------------------------------------

  test("bucketed join: sort-merge with ZERO exchanges, agg included") {
    val df = operators.Relational.qBucketJoin(spark, sf)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("SortMergeJoin"),
      s"bucketed join must stay on the sort-merge path:\n$executed")
    assert(!executed.contains("Exchange"),
      s"bucketed join + custkey-clustered agg must be shuffle-free:\n$executed")
  }

  test("bucketed join result equals the plain shuffled join") {
    import graft.sources.Tables
    val plain = Tables.customer(spark, sf).select($"c_custkey", $"c_mktsegment")
      .join(Tables.orders(spark, sf).select($"o_custkey", $"o_totalprice"),
        $"c_custkey" === $"o_custkey")
      .groupBy($"c_custkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
           operators.dsum($"o_totalprice").as("total_spent"))
    val a = operators.Relational.qBucketJoin(spark, sf).collect().toSet
    val b = plain.collect().toSet
    assert(a == b)
  }

  // --- TokenWindows generator ---------------------------------------------------

  test("token windows tile the document: stride starts, short tail, full coverage") {
    val df = Seq((1L, (1 to 60).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val rows = df.select($"doc_id",
        graft.plans.GenExprs.tokenWindowsCol(split(lower($"text"), "\\s+"), 50, 25)
          .as(Seq("win_idx", "win_len", "win_text")))
      .orderBy($"win_idx").collect()
    // n=60, stride=25 -> starts 0,25,50 -> lens 50,35,10
    assert(rows.map(_.getLong(2)).toSeq == Seq(50L, 35L, 10L))
    assert(rows(0).getString(3).startsWith("t1 t2 ") && rows(0).getString(3).endsWith(" t50"))
    assert(rows(2).getString(3) == (51 to 60).map(i => s"t$i").mkString(" "))
    // every token appears in at least one window (coverage)
    val covered = rows.flatMap(_.getString(3).split(" ")).toSet
    assert(covered == (1 to 60).map(i => s"t$i").toSet)
  }

  test("token windows: null and empty arrays generate no rows") {
    val df = Seq((1L, Some(Seq.empty[String])), (2L, None))
      .toDF("doc_id", "toks")
    val out = df.select($"doc_id",
      graft.plans.GenExprs.tokenWindowsCol($"toks", 50, 25)
        .as(Seq("win_idx", "win_len", "win_text")))
    assert(out.count() == 0L)
  }

  test("token windows generator works through the SQL surface (LATERAL VIEW)") {
    val df = Seq((7L, "a b c d e")).toDF("doc_id", "text")
    df.createOrReplaceTempView("r5_gen_docs")
    val out = spark.sql(
      """SELECT doc_id, w.win_idx, w.win_len, w.win_text
        |FROM r5_gen_docs
        |LATERAL VIEW graft_token_windows(split(lower(text), '\\s+'), 3, 2) w
        |""".stripMargin).orderBy($"win_idx").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq ==
      Seq((0L, 3L, "a b c"), (1L, 3L, "c d e"), (2L, 1L, "e")))
  }

  // --- unpivot -------------------------------------------------------------------

  test("unpivot runs through Expand: one scan of the fact table, not four") {
    val df = operators.Relational.qUnpivot(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"unpivot must use Expand:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"unpivot must scan lineitem exactly once:\n$plan")
    // 4 metrics per returnflag value
    val rows = df.collect()
    assert(rows.groupBy(_.getString(0)).values.forall(_.length == 4))
  }

  // --- BPE pair counting ----------------------------------------------------------

  test("bpe pairs: adjacent-pair counts with deterministic ties") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val out = operators.TextAnalysis.bpePairs(spark, dir, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // doc1 pairs: "a b","b a","a b"; doc2: "b a"
    assert(out == Seq(("a b", 2L), ("b a", 2L)))
  }

  // --- corpus merge (upsert) ------------------------------------------------------

  test("corpus merge: latest revision wins, inserts appear, untouched docs stay") {
    import graft.sources.Tables
    val out = operators.Curation.corpusMerge(spark, sf)
    val rows = out.collect()
    val n = Tables.documents(spark, sf).count()
    val docs = Tables.documents(spark, sf).select($"doc_id").as[Long].collect().toSet
    val updated = docs.count(_ % 7 == 0)
    val inserted = docs.count(_ % 13 == 0)
    assert(rows.length == n + inserted)
    // every updated doc resolves to rev 2 with 2 versions
    assert(rows.filter(r => docs.contains(r.getLong(0)) && r.getLong(0) % 7 == 0)
      .forall(r => r.getLong(1) == 2L && r.getLong(3) == 2L))
    assert(rows.count(_.getLong(1) == 2L) == updated)
    // inserts are rev-1 singletons under shifted ids
    assert(rows.filter(_.getLong(0) >= 100000L)
      .forall(r => r.getLong(1) == 1L && r.getLong(3) == 1L))
  }

  // --- time-series gap fill --------------------------------------------------------

  test("gapfill: full minute grid per active hour, carry-forward from slot of first event") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gap").toString
    // one user, one hour: events at minute 10 (v=1.0) and minute 40 (v=3.0);
    // a same-µs collision at minute 40 must resolve to the higher event_id
    val base = java.sql.Timestamp.valueOf("2024-01-01 05:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    Seq(
      (1L, at(10), 7L, "m", 1.0, "{}"),
      (2L, at(40), 7L, "m", 99.0, "{}"),
      (3L, at(40), 7L, "m", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = operators.Telemetry.gapfill(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_slots") == 60L)
    // slots 0..9 are null (before the first event), 10..59 carry a value
    assert(r.getAs[Long]("n_filled") == 50L)
    // minutes 10..39 carry 1.0 (30 slots), 40..59 carry 3.0 (20 slots, max
    // event_id wins the same-µs collision): 30*1 + 20*3 = 90
    assert(r.getAs[Double]("sum_filled") == 90.0)
  }

  // --- boilerplate removal ----------------------------------------------------------

  test("boilerplate removes high-df chunks from EVERY doc; dedup_lines keeps the first") {
    val dir = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    val header = (1 to 10).map(i => s"h$i").mkString(" ")   // one exact 10-token chunk
    val aTail = (1 to 10).map(i => s"a$i").mkString(" ")
    val bTail = (1 to 10).map(i => s"b$i").mkString(" ")
    Seq((1L, s"$header $aTail"), (2L, s"$header $bTail")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val boiler = operators.Curation.boilerplate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // the shared header chunk disappears from BOTH docs
    assert(boiler(1L) == aTail && boiler(2L) == bTail)
    val dedup = operators.Curation.dedupLines(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // dedup_lines keeps the first occurrence (doc 1) and strips doc 2's copy
    assert(dedup(1L) == s"$header $aTail" && dedup(2L) == bTail)
  }

  test("boilerplate keeps fully-boilerplate docs as empty-text rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_boiler2").toString
    // the shared chunk must recur across DIFFERENT texts: since r11
    // the df census counts distinct texts, so two verbatim clones of
    // one doc no longer promote their content to boilerplate (that
    // is dedup's job, and a duplication factor > maxDf must not
    // strip the corpus) — doc 2 carries the chunk plus unique tail
    val chunk = (1 to 10).map(i => s"c$i").mkString(" ")
    val tail = (1 to 10).map(i => s"u$i").mkString(" ")
    Seq((1L, chunk), (2L, s"$chunk $tail")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = operators.Curation.boilerplate(spark, dir).collect()
    assert(rows.length == 2)
    val d1 = rows.find(_.getLong(0) == 1L).get
    assert(d1.getString(1) == "" && d1.getLong(2) == 0L && d1.getLong(3) == 1L,
      s"fully-boilerplate doc must survive empty: $d1")
    val d2 = rows.find(_.getLong(0) == 2L).get
    assert(d2.getString(1) == tail && d2.getLong(2) == 1L && d2.getLong(3) == 2L,
      s"doc 2 must keep only its unique chunk: $d2")
  }

  // --- set operations --------------------------------------------------------------

  test("intersect and except partition the 1995 buyer set exactly") {
    import graft.sources.Tables
    val y95 = Tables.orders(spark, sf).filter(year($"o_orderdate") === 1995)
      .select($"o_custkey").distinct().as[Long].collect().toSet
    val y96 = Tables.orders(spark, sf).filter(year($"o_orderdate") === 1996)
      .select($"o_custkey").distinct().as[Long].collect().toSet
    val both = operators.Relational.qIntersect(spark, sf).as[Long].collect().toSet
    val only95 = operators.Relational.qExcept(spark, sf).as[Long].collect().toSet
    assert(both == (y95 intersect y96))
    assert(only95 == (y95 diff y96))
    assert((both intersect only95).isEmpty && (both union only95) == y95)
  }

  // --- JSON props extraction ---------------------------------------------------------

  test("props extraction: declared schema, malformed JSON quarantines as null") {
    val dir = java.nio.file.Files.createTempDirectory("graft_props").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq(
      (1L, ts, 1L, "a", 1.0, """{"k": 42}"""),
      (2L, ts, 1L, "a", 2.0, """not json"""),
      (3L, ts, 1L, "a", 4.0, """{"other": 1}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = operators.Telemetry.propsExtract(spark, dir).collect()
    val byBucket = rows.map(r => Option(r.get(1)).map(_.asInstanceOf[Long]) ->
      (r.getLong(2), r.getDouble(3))).toMap
    assert(byBucket(Some(2L)) == ((1L, 1.0)))     // k=42 -> bucket 2
    assert(byBucket(None) == ((2L, 6.0)))         // malformed + missing key -> null bucket
  }

  // --- range-frame moving average -------------------------------------------------------

  test("moving average frame is event-time based: inclusive at -10min, exclusive past it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mavg").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    Seq(
      (1L, at(0), 5L, "m", 10.0, "{}"),
      (2L, at(10), 5L, "m", 20.0, "{}"),   // exactly 10 min later: IN frame
      (3L, at(21), 5L, "m", 40.0, "{}")    // 11 min after event 2: only itself
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = operators.Telemetry.movingAvg(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getDouble(5))).toMap
    assert(rows(1L) == ((1L, 10.0)))
    assert(rows(2L) == ((2L, 15.0)))
    assert(rows(3L) == ((1L, 40.0)))
  }

  // --- IVF-PQ --------------------------------------------------------------------

  test("ivfpq: neighbors come only from probed lists, scored identically to ann_pq") {
    val ivfpq = operators.Similarity.ivfpqTopK(spark, sf).collect()
    assert(ivfpq.groupBy(_.getLong(0)).values.forall(_.length == 5))
    // ADC distances must agree with ann_pq's for the same (query, neighbor)
    val pq = operators.Similarity.pqTopK(spark, sf, k = 499).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivfpq.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(pq.contains(key) && pq(key) == r.getDouble(2),
        s"ADC score mismatch for $key")
    }
  }
}
