package graft

import org.apache.spark.sql.functions._

/** Round-6 additions: outer-join aggregate, event-path transition
  * matrix, dyadic trailing EWMA. */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  // --- q_outerjoin -------------------------------------------------------------

  test("outer join keeps order-less customers with n_orders = 0 and null spend") {
    val df = operators.Relational.qOuterJoin(spark, sf)
    val rows = df.collect()
    val nCust = sources.Tables.customer(spark, sf).count()
    assert(rows.length == nCust, "every customer survives the outer join")
    val inactive = rows.filter(_.getLong(2) == 0L)
    assert(inactive.nonEmpty, "the 1996 filter must leave some customers order-less")
    assert(inactive.forall(_.isNullAt(3)), "no fabricated spend for order-less customers")
    // active customers: spend present and positive
    assert(rows.filter(_.getLong(2) > 0L).forall(r => !r.isNullAt(3) && r.getDouble(3) > 0))
  }

  test("outer join aggregates the fact BEFORE the join (partial agg below it)") {
    val df = operators.Relational.qOuterJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the pre-aggregation must exist; the join input is the rollup,
    // not raw orders: HashAggregate appears on the build side
    assert(plan.contains("HashAggregate"), plan)
    assert(df.queryExecution.optimizedPlan.toString.linesIterator
      .dropWhile(l => !l.contains("Join")).exists(_.contains("Aggregate")),
      "aggregate must sit under the join in the optimized plan")
  }

  // --- events_paths ------------------------------------------------------------

  test("event paths count every adjacent bigram, including self-loops") {
    val df = operators.Telemetry.paths(spark, sf)
    val m = df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m.nonEmpty)
    // total transitions = total non-null-ts events - #users (one less
    // transition than events per user)
    val ev = sources.Tables.events(spark, sf).filter($"ts".isNotNull)
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    assert(m.values.sum == expected)
    // self-loops exist in a 5-type corpus with long user histories
    assert(m.keys.exists(k => k._1 == k._2))
  }

  test("event paths: n_users never exceeds n_transitions") {
    val bad = operators.Telemetry.paths(spark, sf)
      .filter($"n_users" > $"n_transitions").count()
    assert(bad == 0L)
  }

  // --- ts_ewma -----------------------------------------------------------------

  test("ewma: first event per user equals its own value; weights renormalize") {
    val df = operators.Telemetry.ewma(spark, sf)
    val first = df.filter($"n_window" === 1).collect()
    assert(first.nonEmpty)
    // n_window = 1 -> ewma = cents*128 / 128 / 100 = value (cent-exact)
    val ev = sources.Tables.events(spark, sf)
      .filter($"ts".isNotNull && $"value".isNotNull)
      .select($"event_id", round($"value" * 100).cast("long").as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    first.foreach { r =>
      val cents = ev(r.getLong(0))
      assert(math.abs(r.getDouble(4) - cents / 100.0) < 1e-12)
    }
  }

  test("ewma hand-check: dyadic weights over a 3-event history") {
    val df = operators.Telemetry.ewma(spark, sf)
    // replay one user's first 3 events by hand
    val ev = sources.Tables.events(spark, sf)
      .filter($"ts".isNotNull && $"value".isNotNull)
      .select($"user_id", unix_micros($"ts").as("eus"), $"event_id",
        round($"value" * 100).cast("long").as("cents"))
      .orderBy($"user_id", $"eus", $"event_id").collect()
    val uid = ev.head.getLong(0)
    val hist = ev.filter(_.getLong(0) == uid).take(3).map(_.getLong(3))
    assume(hist.length == 3)
    val expected = (hist(2) * 128 + hist(1) * 64 + hist(0) * 32).toDouble / (128 + 64 + 32) / 100.0
    val third = df.filter($"user_id" === uid).orderBy($"eus", $"event_id")
      .collect()(2)
    assert(third.getLong(3) == 3L)
    assert(math.abs(third.getDouble(4) - expected) < 1e-12)
  }

  test("ewma plan: all taps share ONE window sort (single shuffle)") {
    val df = operators.Telemetry.ewma(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val nExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(nExchanges == 1, s"expected one window shuffle, got $nExchanges:\n$plan")
  }

  // --- dedup_semdedup ----------------------------------------------------------

  test("semdedup: every vector classified; losers exactly = smaller-id near neighbor") {
    val out = operators.Similarity.semdedup(spark, sf).collect()
    val nVecs = sources.Tables.embeddings(spark, sf).count()
    assert(out.length == nVecs)
    // replay the pair predicate by hand (500 vecs locally)
    val cluster = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = sources.Tables.embeddings(spark, sf)
      .orderBy($"vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var da = 0.0; var db = 0.0; var ab = 0.0
      var i = 0
      while (i < a.length) { da += a(i)*a(i); db += b(i)*b(i); ab += a(i)*b(i); i += 1 }
      ab / (math.sqrt(da) * math.sqrt(db))
    }
    out.foreach { r =>
      val (vid, keep) = (r.getLong(0), r.getBoolean(3))
      val hasSmallerNbr = vecs.keys.exists(o =>
        o < vid && cluster(o) == cluster(vid) && cos(vecs(o), vecs(vid)) >= 0.35)
      assert(keep == !hasSmallerNbr, s"vec $vid: keep=$keep but smaller-nbr=$hasSmallerNbr")
    }
  }

  test("semdedup: no-neighbor vectors always keep; corpus min id always keeps") {
    val out = operators.Similarity.semdedup(spark, sf).collect()
    assert(out.filter(_.getLong(2) == 0L).forall(_.getBoolean(3)))
    val minId = out.map(_.getLong(0)).min
    assert(out.find(_.getLong(0) == minId).get.getBoolean(3))
    assert(out.exists(!_.getBoolean(3)), "corpus must contain semantic dups at this tau")
  }

  // --- text_ngram_lm -----------------------------------------------------------

  test("ngram LM score: bounded below by 1 and consistent with its own integers") {
    val rows = operators.TextAnalysis.ngramLm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s, score) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n >= 1 && s >= n, s"df >= 1 per bigram: n=$n sum=$s")
      assert(score == s.toDouble / n.toDouble)
    }
  }

  test("ngram LM: corpus-typical docs outscore a unique-bigram doc (engineered)") {
    // two docs sharing all bigrams + one gibberish doc: shared bigrams
    // have df 2, unique ones df 1
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),
      (3L, "zxq wvu tsr qpo nml")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("graft_test_lm_docs")
    // run the same plan shape inline
    val toks = split(lower($"text"), "\\s+")
    val n = size(toks)
    val occ = docs.select($"doc_id", explode(zip_with(
        slice(toks, lit(1), greatest(n - 1, lit(0))),
        slice(toks, lit(2), greatest(n - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b))).as("bigram"))
      .groupBy($"doc_id", $"bigram").agg(count(lit(1)).as("cnt"))
    val dfc = occ.groupBy($"bigram").agg(count(lit(1)).as("df"))
    val scored = occ.join(dfc, "bigram").groupBy($"doc_id")
      .agg((sum($"cnt" * $"df") / sum($"cnt")).as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) == 2.0 && scored(2L) == 2.0 && scored(3L) == 1.0)
  }

  // --- corpus_interleave -------------------------------------------------------

  test("interleave: round-robin positions — distinct, mod-S = source index, dense ranks") {
    val rows = operators.Curation.interleave(spark, sf).collect()
    val nSrc = rows.map(_.getLong(2)).distinct.length
    // positions are globally distinct
    assert(rows.map(_.getLong(4)).distinct.length == rows.length)
    // pos ≡ sidx (mod S): strict round-robin
    assert(rows.forall(r => r.getLong(4) % nSrc == r.getLong(2)))
    // within each source the ranks are exactly 0..n_s-1
    rows.groupBy(_.getString(1)).foreach { case (_, g) =>
      assert(g.map(_.getLong(3)).sorted.toSeq == (0L until g.length).toSeq)
    }
    // every prefix of the global order is evenly mixed: among the
    // first S*m positions each source contributes at most m docs
    val byPos = rows.sortBy(_.getLong(4)).take(nSrc * 10)
    byPos.groupBy(_.getLong(2)).foreach { case (_, g) => assert(g.length <= 10) }
  }

  test("interleave plan: corpus rank never sorts a whole source in one task") {
    val df = operators.Curation.interleave(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    // the corpus-sized window must partition on (source, bucket);
    // windows on source alone are only over the tiny distinct dim
    assert(plan.contains("bucket"), plan)
  }

  // --- graph_triangles ---------------------------------------------------------

  test("triangles: degree-oriented count equals the naive closed-wedge count") {
    val pairs = operators.Dedup.minhash(spark, sf)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive reference: for a<b<c all three edges present
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    def edge(a: Long, b: Long) = pairs.contains((a min b, a max b))
    val naive = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      Seq(a, b, c) <- nodes.combinations(3)
      if edge(a, b) && edge(b, c) && edge(a, c)
    } { naive(a) += 1; naive(b) += 1; naive(c) += 1 }
    val got = operators.Dedup.triangles(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive.toMap, s"got=$got naive=$naive")
    assert(got.nonEmpty, "the dup graph must contain at least one triangle at sf0.001")
  }

  // --- mm_phash ----------------------------------------------------------------

  test("AHash62: bits set exactly above the mean; sign-safe; quarantines bad offsets") {
    val bytes = Array.tabulate[Byte](70)(i => (i * 4).toByte) // 0,4,8,...
    val df = Seq((bytes, 0), (bytes, 65), (bytes, -1), (null.asInstanceOf[Array[Byte]], 0))
      .toDF("b", "off")
      .select(plans.Image.ahash($"b", $"off").as("h"))
    val rows = df.collect()
    // region = bytes 0..61 (values 0,4,...,244), mean = 122 -> bytes
    // 124.. set: indices 31..61
    val expected = (31 to 61).map(i => 1L << i).sum
    assert(rows(0).getLong(0) == expected)
    assert(rows(0).getLong(0) > 0L, "62-bit hash stays positive")
    assert(rows(1).isNullAt(0) === false, "offset 65 still has 5 bytes of region")
    assert(rows(2).isNullAt(0) && rows(3).isNullAt(0))
  }

  test("phash finds the corpus's duplicate blobs (hamming 0 for identical payloads)") {
    val out = operators.Multimodal.phash(spark, sf).collect()
    assert(out.nonEmpty)
    // exact-duplicate documents must appear at hamming 0
    val exactDups = operators.Dedup.exact(spark, sf)
      .filter($"n_copies" > 1).count()
    if (exactDups > 0) assert(out.exists(_.getLong(2) == 0L))
    assert(out.forall(_.getLong(2) <= 8L))
  }

  // --- stream_sessions ---------------------------------------------------------

  test("streaming sessions stitch across micro-batches; sentinel flushes the tail") {
    import graft.streaming.StreamSessions
    import StreamSessions.Ev
    implicit val sqlCtx = spark.sqlContext
    val gapUs = 1800L * 1000000L
    val mn = 60L * 1000000L
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = StreamSessions.sessionize(mem.toDS(), gapUs)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      // batch 1: two events 10 min apart (one open session)
      mem.addData(Ev(Some(1L), 0L, 1L), Ev(Some(1L), 10L * mn, 2L))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0L, "session still open: nothing emits")
      // batch 2: 20 min later (extends the SAME session from state),
      // then a 40-min gap (closes it, opens session 2)
      mem.addData(Ev(Some(1L), 30L * mn, 3L), Ev(Some(1L), 70L * mn, 4L))
      q.processAllAvailable()
      val afterB2 = spark.table("sess_out").collect()
      assert(afterB2.length == 1)
      assert(afterB2(0).getLong(1) == 1L && afterB2(0).getLong(2) == 3L,
        s"session 1 must hold all three stitched events: ${afterB2.toSeq}")
      // sentinel: far future, closes session 2
      mem.addData(Ev(Some(1L), 70L * mn + 3L * gapUs, -1L))
      q.processAllAvailable()
      val all = spark.table("sess_out").collect().sortBy(_.getLong(1))
      assert(all.length == 2 && all(1).getLong(1) == 2L && all(1).getLong(2) == 1L)
    } finally q.stop()
  }

  test("stream_sessions equals the batch session_windows result") {
    val batch = operators.Telemetry.sessionWindows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = graft.streaming.StreamSessions.streamedSessions(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("phash fingerprints are scan-local: no shuffle before the band join") {
    val df = operators.Multimodal.phash(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the hash+explode stage reads the parquet scan directly; the
    // first exchange in any path is the band/bucket hash partitioning
    assert(!plan.contains("SortMergeJoin") || plan.contains("Exchange"),
      "sanity: plan printable")
    val scanToFirstExchange = plan.split("Exchange").head
    assert(!scanToFirstExchange.contains("Window"),
      s"no window pass before banding:\n$plan")
  }
}
