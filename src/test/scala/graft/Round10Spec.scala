package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 additions: changelog compaction (CDC apply), SCD2
  * history build, OHLC resampling, freshness audit, Pareto/ABC
  * analysis, deterministic train/val/test split, int8 Gram matrix. */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  // --- q_cdc_apply ---------------------------------------------------------

  test("cdc apply: latest-wins equals the window formulation, Window-free") {
    val log = sources.Tables.events(spark, sf)
      .select($"user_id", $"ts", $"value",
        when($"event_type" === "error", lit("D")).otherwise(lit("U")).as("op"))
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc)
    val expect = log.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .filter($"op" =!= "D")
      .select($"user_id", $"value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val df = operators.Changelog.cdcApply(spark, sf)
    val got = df.select($"user_id", $"value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == expect, "max_by election must equal the window latest-wins")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "compaction is an aggregate election, never a per-key sort")
  }

  test("cdc apply: tombstoned keys are dropped, op counts survive") {
    val df = operators.Changelog.cdcApply(spark, sf).cache()
    val lastOps = sources.Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(max_by($"event_type", unix_micros($"ts")).as("last_type"))
    val tombstoned = lastOps.filter($"last_type" === "error")
      .select($"user_id").collect().map(_.getLong(0)).toSet
    val kept = df.select($"user_id").collect().map(_.getLong(0)).toSet
    assert(tombstoned.nonEmpty, "corpus must exercise the tombstone path")
    assert(kept.intersect(tombstoned).isEmpty, "last-op=D keys must vanish")
    val ops = df.agg(sum($"n_ops")).collect()(0).getLong(0)
    val totalOfKept = sources.Tables.events(spark, sf)
      .join(df.select($"user_id"), Seq("user_id"), "left_semi").count()
    assert(ops == totalOfKept, "n_ops must count the full log per kept key")
  }

  // --- q_scd2 --------------------------------------------------------------

  test("scd2: intervals tile each key's timeline, one open interval per key") {
    val df = operators.Changelog.scd2(spark, sf).cache()
    // exactly one current row per user, and it is the max version
    val cur = df.filter($"is_current").groupBy($"user_id").count()
      .filter($"count" =!= 1).count()
    assert(cur == 0, "exactly one open interval per key")
    // intervals chain: valid_to of version v == valid_from of v+1
    val chain = df.as("a").join(df.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.version" + 1 === $"b.version")
      .filter($"a.valid_to" =!= $"b.valid_from").count()
    assert(chain == 0, "consecutive intervals must share a boundary")
    // no zero-length or inverted intervals, no no-op versions
    assert(df.filter($"valid_to".isNotNull && $"valid_to" <= $"valid_from").count() == 0)
    val noop = df.as("a").join(df.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.version" + 1 === $"b.version")
      .filter($"a.event_type" === $"b.event_type").count()
    assert(noop == 0, "consecutive versions must differ (change rows only)")
  }

  // --- ts_ohlc -------------------------------------------------------------

  test("ohlc: candle invariants hold and open/close match the window form") {
    val df = operators.Telemetry.ohlc(spark, sf).cache()
    assert(df.filter($"high" < $"low" || $"high" < $"open" ||
      $"high" < $"close" || $"low" > $"open" || $"low" > $"close").count() == 0)
    val w = Window.partitionBy($"event_type", date_trunc("day", $"ts")).orderBy($"ts")
    val firsts = sources.Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"event_type", date_trunc("day", $"ts").as("day"), $"value".as("open"))
    val mismatch = df.join(firsts, Seq("event_type", "day"))
      .filter(df("open") =!= firsts("open")).count()
    assert(mismatch == 0, "min_by open must equal the first-row-per-bucket window")
    // the candle aggregation itself must not contain a Window (only the
    // day-over-day lag over the already-resampled series does)
    val candlePlan = sources.Tables.events(spark, sf)
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(min_by($"value", unix_micros($"ts")).as("open"))
      .queryExecution.executedPlan.toString
    assert(!candlePlan.contains("Window"), "resample is aggregate-only")
  }

  // --- dq_freshness --------------------------------------------------------

  test("freshness: lags are anchored at the corpus high-water mark") {
    val df = operators.Quality.freshness(spark, sf).cache()
    assert(df.filter($"lag_seconds" === 0L).count() >= 1,
      "the freshest stream defines the high-water mark")
    assert(df.filter($"lag_seconds" < 0L).count() == 0)
    assert(df.filter($"n_last_day" > $"n_events").count() == 0)
    assert(df.filter($"is_stale" =!= ($"lag_seconds" > 86400L)).count() == 0)
    val total = df.agg(sum($"n_events")).collect()(0).getLong(0)
    assert(total == sources.Tables.events(spark, sf).count(),
      "the audit partitions the log, one scan covers every stream")
  }

  // --- q_pareto ------------------------------------------------------------

  test("pareto: cumulative share is monotone to 1.0 and classes cut at 80/95") {
    val rows = operators.Relational.qPareto(spark, sf)
      .orderBy($"rnk").collect()
    val shares = rows.map(_.getDouble(3))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b + 1e-12 },
      "cum_share must be nondecreasing in rank order")
    assert(math.abs(shares.last - 1.0d) < 1e-9, "shares must end at 1.0")
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b },
      "rank order is revenue-descending")
    rows.foreach { r =>
      val (share, cls) = (r.getDouble(3), r.getString(4))
      val want = if (share <= 0.80) "A" else if (share <= 0.95) "B" else "C"
      assert(cls == want, s"class at share=$share")
    }
  }

  // --- sample_split --------------------------------------------------------

  test("split: a stable shuffle-free partition of the corpus near 80/10/10") {
    val df = operators.TextAnalysis.sampleSplit(spark, sf).cache()
    val n = sources.Tables.documents(spark, sf).count()
    assert(df.count() == n, "every document lands in exactly one split")
    assert(df.select($"doc_id").distinct().count() == n)
    val byS = df.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.keySet == Set("train", "validation", "test"))
    val trainFrac = byS("train").toDouble / n
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train frac $trainFrac")
    // pure function of doc_id: no shuffle anywhere in the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "split assignment is scan-local")
    // stability: recomputing yields the identical assignment
    val again = operators.TextAnalysis.sampleSplit(spark, sf)
      .select($"doc_id", $"split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val first = df.select($"doc_id", $"split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(again == first)
  }

  // --- embed_gram ----------------------------------------------------------

  test("gram: upper triangle over quantized vectors, exact and join-free") {
    val df = operators.Similarity.gram(spark, sf).cache()
    val dim = 64
    assert(df.count() == dim.toLong * (dim + 1) / 2, "full upper triangle")
    assert(df.filter($"i" > $"j").count() == 0)
    assert(df.filter($"i" === $"j" && $"gram_q" < 0L).count() == 0,
      "diagonal of a Gram matrix is nonnegative")
    // spot-check one off-diagonal cell against a driver-side recompute
    val vecs = sources.Tables.embeddings(spark, sf)
      .select($"embedding").collect().map(_.getSeq[Float](0).toArray)
    def quant(v: Array[Float]): Array[Long] = {
      val ma = v.map(x => math.abs(x.toDouble)).max
      if (ma > 0) v.map(x => math.floor(x.toDouble * 127.0 / ma + 0.5).toLong)
      else v.map(_ => 0L)
    }
    val want = vecs.map(quant).map(q => q(3) * q(17)).sum
    val got = df.filter($"i" === 3L && $"j" === 17L)
      .collect()(0).getAs[Long]("gram_q")
    assert(got == want, "cell (3,17) must equal the direct accumulation")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      "cell products are emitted scan-local, never by self-joining coordinates")
  }
}
