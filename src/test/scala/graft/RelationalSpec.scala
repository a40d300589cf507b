package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("q1_agg groups and sums exactly") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val r = rows.map(r => r.getAs[String]("l_returnflag")).distinct
    assert(r.forall(Set("A", "N", "R")))
    // decimal-exact: sum of 2-dp values must itself be 2-dp clean
    rows.foreach { row =>
      val s = row.getAs[Double]("sum_base_price")
      assert(math.abs(s * 100 - math.round(s * 100)) < 1e-6)
    }
  }

  test("q3_topk returns descending deterministic top-10") {
    val rows = Relational.q3TopK(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q5_multijoin covers ASIA nations") {
    val rows = Relational.q5MultiJoin(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 5)
  }

  test("q_window keeps at most 3 rows per supplier") {
    val df = Relational.qWindow(spark, sf)
    val maxPerSupp = df.groupBy($"l_suppkey").count().agg(max($"count")).head().getLong(0)
    assert(maxPerSupp <= 3)
  }

  test("q_distinct counts are bounded by group size") {
    Relational.qDistinct(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_parts") <= r.getAs[Long]("n_rows"))
    }
  }

  test("q_exists anti-join excludes customers with large orders") {
    val excluded = Relational.qExists(spark, sf).select($"c_custkey").as[Long].collect().toSet
    val withBig = graft.sources.Tables.orders(spark, sf)
      .filter($"o_totalprice" > 300000.0).select($"o_custkey").as[Long].collect().toSet
    assert(excluded.intersect(withBig).isEmpty)
  }

  test("q_rollup contains grand total row") {
    val rows = Relational.qRollup(spark, sf).collect()
    assert(rows.count(r => r.isNullAt(0) && r.isNullAt(1)) == 1)
  }

  test("q_moments yields bounded correlations") {
    Relational.qMoments(spark, sf).collect().foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 && c <= 1.0)
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("q_asof picks most recent order date <= event ts") {
    val rows = Relational.qAsOf(spark, sf).filter($"last_order_date".isNotNull).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getAs[java.sql.Timestamp]("last_order_date")
        .after(r.getAs[java.sql.Timestamp]("ts")))
    }
  }

  test("KMV sketch stays bounded and estimates within expected error") {
    Relational.qSketchDistinct(spark, sf).collect().foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("est_distinct")
      if (exact < 256) assert(est == exact, "below k the sketch is exact")
      else assert(math.abs(est - exact) / exact < 0.2,
        s"estimate $est too far from $exact for k=256 (~6% expected)")
    }
    // the aggregation result is a bounded, sorted, distinct hash set
    val kmv = graft.sources.Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(graft.plans.Sketch.kMinValues(
        graft.functions.HashFns.polyHash($"l_partkey".cast("string")), 256).as("kmv"))
      .collect()
    kmv.foreach { r =>
      val a = r.getSeq[Long](r.fieldIndex("kmv"))
      assert(a.length <= 256)
      assert(a == a.sorted && a.distinct.length == a.length)
    }
  }

  test("banded range join equals the naive range join, through an equi-join") {
    import org.apache.spark.sql.functions._
    val banded = Relational.qRangeJoin(spark, sf)
    val got = banded.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // naive form: direct theta self-join on |Δt| <= 10 min (fine at
    // spec scale)
    val w = 10L * 60 * 1000000L
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", unix_micros($"ts").as("eus"),
        $"value".cast("decimal(18,2)").as("v"))
    val a = ev.select($"event_id", $"user_id", $"eus")
    val b = ev.select($"event_id".as("nb_id"), $"user_id", $"eus".as("nus"), $"v")
    val naive = a.join(b, a("user_id") === b("user_id") &&
        $"nb_id" =!= $"event_id" && abs($"nus" - $"eus") <= w, "left")
      .groupBy($"event_id")
      .agg(count($"nb_id").as("n"),
        coalesce(sum($"v").cast("double"), lit(0.0d)).as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == naive)
    assert(got.values.exists(_._1 > 0))
    // the banded plan must candidate through an EQUI-join on
    // (user, bucket) — never a per-key cross product
    banded.collect()
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a cross product:\n$plan")
  }

  test("custom as-of operator matches the union+window plan row for row") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.sql.Timestamp]("last_order_date")),
        Option(r.getAs[java.lang.Double]("last_day_total")).map(_.doubleValue)))
      .sortBy(_._1)
    val native = Relational.qAsOfNative(spark, sf)
    assert(canon(native).sameElements(canon(Relational.qAsOf(spark, sf))))
    // the physical plan must be our operator, co-partitioned+sorted by
    // Catalyst (one exchange per side), not a range join fallback
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
  }

  test("as-of merge participates in whole-stage codegen (and interpreted path agrees)") {
    // with AQE off the executed plan prints codegen stage stars: the
    // merge must sit INSIDE a WholeStageCodegen stage ("*(n) AsOfJoin"),
    // not at an iterator boundary — that fusion is the difference
    // between two virtual calls per row and a compiled loop at 100 TB
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val native = Relational.qAsOfNative(spark, sf)
      val plan = native.queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
        l.contains("AsOfJoin") && l.trim.matches("""[+:.\s-]*\*\(\d+\) AsOfJoin.*""")),
        s"AsOfJoin not inside a WholeStageCodegen stage:\n$plan")
      val rows = native.collect().map(_.getAs[Long]("event_id")).sorted
      // interpreted fallback must produce the identical result
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = Relational.qAsOfNative(spark, sf)
        .collect().map(_.getAs[Long]("event_id")).sorted
      assert(rows.sameElements(interp))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", old)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }
}
