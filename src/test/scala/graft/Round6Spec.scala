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
}
