package graft

import org.apache.spark.sql.functions._

/** Round-11 additions: lag-1 autocorrelation, activity streaks,
  * cumulative-distinct growth, Markov transition matrix, mean-shift
  * changepoints, equal-frequency quartiles, Benford audit, blocked
  * Levenshtein near-dup pairs. */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  // --- ts_autocorr ---------------------------------------------------------

  test("autocorr: matches Spark's corr aggregate, pairs = n-1 per series") {
    val df = operators.Telemetry.autocorr(spark, sf).cache()
    val counts = sources.Tables.events(spark, sf)
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    df.collect().foreach { r =>
      val (et, n, rho) = (r.getString(0), r.getLong(1), r.getDouble(2))
      assert(n == counts(et) - 1, s"$et: lag-1 pairs must be n-1")
      assert(math.abs(rho) <= 1.0 + 1e-12, s"$et: |rho1| must be <= 1")
    }
    // cross-check the decimal-sums assembly against the built-in corr
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"ts".asc, $"event_id".asc)
    val ref = sources.Tables.events(spark, sf)
      .select($"event_type", $"ts", $"event_id", $"value")
      .withColumn("prev", lag($"value", 1).over(w))
      .filter($"prev".isNotNull)
      .groupBy($"event_type").agg(corr($"prev", $"value").as("rho"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(2) - ref(r.getString(0))) < 1e-9,
        s"${r.getString(0)}: decimal-sum rho must agree with corr()")
    }
  }

  // --- events_streak -------------------------------------------------------

  test("streak: hand-replayed longest run for every user, integer days") {
    val df = operators.Telemetry.streaks(spark, sf).cache()
    val byUser = sources.Tables.events(spark, sf)
      .select($"user_id", datediff(to_date($"ts"), lit("1970-01-01").cast("date")).as("day"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).sorted.toVector).toMap
    def longest(days: Vector[Int]): (Int, Int) = { // (len, startDay)
      var best = (0, 0); var len = 0; var start = days.head
      days.zipWithIndex.foreach { case (d, i) =>
        if (i == 0 || d == days(i - 1) + 1) len += 1
        else { len = 1; start = d }
        if (i == 0) start = d
        if (len > best._1) best = (len, start)
      }
      best
    }
    val got = df.collect().map(r => r.getLong(0) ->
      (r.getLong(3), r.getDate(4).toLocalDate.toEpochDay)).toMap
    assert(got.keySet == byUser.keySet, "one row per active user")
    byUser.foreach { case (u, days) =>
      val (len, start) = longest(days)
      assert(got(u)._1 == len.toLong, s"user $u: best streak length")
      assert(got(u)._2 == start.toLong, s"user $u: earliest best-streak start")
    }
  }

  // --- q_running_distinct --------------------------------------------------

  test("running distinct: monotone, ends at total distinct, news sum up") {
    val df = operators.Telemetry.runningDistinct(spark, sf)
      .orderBy($"day").collect()
    val total = sources.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(df.last.getLong(3) == total, "curve must end at total distinct users")
    assert(df.map(_.getLong(2)).sum == total, "new-user column must partition the population")
    df.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(3), "cumulative distinct never decreases")
    }
    df.foreach(r => assert(r.getLong(1) >= r.getLong(2),
      "active count dominates new count"))
  }

  // --- events_markov -------------------------------------------------------

  test("markov: rows are conditional distributions, mass sums to one") {
    val df = operators.Telemetry.markov(spark, sf).cache()
    val mass = df.groupBy($"from_state")
      .agg(sum($"p").as("m"), sum($"n_transitions").as("n"), max($"row_total").as("t"))
      .collect()
    mass.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9, s"${r.getString(0)}: P mass must be 1")
      assert(r.getLong(2) == r.getLong(3), "row_total must equal the summed counts")
    }
    // total transitions = total events - one sequence head per user
    val ev = sources.Tables.events(spark, sf)
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    assert(df.agg(sum($"n_transitions")).collect()(0).getLong(0) == expected)
    val top = df.filter($"rnk" === 1).collect()
    top.foreach { r =>
      val best = df.filter($"from_state" === r.getString(0))
        .agg(max($"n_transitions")).collect()(0).getLong(0)
      assert(r.getLong(2) == best, "rnk 1 must carry the modal transition")
    }
  }

  // --- ts_changepoint ------------------------------------------------------

  test("changepoint: flags exceed the adaptive bar; both frames share one Window") {
    val df = operators.Telemetry.changepoints(spark, sf)
    df.collect().foreach { r =>
      val (jump, bar) = (r.getDouble(5), r.getDouble(6))
      assert(math.abs(jump) > 3.0 * bar, "every flag must clear 3x the mean abs jump")
      assert(math.abs(r.getDouble(4) - r.getDouble(3) - jump) < 1e-12,
        "jump must be post minus pre")
    }
    // the frame pair and the threshold stack on ONE shuffle + sort:
    // a join-back formulation would duplicate the whole window subtree
    // after execution AQE prints Final + Initial plan sections; count in the final only
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .split("== Initial Plan ==")(0)
    def nodes(p: String) = s"$p \\(\\d+\\)".r.findAllIn(plan).size
    assert(nodes("Sort") == 1 && nodes("Exchange") == 1 && nodes("Window") == 2,
      s"both Window stages must reuse a single exchange and sort:\n$plan")
    assert(!plan.contains("Join"), "threshold must not re-execute the window subtree")
  }

  // --- q_ntile -------------------------------------------------------------

  test("ntile: equal-frequency tiles with ordered, touching boundaries") {
    val rows = operators.Relational.qNtile(spark, sf)
      .orderBy($"tile").collect()
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, "ntile sizes differ by at most one")
    assert(sizes.sum == sources.Tables.customer(spark, sf).count())
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2),
        "tile k's max balance cannot exceed tile k+1's min")
    }
  }

  // --- dq_benford ----------------------------------------------------------

  test("benford: digits partition the table, shares and literals line up") {
    val rows = operators.Quality.benford(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSet.subsetOf((1 to 9).toSet))
    assert(rows.map(_.getLong(1)).sum == sources.Tables.lineitem(spark, sf).count())
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-12, "shares sum to 1")
    val benford = Map(1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.096910,
      5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153, 9 -> 0.045757)
    rows.foreach { r =>
      assert(r.getDouble(3) == benford(r.getInt(0)), "expected column is the 6-dp literal")
      assert(math.abs(r.getDouble(4) - math.abs(r.getDouble(2) - r.getDouble(3))) < 1e-15)
    }
  }

  // --- dedup_fuzzy ---------------------------------------------------------

  test("fuzzy dedup: real near-pairs, threshold honored, no cartesian join") {
    val df = operators.Dedup.fuzzy(spark, sf).cache()
    val rows = df.collect()
    assert(rows.nonEmpty, "corpus contains small-edit near-dups")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs are emitted once, id1 < id2")
      val lev = r.getLong(2); val cap = math.max(r.getLong(3), r.getLong(4))
      assert(lev <= 0.25 * cap, "relative threshold must hold")
      assert(r.getDouble(5) >= 0.75 - 1e-12, "similarity consistent with threshold")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      "LSH blocking must keep this an equi-join — an O(n^2) plan is a bug at scale")
    // exact duplicates have identical signatures: LSH must surface them, lev 0
    // (none exist at this sf — the check bites on corpora that have them)
    val exact = sources.Tables.documents(spark, sf)
      .groupBy($"text").agg(collect_list($"doc_id").as("ids"))
      .filter(size($"ids") >= 2).select($"ids").collect()
    exact.foreach { r =>
      val ids = r.getSeq[Long](0).sorted
      val hit = rows.exists(p => p.getLong(0) == ids(0) && p.getLong(1) == ids(1)
        && p.getLong(2) == 0L)
      assert(hit, s"exact dup pair ${ids(0)},${ids(1)} must surface with lev 0")
    }
    // near-identical LSH pairs (the corpus's planted near-dups) must be caught
    val planted = operators.Dedup.minhash(spark, sf)
      .filter($"jaccard" >= 0.9).collect()
    assert(planted.nonEmpty, "corpus must contain high-similarity near-dups")
    planted.foreach { p =>
      assert(rows.exists(r => r.getLong(0) == p.getLong(0) && r.getLong(1) == p.getLong(1)),
        s"jaccard>=0.9 pair ${p.getLong(0)},${p.getLong(1)} must pass edit-distance verify")
    }
  }
}
