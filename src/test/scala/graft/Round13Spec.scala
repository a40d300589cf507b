package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quality, Telemetry, TextAnalysis}
import graft.sources.Tables

/** Round-7 additions, second batch: key-uniqueness audit, RFM
  * segmentation, fraction-threshold decontamination, and the
  * watermarked tumbling-window streaming twin of beacon_5min. */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  test("dq_uniqueness: row accounting is exact and widening a key never loses keys") {
    val out = Quality.uniqueness(spark, sf).collect()
      .map(r => r.getAs[String]("key_cols") -> r).toMap
    assert(out.size == 3)
    val total = Tables.events(spark, sf).count()
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") == total, "every audit sees the full log")
      assert(r.getAs[Long]("n_surplus_rows") ==
        r.getAs[Long]("n_rows") - r.getAs[Long]("n_keys"))
      assert(r.getAs[Long]("n_dup_keys") >= 0)
      if (r.getAs[Long]("n_dup_keys") == 0)
        assert(r.getAs[Long]("max_multiplicity") == 1L)
      else assert(r.getAs[Long]("max_multiplicity") > 1L)
    }
    // a superset key partitions at least as finely
    assert(out("user_id,event_type,ts").getAs[Long]("n_keys") >=
      out("user_id,ts").getAs[Long]("n_keys"))
    // the generator's event_id is the declared PK — the audit should
    // confirm it (if this ever fails, the data changed, not the op)
    assert(out("event_id").getAs[Long]("n_dup_keys") == 0L)
  }

  test("events_rfm: one row per user, scores are balanced quartiles, best users score 1") {
    val rows = Telemetry.rfm(spark, sf).collect()
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(rows.length == users)
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val byTile = rows.groupBy(_.getAs[Long](c)).view.mapValues(_.length)
      assert(byTile.keySet.subsetOf(Set(1L, 2L, 3L, 4L)))
      // ntile balance: tile sizes differ by at most 1
      assert(byTile.values.max - byTile.values.min <= 1, s"$c unbalanced: $byTile")
    }
    val top = rows.maxBy(r => (r.getAs[Double]("monetary"), -r.getAs[Long]("user_id")))
    assert(top.getAs[Long]("m_score") == 1L)
    val freshest = rows.minBy(r => (r.getAs[Long]("recency_days"), r.getAs[Long]("user_id")))
    assert(freshest.getAs[Long]("r_score") == 1L)
    assert(rows.forall(_.getAs[Long]("recency_days") >= 0L))
  }

  test("decontaminate_frac: verdict is the exact integer threshold over the any-hit set") {
    val frac = TextAnalysis.decontaminateFrac(spark, sf).collect()
    val anyHit = TextAnalysis.decontaminate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared_shingles")).toMap
    val train = Tables.documents(spark, sf).filter($"doc_id" >= 50L).count()
    assert(frac.length == train, "every training doc reports, clean ones included")
    frac.foreach { r =>
      val (n, hit) = (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hit"))
      assert(hit <= n)
      assert(hit == anyHit.getOrElse(r.getAs[Long]("doc_id"), 0L),
        "hit counts must agree with the any-hit operator")
      assert(r.getAs[Boolean]("contaminated") == (hit * 100L >= n * 20L))
    }
    // the fraction rule is strictly more selective than any-hit here
    val nFrac = frac.count(_.getAs[Boolean]("contaminated"))
    assert(nFrac <= anyHit.size)
  }

  test("stream_beacon: append-mode window emission equals the batch groupBy exactly") {
    val streamed = graft.streaming.StreamBeacon.streamedBeacon(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = Telemetry.beacon5Min(spark, sf).collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
