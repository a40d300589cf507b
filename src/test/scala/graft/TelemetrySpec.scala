package graft

import org.apache.spark.sql.functions._
import graft.operators.Telemetry
import graft.sources.Tables

class TelemetrySpec extends SparkSpec {
  import org.apache.spark.sql.functions.{abs => cabs, _}

  test("anomaly flags exactly the events beyond 2 sigma of their user") {
    val out = graft.operators.Telemetry.anomaly(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(out.nonEmpty && out.values.exists(identity) && out.values.exists(!_))
    // recompute the rule per user on the driver (spec scale) and match
    import spark.implicits._
    val rows = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"value".cast("decimal(18,2)").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    rows.groupBy(_._2).foreach { case (_, es) =>
      // exact decimal power sums like the operator (a double
      // accumulation here would drift in the last ulp and flip
      // near-boundary flags)
      val n = es.length.toDouble
      val mu = es.map(v => BigDecimal(v._3)).sum.toDouble / n
      val m2 = es.map(v => BigDecimal(v._3) * BigDecimal(v._3)).sum.toDouble / n
      val variance = m2 - mu * mu
      es.foreach { case (id, _, x) =>
        val expect = (x - mu) * (x - mu) > 4.0 * variance
        assert(out(id) == expect, s"event $id: got ${out(id)}, want $expect")
      }
    }
  }
  import spark.implicits._

  test("downsample_1hz emits at most one row per (user, second)") {
    val df = Telemetry.downsample1Hz(spark, sf)
    assert(df.groupBy($"user_id", $"sec").count().filter($"count" > 1).isEmpty)
  }

  test("beacon_5min buckets align to 300s and cover all events") {
    val df = Telemetry.beacon5Min(spark, sf)
    assert(df.filter(unix_seconds($"bucket") % 300 =!= 0).isEmpty)
    val total = df.agg(sum($"n_events")).head().getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("data_budget never exceeds the cap") {
    val df = Telemetry.dataBudget(spark, sf)
    assert(df.filter($"cum_kb" > 5000.0).isEmpty)
  }

  test("session_windows spans are gap-bounded") {
    val df = Telemetry.sessionWindows(spark, sf)
    assert(df.count() > 0)
    // sessions of one user never overlap
    val overlaps = df.as("a").join(df.as("b"),
      $"a.user_id" === $"b.user_id" && $"a.session_id" < $"b.session_id" &&
        $"a.end_ts" >= $"b.start_ts")
    assert(overlaps.isEmpty)
  }

  test("chunk_messages chunks reassemble to the payload size") {
    val df = Telemetry.chunkMessages(spark, sf)
    val bad = df.groupBy($"event_id", $"nbytes")
      .agg(sum($"chunk_bytes").as("re"))
      .filter($"re" =!= $"nbytes")
    assert(bad.isEmpty)
    assert(df.filter($"chunk_bytes" > 6400L || $"chunk_bytes" <= 0L).isEmpty)
  }

  test("queue_stats accounts every message exactly once") {
    val df = Telemetry.queueStats(spark, sf)
    val total = df.agg(sum($"n_msgs")).head().getLong(0)
    assert(total == Tables.events(spark, sf).count())
    df.collect().foreach(r => assert(r.getAs[Long]("n_lost") <= r.getAs[Long]("n_msgs")))
  }

  test("status_transitions only reports real state changes") {
    val rows = Telemetry.statusTransitions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[String]("prev_type") != r.getAs[String]("cur_type")))
  }

  test("chunk_reassemble detects exactly the simulated losses") {
    val rows = Telemetry.chunkReassemble(spark, sf).collect()
    assert(rows.nonEmpty)
    // every sent message appears, even when every chunk was lost
    val nMessages = Tables.events(spark, sf)
      .filter(round($"value" * 100) > 0).count()
    assert(rows.length == nMessages)
    rows.foreach { r =>
      val (id, rec, exp) = (r.getAs[Long]("event_id"),
        r.getAs[Long]("n_received"), r.getAs[Long]("n_expected"))
      // exactness: the deficit equals the count of indices the drop
      // rule removes for THIS message
      val dropped = (0L until exp).count(i => (id + i) % 97 == 0)
      assert(exp - rec == dropped, s"event $id: $rec of $exp with $dropped dropped")
      assert(r.getAs[Boolean]("is_complete") == (rec == exp))
    }
    // single-chunk messages with event_id % 97 == 0 are FULLY lost and
    // must still be accounted (n_received = 0)
    assert(rows.exists(r => r.getAs[Long]("n_received") == 0L))
    assert(rows.exists(!_.getAs[Boolean]("is_complete")))
    assert(rows.exists(_.getAs[Boolean]("is_complete")))
  }
}
