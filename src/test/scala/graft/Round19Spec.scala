package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Telemetry}

/** Round-8 additions: OPQ rotation training, the IVF-OPQ-PQ search
  * composition, and the streaming dispersion twin. */
class Round19Spec extends SparkSpec {
  import spark.implicits._

  test("ann_opq: every (vector, subspace) coded; codes within the codebook") {
    val rows = Similarity.opqTrain(spark, sf).collect()
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.length == n * 4, "one row per (vector, subspace)")
    rows.foreach { r =>
      val (c1, code) = (r.getAs[Long]("c1"), r.getAs[Long]("code"))
      assert(c1 >= 0 && c1 < 16 && code >= 0 && code < 16)
      assert(r.getAs[Boolean]("moved") == (c1 != code))
    }
  }

  test("ann_ivfopq: coarse IVF probes match ann_ivfpq's (a rotation never changes cosine)") {
    def topk(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk")) ->
        r.getAs[Long]("neighbor_id")).toMap
    val opq = Similarity.ivfopqTopK(spark, sf)
    val got = topk(opq)
    assert(got.nonEmpty)
    // exactly k ranks per query, ranks dense from 1
    got.keys.groupBy(_._1).foreach { case (_, ks) =>
      assert(ks.map(_._2).toSeq.sorted == (1L to ks.size).toSeq)
    }
    // distances non-decreasing in rank per query
    val byQ = opq.collect().groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("approx_dist"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
  }

  test("stream_dispersion equals the batch events_dispersion result") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("n_hours"), r.getAs[Long]("sx"), r.getAs[Long]("sxx"),
        r.getAs[Long]("vmr_num"), r.getAs[Long]("vmr_den"),
        r.getAs[Boolean]("over_dispersed"))).sortBy(_._1).toSeq
    val batch = canon(Telemetry.dispersion(spark, sf))
    val streamed = canon(graft.streaming.StreamXcorr.streamedDispersion(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }

  test("streaming twins survive NULL-keyed telemetry (the adversarial-corpus contract)") {
    // a miniature corpus with NULL user_id / event_type / value rows:
    // the Option-typed encoders must process them (not NPE), and the
    // null-user session partition must come through like the batch
    // window's
    val tmp = java.nio.file.Files.createTempDirectory("nulls_").toString
    val rows = Seq[(java.lang.Long, java.sql.Timestamp, java.lang.Long, String, java.lang.Double, String)](
      (0L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0, "{\"k\": 1}"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), null, "view", 2.0, "{\"k\": 2}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), null, null, null, null),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 13:00:00"), 1L, "purchase", null, "{\"k\": 3}"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 14:00:00"), 2L, "error", 4.0, "{\"k\": 77}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val sess = graft.streaming.StreamSessions.streamedSessions(spark, tmp).collect()
    assert(sess.exists(_.isNullAt(0)), "null-user session partition must emit")
    val cdc = graft.streaming.StreamCdc.streamedCdc(spark, tmp).collect()
    assert(cdc.exists(_.isNullAt(0)), "null-user CDC key must compact")
    // null upsert value carried verbatim by latest-wins (event 3)
    assert(cdc.find(r => !r.isNullAt(0) && r.getLong(0) == 1L).exists(_.isNullAt(1)))
    val ttl = graft.streaming.StreamTtl.streamedTtl(spark, tmp).collect()
    assert(ttl.exists(_.isNullAt(0)), "null-type TTL stream must classify")
  }

  test("stream_xcorr equals the batch ts_xcorr result") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getAs[String]("type_a"), r.getAs[String]("type_b"), r.getAs[Long]("lag_h")),
        (r.getAs[Long]("n_hours"), r.getAs[Long]("num"),
          r.getAs[Long]("den_x"), r.getAs[Long]("den_y")))).toMap
    val batch = canon(Telemetry.xcorr(spark, sf))
    val streamed = canon(graft.streaming.StreamXcorr.streamedXcorr(spark, sf))
    assert(batch.nonEmpty && batch == streamed)
  }
}
