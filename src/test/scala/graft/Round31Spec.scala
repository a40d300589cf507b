package graft

import org.apache.spark.sql.functions._

/** Round 12 (r31 spec file): stream_mv_refresh — the materialized
  * view maintained live from the delta feed. */
class Round31Spec extends SparkSpec {

  test("stream_mv_refresh: deltas straddling the cut fold into ONE cell per language") {
    import graft.streaming.StreamMvRefresh
    import StreamMvRefresh.{Delta, Out}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Delta]
    val q = StreamMvRefresh.fold(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("smv_out").start()
    try {
      // batch 1: en gets a removal (-1, -40) and a revision (0, +7);
      // nothing may emit before the snapshot barrier
      mem.addData(
        Delta(Some("en"), Some(-1L), Some(-40L), sentinel = false),
        Delta(Some("en"), Some(0L), Some(7L), sentinel = false),
        Delta(None, Some(1L), Some(12L), sentinel = false))
      q.processAllAvailable()
      assert(spark.table("smv_out").count() == 0L,
        "the view cell must not flush before the snapshot barrier")
      // batch 2: en's insert (+1, +90) lands across the cut, a NULL
      // d_bytes removal contributes 0 bytes (batch SUM skip-null),
      // then sentinels flush — en must be ONE cell (0, +57)
      mem.addData(
        Delta(Some("en"), Some(1L), Some(90L), sentinel = false),
        Delta(Some("en"), Some(-1L), None, sentinel = false),
        Delta(Some("en"), None, None, sentinel = true),
        Delta(None, None, None, sentinel = true))
      q.processAllAvailable()
      val out = spark.table("smv_out").as[Out].collect().toSet
      assert(out == Set(Out(Some("en"), -1L, 57L), Out(None, 1L, 12L)),
        s"cross-batch fold must accumulate one cell per language, got $out")
    } finally q.stop()
  }

  test("ObjectHashAggregate fallback threshold is raised (small-buffer aggregates stay hash-based)") {
    // the 128-key default makes every TypedImperativeAggregate plan
    // (TopKPairs elections, KMV/CMS sketches) sort its WHOLE input
    // once a task sees >128 groups — measured at the 100x census as a
    // disk-filling spill (§6). GraftSession pins the raised value.
    assert(spark.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold") == (256 * 1024).toString)
  }

  test("stream_mv_refresh equals the batch corpus_mv_refresh (incremental == recompute)") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    val batch = canon(operators.Curation.mvRefresh(spark, sf))
    val streamed = canon(streaming.StreamMvRefresh.streamedMvRefresh(spark, sf))
    assert(batch.nonEmpty && streamed == batch,
      "the live-maintained view must be indistinguishable from the recompute")
  }
}
