package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

import graft.operators.{Dedup, Relational, Skew}
import graft.plans.Frame
import graft.streaming.StreamRelay

/** Round-2 hardening: malformed-input null safety, analysis-time type
  * checking, skew-bounded aggregation buffers, deterministic salting,
  * plan-shape regression guards, and the live (unbounded-source)
  * relay variant. */
class Round2Spec extends SparkSpec {
  import spark.implicits._

  // --- null-safe frame codec ------------------------------------------------

  test("UnpackFrame yields null (not an exception) on corrupt frames") {
    val df = Seq(
      ("good", 1L, 1600000000L),
      ("bad", 2L, 1600000001L)
    ).toDF("tag", "device", "ts")
      .withColumn("frame",
        when($"tag" === "good",
          Frame.pack($"device", $"ts", array_repeat(lit(5L), 7)))
          .otherwise(lit("definitely-not-a-frame".getBytes)))
      .withColumn("parsed", Frame.unpack($"frame"))
    val rows = df.select($"tag", $"parsed").collect()
    val good = rows.find(_.getString(0) == "good").get
    val bad = rows.find(_.getString(0) == "bad").get
    assert(!good.isNullAt(1), "valid frame must parse")
    assert(bad.isNullAt(1), "corrupt frame must quarantine as null")
    // the side-aggregate reject count a 100 TB ingest would keep
    val rejects = df.agg(count(when($"parsed".isNull, 1))).head().getLong(0)
    assert(rejects == 1L)
  }

  test("PackFrame round-trips int32/int16 boundary values, nulls beyond them") {
    val df = Seq(
      (Int.MaxValue.toLong, Int.MinValue.toLong, Short.MaxValue.toLong, "edge"),
      (Int.MaxValue.toLong + 1L, 0L, 0L, "device_over"),
      (0L, Int.MinValue.toLong - 1L, 0L, "ts_under"),
      (0L, 0L, Short.MaxValue.toLong + 1L, "sample_over")
    ).toDF("device", "ts", "sample", "tag")
      .withColumn("frame", Frame.pack($"device", $"ts", array_repeat($"sample", 7)))
      .withColumn("parsed", Frame.unpack($"frame"))
    val byTag = df.collect().map(r => r.getAs[String]("tag") -> r).toMap
    assert(!byTag("edge").isNullAt(byTag("edge").fieldIndex("frame")))
    val p = byTag("edge").getStruct(byTag("edge").fieldIndex("parsed"))
    assert(p.getInt(0) == Int.MaxValue && p.getInt(1) == Int.MinValue)
    assert(p.getSeq[Int](2).forall(_ == Short.MaxValue.toInt))
    Seq("device_over", "ts_under", "sample_over").foreach { t =>
      assert(byTag(t).isNullAt(byTag(t).fieldIndex("frame")),
        s"$t must null out, not wrap")
    }
  }

  // --- analysis-time type checking ------------------------------------------

  test("graft_* SQL functions reject mis-typed arguments at analysis time") {
    // array<double> where array<float> is required: would read 8-byte
    // slots as floats and return garbage if allowed through
    intercept[AnalysisException] {
      spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").collect()
    }
    // non-string into the polynomial hash
    intercept[AnalysisException] {
      spark.sql("SELECT graft_poly_hash(42)").collect()
    }
    // long array into minhash (expects array<string>)
    intercept[AnalysisException] {
      spark.sql("SELECT graft_minhash(array(1L, 2L))").collect()
    }
  }

  // --- skew-bounded ngram index ----------------------------------------------

  test("dedup_ngram drops hot grams before building doc lists") {
    // 40 docs in 20 designed pairs: every doc carries the stop-gram
    // "zzzz" (df = 40 > cap) plus a 4-char tag shared only by its
    // pair partner. With the cap at 10, candidate pairs can only come
    // from rare grams — the hot gram must contribute nothing.
    val tmp = java.nio.file.Files.createTempDirectory("ngram_skew_").toString
    val docs = (0 until 40).map { i =>
      val tag = ('a' + i / 2).toChar.toString * 4
      (i.toLong, s"zzzz $tag u${i}v")
    }
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.ngram(spark, tmp, maxBucket = 10).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(a / 2 == b / 2 && b == a + 1,
        s"pair ($a,$b) must only arise from its rare pair tag, not the hot gram")
    }
  }

  // --- deterministic salting --------------------------------------------------

  test("saltedJoin is deterministic across runs and spreads a hot key") {
    val fact = (0 until 1000).map(i => (1L, i.toLong)).toDF("k", "payload")
    val dim = Seq((1L, "only")).toDF("k", "name")
    val run1 = Skew.saltedJoin(fact, dim, "k").orderBy("payload").collect()
    val run2 = Skew.saltedJoin(fact, dim, "k").orderBy("payload").collect()
    assert(run1.sameElements(run2), "row-content salt must be retry-stable")
    assert(run1.length == 1000)
    // same salt expression as Skew.saltedJoin: hot key spreads out
    val nBuckets = fact
      .select(pmod(hash(fact.columns.map(col): _*), lit(16)).as("salt"))
      .distinct().count()
    assert(nBuckets > 1, "a hot key's rows must land in multiple buckets")
  }

  // --- plan-shape regression guards -------------------------------------------

  private def formattedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("headline queries keep whole-stage codegen and parquet filter pushdown") {
    Seq(
      "q1_agg" -> Relational.q1Agg(spark, sf),
      "q3_topk" -> Relational.q3TopK(spark, sf),
      "q5_multijoin" -> Relational.q5MultiJoin(spark, sf)
    ).foreach { case (name, df) =>
      val formatted = formattedPlan(df)
      assert("PushedFilters: \\[[^\\]]".r.findFirstIn(formatted).isDefined,
        s"$name lost parquet filter pushdown:\n$formatted")
      df.collect()
      // "*(n)" is the WholeStageCodegen stage marker in plan strings
      val executed = df.queryExecution.executedPlan.toString
      assert("\\*\\(\\d+\\)".r.findFirstIn(executed).isDefined,
        s"$name fell out of whole-stage codegen:\n$executed")
    }
  }

  test("ivf search reaches the index through a broadcast probe join") {
    val plan = formattedPlan(graft.operators.Similarity.ivfTopK(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"probe set must broadcast, never shuffle the inverted index:\n$plan")
  }

  test("q5 dimension joins broadcast") {
    val plan = formattedPlan(Relational.q5MultiJoin(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("native hash expressions stay inside whole-stage codegen") {
    val df = graft.sources.Tables.documents(spark, sf)
      .select(graft.functions.HashFns.polyHash($"text").as("h"))
      .groupBy($"h").count()
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\)".r.findFirstIn(executed).isDefined, executed)
    // the native expression itself must sit inside a codegen stage,
    // not on a CodegenFallback island
    assert("\\*\\(\\d+\\) Project \\[polyhashstr".r.findFirstIn(executed).isDefined, executed)
  }

  // --- live (unbounded) relay source ------------------------------------------

  test("frame relay ingests from an unbounded rate source across >=2 triggers") {
    // the reference's live port-read loop (main.lua rs232 reads): an
    // unbounded source emits duplicate-heavy frames; the SAME
    // parseAndThrottle plan used by the file-backed ingest throttles
    // them to 1 Hz per device with a real trigger cadence
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "2000").load()
    val frames = rate.select(
      Frame.pack($"value" % 3, lit(1600000000L) + ($"value" / 30L).cast(LongType),
        array_repeat(lit(1L), 7)).as("frame"))
    val throttled = StreamRelay.parseAndThrottle(frames)
    val q = throttled.writeStream.outputMode("append").format("memory")
      .queryName("rate_ingest").trigger(Trigger.ProcessingTime(250)).start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (System.currentTimeMillis() < deadline &&
        q.recentProgress.count(_.numInputRows > 0) < 2) Thread.sleep(200)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "expected at least two non-empty micro-batches from the rate source")
    } finally q.stop()
    val out = spark.table("rate_ingest")
    assert(out.count() > 0)
    val dupes = out.groupBy("device", "ts_secs").count().filter($"count" > 1).count()
    assert(dupes == 0, "1 Hz throttle must hold across micro-batches")
  }
}
