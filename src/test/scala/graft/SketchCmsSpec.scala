package graft

import org.apache.spark.sql.functions._

import graft.plans.{CountMin, Sketch}

/** Count-Min sketch: bounded grid, elementwise merge, never
  * under-counts, SQL exposure. */
class SketchCmsSpec extends SparkSpec {
  import spark.implicits._

  test("cms never under-counts and is exact without collisions") {
    // 8 distinct items with known multiplicities, tiny corpus: with
    // w=1024 collisions among 8 items are possible but estimates must
    // always be >= true count; for each item est(min over 4 rows) is
    // exact unless it collides in ALL rows
    val items = (1L to 8L).flatMap(i => Seq.fill(i.toInt)(i))
    val df = items.toDF("v")
      .agg(Sketch.countMin($"v").as("cms")).select(explode($"cms").as("c"))
    val total = df.agg(sum($"c")).head().getLong(0)
    assert(total == items.length.toLong * CountMin.D,
      "every update must increment exactly one counter per row")
    val est = items.distinct.map { i =>
      val buckets = (0 until CountMin.D).map(j => j * 1024 + CountMin.bucket(j, i, 1024))
      val grid = items.toDF("v").agg(Sketch.countMin($"v").as("cms"))
        .select($"cms").head().getSeq[Long](0)
      i -> buckets.map(grid).min
    }.toMap
    est.foreach { case (i, e) => assert(e >= i, s"item $i under-counted: $e") }
  }

  test("q_cms_topterms estimates dominate the exact document frequencies") {
    val out = graft.operators.TextAnalysis.cmsTopTerms(spark, sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"term ${r.getString(0)}: cms ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
  }

  test("the sketch aggregates through partial merge with a fixed-size buffer") {
    // many partitions force partial buffers + merge; the result array
    // stays exactly D*w regardless of input cardinality
    val big = spark.range(0, 10000, 1, 16)
      .agg(Sketch.countMin($"id", 64).as("cms")).head().getSeq[Long](0)
    assert(big.length == CountMin.D * 64)
    assert(big.sum == 10000L * CountMin.D)
  }

  test("graft_cms resolves in SQL with a literal width") {
    val r = spark.sql(
      "SELECT graft_cms(CAST(v AS BIGINT), 32) AS cms FROM VALUES (1), (1), (2) AS t(v)")
      .select(size($"cms")).head()
    assert(r.getInt(0) == CountMin.D * 32)
  }

  test("containment scores a short doc quoted inside a long one near 1.0") {
    val quote = "the exact quoted passage that appears verbatim inside the longer document"
    val long_ = s"preamble material first $quote and then a very long trailing discussion " +
      "of completely unrelated topics stretching the union far beyond the intersection"
    val docs = Seq((1L, quote), (2L, long_), (3L, "entirely different text"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_cont").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val cont = graft.operators.Dedup.containment(spark, dir)
      .filter($"doc_a" === 1L && $"doc_b" === 2L)
      .select($"containment").head().getDouble(0)
    val jacc = graft.operators.Dedup.ngram(spark, dir)
      .filter($"doc_a" === 1L && $"doc_b" === 2L)
      .select($"jaccard").head().getDouble(0)
    assert(cont > 0.95, s"short-in-long containment should be ~1, got $cont")
    assert(jacc < 0.6, s"jaccard under-scores the same pair ($jacc) — why containment exists")
  }
}
