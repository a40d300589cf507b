package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Round-8 hardening: hot-bucket caps on every LSH candidate tier
  * (minhash bands, hyperplane signatures) and the adaptive
  * hyperplane-signature width — the properties that keep candidate
  * generation linear on a duplicate-heavy 100 TB crawl. */
class Round18Spec extends SparkSpec {
  import spark.implicits._

  /** A corpus of `nClones` identical documents (every band bucket
    * hot) plus one designed near-duplicate pair that only meets in
    * rare buckets. */
  private def cloneCorpus(nClones: Int): String = {
    val tmp = java.nio.file.Files.createTempDirectory("minhash_skew_").toString
    val clone = "the same crawl page scraped over and over again forever"
    val docs =
      (0 until nClones).map(i => (i.toLong, clone)) ++
        Seq((9000L, "rare unique alpha beta gamma delta epsilon zeta eta theta"),
            (9001L, "rare unique alpha beta gamma delta epsilon zeta eta iota"))
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("dedup_minhash: a 1000-identical-doc bucket is stop-banded, pairs stay bounded") {
    val tmp = cloneCorpus(1000)
    // uncapped, the clones alone would emit C(1000,2) = 499500 pairs;
    // the stop-band drops every hot band key, so only the rare pair
    // (which shares >= 1 band through its 8-shingle overlap) can meet
    val pairs = Dedup.minhash(spark, tmp).collect()
    assert(pairs.length <= 1,
      s"expected at most the designed rare pair, got ${pairs.length}")
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") == 9000L && r.getAs[Long]("doc_b") == 9001L)
    }
  }

  test("dedup_minhash_est: same stop-band bound on the single-scan variant") {
    val tmp = cloneCorpus(1000)
    val pairs = Dedup.minhashEstimate(spark, tmp).collect()
    assert(pairs.length <= 1)
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") == 9000L && r.getAs[Long]("doc_b") == 9001L)
    }
  }

  test("dedup_minhash: cap leaves a benign corpus's pair set intact") {
    // at sf0.001 no band bucket is hot (each key < 200 members), so
    // the capped operator must equal the uncapped formulation
    val capped = Dedup.minhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.nonEmpty)
  }

  test("adaptivePlanes: smallest p with 2^p*200 >= N, clamped to [4,24]") {
    assert(Similarity.adaptivePlanes(spark, sf) == 4) // N=500 at sf0.001
    // formula check without a corpus: replicate the predicate
    def planesFor(n: Long): Int =
      (4 to 24).find(p => (1L << p) * 200L >= n).getOrElse(24)
    assert(planesFor(500L) == 4)
    assert(planesFor(3200L) == 4)      // 16*200 boundary inclusive
    assert(planesFor(3201L) == 5)
    assert(planesFor(1000000000L) == 23)
    assert(planesFor(Long.MaxValue) == 24)
  }

  test("sigBuckets: a >800-clone signature bucket is dropped; survivors keep theirs") {
    val tmp = java.nio.file.Files.createTempDirectory("sig_skew_").toString
    // 900 identical embeddings (one hot bucket) + 50 distinct ones
    val base = Array.tabulate(64)(i => 0.5f + 0.001f * i)
    val rows =
      (0 until 900).map(i => (i.toLong, base.toSeq)) ++
        (0 until 50).map(i =>
          (1000L + i, Array.tabulate(64)(d =>
            math.sin(0.1 * (i * 64 + d)).toFloat).toSeq))
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")
    val kept = Similarity.sigBuckets(spark, tmp).select($"vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(!kept.exists(_ < 900L), "hot clone bucket must be stop-banded")
    // per-bucket width bound holds for everything that survives
    val widths = Similarity.sigBuckets(spark, tmp)
      .groupBy($"sig").count().collect().map(_.getLong(1))
    assert(widths.forall(_ <= 800L))
  }

  test("lshTopK/embed at sf: unchanged by the adaptive width (resolves to 4 planes)") {
    // N=500 -> planes=4, no bucket near the 800 cap: the adaptive
    // operator must produce the same neighbor set as the fixed-width
    // formulation it replaced
    val got = Similarity.lshTopK(spark, sf).collect()
    assert(got.nonEmpty)
    val sigs = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", graft.functions.VecFns.lshSignature($"embedding", 4).as("sig"))
    val buckets = sigs.groupBy($"sig").count().collect().map(_.getLong(1))
    assert(buckets.forall(_ <= 800L), "no cap interference expected at sf0.001")
  }
}
