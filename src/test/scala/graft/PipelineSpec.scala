package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Specs for the LLM-pipeline operator families (D/E/F in SURVEY §2). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("dedup_exact covers every document exactly once") {
    val df = Dedup.exact(spark, sf)
    assert(df.agg(sum($"n_copies")).head().getLong(0) == 500L)
  }

  test("dedup_minhash pairs are ordered and above threshold") {
    Dedup.minhash(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Double]("jaccard") >= 0.2)
    }
  }

  test("dedup_minhash_est covers the exact variant's candidates") {
    val est = Dedup.minhashEstimate(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val exact = Dedup.minhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(exact.subsetOf(est))   // same LSH candidates, pre-threshold
    Dedup.minhashEstimate(spark, sf).collect().foreach { r =>
      val e = r.getAs[Double]("est_jaccard")
      assert(e >= 0.0 && e <= 1.0)
    }
  }

  test("dedup_clusters equals driver-computed connected components") {
    val pairs = Dedup.minhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    // independent union-find over the same pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.map(n => n -> nodes.filter(m => find(m) == find(n)).min).toMap
    val got = Dedup.clusters(spark, sf).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSet == nodes.toSet)
    got.foreach { r =>
      val (d, c) = (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"))
      assert(c == expected(d), s"doc $d: cluster $c != expected ${expected(d)}")
      assert(r.getAs[Boolean]("is_keeper") == (d == c))
      assert(r.getAs[Long]("cluster_size") == expected.values.count(_ == c))
    }
  }

  test("dedup_clusters merges transitive chains without a direct pair") {
    // docs 1-2-3 are near-identical (pairwise LSH hits), 4-5 a
    // separate pair, 6 unrelated: components {1,2,3} and {4,5}
    val tmp = java.nio.file.Files.createTempDirectory("clusters_").toString
    val base = "the quick brown fox jumps over the lazy dog again and again number"
    Seq(
      (1L, s"$base one"), (2L, s"$base two"), (3L, s"$base three"),
      (4L, "completely different corpus text repeated here verbatim yes"),
      (5L, "completely different corpus text repeated here verbatim yes indeed"),
      (6L, "nothing shares any shingle with this solitary document at all ok")
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val got = Dedup.clusters(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(got(1L) == (1L, 3L) && got(2L) == (1L, 3L) && got(3L) == (1L, 3L))
    assert(got(4L) == (4L, 2L) && got(5L) == (4L, 2L))
  }

  test("dedup_clusters and dedup_apply handle a corpus with no duplicates") {
    val tmp = java.nio.file.Files.createTempDirectory("clean_").toString
    (1 to 6).map(i => (i.toLong, s"alpha$i beta$i gamma$i delta$i epsilon$i", "en", "test", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    assert(Dedup.clusters(spark, tmp).count() == 0, "clean corpus has no clusters")
    assert(Dedup.applyDedup(spark, tmp).count() == 6, "clean corpus survives intact")
  }

  test("dedup_apply keeps exactly keepers plus never-paired docs") {
    val clusters = Dedup.clusters(spark, sf).collect()
    val losers = clusters.filterNot(_.getAs[Boolean]("is_keeper"))
      .map(_.getAs[Long]("doc_id")).toSet
    val kept = Dedup.applyDedup(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(kept.size == 500 - losers.size)
    assert(losers.forall(!kept.contains(_)))
    assert(clusters.filter(_.getAs[Boolean]("is_keeper"))
      .forall(r => kept.contains(r.getAs[Long]("doc_id"))))
  }

  test("dedup_simhash hamming bounded by band structure") {
    Dedup.simhash(spark, sf).collect().foreach { r =>
      val h = r.getAs[Long]("hamming")
      assert(h >= 0 && h <= 12)
    }
  }

  test("dedup_ngram returns top-20 sorted by jaccard") {
    val rows = Dedup.ngram(spark, sf).collect()
    assert(rows.length <= 20)
    val js = rows.map(_.getAs[Double]("jaccard"))
    assert(js.sameElements(js.sortBy(-_)))
  }

  test("dedup_embed cosine within [-1, 1] and >= 0.35") {
    Dedup.embed(spark, sf).collect().foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= 0.35 && c <= 1.0)
    }
  }

  test("ann_brute yields exactly top-5 per query") {
    val df = Similarity.bruteTopK(spark, sf)
    val counts = df.groupBy($"query_id").count().collect()
    assert(counts.length == 10)
    counts.foreach(r => assert(r.getAs[Long]("count") == 5L))
    // scores descend within each query
    df.orderBy($"query_id", $"rnk").collect().grouped(5).foreach { g =>
      val cs = g.map(_.getAs[Double]("cosine"))
      assert(cs.sameElements(cs.sortBy(-(_: Double))))
    }
  }

  test("ann_ivf stays within brute-force scores and keeps useful recall") {
    val ivf = Similarity.ivfTopK(spark, sf).collect()
    val perQ = ivf.groupBy(_.getAs[Long]("query_id"))
    assert(perQ.size == 10 && perQ.values.forall(_.length <= 5))
    val brute = Similarity.bruteTopK(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
    perQ.foreach { case (q, rows) =>
      val best = rows.map(_.getAs[Double]("cosine")).max
      val bruteBest = brute(q).map(_.getAs[Double]("cosine")).max
      assert(best <= bruteBest + 1e-12, "approximate search cannot beat exact")
    }
    val hits = perQ.map { case (q, rows) =>
      val exact = brute(q).map(_.getAs[Long]("neighbor_id")).toSet
      rows.map(_.getAs[Long]("neighbor_id")).count(exact)
    }.sum
    assert(hits.toDouble / 50.0 > 0.2, s"recall ${hits / 50.0} too low for nProbe=4/16")
  }

  test("ann_lsh neighbors share the query's signature bucket (<=3 each)") {
    val df = Similarity.lshTopK(spark, sf)
    assert(df.groupBy($"query_id").count().filter($"count" > 3).isEmpty)
  }

  test("text_langid predicts only known languages") {
    val langs = TextAnalysis.langId(spark, sf)
      .select($"pred_lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("de", "en", "es", "fr", "zh", "und")))
  }

  test("text_quality ratios are in [0, 1]") {
    TextAnalysis.quality(spark, sf).collect().foreach { r =>
      Seq("punct_ratio", "digit_ratio", "stop_ratio").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c = $v")
      }
    }
  }

  test("text_tokens counts are consistent") {
    TextAnalysis.tokenCounts(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_sub_tokens") >= r.getAs[Long]("n_ws_tokens"))
    }
  }

  test("text_topterms is sorted by document frequency") {
    val rows = TextAnalysis.topTerms(spark, sf).collect()
    assert(rows.length == 20)
    val freqs = rows.map(_.getAs[Long]("doc_freq"))
    assert(freqs.sameElements(freqs.sortBy(-(_: Long))))
  }

  test("text_tfidf yields one top term per document") {
    val df = TextAnalysis.tfidf(spark, sf)
    assert(df.count() == 500)
    assert(df.select($"doc_id").distinct().count() == 500)
  }

  test("q_pivot counts reconcile with totals") {
    val rows = graft.operators.Relational.qPivot(spark, sf).collect()
    rows.foreach { r =>
      val parts = Seq("n_click", "n_error", "n_purchase", "n_signup", "n_view")
        .map(r.getAs[Long]).sum
      assert(parts == r.getAs[Long]("n_total"))
    }
  }

  test("sample_strata is deterministic and roughly the target rate") {
    val a = TextAnalysis.sampleStrata(spark, sf).collect().map(_.getLong(0)).toSet
    val b = TextAnalysis.sampleStrata(spark, sf).collect().map(_.getLong(0)).toSet
    assert(a == b)                       // reproducible subset
    assert(a.size > 50 && a.size < 150)  // ~20% of 500
  }

  test("decontaminate only flags training docs") {
    val rows = TextAnalysis.decontaminate(spark, sf).collect()
    assert(rows.nonEmpty)   // this corpus is known to contain overlap
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") >= 50L)
      assert(r.getAs[Long]("n_shared_shingles") >= 1L)
    }
  }

  test("text_repetition scores boilerplate above varied text") {
    val scores = TextAnalysis.repetition(spark, sf).collect()
    assert(scores.length == 500)
    scores.foreach { r =>
      val f = r.getAs[Double]("top_gram_frac")
      assert(f > 0.0 && f <= 1.0)
      assert(r.getAs[Long]("n_grams") > 0)
    }
    // synthetic contrast: pure repetition ~1.0, varied text far lower
    val tmp = java.nio.file.Files.createTempDirectory("rep_").toString
    Seq((1L, "abab" * 50), (2L, ('a' to 'z').mkString(" ")))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val m = TextAnalysis.repetition(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("top_gram_frac")).toMap
    assert(m(1L) > 0.4 && m(1L) > m(2L) * 3)
  }

  test("text_redact masks every occurrence") {
    val df = TextAnalysis.redact(spark, sf)
    assert(df.filter($"redacted".contains("customer")).isEmpty)
    assert(df.filter($"n_redactions" > 0).count() > 0)
  }

  test("text_fingerprint hashes are within the modulus") {
    TextAnalysis.fingerprint(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("full_hash") >= 0 && r.getAs[Long]("full_hash") < 1000000007L)
      assert(r.getAs[Long]("min_kgram_hash") < 1000000007L)
    }
  }
}
