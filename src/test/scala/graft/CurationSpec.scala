package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Curation, Similarity, TextAnalysis}

/** Round-4 curation operators: per-source caps, span-level dedup,
  * bloom-prefiltered decontamination, distributed k-means. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def formattedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  // --- corpus_cap -----------------------------------------------------------

  test("two-stage corpus cap equals the single-window top-k") {
    val twoStage = Curation.corpusCap(spark, sf, perSource = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        size(split(lower($"text"), "\\s+")).cast("long").as("score"))
    val w = Window.partitionBy($"source").orderBy($"score".desc, $"doc_id".asc)
    val oneWindow = docs.withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 7)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3))).toSet
    assert(twoStage == oneWindow)
    assert(twoStage.nonEmpty)
  }

  test("corpus cap survives an engineered hot source") {
    // one source with 50x the docs of the others: the two-stage shape
    // must still return exactly the global top-k with global ranks
    val hot = (1L to 500L).map(i => (i, "hot", ("tok " * ((i % 40).toInt + 1)).trim))
    val cold = (1000L to 1009L).map(i => (i, s"cold${i % 3}", "a b c d e"))
    val dir = java.nio.file.Files.createTempDirectory("graft_cap").toString
    (hot ++ cold).toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en")).withColumn("n_chars", length($"text").cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val out = Curation.corpusCap(spark, dir, perSource = 5)
    val byGroup = out.groupBy($"source").agg(count(lit(1)).as("n"), max($"rnk").as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byGroup("hot") == ((5L, 5L)))
    // hot's winners are the 5 longest docs (score 40, ids ascending)
    val hotIds = out.filter($"source" === "hot").orderBy($"rnk")
      .select($"doc_id").as[Long].collect().toSeq
    assert(hotIds == Seq(39L, 79L, 119L, 159L, 199L), hotIds.toString)
  }

  // --- dedup_lines ----------------------------------------------------------

  test("span dedup keeps first occurrences and reassembles documents in order") {
    val chunkA = (1 to 10).map(i => s"a$i").mkString(" ")
    val chunkB = (1 to 10).map(i => s"b$i").mkString(" ")
    val chunkC = (1 to 10).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"$chunkA $chunkB"),        // both first occurrences
      (2L, s"$chunkC $chunkA"),        // keeps C (pos 0), loses A (pos 1)
      (3L, chunkA)                     // fully duplicated -> dropped
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_lines").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val out = Curation.dedupLines(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((s"$chunkA $chunkB", 2L, 2L)))
    assert(out(2L) == ((chunkC, 1L, 2L)))
    assert(!out.contains(3L), "a fully-duplicated document must drop")
  }

  // --- corpus_pack ----------------------------------------------------------

  test("pack offsets equal the naive global prefix sum; boundaries detected") {
    val packed = Curation.corpusPack(spark, sf, ctx = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    val naiveW = Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val naive = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", size(split(lower($"text"), "\\s+")).cast("long").as("n"))
      .withColumn("start", coalesce(sum($"n").over(naiveW), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(naive.nonEmpty)
    naive.foreach { case (id, n, start) =>
      val (gotStart, packId, off, spans) = packed(id)
      assert(gotStart == start, s"doc $id: start $gotStart != $start")
      assert(packId == start / 64 && off == start % 64)
      assert(spans == ((start + n - 1) / 64 > start / 64))
    }
    // the corpus straddles many packs, so some doc must span
    assert(packed.values.exists(_._4) && packed.values.exists(!_._4))
  }

  test("pack prefix sum shuffles the corpus once, by block — and survives task merging") {
    val df = Curation.corpusPack(spark, sf)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    // corpus-side window clusters by the data-derived block key...
    assert(executed.contains("hashpartitioning(block"), executed)
    // ...and the only single-partition exchange is the tiny per-block
    // totals window (rows ∝ blocks); the corpus never global-sorts
    assert(executed.contains("Exchange SinglePartition"), executed)
    assert(!executed.contains("rangepartitioning"),
      s"corpus must not pay a global range sort:\n$executed")
    // regression: offsets keyed on physical partition ids broke under
    // a downstream coalesce(1) (Verify's dump shape) — task merging
    // collapses partition ids while per-parent folds still reset
    val plain = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val merged = Curation.corpusPack(spark, sf).coalesce(1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(merged == plain, "offsets must be identical under coalesce(1)")
  }

  // --- source_mix / corpus_shard --------------------------------------------

  test("mixture sampling rates apply per language") {
    val out = Curation.sourceMix(spark, sf)
    val got = out.groupBy($"lang").agg(max($"target_pct")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (lang, pct) =>
      val want = Map("en" -> 50L, "de" -> 30L, "fr" -> 20L).getOrElse(lang, 10L)
      assert(pct == want, s"$lang sampled at $pct, want $want")
    }
    assert(out.filter($"bucket" >= $"target_pct").count() == 0)
  }

  test("epoch multipliers replicate and subsample per language deterministically") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .withColumn("bucket", pmod(graft.functions.HashFns.polyHash($"text"), lit(100L)))
      .select($"doc_id", $"lang", $"bucket").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val copies = Curation.corpusEpochs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    docs.foreach { case (id, (lang, bucket)) =>
      val expect = lang match {
        case "en" => 2L
        case "de" => if (bucket < 50) 2L else 1L
        case "fr" => if (bucket < 30) 1L else 0L
        case _ => 1L
      }
      val got = copies.getOrElse(id, Seq.empty)
      assert(got == (1L to expect), s"doc $id ($lang, bucket $bucket): $got")
    }
    // the corpus genuinely exercises both replication and subsampling
    assert(copies.values.exists(_.length == 2) &&
      docs.exists { case (id, (l, b)) => l == "fr" && b >= 30 && !copies.contains(id) })
  }

  test("shard assignment is a deterministic permutation: every doc exactly once") {
    val out = Curation.corpusShard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(out.length == n)
    assert(out.map(_._1).distinct.length == n)
    // within every shard, positions are 1..size with no gaps
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard has position gaps")
    }
    val again = Curation.corpusShard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == out.toSet, "shard permutation must be reproducible")
    // the two-phase rank (hash-range buckets + broadcast bases) must
    // equal the naive per-shard window exactly
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", graft.functions.HashFns.polyHash($"text").as("h"))
      .withColumn("shard", pmod($"h", lit(16L)))
    val naiveW = Window.partitionBy($"shard").orderBy($"h".asc, $"doc_id".asc)
    val naive = docs.withColumn("pos", row_number().over(naiveW).cast("long"))
      .select($"doc_id", $"shard", $"pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == naive.toSet)
  }

  // --- decontaminate_bloom --------------------------------------------------

  test("bloom prefilter is result-invisible and present in the plan") {
    val exact = TextAnalysis.decontaminate(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = Curation.decontaminateBloom(spark, sf)
    val got = bloom.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact)
    assert(exact.nonEmpty)
    val plan = formattedPlan(bloom)
    assert(plan.contains("might_contain"),
      s"bloom probe must run scan-side before the exact join:\n$plan")
    // the filter aggregates inside the plan (scalar subquery), not on
    // the driver
    assert(plan.contains("Subquery") || plan.contains("bloom_filter_agg"), plan)
  }

  // --- embed_kmeans ---------------------------------------------------------

  test("kmeans: seeds own their clusters in round 1; assignments refine deterministically") {
    val out = Similarity.kmeans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(out.length == n)
    // every seed is its own nearest centroid in round 1
    out.filter(_._1 < 8).foreach { case (id, c1, _, _) => assert(c1 == id) }
    // moved flag is consistent
    out.foreach { case (_, c1, c2, moved) => assert(moved == (c1 != c2)) }
    // some vector moves between rounds on this corpus (centroids
    // shifted), but clusters stay within the seed label set
    assert(out.forall(r => r._3 >= 0 && r._3 < 8))
    // iters=1 must equal the round-1 assignment column
    val one = Similarity.kmeans(spark, sf, iters = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(one == out.map(r => (r._1, r._2, r._2)).toSet)
    // deterministic across runs
    val again = Similarity.kmeans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(again.toSet == out.toSet)
  }

  test("kmeans centroids broadcast in every assignment round") {
    val plan = formattedPlan(Similarity.kmeans(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"assignment passes must broadcast the centroids:\n$plan")
  }
}
