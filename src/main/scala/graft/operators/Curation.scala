package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.TextFns
import graft.sources.Tables

/** Corpus-curation operators a large-scale training-data pipeline
  * runs beyond per-document scoring: per-source volume caps,
  * corpus-wide span-level deduplication, and the bloom-prefiltered
  * decontamination scale path.
  */
object Curation {

  /** Per-source corpus cap (the CommonCrawl-style per-domain quota):
    * keep the top `perSource` documents of every source ranked by a
    * quality score (token count; ties break to the smaller doc_id).
    *
    * Scale shape: top-k per group via TWO bounded stages instead of
    * one window over the raw corpus — a single `Window.partitionBy
    * (source)` puts every document of a hot source into ONE task
    * (classic skew: at 100 TB a big domain is billions of rows), so
    * stage 1 takes the per-(source, input-partition) top-k (the
    * shuffle to (source, partition) spreads a hot source over every
    * input split, keys are balanced by construction) and stage 2
    * ranks only the ≤ k-per-partition survivors. Global top-k of
    * per-partition top-ks is exactly the corpus top-k. */
  def corpusCap(spark: SparkSession, dir: String, perSource: Int = 20): DataFrame = {
    import spark.implicits._
    val scored = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        size(TextFns.tokens($"text")).cast(LongType).as("score"))
    val local = Window.partitionBy($"source", $"pid")
      .orderBy($"score".desc, $"doc_id".asc)
    val global = Window.partitionBy($"source")
      .orderBy($"score".desc, $"doc_id".asc)
    scored
      .withColumn("pid", spark_partition_id())
      .withColumn("lrn", row_number().over(local))
      .filter($"lrn" <= perSource)
      .withColumn("rnk", row_number().over(global).cast(LongType))
      .filter($"rnk" <= perSource)
      .select($"source", $"doc_id", $"score", $"rnk")
  }

  /** Corpus-wide span-level exact dedup (the CCNet/RefinedWeb "line
    * dedup" pass, over fixed `chunkTokens`-token chunks because the
    * synthetic corpus has no newlines): every chunk keeps only its
    * FIRST occurrence — (doc_id, chunk_idx)-lexicographic minimum —
    * and each document is reassembled from its surviving chunks.
    * Boilerplate repeated across documents (headers, navigation,
    * license blocks) disappears corpus-wide while one copy survives.
    *
    * Two shuffles, both ∝ corpus tokens: first-occurrence election
    * partitions by the chunk itself (at 100 TB the key would be a
    * 128-bit chunk hash to keep exchange rows narrow — equality
    * semantics identical sans astronomically-unlikely collisions),
    * then reassembly groups by doc_id. Chunking is scan-local
    * (`slice` over the token array, no per-token explode). Documents
    * whose every chunk loses are dropped entirely — consistent with
    * the oracle. */
  def dedupLines(spark: SparkSession, dir: String, chunkTokens: Int = 10): DataFrame = {
    import spark.implicits._
    val toks = TextFns.tokens($"text")
    val nChunks = ceil(size(toks) / lit(chunkTokens.toDouble)).cast("int")
    val chunks = Tables.documents(spark, dir)
      .select($"doc_id",
        transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(toks, i * chunkTokens + 1, lit(chunkTokens)), " ")).as("chunks"))
      .select($"doc_id", size($"chunks").cast(LongType).as("total_chunks"),
        posexplode($"chunks").as(Seq("cidx", "chunk")))
    val firstW = Window.partitionBy($"chunk").orderBy($"doc_id".asc, $"cidx".asc)
    chunks
      .withColumn("rn", row_number().over(firstW))
      .filter($"rn" === 1)
      .groupBy($"doc_id")
      .agg(
        array_join(transform(sort_array(collect_list(struct($"cidx", $"chunk"))),
          _.getField("chunk")), " ").as("text_dedup"),
        count(lit(1)).as("kept_chunks"),
        min($"total_chunks").as("total_chunks"))
  }

  /** Bloom-prefiltered benchmark decontamination — the 100 TB shape
    * of [[TextAnalysis.decontaminate]]: the holdout shingle set
    * aggregates into a Bloom filter INSIDE the plan (scalar subquery
    * — no driver-side collect), every corpus shingle probes the
    * broadcast filter scan-side, and only the might-contain survivors
    * reach the exact semi-join that removes false positives. The
    * result is bit-identical to the exact operator, but the join
    * input shrinks from all corpus shingles to (true matches + FP
    * rate) — at 100 TB that is the difference between shuffling the
    * corpus and shuffling a rounding error of it.
    *
    * Uses Spark's own codegen'd bloom expressions (the runtime-
    * filter machinery: BloomFilterAggregate / might_contain over
    * xxhash64). */
  def decontaminateBloom(spark: SparkSession, dir: String, holdout: Long = 50L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val sh = Tables.documents(spark, dir)
      .select($"doc_id", explode(TextFns.shingleSet($"text", 5)).as("shingle"))
    val eval_ = sh.filter($"doc_id" < holdout).select($"shingle").distinct()
    val bloom = eval_
      .agg(ColumnBridge.column(
        new BloomFilterAggregate(ColumnBridge.expression(xxhash64($"shingle")))
          .toAggregateExpression()).as("bf"))
      .scalar()
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom),
      ColumnBridge.expression(xxhash64($"shingle"))))
    sh.filter($"doc_id" >= holdout)
      .filter(mightContain)
      .join(eval_, "shingle")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shared_shingles"))
  }
}
