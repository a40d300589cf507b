package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text primitives for the LLM-pipeline operators. All codegen'd
  * built-ins / higher-order functions; engine-portable semantics
  * (1-based substring, regex whitespace split) so the DuckDB oracle
  * can restate them exactly.
  */
object TextFns {
  /** Whitespace tokens of the lowercased text. */
  def tokens(c: Column): Column = split(lower(c), "\\s+")

  /** w-token shingles joined by single spaces; whole text if fewer
    * than w tokens. */
  def tokenShingles(c: Column, w: Int = 3): Column = {
    val t = tokens(c)
    when(size(t) >= w,
      transform(sequence(lit(0), size(t) - w),
        i => concat_ws(" ", (0 until w).map(k => element_at(t, i + k + 1)): _*)))
      .otherwise(array(concat_ws(" ", t)))
  }

  /** Distinct character n-grams of the lowercased text — native
    * single-pass (graft.plans.CharNGramSet). */
  def charNGrams(c: Column, n: Int = 4): Column =
    graft.plans.TextExprs.charNGramSetCol(c, n)

  /** The composed HOF definition of the same n-gram set (the shape
    * the DuckDB oracle evaluates); retained to assert native parity. */
  def charNGramsHof(c: Column, n: Int = 4): Column = {
    val lc = lower(c)
    array_distinct(
      when(length(lc) >= n,
        transform(sequence(lit(1), length(lc) - n + 1), i => substring(lc, i, lit(n))))
        .otherwise(array(lc)))
  }

  /** Distinct w-token shingles — native single-pass equivalent of
    * array_distinct(tokenShingles(c, w)). */
  def shingleSet(c: Column, w: Int = 3): Column =
    graft.plans.TextExprs.shingleSetCol(c, w)

  /** Jaccard similarity of two pre-distinct arrays, as an exact
    * int/int division in double. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast(DoubleType) / (size(a) + size(b) - inter).cast(DoubleType)
  }

  /** Per-language marker stopwords for the n-gram language heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die", "nicht", "das"),
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de", "shi", "le", "wo", "bu"),
  )

  /** Count of tokens that appear in the marker set. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => markers.map(m => t === m).reduce(_ || _)))

  /** Simple token-count of regex word/number/punct units ("BPE-ish"). */
  val subTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
}
