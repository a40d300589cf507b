package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic pure-arithmetic hash families.
  *
  * Engine-portable by construction: every hash is integer arithmetic
  * over code points, so the DuckDB oracle can evaluate the *same*
  * function (no reliance on murmur/xxhash implementations). All ops
  * stay inside Spark's codegen'd higher-order functions — no UDFs.
  */
object HashFns {
  /** Polynomial-hash modulus (31-bit prime). */
  val P: Long = 1000000007L
  /** LSH permutation modulus (2^31 - 1, prime). */
  val P31: Long = 2147483647L
  /** Number of MinHash permutations / bands layout (16 = 4 bands × 4 rows). */
  val MinHashK = 16
  val Bands = 4
  val RowsPerBand = 4

  /** Code points of a string as longs: split("") yields one element
    * per code point and `ascii` its value — the same contract as
    * DuckDB's string_split('')+ascii(), for any Unicode text. */
  def codePoints(c: Column): Column =
    transform(split(c, ""), ch => ascii(ch).cast(LongType))

  /** Left-fold polynomial hash: h = (h*31 + code) mod P. Native
    * single-pass expression (graft.plans.PolyHashStr); `polyHashHof`
    * keeps the composed definition for equivalence tests. */
  def polyHash(c: Column): Column = graft.plans.HashExprs.polyHashCol(c, 31L, P)

  /** The shared 0..99 content-hash bucket every hash-sampled operator
    * keys on (sample_strata, source_mix, corpus_epochs, the pipeline
    * gate) — one definition so their subsets stay composable and
    * oracle restatements (`polyhash % 100`) stay valid everywhere. */
  def hashBucket(c: Column): Column = pmod(polyHash(c), lit(100L))

  /** The same hash composed from higher-order functions — the form
    * the DuckDB oracle evaluates; retained to assert native parity. */
  def polyHashHof(c: Column): Column =
    aggregate(codePoints(c), lit(0L), (h, x) => (h * 31 + x) % P)

  /** Same fold with a caller-chosen multiplier (independent family). */
  def polyHashMul(c: Column, mul: Long): Column =
    graft.plans.HashExprs.polyHashCol(c, mul, P)

  /** MinHash permutation j applied to a base hash (a_j·h + b_j mod P31).
    * Coefficients stay small so a_j·h fits int64 in both engines. */
  def perm(j: Int, h: Column): Column =
    ((lit(37L + 101L * j) * h + lit(1000003L * j + 12345L)) % P31)

  /** 16 MinHash values over an array of shingle hashes. */
  def minHashes(hashes: Column): Column =
    array((0 until MinHashK).map(j => array_min(transform(hashes, h => perm(j, h)))): _*)

  /** 16 MinHash values straight from the shingle strings — native
    * single-pass (graft.plans.MinHashArr), same values as
    * minHashes(transform(shingles, polyHash)). */
  def minHashesNative(shingles: Column): Column =
    graft.plans.HashExprs.minHashCol(shingles)

  /** Fold an array of longs into one band key. */
  def foldKey(values: Column): Column =
    aggregate(values, lit(0L), (h, x) => (h * 31 + x) % P)

  /** Count of agreeing components of two MinHash signatures — native
    * single-pass (graft.plans.SigAgreeCount). */
  def sigAgree(a: Column, b: Column): Column =
    graft.plans.HashExprs.sigAgreeCol(a, b)

  /** The composed HOF definition of the same count (the shape the
    * DuckDB oracle evaluates); retained to assert native parity. */
  def sigAgreeHof(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), eq => eq)).cast(LongType)

  /** 62-bit SimHash over an array of tokens — native single-pass
    * (graft.plans.SimHash64). */
  def simHash(tokens: Column): Column = graft.plans.HashExprs.simHashCol(tokens)

  /** The composed HOF definition of the same SimHash (the shape the
    * DuckDB oracle evaluates); retained to assert native parity. */
  def simHashHof(tokens: Column): Column = {
    val th = transform(tokens, t =>
      aggregate(transform(split(t, ""), ch => ascii(ch).cast(LongType)),
        lit(0L), (h, x) => (h * 31 + x) % P31) +
      aggregate(transform(split(t, ""), ch => ascii(ch).cast(LongType)),
        lit(0L), (h, x) => (h * 37 + x) % P31) * lit(P31 + 1L))
    val pow2 = array((0 until 62).map(i => lit(1L << i)): _*)
    val votes = aggregate(th, array_repeat(lit(0L), 62),
      (acc, h) => zip_with(acc, pow2,
        (a, p) => a + when(h.bitwiseAND(p) =!= 0L, 1L).otherwise(-1L)))
    aggregate(zip_with(votes, pow2, (v, p) => when(v > 0L, p).otherwise(0L)),
      lit(0L), (a, x) => a + x)
  }

  /** DuckDB SQL fragments mirroring the Scala definitions 1:1 — used
    * by SparkEntry.oracleSql so the oracle computes the same hashes. */
  object Sql {
    val polyHash: String => String = s =>
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($s,''), c -> CAST(ascii(c) AS BIGINT))), (h,c) -> (h*31+c) % 1000000007)"
    def perm(hExpr: String): String =
      s"(CAST(37 + 101*j AS BIGINT) * $hExpr + CAST(1000003*j + 12345 AS BIGINT)) % 2147483647"
  }
}
