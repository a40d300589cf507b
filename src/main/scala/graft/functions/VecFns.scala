package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Vector math over `array<float>` embedding columns.
  *
  * Dot products are LEFT FOLDS in a fixed element order: float×float
  * products are exact in double, and an identical summation order
  * makes the result bit-identical across engines (SURVEY §5) — so
  * cosine scores need no rounding for oracle parity.
  */
object VecFns {
  /** Fixed-order dot product of two equal-length float vectors —
    * native single-pass (graft.plans.DotProductF). */
  def dot(a: Column, b: Column): Column = graft.plans.VecExprs.dotCol(a, b)

  /** The composed HOF definition of the same dot product (the shape
    * the DuckDB oracle evaluates); retained to assert native parity. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0d), (acc, v) => acc + v)

  /** Fold-exact squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** L2 norm, NULL for a zero vector: a zero embedding carries no
    * direction, and the two engines disagree on 0/0 (Spark doubles
    * give NaN, DuckDB gives NULL) — the NULL-norm convention makes a
    * zero vector's cosine NULL in BOTH engines, so it drops out of
    * every threshold filter and sorts last in every (cosine DESC)
    * election identically. A 100 TB corpus WILL contain zero vectors
    * (failed encoder calls, padded rows); silently NaN-poisoned
    * top-k is the alternative. */
  def norm(a: Column): Column = {
    val sq = normSq(a)
    when(sq > 0.0d, sqrt(sq))
  }

  /** Cosine similarity with fold-exact components; NULL when either
    * vector has zero norm. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane coefficient for plane p,
    * dimension d: integer arithmetic only, portable to the oracle. */
  def hyperCoef(p: Column, d: Column): Column =
    ((lit(1L) + (p * 64 + d) * lit(2654435761L)) % 1000003L) - 500001L

  /** nPlanes-bit random-hyperplane LSH signature of a vector —
    * native single-pass (graft.plans.LshSig). Fixed fold order
    * d = 0..63 keeps the projection (and thus the sign bit)
    * engine-exact. */
  def lshSignature(v: Column, nPlanes: Int = 8): Column =
    graft.plans.VecExprs.lshSigCol(v, nPlanes)

  /** Signature of hyperplane TABLE t: planes drawn at global indices
    * t·nPlanes .. t·nPlanes+nPlanes-1, so tables are independent —
    * the OR-construction multi-table LSH building block. */
  def lshSignatureTable(v: Column, nPlanes: Int, table: Int): Column =
    graft.plans.VecExprs.lshSigCol(v, nPlanes, table * nPlanes)

  /** The composed HOF definition of the same signature (the shape the
    * DuckDB oracle evaluates); retained to assert native parity. */
  def lshSignatureHof(v: Column, nPlanes: Int = 8): Column = {
    val planeBits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), lit(63)),
          (x, d) => x.cast(DoubleType) * hyperCoef(lit(p.toLong), d.cast(LongType)).cast(DoubleType)),
        lit(0.0d), (acc, t) => acc + t)
      when(proj > 0.0d, lit(1L << p)).otherwise(lit(0L))
    }
    planeBits.reduce(_ + _)
  }
}
