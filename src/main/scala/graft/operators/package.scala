package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

package object operators {
  /** Exact 2-dp decimal view of a double column. All money/value math
    * runs in decimal so distributed (partial-agg, any partition order)
    * sums are exact and bit-identical to the sequential oracle.
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent exact sum of a 2-dp double column, surfaced as
    * double (schema-stable across engines). */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Exact mean via decimal sum / long count — deterministic double. */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(lit(1))
}
