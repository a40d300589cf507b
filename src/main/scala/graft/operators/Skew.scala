package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot join keys.
  *
  * AQE's skew-join split handles most runtime skew; `saltedJoin` is
  * the explicit variant for the pathological case AQE can't fix —
  * one key holding a double-digit percentage of a 100 TB fact table.
  * The hot side gets a random salt in [0, buckets); the small side is
  * replicated across every salt value, so the hot key's rows spread
  * over `buckets` reducers instead of one.
  */
object Skew {

  /** Inner equi-join of a skewed fact to a (replicable) dim on `key`,
    * spreading each fact key over `buckets` partitions.
    *
    * The salt is `pmod(hash(all fact columns), buckets)` — a pure
    * function of row content, not `rand()` — so task retries and plan
    * re-executions land every row in the same bucket (byte-stable
    * shuffle layout). A hot key's rows still spread across buckets
    * because the non-key columns vary row to row. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col): _*), lit(buckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Left join that routes NULL-key fact rows AROUND the join.
    *
    * NULL join keys never match, but a plain shuffled left join still
    * ships them — and they all hash to the SAME reducer, so a fact
    * table that is 10% null-keyed sends 10% of 100 TB to one
    * straggler task (the null-skew pathology AQE's splitter can't
    * always fix, because the "key" is one value). The split sends
    * only matchable rows through the exchange; null rows take a
    * shuffle-free union branch with the dim columns filled in as the
    * NULLs the outer join would have produced. Bit-identical to the
    * plain left join by construction. */
  def nullSplitLeftJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String): DataFrame = {
    val matched = fact.filter(col(factKey).isNotNull)
      .join(dim, col(factKey) === col(dimKey), "left")
    val bypass = dim.columns.foldLeft(fact.filter(col(factKey).isNull)) {
      (df, c) => df.withColumn(c, lit(null).cast(dim.schema(c).dataType))
    }
    matched.unionByName(bypass)
  }
}
