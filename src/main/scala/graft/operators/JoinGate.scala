package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hint (VERDICT r12 task 5): several
  * stream-static and post-bucket-join fetches used a FORCED
  * `broadcast(dim)` because the dimension is small at every test SF —
  * but each of those dimensions scales with the DATA (FK parent key
  * sets ∝ dimension tables, per-user profiles ∝ users, the ANN query
  * fetch ∝ corpus vectors), so at 100 TB the forced hint becomes a
  * driver/executor OOM instead of a plan choice. The gate broadcasts
  * only while Catalyst's own size estimate sits under the session's
  * `autoBroadcastJoinThreshold` and otherwise returns the frame
  * UNHINTED, letting the planner pick the shuffled join it would pick
  * for any big relation — and says which branch it took, so a census
  * reading the log sees the flip the moment a corpus crosses it.
  *
  * The estimate is Catalyst's `optimizedPlan.stats.sizeInBytes`
  * (driver-side, no job): file-size-derived at the scan and
  * propagated through projections — conservative in the right
  * direction (an overestimate only costs the cheaper shuffle plan,
  * never an OOM).
  */
object JoinGate {

  /** Byte budget for a driver-COLLECTED pack (the LSH packed-table /
    * triangles packed-adjacency gates): an explicitly-set conf value
    * wins verbatim (census forcing knob), but the DEFAULT consults
    * `spark.driver.maxResultSize` — a 4 GiB flat default sat ABOVE the
    * 1g maxResultSize tripwire, so in the 1-4 GiB band the packed
    * branch was chosen and the collect died on the tripwire instead of
    * falling back to the sharded/relational plan built for exactly
    * that scale (VERDICT r13 defect #1). 70% of maxResultSize leaves
    * headroom for the estimate being a lower bound of the serialized
    * task-result bytes; maxResultSize=0 (unlimited) keeps the old
    * 4 GiB executor-memory bound. */
  def packGateBytes(spark: org.apache.spark.sql.SparkSession, key: String): BigInt =
    spark.conf.getOption(key) match {
      case Some(v) => BigInt(v.toLong)
      case None =>
        val mrs = spark.sparkContext.getConf
          .getSizeAsBytes("spark.driver.maxResultSize", "1g")
        BigInt(if (mrs <= 0L) 4L << 30 else math.min(4L << 30, mrs / 10L * 7L))
    }

  /** Hint `dim` for broadcast iff its estimated size fits the session
    * broadcast threshold; log the branch either way under `tag`. */
  def gatedBroadcast(dim: DataFrame, tag: String): DataFrame = {
    val conf = dim.sparkSession.sessionState.conf
    val threshold = conf.autoBroadcastJoinThreshold
    val est = dim.queryExecution.optimizedPlan.stats.sizeInBytes
    val fits = threshold > 0 && est <= BigInt(threshold)
    println(s"[graft-joingate] $tag: est=$est bytes, threshold=$threshold -> " +
      (if (fits) "broadcast" else "shuffle"))
    if (fits) broadcast(dim) else dim
  }
}
