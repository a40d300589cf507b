package graft

/** Round 13 continuation (r33 spec file): the packed-LSH size gate.
  * `lshMultiTopK`'s per-table packed index broadcasts only while its
  * estimated size fits `spark.graft.lsh.maxPackedBroadcastBytes`;
  * past it, the SAME cell math runs as the sharded (sig)-partitioned
  * cogroup — the 10⁹-vector hand-off the scaladoc documents, as
  * working code. Both paths share the sweepCell/emitHeaps kernels,
  * so their results must be bit-identical — this pins it, plus the
  * default-branch choice at test scale. */
class Round33Spec extends SparkSpec {

  private def resultSet(dir: String): Set[(Long, Long, Option[Double])] = {
    val rows = operators.Similarity.lshMultiTopK(spark, dir).collect()
    rows.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
  }

  test("lsh pack gate: sharded cogroup path is bit-identical to the packed broadcast") {
    val key = "spark.graft.lsh.maxPackedBroadcastBytes"
    val viaBroadcast = resultSet(sf)
    spark.conf.set(key, "0") // force every pack past the gate
    try {
      val viaSharded = resultSet(sf)
      assert(viaSharded == viaBroadcast)
      assert(viaSharded.nonEmpty)
    } finally {
      spark.conf.unset(key)
      operators.Dedup.releaseTransientBlocks() // drain the sharded path's cell checkpoints
    }
  }

  test("lsh pack gate: test-scale corpora stay on the broadcast branch by default") {
    // the gate reads the cached index's Catalyst size estimate; at
    // sf0.001 that is a few hundred KB against the 4 GiB default —
    // any flip here means the default threshold or the estimate
    // moved, which would change bench plans silently
    val est = spark.read.parquet(s"$sf/embeddings.parquet")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(est * 10 < BigInt(4L << 30))
  }
}
