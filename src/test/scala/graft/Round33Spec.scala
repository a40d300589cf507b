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

  test("TopCentroids assignment matches the crossJoin+row_number window on degenerate shapes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // vectors: normal, NULL embedding, zero-norm (NULL nrm), and an
    // exact duplicate of a centroid (tie surface); centroids include
    // a NULL-norm one so a ccos column can be NULL per-centroid
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)), // centroid 0
      (1L, Array(0f, 1f, 0f)), // centroid 1
      (2L, Array(0f, 0f, 0f)), // centroid 2 — zero vector, NULL norm
      (10L, Array(1f, 0f, 0f)), // duplicate of centroid 0
      (11L, Array(0.5f, 0.5f, 0f)),
      (12L, Array(0f, 0f, 0f)), // zero-norm query
      (13L, null.asInstanceOf[Array[Float]])) // NULL embedding
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding",
        functions.VecFns.norm($"embedding").as("nrm"))
    val nc = 3
    val cents = emb.filter($"vec_id" < nc)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"), $"nrm".as("cnrm"))
    val scored = emb.crossJoin(broadcast(cents))
      .select($"vec_id", $"cid",
        (functions.VecFns.dot($"embedding", $"cvec") / ($"nrm" * $"cnrm")).as("ccos"))
    val w = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cid".asc)
    for (p <- Seq(1, 2, 3)) {
      val windowed = scored
        .withColumn("rn", row_number().over(w)).filter($"rn" <= p)
        .select($"vec_id", $"cid", $"ccos", $"rn")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getInt(3))).toSet
      val cb = emb.filter($"vec_id" < nc)
        .select($"vec_id", $"embedding", $"nrm").collect().sortBy(_.getLong(0))
      val native = emb.withColumn("tc", plans.VecExprs.topCentroidsCol(
          $"embedding", $"nrm",
          cb.map(_.getLong(0)),
          cb.map(r => if (r.isNullAt(1)) null else r.getSeq[Float](1).toArray),
          cb.map(r => if (r.isNullAt(2)) Double.NaN else r.getDouble(2)), p))
        .select($"vec_id", posexplode($"tc").as(Seq("pos", "c")))
        .select($"vec_id", $"c.cid", $"c.ccos", ($"pos" + 1).as("rn"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getInt(3))).toSet
      assert(native == windowed, s"p=$p")
    }
  }

  test("knnGraph plan shape: no window — assignment is the TopCentroids scan, election the packed sweep") {
    // the two windows this operator used to carry (per-vector
    // centroid assignment, per-query row_number) both re-sorted
    // corpus-proportional relations at scale; neither may reappear
    val plan = operators.Similarity.knnGraph(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.linesIterator.take(12).mkString("\n"))
  }

  test("triangles: packed-adjacency path is count-identical to the relational wedge join") {
    val key = "spark.graft.graph.maxAdjBroadcastBytes"
    def counts(): Map[Long, Long] =
      operators.Dedup.triangles(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val packed = counts() // default branch at test scale
    spark.conf.set(key, "0") // force the wedge-join fallback
    try {
      val wedge = counts()
      assert(packed == wedge)
      assert(packed.nonEmpty)
    } finally spark.conf.unset(key)
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
