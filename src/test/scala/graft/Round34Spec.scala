package graft

/** Round 14 (r34 spec file): the packed k-core peel and its size
  * gate. `kcore`'s packed path shuffles the symmetric adjacency once
  * and peels with sorted survivor-array broadcasts; past
  * `spark.graft.graph.maxKeepBroadcastBytes` the relational
  * semi-join peel remains the plan. Both elect the same survivor set
  * every round (deg ≥ k over the same edge multiset), so results
  * must be bit-identical — this pins it across (k, rounds) shapes,
  * plus the default branch at test scale. */
class Round34Spec extends SparkSpec {

  private def rows(k: Int, rounds: Int): Set[(Long, Long, Boolean, Long)] =
    operators.Dedup.kcore(spark, sf, k, rounds).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
      .toSet

  test("kcore: relational semi-join peel is bit-identical to the packed peel") {
    val key = "spark.graft.graph.maxKeepBroadcastBytes"
    for ((k, rounds) <- Seq((2, 3), (1, 1), (3, 2), (2, 0))) {
      val packed = rows(k, rounds) // default branch at test scale
      spark.conf.set(key, "0") // force the relational fallback
      try {
        val relational = rows(k, rounds)
        assert(relational == packed, s"k=$k rounds=$rounds")
      } finally {
        spark.conf.unset(key)
        operators.Dedup.releaseTransientBlocks()
      }
    }
  }

  test("kcore: default branch at test scale is the packed peel, and output is nonempty") {
    val out = rows(2, 3)
    assert(out.nonEmpty)
    // every node reports, depth is bounded by rounds, in_core agrees
    assert(out.forall { case (_, rs, inCore, _) =>
      rs >= 0L && rs <= 3L && (inCore == (rs == 3L))
    })
    // a node outside the final core must report final_degree 0
    assert(out.forall { case (_, rs, _, fd) => rs == 3L || fd == 0L })
    operators.Dedup.releaseTransientBlocks()
  }
}
