package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}
import graft.sources.Tables

/** Round-7 additions, third batch: k-hop reachability over the
  * near-dup graph and contrastive negative sampling. */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  test("graph_reach: seeds at hop 0, hops bounded, every reached node touches the graph") {
    val reach = Dedup.reach(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("hops")).toMap
    assert(reach.nonEmpty)
    assert(reach.values.forall(h => h >= 0L && h <= 3L))
    // every seed node (id % 10 == 0) present in the graph is at hop 0
    reach.foreach { case (id, h) => if (id % 10 == 0) assert(h == 0L, s"seed $id at $h") }
    // monotone frontier: raising the depth never loses nodes and
    // never increases a node's distance
    val deeper = Dedup.reach(spark, sf, maxHops = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("hops")).toMap
    assert(reach.keySet.subsetOf(deeper.keySet))
    reach.foreach { case (id, h) => assert(deeper(id) <= h) }
  }

  test("graph_reach: a hop-1 node shares a verified pair with some seed") {
    val reach = Dedup.reach(spark, sf).collect()
    val hop1 = reach.filter(_.getAs[Long]("hops") == 1L).map(_.getAs[Long]("doc_id"))
    // hop-1 nodes are non-seeds by min-hop election
    assert(hop1.forall(_ % 10 != 0))
  }

  test("sample_negative: k negatives per anchor, never from the anchor's own source, deterministic") {
    val out = Curation.sampleNegative(spark, sf).collect()
    val anchors = Tables.documents(spark, sf).filter($"doc_id" < 32L).count()
    assert(out.length == anchors * 4, "every (anchor, slot) resolves to exactly one negative")
    out.foreach { r =>
      assert(r.getAs[String]("neg_source") != r.getAs[String]("anchor_source"))
      assert(r.getAs[Long]("slot") >= 0L && r.getAs[Long]("slot") < 4L)
    }
    // per (anchor, slot) exactly one row
    assert(out.map(r => (r.getAs[Long]("anchor_id"), r.getAs[Long]("slot"))).distinct.length
      == out.length)
    // bit-identical replay
    val again = Curation.sampleNegative(spark, sf).collect().map(_.toSeq).toSet
    assert(again == out.map(_.toSeq).toSet)
  }
}
