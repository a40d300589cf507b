package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the graft native expressions: registered through
  * SparkSessionExtensions (the supported extension point), so
  * `spark.sql("SELECT graft_poly_hash(text) ...")` works anywhere —
  * including `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * on a real cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.GraftExtensions", name),
        builder))
    }
    e.injectPlannerStrategy(_ => AsOfStrategy)
    // rewrite O(rows²) tail window frames (k FOLLOWING → UNBOUNDED
    // FOLLOWING) into the incremental reversed-sort mirror — see
    // ReverseTailFrames' safety gates
    e.injectOptimizerRule(_ => ReverseTailFrames)
  }
}

object GraftExtensions {
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      require(es.length == n,
        s"$name expects $n argument(s), got ${es.length}")
      build(es)
    }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_poly_hash" -> arity("graft_poly_hash", 1)(es => PolyHashStr(es.head, 31L, HashExprs.P)),
    "graft_simhash" -> arity("graft_simhash", 1)(es => SimHash64(es.head)),
    "graft_minhash" -> arity("graft_minhash", 1)(es => MinHashArr(es.head)),
    "graft_dot" -> arity("graft_dot", 2)(es => DotProductF(es(0), es(1))),
    "graft_sqdist" -> arity("graft_sqdist", 2)(es => SqDistFF(es(0), es(1))),
    "graft_sig_agree" -> arity("graft_sig_agree", 2)(es => SigAgreeCount(es(0), es(1))),
    "graft_shingles" -> arity("graft_shingles", 1)(es => ShingleSet(es.head, 3)),
    "graft_ngrams" -> arity("graft_ngrams", 1)(es => CharNGramSet(es.head, 4)),
    "graft_pack_frame" -> arity("graft_pack_frame", 3)(es => PackFrame(es(0), es(1), es(2))),
    "graft_unpack_frame" -> arity("graft_unpack_frame", 1)(es => UnpackFrame(es.head)),
    "graft_byte_sum" -> arity("graft_byte_sum", 2)(es => ByteSum(es(0), es(1))),
    "graft_pack_image" -> arity("graft_pack_image", 4)(es => PackImage(es(0), es(1), es(2), es(3))),
    "graft_decode_image" -> arity("graft_decode_image", 1)(es => DecodeImageMeta(es.head)),
    "graft_ahash" -> arity("graft_ahash", 2)(es => AHash62(es(0), es(1))),
    "graft_pack_wav" -> arity("graft_pack_wav", 3)(es => PackWav(es(0), es(1), es(2))),
    "graft_decode_wav" -> arity("graft_decode_wav", 1)(es => DecodeWavMeta(es.head)),
    "graft_pack_mp4" -> arity("graft_pack_mp4", 4)(es => PackMp4(es(0), es(1), es(2), es(3))),
    "graft_decode_mp4" -> arity("graft_decode_mp4", 1)(es => DecodeMp4Meta(es.head)),
    "graft_bin_join" -> arity("graft_bin_join", 1)(es => BinJoin(es.head, 0x3a)),
    // aggregate: the analyzer wraps a raw AggregateFunction returned
    // from a registry builder; k must be a foldable int literal
    "graft_kmv" -> arity("graft_kmv", 2)(es => KMinValues(es.head, litInt("graft_kmv", es(1)))),
    "graft_cms" -> arity("graft_cms", 2)(es => CountMin(es.head, litInt("graft_cms", es(1)))),
    // generator (UDTF): usable in SELECT / LATERAL VIEW like explode
    "graft_token_windows" -> arity("graft_token_windows", 3)(es =>
      TokenWindows(es.head, litInt("graft_token_windows", es(1)),
        litInt("graft_token_windows", es(2)))),
  )

  private def litInt(name: String, e: Expression): Int = e match {
    case lit: org.apache.spark.sql.catalyst.expressions.Literal if lit.foldable =>
      lit.value match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"$name expects an integer literal k, got $other")
      }
    case other => throw new IllegalArgumentException(
      s"$name expects a literal k, got ${other.sql}")
  }
}
