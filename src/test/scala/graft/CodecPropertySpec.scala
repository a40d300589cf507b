package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{Frame, Image, PackFrame, UnpackFrame}

/** Property-based coverage of the binary codecs: the whole value
  * domain round-trips, everything outside it quarantines as null, and
  * the decoders never throw on arbitrary bytes — checked by direct
  * Catalyst eval (no Spark session), thousands of cases per run. */
class CodecPropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 500): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def packEval(d: Long, t: Long, s: Seq[Long]): Any =
    PackFrame(Literal(d), Literal(t),
      Literal.create(s.toArray, ArrayType(LongType))).eval(InternalRow.empty)
  private def unpackEval(b: Array[Byte]): Any =
    UnpackFrame(Literal(b, BinaryType)).eval(InternalRow.empty)

  test("frame codec round-trips the full int32/int16 domain") {
    val gen = for {
      d <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      t <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      s <- Gen.listOfN(Frame.NumSamples,
        Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield (d, t, s)
    check(Prop.forAll(gen) { case (d, t, s) =>
      val bytes = packEval(d.toLong, t.toLong, s.map(_.toLong)).asInstanceOf[Array[Byte]]
      val row = unpackEval(bytes).asInstanceOf[InternalRow]
      row.getInt(0) == d && row.getInt(1) == t &&
        row.getArray(2).toIntArray().toSeq == s
    })
  }

  test("frame pack nulls outside the wire domain") {
    val outOfRange = Gen.oneOf(
      Gen.chooseNum(Int.MaxValue.toLong + 1, Long.MaxValue).map(v => (v, 0L, 0L)),
      Gen.chooseNum(Long.MinValue, Int.MinValue.toLong - 1).map(v => (0L, v, 0L)),
      Gen.chooseNum(Short.MaxValue.toLong + 1, Long.MaxValue).map(v => (0L, 0L, v)))
    check(Prop.forAll(outOfRange) { case (d, t, s) =>
      packEval(d, t, Seq.fill(Frame.NumSamples)(s)) == null
    })
  }

  test("frame unpack never throws on arbitrary bytes") {
    check(Prop.forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val r = unpackEval(bytes)
      r == null || r.isInstanceOf[InternalRow]
    })
  }

  test("image codec round-trips every format across the dimension domain") {
    val gen = for {
      fmt <- Gen.oneOf("png", "jpeg", "webp", "raw")
      w <- Gen.chooseNum(1, 0xffff)
      h <- Gen.chooseNum(1, 0xffff)
      payload <- Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (fmt, w, h, payload)
    check(Prop.forAll(gen) { case (fmt, w, h, payload) =>
      val blob = Image.packImage(fmt, w.toLong, h.toLong, payload)
      val row = Image.decodeImage(blob)
      blob.length == Image.headerLen(fmt) + payload.length &&
        row != null &&
        row.getString(0) == fmt &&
        row.getInt(1) == w && row.getInt(2) == h &&
        row.getInt(3) == Image.headerLen(fmt)
    })
  }

  test("image decode never throws on arbitrary bytes") {
    check(Prop.forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val r = Image.decodeImage(bytes)
      r == null || r.isInstanceOf[InternalRow]
    })
  }

  test("signature agreement equals an independent element count") {
    val gen = for {
      a <- Gen.listOfN(16, Gen.choose(0L, 1000L))
      b <- Gen.listOfN(16, Gen.choose(0L, 1000L))
    } yield (a, b)
    check(Prop.forAll(gen) { case (a, b) =>
      graft.plans.HashExprs.sigAgree(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray)) ==
        a.zip(b).count { case (x, y) => x == y }.toLong
    })
  }
}
