package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Dedup, Frames}
import graft.plans.{Frame, Image, Sketch}

/** Round-3 hardening: checkpoint-block lifecycle in the dedup
  * clustering loop, bounded (rolled) wire blobs, and the codec edge
  * cases from the round-2 advisory (JPEG standalone markers, null
  * sample elements, KMV k validation). */
class Round3Spec extends SparkSpec {
  import spark.implicits._

  // --- dedup clustering: checkpoint lifecycle -------------------------------

  test("componentLabels persists only the converged labels; apply reuses them") {
    Dedup.clearLabelCache()
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val clusters = Dedup.clusters(spark, sf).collect()
    assert(clusters.nonEmpty)
    val afterClusters = sc.getPersistentRDDs.size
    // every superseded round and the pair checkpoint are unpersisted;
    // the single converged label set stays (it backs the cache)
    assert(afterClusters == before + 1,
      s"expected exactly one persisted RDD (converged labels), " +
        s"got ${afterClusters - before}")
    // dedup_apply must reuse the converged labels, not re-run the
    // MinHash + iteration pipeline (and so add zero persisted blocks)
    val applied = Dedup.applyDedup(spark, sf).collect()
    assert(applied.nonEmpty)
    assert(sc.getPersistentRDDs.size == afterClusters,
      "applyDedup must reuse cached labels without new checkpoints")
    Dedup.clearLabelCache()
    assert(sc.getPersistentRDDs.size == before,
      "clearLabelCache must free the cached label blocks")
  }

  // --- frame_wire: rolled blobs ---------------------------------------------

  test("wire blobs roll by count: hot device stays bounded, results unchanged") {
    // one hot device with 100x the frames of the others
    val hot = (1L to 500L).map(i => (1L, i))
    val cold = (2L to 10L).flatMap(d => (1L to 5L).map(i => (d, d * 1000L + i)))
    val framed = (hot ++ cold).toDF("device_id", "event_id")
      .withColumn("frame", Frame.pack($"device_id", $"event_id" + 1600000000L,
        transform(sequence(lit(0L), lit(6L)), i => ($"event_id" + i * 13) % 32768)))
    val blobs = Frames.wireBlobs(framed, framesPerBlob = 16)
      .select($"device_id", octet_length($"wire").as("len")).collect()
    val hotBlobs = blobs.filter(_.getLong(0) == 1L)
    // ceil(500/16) = 32 blobs; every buffer held at most 16 frames
    assert(hotBlobs.length == 32, s"expected 32 rolled blobs, got ${hotBlobs.length}")
    assert(blobs.forall(_.getInt(1) <= 16 * (Frame.FrameLen + 1)),
      "no blob may exceed framesPerBlob frames")
    // rolling must not change the parsed aggregate: compare the full
    // pipeline at two roll sizes against ground truth from the frames
    val out = Frames.wireParse(Frames.wireBlobs(framed, 16))
      .orderBy($"device_id").collect()
    val outWide = Frames.wireParse(Frames.wireBlobs(framed, 1000))
      .orderBy($"device_id").collect()
    assert(out.toSeq == outWide.toSeq, "roll size must not affect results")
    val hotRow = out.find(_.getLong(0) == 1L).get
    assert(hotRow.getLong(1) == 500L && hotRow.getBoolean(3))
  }

  // --- codec edge cases (round-2 advisory) ----------------------------------

  test("PackFrame quarantines frames with null sample elements") {
    val df = Seq(1L).toDF("d")
      .withColumn("good", Frame.pack($"d", lit(0L), array_repeat(lit(5L), 7)))
      .withColumn("bad", Frame.pack($"d", lit(0L),
        array(lit(1L), lit(null).cast(LongType), lit(3L), lit(4L), lit(5L), lit(6L), lit(7L))))
    val r = df.select($"good", $"bad").head()
    assert(!r.isNullAt(0))
    assert(r.isNullAt(1), "null sample element must null the frame, not pack 0")
  }

  test("KMinValues rejects k < 1 at construction") {
    intercept[IllegalArgumentException] { Sketch.kMinValues(lit(1L), 0) }
    intercept[IllegalArgumentException] { Sketch.kMinValues(lit(1L), -5) }
  }

  test("JPEG marker scan handles padding, standalone markers, and SOS/EOI") {
    def shortBE(v: Int): Seq[Byte] = Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val soi = Seq(0xff.toByte, 0xd8.toByte)
    // APP0 segment with 4 data bytes, then fill padding, a TEM and an
    // RST standalone marker, then a real SOF0 (h=7, w=9)
    val app0 = Seq(0xff.toByte, 0xe0.toByte) ++ shortBE(6) ++ Seq[Byte](1, 2, 3, 4)
    val pad = Seq(0xff.toByte, 0xff.toByte)
    val tem = Seq(0xff.toByte, 0x01.toByte)
    val rst = Seq(0xff.toByte, 0xd3.toByte)
    val sof = Seq(0xff.toByte, 0xc0.toByte) ++ shortBE(17) ++
      (Seq[Byte](8) ++ shortBE(7) ++ shortBE(9) ++ Seq[Byte](3) ++
        Seq[Byte](1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    val valid = (soi ++ app0 ++ pad ++ tem ++ rst ++ sof).toArray
    val parsed = Image.decodeImage(valid)
    assert(parsed != null, "legal pre-SOF markers must not quarantine the image")
    assert(parsed.getInt(1) == 9 && parsed.getInt(2) == 7)
    // SOS before any SOF: dimensions unrecoverable -> null
    val sos = Seq(0xff.toByte, 0xda.toByte) ++ shortBE(3) ++ Seq[Byte](0)
    assert(Image.decodeImage((soi ++ app0 ++ sos ++ sof).toArray) == null)
    // EOI with no SOF -> null, not a crash
    assert(Image.decodeImage((soi ++ app0 ++ Seq(0xff.toByte, 0xd9.toByte)).toArray) == null)
    // truncated segment length -> null
    assert(Image.decodeImage((soi ++ Seq(0xff.toByte, 0xe0.toByte, 0x00.toByte)).toArray) == null)
  }
}
