package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real ISO-BMFF (MP4) container codec — the video modality beside
  * [[Image]] and [[Audio]]: blobs carry a genuine box structure
  * (`ftyp` with major/minor brand + compatible brands, `moov`
  * containing a spec-layout `mvhd` with timescale/duration, `mdat`
  * over the payload standing in for coded samples) and the decoder
  * runs a proper top-level box scan: u32 big-endian sizes with the
  * size==1 → 64-bit largesize and size==0 → to-end-of-file escapes
  * real files use, unknown boxes skipped, `mvhd` parsed in both its
  * version-0 (u32 times) and version-1 (u64 times) layouts. Track
  * boxes (`trak`/`stbl` — codec-specific sample tables) sit behind
  * the same column boundary as pixel/PCM decode does for the other
  * modalities; the box layer is the genuine wire format.
  *
  * Malformed input (no leading ftyp, truncated/overrunning box sizes,
  * missing moov/mvhd/mdat, bad mvhd version) returns NULL for
  * quarantine, like the frame/image/audio codecs. Box sizes are
  * UNTRUSTED u32/u64 values and all offset arithmetic is Long —
  * Int math would wrap on a crafted ~2^31 size, skip the bounds
  * check, and crash instead of quarantining.
  */
object Video {
  def pack(brand: Column, timescale: Column, duration: Column, payload: Column): Column =
    ColumnBridge.column(PackMp4(
      ColumnBridge.expression(brand), ColumnBridge.expression(timescale),
      ColumnBridge.expression(duration), ColumnBridge.expression(payload)))
  def decode(blob: Column): Column =
    ColumnBridge.column(DecodeMp4Meta(ColumnBridge.expression(blob)))
  def packSync(brand: Column, timescale: Column, duration: Column,
      payload: Column, nSamples: Column, syncEvery: Column): Column =
    ColumnBridge.column(PackMp4Sync(Seq(
      ColumnBridge.expression(brand), ColumnBridge.expression(timescale),
      ColumnBridge.expression(duration), ColumnBridge.expression(payload),
      ColumnBridge.expression(nSamples), ColumnBridge.expression(syncEvery))))
  def syncSamples(blob: Column): Column =
    ColumnBridge.column(DecodeMp4Sync(ColumnBridge.expression(blob)))

  val FtypLen = 24      // 8 header + major(4) + minor(4) + 2 compat brands(8)
  val MvhdLen = 108     // 8 header + version/flags(4) + v0 payload(96)
  val MoovLen = 8 + MvhdLen
  val HeaderLen = FtypLen + MoovLen + 8   // everything before the mdat payload

  private def putIntBE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >> 24) & 0xff).toByte
    b(off + 1) = ((v >> 16) & 0xff).toByte
    b(off + 2) = ((v >> 8) & 0xff).toByte
    b(off + 3) = (v & 0xff).toByte
  }
  private def getIntBE(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def getLongBE(b: Array[Byte], off: Int): Long =
    ((getIntBE(b, off).toLong & 0xffffffffL) << 32) |
      (getIntBE(b, off + 4).toLong & 0xffffffffL)
  private def tag(b: Array[Byte], off: Int, t: String): Boolean =
    b.length >= off + 4 && b(off) == t(0).toByte && b(off + 1) == t(1).toByte &&
      b(off + 2) == t(2).toByte && b(off + 3) == t(3).toByte
  private def putTag(b: Array[Byte], off: Int, t: String): Unit = {
    var i = 0
    while (i < 4) { b(off + i) = t(i).toByte; i += 1 }
  }

  /** Static body for PackMp4: ftyp(major=brand) + moov(mvhd v0 with
    * timescale/duration and the spec's unity rate/volume/matrix) +
    * mdat(payload). Null on out-of-domain parameters (brand must be
    * exactly 4 printable ASCII chars; v0 fields are u32). */
  def packMp4(brand: UTF8String, timescale: Long, duration: Long,
      payload: Array[Byte]): Array[Byte] = {
    val br = brand.toString
    if (br.length != 4 || !br.forall(c => c >= 0x20 && c < 0x7f)) return null
    if (timescale < 1 || timescale > 0xffffffffL) return null
    if (duration < 0 || duration > 0xffffffffL) return null
    val out = new Array[Byte](HeaderLen + payload.length)
    // ftyp
    putIntBE(out, 0, FtypLen)
    putTag(out, 4, "ftyp")
    putTag(out, 8, br)
    putIntBE(out, 12, 0x200)                     // minor version
    putTag(out, 16, "isom")
    putTag(out, 20, "mp41")
    // moov > mvhd (version 0)
    val mo = FtypLen
    putIntBE(out, mo, MoovLen)
    putTag(out, mo + 4, "moov")
    val mv = mo + 8
    putIntBE(out, mv, MvhdLen)
    putTag(out, mv + 4, "mvhd")
    // version(0) + flags(0) already zero; creation/modification zero
    putIntBE(out, mv + 20, timescale.toInt)
    putIntBE(out, mv + 24, duration.toInt)
    putIntBE(out, mv + 28, 0x00010000)           // rate 1.0
    out(mv + 32) = 0x01                          // volume 1.0 (u8.8 hi byte)
    // matrix: unity (a=d=0x00010000, w=0x40000000)
    putIntBE(out, mv + 44, 0x00010000)
    putIntBE(out, mv + 60, 0x00010000)
    putIntBE(out, mv + 76, 0x40000000)
    putIntBE(out, mv + 104, 2)                   // next_track_id
    // mdat
    val md = mo + MoovLen
    putIntBE(out, md, 8 + payload.length)
    putTag(out, md + 4, "mdat")
    System.arraycopy(payload, 0, out, md + 8, payload.length)
    out
  }

  /** Static body for PackMp4Sync: the [[packMp4]] layout plus a
    * spec-nested `trak > mdia > minf > stbl > stss` chain inside moov
    * carrying the sync-sample (keyframe) table — 1-based sample
    * indices 1, 1+syncEvery, … ≤ nSamples, exactly the stss wire
    * format (version/flags u32, entry_count u32, u32 entries). Null
    * on out-of-domain parameters (sample counts are u32, syncEvery
    * ≥ 1). The nesting is real: [[decodeMp4Sync]] finds the table by
    * recursive box descent, not by fixed offsets. */
  def packMp4Sync(brand: UTF8String, timescale: Long, duration: Long,
      payload: Array[Byte], nSamples: Long, syncEvery: Long): Array[Byte] = {
    val br = brand.toString
    if (br.length != 4 || !br.forall(c => c >= 0x20 && c < 0x7f)) return null
    if (timescale < 1 || timescale > 0xffffffffL) return null
    if (duration < 0 || duration > 0xffffffffL) return null
    if (nSamples < 1 || nSamples > 0xffffffffL || syncEvery < 1) return null
    val k = (1L + (nSamples - 1) / syncEvery).toInt
    val stssLen = 8 + 4 + 4 + 4 * k
    val stblLen = 8 + stssLen
    val minfLen = 8 + stblLen
    val mdiaLen = 8 + minfLen
    val trakLen = 8 + mdiaLen
    val moovLen = 8 + MvhdLen + trakLen
    val out = new Array[Byte](FtypLen + moovLen + 8 + payload.length)
    // ftyp
    putIntBE(out, 0, FtypLen)
    putTag(out, 4, "ftyp")
    putTag(out, 8, br)
    putIntBE(out, 12, 0x200)
    putTag(out, 16, "isom")
    putTag(out, 20, "mp41")
    // moov > mvhd (version 0)
    val mo = FtypLen
    putIntBE(out, mo, moovLen)
    putTag(out, mo + 4, "moov")
    val mv = mo + 8
    putIntBE(out, mv, MvhdLen)
    putTag(out, mv + 4, "mvhd")
    putIntBE(out, mv + 20, timescale.toInt)
    putIntBE(out, mv + 24, duration.toInt)
    putIntBE(out, mv + 28, 0x00010000)
    out(mv + 32) = 0x01
    putIntBE(out, mv + 44, 0x00010000)
    putIntBE(out, mv + 60, 0x00010000)
    putIntBE(out, mv + 76, 0x40000000)
    putIntBE(out, mv + 104, 2)
    // moov > trak > mdia > minf > stbl > stss
    var o = mv + MvhdLen
    putIntBE(out, o, trakLen); putTag(out, o + 4, "trak"); o += 8
    putIntBE(out, o, mdiaLen); putTag(out, o + 4, "mdia"); o += 8
    putIntBE(out, o, minfLen); putTag(out, o + 4, "minf"); o += 8
    putIntBE(out, o, stblLen); putTag(out, o + 4, "stbl"); o += 8
    putIntBE(out, o, stssLen); putTag(out, o + 4, "stss")
    // version/flags u32 already zero
    putIntBE(out, o + 12, k)
    var i = 0
    while (i < k) {
      putIntBE(out, o + 16 + 4 * i, (1L + i.toLong * syncEvery).toInt)
      i += 1
    }
    // mdat
    val md = mo + moovLen
    putIntBE(out, md, 8 + payload.length)
    putTag(out, md + 4, "mdat")
    System.arraycopy(payload, 0, out, md + 8, payload.length)
    out
  }

  /** Static body for DecodeMp4Sync: top-level box scan to moov, then
    * RECURSIVE descent through container boxes (trak/mdia/minf/stbl)
    * to the first `stss`, whose u32 entries return as a long array —
    * the keyframe table a sample-accurate video reader seeks by.
    * Null on malformed bytes (bad sizes, truncated table, no ftyp);
    * null (not empty) when no stss exists, so "no keyframe index" is
    * quarantined distinctly from "empty index". */
  def decodeMp4Sync(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (b.length < 8 || !tag(b, 4, "ftyp")) return null
    // returns: parsed entries, or null
    def descend(start: Long, end: Long, depth: Int): Array[Long] = {
      var co = start
      while (co + 8 <= end) {
        val c = co.toInt
        var csize = getIntBE(b, c).toLong & 0xffffffffL
        var chdr = 8L
        if (csize == 1L) {
          if (co + 16 > end) return null
          csize = getLongBE(b, c + 8)
          chdr = 16L
        } else if (csize == 0L) csize = end - co
        if (csize < chdr || co + csize > end) return null
        if (tag(b, c + 4, "stss")) {
          if (csize < chdr + 8) return null
          val p = (co + chdr).toInt
          if ((b(p) & 0xff) != 0) return null      // stss has only v0
          val k = getIntBE(b, p + 4).toLong & 0xffffffffL
          if (chdr + 8 + 4 * k > csize) return null
          val arr = new Array[Long](k.toInt)
          var i = 0
          while (i < k) {
            arr(i) = getIntBE(b, p + 8 + 4 * i).toLong & 0xffffffffL
            i += 1
          }
          return arr
        }
        if (depth < 8 && (tag(b, c + 4, "trak") || tag(b, c + 4, "mdia") ||
            tag(b, c + 4, "minf") || tag(b, c + 4, "stbl"))) {
          val r = descend(co + chdr, co + csize, depth + 1)
          if (r != null) return r
        }
        co += csize
      }
      null
    }
    var off = 0L
    var first = true
    while (off + 8 <= b.length) {
      val o = off.toInt
      var size = getIntBE(b, o).toLong & 0xffffffffL
      var hdr = 8L
      if (size == 1L) {
        if (off + 16 > b.length) return null
        size = getLongBE(b, o + 8)
        hdr = 16L
      } else if (size == 0L) size = b.length - off
      if (size < hdr || off + size > b.length) return null
      if (first && !tag(b, o + 4, "ftyp")) return null
      if (tag(b, o + 4, "moov")) {
        val r = descend(off + hdr, off + size, 0)
        if (r != null)
          return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(r)
      }
      first = false
      off += size
    }
    null
  }

  /** Static body for DecodeMp4Meta: top-level box scan (ftyp required
    * first, as the spec mandates for file identification), moov
    * child scan for mvhd (v0 and v1 layouts), mdat located. Null on
    * any malformation. Returns (brand, timescale, duration,
    * mdat_len, payload_off). */
  def decodeMp4(b: Array[Byte]): InternalRow = {
    if (b.length < 8 || !tag(b, 4, "ftyp")) return null
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var mdatLen = -1L
    var mdatOff = -1L
    var off = 0L
    var first = true
    while (off + 8 <= b.length) {
      val o = off.toInt
      var size = getIntBE(b, o).toLong & 0xffffffffL
      var hdr = 8L
      if (size == 1L) {                          // 64-bit largesize
        if (off + 16 > b.length) return null
        size = getLongBE(b, o + 8)
        hdr = 16L
      } else if (size == 0L) size = b.length - off   // box runs to EOF
      if (size < hdr || off + size > b.length) return null
      if (first && !tag(b, o + 4, "ftyp")) return null
      if (tag(b, o + 4, "ftyp")) {
        if (size < hdr + 8) return null
        brand = new String(b, (off + hdr).toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)
      } else if (tag(b, o + 4, "moov")) {
        // child box scan for mvhd
        var co = off + hdr
        val end = off + size
        while (co + 8 <= end && timescale < 0) {
          val c = co.toInt
          var csize = getIntBE(b, c).toLong & 0xffffffffL
          var chdr = 8L
          if (csize == 1L) {
            if (co + 16 > end) return null
            csize = getLongBE(b, c + 8)
            chdr = 16L
          }
          if (csize < chdr || co + csize > end) return null
          if (tag(b, c + 4, "mvhd")) {
            val p = (co + chdr).toInt
            if (co + chdr + 4 > end) return null
            val version = b(p) & 0xff
            if (version == 0) {
              if (co + chdr + 24 > end) return null
              timescale = getIntBE(b, p + 12).toLong & 0xffffffffL
              duration = getIntBE(b, p + 16).toLong & 0xffffffffL
            } else if (version == 1) {
              if (co + chdr + 32 > end) return null
              timescale = getIntBE(b, p + 20).toLong & 0xffffffffL
              duration = getLongBE(b, p + 24)
            } else return null
          }
          co += csize
        }
      } else if (tag(b, o + 4, "mdat")) {
        mdatLen = size - hdr
        mdatOff = off + hdr
      }
      first = false
      off += size
    }
    if (brand == null || timescale < 1 || duration < 0 || mdatOff < 0) return null
    if (mdatLen > Int.MaxValue) return null
    InternalRow(UTF8String.fromString(brand), timescale, duration,
      mdatLen.toInt, mdatOff.toInt)
  }
}

/** (brand string, timescale int64, duration int64, payload binary) →
  * ISO-BMFF blob. Null on out-of-domain parameters. */
case class PackMp4(first: Expression, second: Expression, third: Expression,
    fourth: Expression)
    extends QuaternaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq[DataType](StringType, LongType, LongType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(br: Any, ts: Any, du: Any, p: Any): Any =
    Video.packMp4(br.asInstanceOf[UTF8String], ts.asInstanceOf[Long],
      du.asInstanceOf[Long], p.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(a, b, c, d)
}

/** (brand, timescale u32, duration u32, payload, n_samples u32,
  * sync_every ≥ 1) → ISO-BMFF blob whose moov carries a spec-nested
  * trak>mdia>minf>stbl>stss keyframe table. Null when out of domain. */
case class PackMp4Sync(children: Seq[Expression])
    extends Expression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq[DataType](StringType, LongType, LongType, BinaryType, LongType, LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else Video.packMp4Sync(vs(0).asInstanceOf[UTF8String],
      vs(1).asInstanceOf[Long], vs(2).asInstanceOf[Long],
      vs(3).asInstanceOf[Array[Byte]], vs(4).asInstanceOf[Long],
      vs(5).asInstanceOf[Long])
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs)
}

/** blob → array<long> of 1-based sync-sample (keyframe) indices from
  * the first stss box found by recursive container descent; null when
  * the bytes are malformed OR no stss exists (quarantine both). */
case class DecodeMp4Sync(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Video.decodeMp4Sync(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** blob → struct(brand, timescale, duration, mdat_len, payload_off),
  * parsed from the actual box bytes; null when malformed. */
case class DecodeMp4Meta(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq[DataType](BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("timescale", LongType, nullable = false),
    StructField("duration", LongType, nullable = false),
    StructField("mdat_len", IntegerType, nullable = false),
    StructField("payload_off", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Video.decodeMp4(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
