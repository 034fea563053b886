package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL pure-JVM MP4 / ISO-BMFF (ISO 14496-12) container-metadata
  * parse — the M1/PNG-IHDR pattern applied to video (VERDICT r13 task
  * 4): a box walk over ftyp (major brand) → moov → mvhd (movie
  * timescale + duration, version 0 and 1 layouts) → trak → tkhd (track
  * count, first non-zero 16.16 fixed-point presentation dims). What a
  * multimodal pipeline needs BEFORE sampling frames: duration to plan
  * sampling, dims for shape-bucketed batching — no codec dependency.
  *
  * Never-crash contract over arbitrary binary columns (the decodeWav
  * cursor discipline): every size field is validated to advance the
  * cursor STRICTLY forward within addressable range before use —
  * size==0 ("to end of file") closes the current level, size==1 reads
  * the 64-bit largesize, any malformed size degrades the whole parse
  * to format = "unknown". Nothing is allocated from declared sizes
  * (the PNG IHDR guard generalized: this parser allocates nothing at
  * all).
  *
  * Returned struct:
  *   format       "mp4" | "unknown"
  *   major_brand  ftyp major brand 4CC
  *   timescale    mvhd movie timescale (units/second)
  *   duration     mvhd duration in timescale units
  *   n_tracks     number of trak boxes in moov
  *   width/height first trak's tkhd dims with both non-zero
  *                (integer part of the 16.16 fixed-point values)
  */
case class Mp4Meta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = Mp4Meta.schema
  override def prettyName: String = "mp4_meta"

  override protected def nullSafeEval(input: Any): Any =
    Mp4Meta.decode(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Mp4Meta =
    copy(child = newChild)
}

object Mp4Meta {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("major_brand", StringType),
    StructField("timescale", LongType),
    StructField("duration", LongType),
    StructField("n_tracks", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  def apply(bin: Column): Column =
    ColumnBridge.column(Mp4Meta(ColumnBridge.expression(bin)))

  private val unknown: InternalRow = {
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(7)
    r.update(0, UTF8String.fromString("unknown"))
    r
  }

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)
  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Header of the box at `off` within [off, end): (type, bodyStart,
    * boxEnd), or null when malformed / not strictly advancing.
    */
  private def boxAt(b: Array[Byte], off: Long, end: Long)
      : (String, Long, Long) = {
    if (off + 8 > end) return null
    val o = off.toInt
    val size32 = be32(b, o)
    var body = off + 8
    val boxEnd =
      if (size32 == 0L) end // "to end of enclosing level"
      else if (size32 == 1L) {
        if (off + 16 > end) return null
        body = off + 16
        off + be64(b, o + 8)
      } else off + size32
    if (boxEnd <= off || boxEnd > end || body > boxEnd) return null
    (fourcc(b, o + 4), body, boxEnd)
  }

  private[graft] def decode(b: Array[Byte]): InternalRow = {
    val end = b.length.toLong
    val first = boxAt(b, 0L, end)
    if (first == null || first._1 != "ftyp" || first._2 + 4 > first._3)
      return unknown
    val brand = fourcc(b, first._2.toInt)
    var timescale = -1L
    var duration = -1L
    var nTracks = 0
    var width = -1
    var height = -1
    var off = first._3
    while (off < end) {
      val box = boxAt(b, off, end)
      if (box == null) return unknown
      if (box._1 == "moov") {
        // walk moov children
        var c = box._2
        while (c < box._3) {
          val child = boxAt(b, c, box._3)
          if (child == null) return unknown
          child._1 match {
            case "mvhd" if timescale < 0 =>
              val body = child._2.toInt
              if (child._2 + 1 > child._3) return unknown
              val v = b(body) & 0xff
              if (v == 1 && child._2 + 4 + 28 <= child._3) {
                timescale = be32(b, body + 4 + 16)
                duration = be64(b, body + 4 + 20)
              } else if (v == 0 && child._2 + 4 + 16 <= child._3) {
                timescale = be32(b, body + 4 + 8)
                duration = be32(b, body + 4 + 12)
              } else return unknown
            case "trak" =>
              nTracks += 1
              // find tkhd among the trak's children
              var t = child._2
              while (t < child._3) {
                val tb = boxAt(b, t, child._3)
                if (tb == null) return unknown
                if (tb._1 == "tkhd" && width < 0) {
                  val body = tb._2.toInt
                  if (tb._2 + 1 > tb._3) return unknown
                  val v = b(body) & 0xff
                  // dims at the fullbox tail — after version/flags:
                  // v0 times/ids/duration 20 + reserved 8 + layer/
                  // group/volume/reserved 8 + matrix 36 = 72; v1's
                  // 64-bit times/duration add 12
                  val dimsOff = if (v == 1) body + 4 + 84 else body + 4 + 72
                  if (dimsOff + 8 <= tb._3) {
                    val w = be16(b, dimsOff)     // 16.16 integer part
                    val h = be16(b, dimsOff + 4)
                    if (w > 0 && h > 0) { width = w; height = h }
                  }
                }
                t = tb._3
              }
            case _ => ()
          }
          c = child._3
        }
      }
      off = box._3
    }
    if (timescale < 0) return unknown
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(7)
    r.update(0, UTF8String.fromString("mp4"))
    r.update(1, UTF8String.fromString(brand))
    r.update(2, timescale)
    r.update(3, duration)
    r.update(4, nTracks)
    if (width > 0) { r.update(5, width); r.update(6, height) }
    r
  }
}

/** Synthesize a minimal VALID ISO-BMFF container — [[Mp4Meta]]'s
  * encode∘decode == id partner (the EncodeWavPcm16 pattern): ftyp
  * ("isom") + moov(mvhd v0 + `nTracks` × trak(tkhd v0)) + an mdat
  * whose bytes derive from md5(seed) blocks. Track dims are written as
  * 16.16 fixed point; every size field is exact, so the decoder's
  * analytic output is (timescale, duration, nTracks, width, height)
  * verbatim.
  */
case class EncodeMp4(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.size == 6,
    "EncodeMp4(timescale, duration, nTracks, width, height, seed)")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "encode_mp4"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val timescale = vs(0).asInstanceOf[Long]
    val duration = vs(1).asInstanceOf[Long]
    val nTracks = math.min(math.max(vs(2).asInstanceOf[Long], 0L), 64L).toInt
    val width = vs(3).asInstanceOf[Long].toInt
    val height = vs(4).asInstanceOf[Long].toInt
    val seed = vs(5).asInstanceOf[UTF8String].toString
    val mdatBody = 16
    val moovLen = 8 + 108 + nTracks * (8 + 92)
    val out = java.nio.ByteBuffer.allocate(24 + moovLen + 8 + mdatBody)
    def cc(s: String) = out.put(s.getBytes("US-ASCII"))
    // ftyp: 8 header + major 4 + minor 4 + 2 compatible brands = 24
    out.putInt(24); cc("ftyp"); cc("isom"); out.putInt(0)
    cc("iso2"); cc("mp41")
    // moov
    out.putInt(moovLen); cc("moov")
    out.putInt(108); cc("mvhd"); out.putInt(0) // version 0 + flags
    out.putInt(0).putInt(0)                    // ctime, mtime
    out.putInt(timescale.toInt).putInt(duration.toInt)
    out.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume
    out.putLong(0L)                            // reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(out.putInt)                     // unity matrix
    (0 until 6).foreach(_ => out.putInt(0))    // pre_defined
    out.putInt(nTracks + 1)                    // next_track_ID
    var tid = 1
    while (tid <= nTracks) {
      out.putInt(8 + 92); cc("trak")
      out.putInt(92); cc("tkhd"); out.putInt(7) // v0, flags: enabled
      out.putInt(0).putInt(0)                   // ctime, mtime
      out.putInt(tid).putInt(0)                 // track_ID, reserved
      out.putInt(duration.toInt)
      out.putLong(0L)                           // reserved
      out.putShort(0).putShort(0).putShort(0).putShort(0) // layer/group/volume/rsvd
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(out.putInt)
      out.putInt(width << 16).putInt(height << 16) // 16.16 fixed
      tid += 1
    }
    // mdat with seeded filler
    out.putInt(8 + mdatBody); cc("mdat")
    out.put(java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8")))
    out.array()
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EncodeMp4 =
    copy(children = newChildren)
}

object EncodeMp4 {
  def apply(timescale: Column, duration: Column, nTracks: Column,
      width: Column, height: Column, seed: Column): Column =
    ColumnBridge.column(EncodeMp4(Seq(timescale, duration, nTracks,
      width, height, seed).map(ColumnBridge.expression)))
}
