package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL pure-JVM JPEG/Exif metadata parse (M17) — the image-side twin
  * of [[Mp4Meta]]'s box walk, over the published JPEG (ITU T.81
  * marker segments) and Exif/TIFF (CIPA DC-008; TIFF 6.0 IFD) layouts:
  * walk marker segments from SOI to the first APP1 carrying
  * "Exif\0\0", then parse the embedded TIFF header (II little / MM
  * big byte order, magic 42, IFD0 offset) and scan IFD0's 12-byte
  * entries for Orientation (tag 0x0112, SHORT) and Make (tag 0x010F,
  * ASCII ≤ 4 bytes inline; longer makes live behind value offsets and
  * read from the offset when addressable). Orientation is what an
  * image pipeline must honor BEFORE any resize/crop — a rotated
  * training image with the flag dropped is silently wrong data.
  *
  * Never-crash contract (the decodeWav/Mp4 cursor discipline): every
  * segment length and IFD offset is validated to advance strictly
  * forward within addressable range before use; any malformed field
  * degrades the parse to format = "unknown". Nothing is allocated
  * from declared sizes.
  *
  * Returned struct: format "jpeg-exif" | "unknown"; byte_order
  * "II"|"MM"; orientation 1–8 (null when absent); make (null when
  * absent); n_entries = IFD0 entry count.
  */
case class ExifMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ExifMeta.schema
  override def prettyName: String = "exif_meta"

  override protected def nullSafeEval(input: Any): Any =
    ExifMeta.decode(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): ExifMeta =
    copy(child = newChild)
}

object ExifMeta {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("byte_order", StringType),
    StructField("orientation", IntegerType),
    StructField("make", StringType),
    StructField("n_entries", IntegerType)))

  def apply(bin: Column): Column =
    ColumnBridge.column(ExifMeta(ColumnBridge.expression(bin)))

  private val unknown: InternalRow = {
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(5)
    r.update(0, UTF8String.fromString("unknown"))
    r
  }

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private[graft] def decode(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return unknown // SOI
    // marker walk: FF xx [2-byte len incl. itself] payload
    var off = 2
    while (off + 4 <= n) {
      if (u8(b, off) != 0xff) return unknown
      val marker = u8(b, off + 1)
      if (marker == 0xd9 || marker == 0xda) return unknown // EOI/SOS first
      val segLen = be16(b, off + 2)
      if (segLen < 2 || off + 2 + segLen > n) return unknown
      val body = off + 4
      val bodyEnd = off + 2 + segLen
      if (marker == 0xe1 && bodyEnd - body >= 6 &&
          b(body) == 'E' && b(body + 1) == 'x' && b(body + 2) == 'i' &&
          b(body + 3) == 'f' && b(body + 4) == 0 && b(body + 5) == 0)
        return parseTiff(b, body + 6, bodyEnd)
      off = bodyEnd
    }
    unknown
  }

  /** TIFF header + IFD0 within [tiff, end). */
  private def parseTiff(b: Array[Byte], tiff: Int, end: Int): InternalRow = {
    if (tiff + 8 > end) return unknown
    val little =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return unknown
    def r16(o: Int): Int =
      if (little) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) else be16(b, o)
    def r32(o: Int): Long =
      if (little)
        (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
          ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else
        ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
          ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    if (r16(tiff + 2) != 42) return unknown
    val ifd0 = r32(tiff + 4)
    if (ifd0 < 8 || tiff + ifd0 + 2 > end) return unknown
    val ifdStart = tiff + ifd0.toInt
    val count = r16(ifdStart)
    if (ifdStart + 2 + count * 12 > end) return unknown
    var orientation: Integer = null
    var make: UTF8String = null
    var i = 0
    while (i < count) {
      val e = ifdStart + 2 + i * 12
      val tag = r16(e)
      val typ = r16(e + 2)
      val cnt = r32(e + 4)
      if (tag == 0x0112 && typ == 3 && cnt == 1L)
        orientation = r16(e + 8)
      else if (tag == 0x010f && typ == 2 && cnt >= 1L) {
        val len = cnt.toInt
        val at =
          if (cnt <= 4L) e + 8
          else {
            val vo = r32(e + 8)
            if (vo < 0 || tiff + vo + cnt > end) -1 else tiff + vo.toInt
          }
        if (at >= 0) {
          // ASCII, NUL-terminated inside the declared count
          var l = 0
          while (l < len && b(at + l) != 0) l += 1
          make = UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, at, at + l))
        }
      }
      i += 1
    }
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(5)
    r.update(0, UTF8String.fromString("jpeg-exif"))
    r.update(1, UTF8String.fromString(if (little) "II" else "MM"))
    if (orientation != null) r.update(2, orientation.intValue())
    if (make != null) r.update(3, make)
    r.update(4, count)
    r
  }
}

/** Synthesize a minimal VALID JPEG carrying an Exif APP1 —
  * [[ExifMeta]]'s encode∘decode == id partner (the EncodeMp4
  * pattern): SOI + APP1("Exif\0\0" + TIFF header in the requested
  * byte order + IFD0 with a Make entry (inline ≤4-byte ASCII) and an
  * Orientation entry) + EOI. Every offset/length exact, so the
  * decoder's analytic output is (byte order, orientation, make,
  * entry count) verbatim.
  */
case class EncodeExifJpeg(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.size == 3,
    "EncodeExifJpeg(orientation, make, bigEndian)")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "encode_exif_jpeg"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val orientation = vs(0).asInstanceOf[Long].toInt
    val makeRaw = vs(1).asInstanceOf[UTF8String].toString
    val big = vs(2).asInstanceOf[Boolean]
    val make = makeRaw.take(3) // inline value slot: ≤3 chars + NUL
    val makeBytes = make.getBytes("US-ASCII")

    val entries = 2
    val ifdLen = 2 + entries * 12 + 4
    val tiffLen = 8 + ifdLen
    val app1Body = 6 + tiffLen
    val segLen = 2 + app1Body
    val out = java.nio.ByteBuffer.allocate(2 + 2 + segLen + 2)
    def p16(v: Int): Unit = {
      if (big) { out.put(((v >> 8) & 0xff).toByte).put((v & 0xff).toByte) }
      else { out.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte) }
      ()
    }
    def p32(v: Long): Unit = {
      if (big) {
        out.put(((v >> 24) & 0xff).toByte).put(((v >> 16) & 0xff).toByte)
          .put(((v >> 8) & 0xff).toByte).put((v & 0xff).toByte)
      } else {
        out.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte)
          .put(((v >> 16) & 0xff).toByte).put(((v >> 24) & 0xff).toByte)
      }
      ()
    }
    out.put(0xff.toByte).put(0xd8.toByte) // SOI
    out.put(0xff.toByte).put(0xe1.toByte) // APP1
    out.put(((segLen >> 8) & 0xff).toByte).put((segLen & 0xff).toByte)
    out.put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
    out.put((if (big) "MM" else "II").getBytes("US-ASCII"))
    p16(42); p32(8L) // magic + IFD0 at offset 8
    p16(entries)
    // Make (0x010F, ASCII, count = len+1 incl. NUL, inline)
    p16(0x010f); p16(2); p32(makeBytes.length + 1L)
    val pad = 4 - (makeBytes.length + 1)
    out.put(makeBytes).put(0.toByte)
    (0 until pad).foreach(_ => out.put(0.toByte))
    // Orientation (0x0112, SHORT, count 1, value in first two bytes)
    p16(0x0112); p16(3); p32(1L)
    p16(orientation); p16(0)
    p32(0L) // next IFD
    out.put(0xff.toByte).put(0xd9.toByte) // EOI
    out.array()
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EncodeExifJpeg =
    copy(children = newChildren)
}

object EncodeExifJpeg {
  def apply(orientation: Column, make: Column, bigEndian: Column): Column =
    ColumnBridge.column(EncodeExifJpeg(
      Seq(orientation, make, bigEndian).map(ColumnBridge.expression)))
}
