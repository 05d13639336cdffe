package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-format probe for opaque media columns: detect the format and
  * pixel dimensions from the binary HEADER alone — the part of multimodal
  * decode that needs no codec library, in pure JVM byte arithmetic
  * (PNG IHDR, GIF logical screen descriptor, BMP info header, JPEG SOF
  * marker scan, RIFF/WAVE fmt chunk, RIFF/WEBP VP8/VP8L/VP8X, ISO-BMFF
  * moov/trak/tkhd). A 100 TB curation pipeline runs exactly this pass to
  * filter by resolution / aspect ratio / format BEFORE paying for full
  * decode; the codec-backed decode stays behind the mapPartitions stub in
  * [[graft.llm.Multimodal]].
  */
object MediaProbeUtil extends Serializable {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def be64(b: Array[Byte], i: Int): Long =
    ((be32(b, i).toLong & 0xffffffffL) << 32) |
      (be32(b, i + 4).toLong & 0xffffffffL)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le24(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def tag4(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0).toByte && b(i + 1) == t.charAt(1).toByte &&
      b(i + 2) == t.charAt(2).toByte && b(i + 3) == t.charAt(3).toByte

  private def row(fmt: String, w: java.lang.Integer, h: java.lang.Integer) =
    InternalRow(UTF8String.fromString(fmt), w, h)

  /** JPEG marker-segment walk to the first SOFn (C0-CF minus C4/C8/CC).
    * Real streams carry 0xFF fill bytes before markers and standalone
    * (length-less) markers — TEM 0x01, RSTn D0-D7, SOI D8 — so the walk
    * consumes repeated 0xFF, advances standalone markers without reading
    * a length, and stops at EOI/SOS (SOF must precede scan data).
    */
  private def jpegDims(b: Array[Byte]): InternalRow = {
    var i = 2
    while (i + 1 < b.length && b(i) == 0xff.toByte) {
      var j = i + 1
      while (j < b.length && b(j) == 0xff.toByte) j += 1 // fill bytes
      if (j >= b.length) return row("jpeg", null, null)
      val m = b(j) & 0xff
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        if (j + 8 <= b.length) return row("jpeg", be16(b, j + 6), be16(b, j + 4))
        return row("jpeg", null, null)
      } else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) {
        i = j + 1 // standalone marker: no length field
      } else if (m == 0xd9 || m == 0xda) {
        return row("jpeg", null, null) // EOI / start-of-scan: no SOF seen
      } else {
        if (j + 3 > b.length) return row("jpeg", null, null)
        i = j + 1 + be16(b, j + 1)
      }
    }
    row("jpeg", null, null)
  }

  /** WebP: the RIFF payload's first chunk decides the flavor — VP8 (lossy
    * frame header behind the 0x9D012A sync code, 14-bit dims), VP8L
    * (lossless, 14-bit minus-one dims packed little-endian behind 0x2F),
    * VP8X (extended, 24-bit minus-one dims).
    */
  private def webpDims(b: Array[Byte]): InternalRow = {
    if (b.length >= 30 && tag4(b, 12, "VP8 ") &&
      b(23) == 0x9d.toByte && b(24) == 0x01 && b(25) == 0x2a)
      return row("webp", le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff)
    if (b.length >= 25 && tag4(b, 12, "VP8L") && b(20) == 0x2f) {
      val bits = le32(b, 21)
      return row("webp", (bits & 0x3fff) + 1, ((bits >> 14) & 0x3fff) + 1)
    }
    if (b.length >= 30 && tag4(b, 12, "VP8X"))
      return row("webp", le24(b, 24) + 1, le24(b, 27) + 1)
    row("webp", null, null)
  }

  /** ISO-BMFF box walk: `start`/`end` bound a box sequence; calls `f` with
    * (type-offset, payload-start, payload-end) per box and returns its
    * first Some. Handles 64-bit largesize and size==0 ("to end of file");
    * every read is bounds-checked against the bytes actually present.
    */
  private def walkBoxes(b: Array[Byte], start: Long, end: Long)(
      f: (Int, Long, Long) => Option[InternalRow]): Option[InternalRow] = {
    var i = start
    while (i + 8 <= end && i + 8 <= b.length) {
      val ii = i.toInt
      val sz0 = be32(b, ii).toLong & 0xffffffffL
      val hdr = if (sz0 == 1) 16L else 8L
      val sz =
        if (sz0 == 0) end - i
        else if (sz0 == 1) {
          if (i + 16 > b.length) return None
          be64(b, ii + 8)
        } else sz0
      if (sz < hdr) return None // corrupt: box smaller than its header
      val r = f(ii + 4, i + hdr, math.min(i + sz, end))
      if (r.isDefined) return r
      i += sz
    }
    None
  }

  /** ISO-BMFF ftyp major brand → reported format. Any brand-carrying
    * container (HEIC, AVIF, M4A, MOV, …) shares the ftyp box, so the
    * brand — not the box structure — decides the label; an unknown but
    * well-formed brand is reported verbatim (lowercased) so a curation
    * filter keyed on format never silently buckets AVIF stills as video.
    */
  private def isoBrandFormat(b: Array[Byte]): String = {
    if (b.length < 12) return "unknown"
    val brand = new String(b, 8, 4, java.nio.charset.StandardCharsets.US_ASCII)
    brand match {
      case "isom" | "iso2" | "iso4" | "iso5" | "iso6" | "mp41" | "mp42" |
           "mp4v" | "avc1" | "dash" | "M4V " => "mp4"
      case "heic" | "heix" | "hevc" | "hevx" | "mif1" | "msf1" => "heic"
      case "avif" | "avis" => "avif"
      case "M4A " => "m4a"
      case "qt  " => "mov"
      case other =>
        val t = other.trim.toLowerCase
        if (t.nonEmpty && t.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')))
          t
        else "unknown"
    }
  }

  /** ISO-BMFF video dims: moov → trak → tkhd; width/height are 16.16 fixed
    * at payload offset 76 (version 0) / 88 (version 1). The first trak
    * with a nonzero width wins (audio traks carry 0×0). The format label
    * comes from the ftyp brand ([[isoBrandFormat]]); still-image brands
    * (heic/avif) keep their dims in meta/ispe, outside this walk, and
    * probe as (brand, null, null).
    */
  private def mp4Dims(b: Array[Byte]): InternalRow = {
    val fmt = isoBrandFormat(b)
    val dims = walkBoxes(b, 0L, b.length.toLong) { (t, ps, pe) =>
      if (!tag4(b, t, "moov")) None
      else walkBoxes(b, ps, pe) { (t2, ts, te) =>
        if (!tag4(b, t2, "trak")) None
        else walkBoxes(b, ts, te) { (t3, ks, ke) =>
          if (!tag4(b, t3, "tkhd") || ks >= b.length) None
          else {
            val off = (if ((b(ks.toInt) & 0xff) == 1) ks + 88 else ks + 76).toInt
            if (off + 8 > ke || off + 8 > b.length) None
            else {
              val w = be32(b, off) >>> 16
              val h = be32(b, off + 4) >>> 16
              if (w > 0) Some(row(fmt, w, h)) else None
            }
          }
        }
      }
    }
    dims.getOrElse(row(fmt, null, null))
  }

  def probe(b: Array[Byte]): InternalRow = {
    if (b.length >= 24 &&
      b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a)
      // IHDR is mandated first: width/height at fixed offsets 16/20
      return row("png", be32(b, 16), be32(b, 20))
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      return row("bmp", le32(b, 18), le32(b, 22))
    if (b.length >= 16 && tag4(b, 0, "RIFF") && tag4(b, 8, "WEBP"))
      return webpDims(b)
    if (b.length >= 44 && tag4(b, 0, "RIFF") && tag4(b, 8, "WAVE"))
      // "dimensions" of audio: channels × sample rate (fmt chunk at 12)
      return row("wav", le16(b, 22), le32(b, 24))
    if (b.length >= 12 && tag4(b, 4, "ftyp"))
      return mp4Dims(b)
    if (b.length >= 4 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte)
      return jpegDims(b)
    row("unknown", null, null)
  }
}

case class MediaProbe(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_probe needs a binary input, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    MediaProbeUtil.probe(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val util = ctx.addReferenceObj("mediaProbeUtil", MediaProbeUtil,
        MediaProbeUtil.getClass.getName.stripSuffix("$") + "$")
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $util.probe($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): MediaProbe =
    copy(child = newChild)
}

object MediaProbeFn {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def probe(media: Column): Column =
    ColumnBridge.column(MediaProbe(ColumnBridge.expr(media)))
}
