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
  * marker scan, RIFF/WAVE fmt chunk). A 100 TB curation pipeline runs
  * exactly this pass to filter by resolution / aspect ratio / format
  * BEFORE paying for full decode; the codec-backed decode stays behind
  * the mapPartitions stub in [[graft.llm.Multimodal]].
  */
object MediaProbeUtil extends Serializable {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def row(fmt: String, w: java.lang.Integer, h: java.lang.Integer) =
    InternalRow(UTF8String.fromString(fmt), w, h)

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
    if (b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
      // "dimensions" of audio: channels × sample rate (fmt chunk at 12)
      return row("wav", le16(b, 22), le32(b, 24))
    if (b.length >= 4 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte) {
      // JPEG: walk marker segments to the first SOFn (C0-CF minus
      // C4/C8/CC); height/width are big-endian at +5/+7 into the segment
      var i = 2
      while (i + 9 < b.length && b(i) == 0xff.toByte) {
        val m = b(i + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return row("jpeg", be16(b, i + 7), be16(b, i + 5))
        i += 2 + be16(b, i + 2)
      }
      return row("jpeg", null, null)
    }
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
