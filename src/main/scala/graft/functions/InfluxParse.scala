package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native parse of Influx line-protocol FIELD and TAG strings
  * (`writer/utils/unmarshal/influx.go:17-60` via go-logfmt). The composed
  * Column forms (`WireFormats.influxFieldsSpec` / `influxTagsSpec`)
  * survive as executable specs with differential tests; the decode path
  * runs these. Why native: the composed field pipeline ran ~15
  * interpreted regex/branch nodes per FIELD inside nested `transform`
  * lambdas (4 classification rlikes + unescape/strip/quote replaces +
  * the full goFloatStrG expression tree) — `ingest_influx_logs_roundtrip`
  * was the slowest decode at sf1. Here the same regexes run precompiled
  * in one loop and the classification/rendering is plain Java.
  */
object InfluxParseUtil extends Serializable {

  import java.util.regex.Pattern

  // the EXACT patterns of the Column spec — find()-scanned, so separators
  // between matches are skipped identically
  private val PairP = Pattern.compile(
    """(?:[^,=\s\\]|\\.)+=(?:"(?:[^"\\]|\\.)*"|(?:[^,\\]|\\.)*)""")
  private val TagP = Pattern.compile("""(?:[^,=\\]|\\.)+=(?:[^,\\]|\\.)*""")
  private val PairKeyP = Pattern.compile("""^((?:[^,=\s\\]|\\.)+)=""")
  private val TagKeyP = Pattern.compile("""^((?:[^,=\\]|\\.)+)=""")
  private val QuotedP = Pattern.compile("""^"((?:[^"\\]|\\.)*)"$""")
  private val IntP = Pattern.compile("""^-?[0-9]+[iu]$""")
  private val FloatP = Pattern.compile(
    """^-?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?$""")
  private val BoolP = Pattern.compile(
    """^(?:t|T|true|True|TRUE|f|F|false|False|FALSE)$""")
  private val SanKeyP = Pattern.compile("(^[^a-zA-Z_]|[^a-zA-Z0-9_])")
  private val UnescP = Pattern.compile("""\\(.)""")
  private val StrUnescP = Pattern.compile("""\\(["\\])""")
  private val LfNeedsQuoteP = Pattern.compile("""[ ="]""")
  private val LfEscP = Pattern.compile("""(["\\])""")

  private def unesc(s: String): String =
    UnescP.matcher(s).replaceAll("$1")

  /** Go `%v` float rendering ('g' shortest): e-notation outside
    * [1e-4, 1e21), matching the Column `goFloatStrG` branch-for-branch.
    */
  def goFloatStrG(d: Double): String = {
    if (math.abs(d) >= 1e21 || (d != 0.0 && math.abs(d) < 1e-4)) {
      if (java.lang.Double.isNaN(d)) return "NaN"
      if (d.isInfinite) return if (d > 0) "Infinity" else "-Infinity"
      val s = java.lang.Double.toString(math.abs(d))
      // Java renders plain decimal only inside [1e-3, 1e7); this branch is
      // entered only for |d| >= 1e21 or |d| < 1e-4, so E-form is guaranteed
      val ei = s.indexOf('E')
      assert(ei >= 0, s"expected E-form from Double.toString($d), got $s")
      val mantAll = s.substring(0, ei).replace(".", "")
      val expn = Integer.parseInt(s.substring(ei + 1))
      var e = mantAll.length
      while (e > 1 && mantAll.charAt(e - 1) == '0') e -= 1
      val digits = mantAll.substring(0, e)
      val sb = new java.lang.StringBuilder(if (d < 0) "-" else "")
      if (digits.length > 1)
        sb.append(digits.charAt(0)).append('.').append(digits, 1, digits.length)
      else sb.append(digits)
      sb.append('e').append(if (expn < 0) '-' else '+')
      val ae = math.abs(expn)
      if (ae < 10) sb.append('0')
      sb.append(ae)
      sb.toString
    } else OtlpSanitizeUtil.goFloatStr(d)
  }

  /** fieldstr → array<struct<k, sv, num, lf, sn>> — the staged transform
    * chain of the spec in one loop.
    */
  def fields(fieldstr: UTF8String): GenericArrayData = {
    val s = fieldstr.toString
    val m = PairP.matcher(s)
    val out = new java.util.ArrayList[InternalRow]()
    while (m.find()) {
      val pair = m.group()
      val km = PairKeyP.matcher(pair)
      val (k, raw) =
        if (km.find()) (unesc(km.group(1)), pair.substring(km.end()))
        else ("", pair)
      var sv: String = null
      var num: java.lang.Double = null
      if (raw.startsWith("\"")) {
        val qm = QuotedP.matcher(raw)
        sv = if (qm.find()) StrUnescP.matcher(qm.group(1)).replaceAll("$1")
          else ""
      } else if (IntP.matcher(raw).find()) {
        val stripped = raw.substring(0, raw.length - 1)
        sv = stripped
        num = java.lang.Double.valueOf(stripped.toDouble)
      } else if (FloatP.matcher(raw).find()) {
        val d = java.lang.Double.parseDouble(raw)
        // overflow floats ("1e309") parse Infinity; the spec's eform
        // renders NULL there (its digit/exponent extraction comes up
        // empty), which nulls sv and lf while num keeps the Infinity
        sv = if (d.isInfinite) null else goFloatStrG(d)
        num = java.lang.Double.valueOf(d)
      } else if (BoolP.matcher(raw).find()) {
        sv = if (raw.charAt(0) == 't' || raw.charAt(0) == 'T') "true" else "false"
      } else sv = raw
      val lf =
        if (sv == null) null
        else if (LfNeedsQuoteP.matcher(sv).find())
          "\"" + LfEscP.matcher(sv).replaceAll("\\\\$1") + "\""
        else sv
      val sn = SanKeyP.matcher(k).replaceAll("_")
      out.add(InternalRow(UTF8String.fromString(k), UTF8String.fromString(sv),
        num, UTF8String.fromString(lf), UTF8String.fromString(sn)))
    }
    new GenericArrayData(out.toArray)
  }

  /** tagstr → last-wins map of sanitized keys → truncated unescaped
    * values (the spec's entriesToMapLastWins fold).
    */
  def tags(tagstr: UTF8String): AnyRef = {
    val s = tagstr.toString
    val m = TagP.matcher(s)
    val pairs = new MapMergeUtil.Pairs(8)
    while (m.find()) {
      val t = m.group()
      val km = TagKeyP.matcher(t)
      val (k, rawv) =
        if (km.find()) (unesc(km.group(1)), t.substring(km.end()))
        else ("", t)
      val v0 = unesc(rawv)
      // trunc matches the Column length()/substring() semantics, which
      // count code points, not UTF-16 units
      val v =
        if (v0.codePointCount(0, v0.length) > 100)
          v0.substring(0, v0.offsetByCodePoints(0, 100)) + "..."
        else v0
      pairs.put(UTF8String.fromString(SanKeyP.matcher(k).replaceAll("_")),
        UTF8String.fromString(v))
    }
    pairs.toMap
  }
}

object InfluxParseTypes {
  val FieldStruct: StructType = StructType(Seq(
    StructField("k", StringType), StructField("sv", StringType),
    StructField("num", DoubleType), StructField("lf", StringType),
    StructField("sn", StringType)))
}

case class InfluxFieldsParse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(InfluxParseTypes.FieldStruct)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"influx_fields needs a string input, got ${other.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    InfluxParseUtil.fields(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val util = ctx.addReferenceObj("influxParseUtil", InfluxParseUtil,
        InfluxParseUtil.getClass.getName.stripSuffix("$") + "$")
      s"${ev.value} = $util.fields($a);"
    })
  override protected def withNewChildInternal(newChild: Expression): InfluxFieldsParse =
    copy(child = newChild)
}

case class InfluxTagsParse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MapMergeTypes.StrMap
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"influx_tags needs a string input, got ${other.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    InfluxParseUtil.tags(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val util = ctx.addReferenceObj("influxParseUtil", InfluxParseUtil,
        InfluxParseUtil.getClass.getName.stripSuffix("$") + "$")
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.MapData) $util.tags($a);"
    })
  override protected def withNewChildInternal(newChild: Expression): InfluxTagsParse =
    copy(child = newChild)
}

object InfluxParse {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def fields(fieldstr: Column): Column =
    ColumnBridge.column(InfluxFieldsParse(ColumnBridge.expr(fieldstr)))

  def tags(tagstr: Column): Column =
    ColumnBridge.column(InfluxTagsParse(ColumnBridge.expr(tagstr)))
}
