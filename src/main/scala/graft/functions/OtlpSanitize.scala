package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native implementations of the OTLP LOGS-path attribute family
  * (`writer otlplogs.go:98-145`): SanitizeKey + SanitizeValue rendering
  * (kvlist → sorted-key JSON object, array → JSON array, scalars
  * Go-style), folded last-wins. The composed Column forms
  * (`WireFormats.attrsToMapSanitizedSpec` / `bodyStrSpec` /
  * `attrsToMapSpec`) survive as executable specs with differential tests;
  * the decode paths run these compiled walks — the recursive
  * `transform`/`to_json`/`map_from_entries`/`array_sort` trees were
  * interpreted per element and dominated the otlp-logs/metrics decode at
  * sf1 (same HOF-tax story as [[TraceAttrs]]).
  *
  * Rendering parity notes (each pinned by the differential tests):
  *   - doubles reproduce the Column `goFloatStr` branch-for-branch,
  *     including the decimal(38,18) HALF_UP mid-band (Spark's double→
  *     decimal cast goes through `BigDecimal.valueOf`, i.e. shortest
  *     `Double.toString` digits — NOT the exact binary expansion);
  *   - JSON escaping matches Jackson (Spark `to_json`): `"` `\` and
  *     control chars, `\b \t \n \f \r` named, the rest `\u00XX`;
  *   - kvlist keys sort AFTER sanitization; sanitized keys are ASCII so
  *     String order equals the UTF8String binary order `array_sort` uses.
  */
object OtlpSanitizeUtil extends Serializable {

  private val WellFormedKey =
    java.util.regex.Pattern.compile("^[a-zA-Z_][a-zA-Z0-9_]*$")

  /** `SanitizeKey` (`otlplogs.go:103-114`), identical to the Column form. */
  def sanitizeKey(k: String): String =
    if (WellFormedKey.matcher(k).find()) k
    else {
      val sb = new java.lang.StringBuilder(k.length + 1)
      var i = 0
      while (i < k.length) {
        val c = k.charAt(i)
        sb.append(
          if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9') || c == '_') c
          else '_')
        i += 1
      }
      val s = sb.toString
      if (s.isEmpty || (s.charAt(0) >= '0' && s.charAt(0) <= '9')) "_" + s
      else s
    }

  /** Go `FormatFloat(f,'f',-1,64)` as the Column `goFloatStr` computes it,
    * branch order preserved.
    */
  def goFloatStr(d: Double): String = {
    if (math.abs(d) < 9e18 && d == math.floor(d) && !d.isInfinite)
      return java.lang.Long.toString(d.toLong)
    if (java.lang.Double.isNaN(d) || d.isInfinite) {
      if (java.lang.Double.isNaN(d)) return "NaN"
      return if (d > 0) "Infinity" else "-Infinity"
    }
    if (math.abs(d) < 1e-18 && d != 0.0) {
      val (sign, digits, expn) = eForm(d)
      val sb = new java.lang.StringBuilder(sign).append("0.")
      var i = 0
      while (i < -expn - 1) { sb.append('0'); i += 1 }
      return sb.append(digits).toString
    }
    if (math.abs(d) < 1e20) {
      val plain = java.math.BigDecimal.valueOf(d)
        .setScale(18, java.math.RoundingMode.HALF_UP).toPlainString
      // strip "\.?0+$": the 18-place string always carries a '.', so this
      // removes the zero tail (and the '.' itself when fully integral)
      var e = plain.length
      while (e > 0 && plain.charAt(e - 1) == '0') e -= 1
      if (e > 0 && plain.charAt(e - 1) == '.') e -= 1
      return plain.substring(0, e)
    }
    val (sign, digits, expn) = eForm(d)
    val sb = new java.lang.StringBuilder(sign).append(digits)
    while (sb.length - sign.length < expn + 1) sb.append('0')
    sb.toString
  }

  /** (sign, shortest digits with '.' removed and zero-tail stripped,
    * decimal exponent) of Java's E-form `Double.toString` — the Column
    * `javaEForm`. Only called on magnitudes where Java always renders
    * E-form.
    */
  private def eForm(d: Double): (String, String, Int) = {
    val s = java.lang.Double.toString(math.abs(d))
    val ei = s.indexOf('E')
    val mant = s.substring(0, ei).replace(".", "")
    var e = mant.length
    while (e > 1 && mant.charAt(e - 1) == '0') e -= 1
    (if (d < 0) "-" else "", mant.substring(0, e), Integer.parseInt(s.substring(ei + 1)))
  }

  /** Jackson-style JSON string escape (what Spark `to_json` emits). */
  private def jsonEscape(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\f' => sb.append("\\f")
        case '\r' => sb.append("\\r")
        case c if c < ' ' =>
          sb.append("\\u").append(f"${c.toInt}%04X")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"'): Unit
  }

  /** leafStr: first non-null of string/int/goFloat(double)/bool/bytes. */
  private def leafStr(v: InternalRow): UTF8String =
    if (!v.isNullAt(0)) v.getUTF8String(0)
    else if (!v.isNullAt(1)) v.getUTF8String(1)
    else if (!v.isNullAt(2)) UTF8String.fromString(goFloatStr(v.getDouble(2)))
    else if (!v.isNullAt(3))
      UTF8String.fromString(if (v.getBoolean(3)) "true" else "false")
    else if (!v.isNullAt(4)) v.getUTF8String(4)
    else null

  /** SanitizeValue rendering of an AnyValue struct (never null: "" when
    * nothing matches — the Column form's final coalesce).
    */
  def render(v: InternalRow, depth: Int): String = {
    val leaf = leafStr(v)
    if (leaf != null) return leaf.toString
    if (depth <= 0 || v.numFields <= 5) return ""
    val childFields = if (depth - 1 > 0) 7 else 5
    if (!v.isNullAt(5)) {
      val kvl = v.getStruct(5, 1)
      if (!kvl.isNullAt(0)) {
        val arr = kvl.getArray(0)
        // last-wins on sanitized keys, then sort — mirrors
        // entriesLastWins → map_entries → array_sort → to_json
        val keys = new java.util.ArrayList[String]()
        val vals = new java.util.HashMap[String, String]()
        var i = 0
        val n = arr.numElements()
        while (i < n) {
          if (!arr.isNullAt(i)) {
            val kv = arr.getStruct(i, 2)
            if (kv.isNullAt(0))
              throw new IllegalArgumentException("Cannot use null as map key")
            val k = sanitizeKey(kv.getUTF8String(0).toString)
            val rv =
              if (kv.isNullAt(1)) ""
              else render(kv.getStruct(1, childFields), depth - 1)
            if (vals.put(k, rv) == null) keys.add(k)
            i += 1
          } else i += 1
        }
        java.util.Collections.sort(keys)
        val sb = new java.lang.StringBuilder(64)
        sb.append('{')
        var j = 0
        while (j < keys.size) {
          if (j > 0) sb.append(',')
          jsonEscape(sb, keys.get(j))
          sb.append(':')
          jsonEscape(sb, vals.get(keys.get(j)))
          j += 1
        }
        sb.append('}')
        return sb.toString
      }
    }
    if (!v.isNullAt(6)) {
      val av = v.getStruct(6, 1)
      if (!av.isNullAt(0)) {
        val arr = av.getArray(0)
        val sb = new java.lang.StringBuilder(64)
        sb.append('[')
        var i = 0
        val n = arr.numElements()
        while (i < n) {
          if (i > 0) sb.append(',')
          if (arr.isNullAt(i)) jsonEscape(sb, "")
          else jsonEscape(sb, render(arr.getStruct(i, childFields), depth - 1))
          i += 1
        }
        sb.append(']')
        return sb.toString
      }
    }
    ""
  }

  /** attrsToMapSanitized: sanitize keys, render values, fold last-wins. */
  def sanitizedAttrs(attrs: ArrayData, depth: Int): AnyRef = {
    val pairs = new MapMergeUtil.Pairs(attrs.numElements())
    var i = 0
    val n = attrs.numElements()
    while (i < n) {
      if (!attrs.isNullAt(i)) {
        val a = attrs.getStruct(i, 2)
        if (a.isNullAt(0))
          throw new IllegalArgumentException("Cannot use null as map key")
        val k = UTF8String.fromString(sanitizeKey(a.getUTF8String(0).toString))
        val v =
          if (a.isNullAt(1)) UTF8String.EMPTY_UTF8
          else UTF8String.fromString(
            render(a.getStruct(1, if (depth > 0) 7 else 5), depth))
        pairs.put(k, v)
      }
      i += 1
    }
    pairs.toMap
  }

  /** attrsToMap (traces-/metrics-style scalar labels): raw keys, leafStr
    * values (null when no scalar — map_concat keeps null values), fold
    * last-wins.
    */
  def plainAttrs(attrs: ArrayData, depth: Int): AnyRef = {
    val pairs = new MapMergeUtil.Pairs(attrs.numElements())
    var i = 0
    val n = attrs.numElements()
    while (i < n) {
      if (!attrs.isNullAt(i)) {
        val a = attrs.getStruct(i, 2)
        if (a.isNullAt(0))
          throw new IllegalArgumentException("Cannot use null as map key")
        val v =
          if (a.isNullAt(1)) null
          else leafStr(a.getStruct(1, if (depth > 0) 7 else 5))
        pairs.put(a.getUTF8String(0), v)
      }
      i += 1
    }
    pairs.toMap
  }
}

private[functions] object OtlpAttrSchema {
  /** Nest depth from an AnyValue StructType (7 fields while nested levels
    * remain, 5 at the innermost) — the walkers need exact per-level
    * UnsafeRow field counts.
    */
  def depthOf(t: DataType): Int = {
    @annotation.tailrec
    def loop(s: StructType, d: Int): Int =
      if (s.length <= 5) d
      else s("kvlistValue").dataType.asInstanceOf[StructType]("values")
        .dataType.asInstanceOf[ArrayType].elementType
        .asInstanceOf[StructType]("value").dataType match {
        case v: StructType => loop(v, d + 1)
        case _ => d
      }
    t match {
      case s: StructType => loop(s, 0)
      case _ => 0
    }
  }

  def isAnyValue(t: DataType): Boolean = t match {
    case v: StructType => v.length >= 5 &&
      v.fieldNames.take(5).sameElements(Array("stringValue", "intValue",
        "doubleValue", "boolValue", "bytesValue")) &&
      (v.length == 5 || (v.length == 7 &&
        v.fieldNames(5) == "kvlistValue" && v.fieldNames(6) == "arrayValue"))
    case _ => false
  }

  def isAttrArray(t: DataType): Boolean = t match {
    case ArrayType(s: StructType, _) =>
      s.length == 2 && s.fieldNames.sameElements(Array("key", "value")) &&
        isAnyValue(s("value").dataType)
    case _ => false
  }

  def attrDepth(t: DataType): Int = t match {
    case ArrayType(s: StructType, _) => depthOf(s("value").dataType)
    case _ => 0
  }
}

/** attrsToMapSanitized as one compiled pass. */
case class OtlpSanitizedAttrs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MapMergeTypes.StrMap
  override def nullIntolerant: Boolean = true
  private lazy val depth = OtlpAttrSchema.attrDepth(child.dataType)
  override def checkInputDataTypes(): TypeCheckResult =
    if (OtlpAttrSchema.isAttrArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"otlp_sanitized_attrs needs array<struct<key, AnyValue>>, got ${child.dataType.simpleString}")
  override def nullSafeEval(a: Any): Any =
    OtlpSanitizeUtil.sanitizedAttrs(a.asInstanceOf[ArrayData], depth)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val util = ctx.addReferenceObj("otlpSanitizeUtil", OtlpSanitizeUtil,
        OtlpSanitizeUtil.getClass.getName.stripSuffix("$") + "$")
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.MapData) " +
        s"$util.sanitizedAttrs($a, $depth);"
    })
  override protected def withNewChildInternal(newChild: Expression): OtlpSanitizedAttrs =
    copy(child = newChild)
}

/** attrsToMap (scalar leaf labels) as one compiled pass. */
case class OtlpPlainAttrs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MapMergeTypes.StrMap
  override def nullIntolerant: Boolean = true
  private lazy val depth = OtlpAttrSchema.attrDepth(child.dataType)
  override def checkInputDataTypes(): TypeCheckResult =
    if (OtlpAttrSchema.isAttrArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"otlp_plain_attrs needs array<struct<key, AnyValue>>, got ${child.dataType.simpleString}")
  override def nullSafeEval(a: Any): Any =
    OtlpSanitizeUtil.plainAttrs(a.asInstanceOf[ArrayData], depth)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val util = ctx.addReferenceObj("otlpSanitizeUtil", OtlpSanitizeUtil,
        OtlpSanitizeUtil.getClass.getName.stripSuffix("$") + "$")
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.MapData) " +
        s"$util.plainAttrs($a, $depth);"
    })
  override protected def withNewChildInternal(newChild: Expression): OtlpPlainAttrs =
    copy(child = newChild)
}

/** SanitizeValue body rendering as one compiled pass. Null input → null
  * (nullIntolerant); the Column wrapper coalesces to "" like the spec
  * form's final lit("").
  */
case class OtlpAnyValueStr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  private lazy val depth = OtlpAttrSchema.depthOf(child.dataType)
  override def checkInputDataTypes(): TypeCheckResult =
    if (OtlpAttrSchema.isAnyValue(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"otlp_any_value_str needs an AnyValue struct, got ${child.dataType.simpleString}")
  override def nullSafeEval(a: Any): Any = UTF8String.fromString(
    OtlpSanitizeUtil.render(a.asInstanceOf[InternalRow], depth))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val util = ctx.addReferenceObj("otlpSanitizeUtil", OtlpSanitizeUtil,
        OtlpSanitizeUtil.getClass.getName.stripSuffix("$") + "$")
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$util.render($a, $depth));"
    })
  override protected def withNewChildInternal(newChild: Expression): OtlpAnyValueStr =
    copy(child = newChild)
}

object OtlpSanitize {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def sanitizedAttrs(attrs: Column): Column =
    ColumnBridge.column(OtlpSanitizedAttrs(ColumnBridge.expr(attrs)))

  def plainAttrs(attrs: Column): Column =
    ColumnBridge.column(OtlpPlainAttrs(ColumnBridge.expr(attrs)))

  def anyValueStr(value: Column): Column =
    ColumnBridge.column(OtlpAnyValueStr(ColumnBridge.expr(value)))
}
