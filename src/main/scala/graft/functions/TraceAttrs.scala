package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native flattening of OTLP trace attributes
  * (`writer otlp.go:130-160` writeAttrValue / initAttributesMap):
  * `array<struct<key, AnyValue>>` → `map<string,string>` with nested
  * kvlist values flattened under dotted key prefixes, array values under
  * `.<index>` keys, scalars rendered Go-fmt style (`%f` fixed-six-decimal
  * doubles, `%v` bools, `%d`/passthrough ints), bytesValue dropped (no
  * case in the reference's switch), and key collisions last-wins.
  *
  * Why a native Expression: the composed form — a recursive
  * `transform`/`flatten`/`coalesce` tree per nesting level, folded by
  * MapEntriesLastWins — is a stack of higher-order functions, which Spark
  * evaluates interpreted with per-element lambda dispatch and per-level
  * intermediate entry arrays; the OTLP-trace decoder runs it twice per
  * span (resource + span attrs) and it kept the decode superlinear in the
  * sf1 scale runs. Same preference-order (b) rationale as [[MapMerge]]
  * and [[ClassTokens]]: the recursion is plain Java over InternalRows,
  * one output map allocation, codegen'd via a static helper call. The
  * composed Column form survives as the executable spec
  * (`WireFormats.traceAttrsToMapSpec`, differential-tested in
  * OtlpBodySpec).
  */
object TraceAttrsUtil extends Serializable {

  private val Dot = UTF8String.fromString(".")
  private val True = UTF8String.fromString("true")
  private val False = UTF8String.fromString("false")

  /** First non-null of stringValue/intValue/%f-double/bool — the scalar
    * coalesce order of the spec form. Leaf ordinals 0-4 are fixed by
    * `WireFormats.anyValueSchema`; bytesValue (4) intentionally dropped.
    */
  private def scalarOf(v: InternalRow): UTF8String =
    if (!v.isNullAt(0)) v.getUTF8String(0)
    else if (!v.isNullAt(1)) v.getUTF8String(1)
    else if (!v.isNullAt(2)) UTF8String.fromString(String.format(
      java.util.Locale.US, "%f", java.lang.Double.valueOf(v.getDouble(2))))
    else if (!v.isNullAt(3)) (if (v.getBoolean(3)) True else False)
    else null

  /** `depth` counts remaining nested levels: the value struct has 7 fields
    * (leaf + kvlistValue@5 + arrayValue@6) while depth > 0, 5 at the
    * innermost level — the exact UnsafeRow field counts matter.
    */
  private def walk(key: UTF8String, v: InternalRow, depth: Int,
      pairs: MapMergeUtil.Pairs): Unit = {
    val s = scalarOf(v)
    if (s != null) {
      // null keys propagate through the dotted concat (like Spark concat)
      // and only error when an entry is actually emitted — exactly where
      // the spec form's map() call would raise NULL_MAP_KEY
      if (key == null)
        throw new IllegalArgumentException("Cannot use null as map key")
      pairs.put(key, s); return
    }
    if (depth <= 0 || v.numFields <= 5) return
    val childFields = if (depth - 1 > 0) 7 else 5
    if (!v.isNullAt(5)) {
      val kvl = v.getStruct(5, 1)
      if (!kvl.isNullAt(0)) {
        val arr = kvl.getArray(0)
        var i = 0
        val n = arr.numElements()
        while (i < n) {
          if (!arr.isNullAt(i)) {
            val kv = arr.getStruct(i, 2)
            if (!kv.isNullAt(1)) {
              val ck =
                if (key == null || kv.isNullAt(0)) null
                else UTF8String.concat(key, Dot, kv.getUTF8String(0))
              walk(ck, kv.getStruct(1, childFields), depth - 1, pairs)
            }
          }
          i += 1
        }
        return
      }
    }
    if (!v.isNullAt(6)) {
      val av = v.getStruct(6, 1)
      if (!av.isNullAt(0)) {
        val arr = av.getArray(0)
        var i = 0
        val n = arr.numElements()
        while (i < n) {
          if (!arr.isNullAt(i)) {
            val ck =
              if (key == null) null
              else UTF8String.concat(key, Dot,
                UTF8String.fromString(java.lang.Integer.toString(i)))
            walk(ck, arr.getStruct(i, childFields), depth - 1, pairs)
          }
          i += 1
        }
      }
    }
  }

  /** attrs: array<struct<key, AnyValue(depth)>> → flattened last-wins map. */
  def flatten(attrs: ArrayData, depth: Int): AnyRef = {
    val pairs = new MapMergeUtil.Pairs(attrs.numElements())
    var i = 0
    val n = attrs.numElements()
    while (i < n) {
      if (!attrs.isNullAt(i)) {
        val a = attrs.getStruct(i, 2)
        if (!a.isNullAt(1))
          walk(a.getUTF8String(0), a.getStruct(1, if (depth > 0) 7 else 5),
            depth, pairs)
      }
      i += 1
    }
    pairs.toMap
  }
}

case class TraceAttrFlatten(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MapMergeTypes.StrMap
  override def nullIntolerant: Boolean = true

  /** Remaining nest levels, derived from the INPUT schema so the walker's
    * UnsafeRow field counts always match the actual layout.
    */
  private lazy val nestDepth: Int = {
    @annotation.tailrec
    def loop(t: StructType, d: Int): Int =
      if (t.length <= 5) d
      else t("kvlistValue").dataType.asInstanceOf[StructType]("values")
        .dataType.asInstanceOf[ArrayType].elementType
        .asInstanceOf[StructType]("value").dataType match {
        case s: StructType => loop(s, d + 1)
        case _ => d
      }
    child.dataType match {
      case ArrayType(s: StructType, _) =>
        s("value").dataType match {
          case v: StructType => loop(v, 0)
          case _ => 0
        }
      case _ => 0
    }
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s.fieldNames.sameElements(Array("key", "value")) &&
          (s("value").dataType match {
            case v: StructType => v.length >= 5 &&
              v.fieldNames.take(5).sameElements(Array("stringValue",
                "intValue", "doubleValue", "boolValue", "bytesValue")) &&
              (v.length == 5 || (v.length == 7 &&
                v.fieldNames(5) == "kvlistValue" && v.fieldNames(6) == "arrayValue"))
            case _ => false
          }) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"trace_attr_flatten needs array<struct<key, AnyValue>>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    TraceAttrsUtil.flatten(a.asInstanceOf[ArrayData], nestDepth)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val util = ctx.addReferenceObj("traceAttrsUtil", TraceAttrsUtil,
        TraceAttrsUtil.getClass.getName.stripSuffix("$") + "$")
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.MapData) " +
        s"$util.flatten($a, $nestDepth);"
    })

  override protected def withNewChildInternal(newChild: Expression): TraceAttrFlatten =
    copy(child = newChild)
}

object TraceAttrs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def flatten(attrs: Column): Column =
    ColumnBridge.column(TraceAttrFlatten(ColumnBridge.expr(attrs)))
}
