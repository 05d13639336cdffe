package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass native implementations of the label-map merge family
  * (graft.model.MapOps). Why native Expressions: the composed forms —
  * `map_concat(map_filter(base, !contains(over)), over)` per merge, an
  * `aggregate` fold of that per entry-list — are higher-order functions,
  * which Spark evaluates interpreted (no codegen) with per-element lambda
  * dispatch, and the ingest decoders run 3-4 such merges per row. Same
  * preference-order (b) rationale as [[CosineSim]]: one fused loop per
  * merge, codegen'd via a static helper call so the surrounding projection
  * stays in its whole-stage span.
  *
  * Semantics are bit-compatible with the HOF forms, including ENTRY ORDER
  * (observable through `to_json`/`map_entries`): a clashing key is REMOVED
  * from its old position and the winning entry appended — exactly
  * filter-then-concat. See MapOps for the reference semantics
  * (ClickHouse `mapUpdate`, `sql_misc.go:41-51`; Go map assignment).
  */
object MapMergeUtil extends Serializable {

  /** Growable (keys, vals) pair list with remove-then-append upsert.
    * Shared with [[TraceAttrsUtil]], which folds flattened span attrs with
    * the same last-wins entry-order semantics.
    */
  private[functions] final class Pairs(sizeHint: Int) {
    private var keys = new Array[AnyRef](math.max(sizeHint, 8))
    private var vals = new Array[AnyRef](math.max(sizeHint, 8))
    private var n = 0
    def put(k: UTF8String, v: AnyRef): Unit = {
      var i = 0
      while (i < n && !keys(i).equals(k)) i += 1
      if (i < n) { // remove old position, shift left
        System.arraycopy(keys, i + 1, keys, i, n - i - 1)
        System.arraycopy(vals, i + 1, vals, i, n - i - 1)
        n -= 1
      }
      if (n == keys.length) {
        keys = java.util.Arrays.copyOf(keys, n * 2)
        vals = java.util.Arrays.copyOf(vals, n * 2)
      }
      keys(n) = k; vals(n) = v; n += 1
    }
    def toMap: MapData = new ArrayBasedMapData(
      new GenericArrayData(java.util.Arrays.copyOf(keys, n)),
      new GenericArrayData(java.util.Arrays.copyOf(vals, n)))
  }

  private def putAll(p: Pairs, m: MapData): Unit = {
    val ks = m.keyArray(); val vs = m.valueArray()
    var i = 0
    val n = m.numElements()
    while (i < n) {
      p.put(ks.getUTF8String(i),
        if (vs.isNullAt(i)) null else vs.getUTF8String(i))
      i += 1
    }
  }

  /** mapUpdate(base, over): over wins; clashing keys move to the end. */
  def update(base: MapData, over: MapData): MapData = {
    val p = new Pairs(base.numElements() + over.numElements())
    putAll(p, base)
    putAll(p, over)
    p.toMap
  }

  /** Fold an array of maps last-wins; null element → null (map_concat
    * null semantics of the HOF form).
    */
  def lastWins(entries: ArrayData): MapData = {
    val p = new Pairs(entries.numElements())
    var i = 0
    val n = entries.numElements()
    while (i < n) {
      if (entries.isNullAt(i)) return null
      putAll(p, entries.getMap(i))
      i += 1
    }
    p.toMap
  }

  /** Parallel key/value arrays → last-wins map (null key is an error,
    * mirroring map_from_arrays).
    */
  def fromArrays(keys: ArrayData, vals: ArrayData): MapData = {
    val n = keys.numElements()
    if (vals.numElements() != n)
      throw new IllegalArgumentException(
        s"fromArraysLastWins: ${n} keys vs ${vals.numElements()} values")
    val p = new Pairs(n)
    var i = 0
    while (i < n) {
      if (keys.isNullAt(i))
        throw new IllegalArgumentException("Cannot use null as map key")
      p.put(keys.getUTF8String(i),
        if (vals.isNullAt(i)) null else vals.getUTF8String(i))
      i += 1
    }
    p.toMap
  }
}

private object MapMergeTypes {
  val StrMap: MapType = MapType(StringType, StringType)
  def isStrMap(t: DataType): Boolean = t match {
    case MapType(StringType, StringType, _) => true
    case _ => false
  }
}

/** `mapUpdate(base, over)` — last-wins merge of two map<string,string>. */
case class MapUpdate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = MapMergeTypes.StrMap
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => MapMergeTypes.isStrMap(e.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"map_update needs two map<string,string> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    MapMergeUtil.update(a.asInstanceOf[MapData], b.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val util = ctx.addReferenceObj("mapMergeUtil", MapMergeUtil,
        MapMergeUtil.getClass.getName.stripSuffix("$") + "$")
      s"${ev.value} = $util.update($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MapUpdate =
    copy(left = newLeft, right = newRight)
}

/** Fold `array<map<string,string>>` into one last-wins map. */
case class MapEntriesLastWins(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MapMergeTypes.StrMap
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if MapMergeTypes.isStrMap(t) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"map_entries_last_wins needs array<map<string,string>>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    MapMergeUtil.lastWins(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val util = ctx.addReferenceObj("mapMergeUtil", MapMergeUtil,
        MapMergeUtil.getClass.getName.stripSuffix("$") + "$")
      s"""
        ${ev.value} = $util.lastWins($a);
        ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): MapEntriesLastWins = copy(child = newChild)
}

/** Parallel string arrays → last-wins map (keep the LAST occurrence of a
  * duplicated key, at its last position).
  */
case class MapFromArraysLastWins(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = MapMergeTypes.StrMap
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"map_from_arrays_last_wins needs two array<string> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    MapMergeUtil.fromArrays(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val util = ctx.addReferenceObj("mapMergeUtil", MapMergeUtil,
        MapMergeUtil.getClass.getName.stripSuffix("$") + "$")
      s"${ev.value} = $util.fromArrays($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MapFromArraysLastWins =
    copy(left = newLeft, right = newRight)
}

object MapMerge {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def update(base: Column, over: Column): Column =
    ColumnBridge.column(MapUpdate(ColumnBridge.expr(base), ColumnBridge.expr(over)))

  def entriesLastWins(entryMaps: Column): Column =
    ColumnBridge.column(MapEntriesLastWins(ColumnBridge.expr(entryMaps)))

  def fromArraysLastWins(keys: Column, vals: Column): Column =
    ColumnBridge.column(MapFromArraysLastWins(
      ColumnBridge.expr(keys), ColumnBridge.expr(vals)))
}
