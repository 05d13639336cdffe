package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Indexed read of a fixed `long[]` shipped with the plan as a reference
  * object (the [[BitsetProbe]] mechanism, but returning the word instead
  * of one bit): `arr[idx]`, with out-of-range indexes reading 0 — the
  * identity element of the sketches this serves (a count that was never
  * incremented, a cell that was never set).
  *
  * Primitive under [[graft.llm.TextOps.cmEstimate]]: a Count-Min query is
  * d of these reads MIN-ed over d seeded row offsets, all inside
  * whole-stage codegen.
  */
case class LongArrayGet(child: Expression, arr: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"long_array_get needs a bigint index, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val idx = input.asInstanceOf[Long]
    if (idx >= 0 && idx < arr.length) arr(idx.toInt) else 0L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = ctx.addReferenceObj("longArr", arr, "long[]")
    nullSafeCodeGen(ctx, ev, idx =>
      s"${ev.value} = ($idx >= 0L && $idx < $a.length) ? $a[(int) $idx] : 0L;")
  }

  override protected def withNewChildInternal(newChild: Expression): LongArrayGet =
    copy(child = newChild)
}

object LongArrayGet {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(idx: Column, arr: Array[Long]): Column =
    ColumnBridge.column(LongArrayGet(ColumnBridge.expr(idx), arr))
}
