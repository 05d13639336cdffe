package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Membership probe against a fixed bitset: true iff bit `pos` of `bits`
  * is set (word `pos >>> 6`, bit `pos & 63`). The bitset rides the
  * serialized plan as a reference object — the same shipping mechanism a
  * broadcast-hash-join's relation uses — so every executor probes one
  * shared immutable array; the probe itself is two ALU ops inside
  * whole-stage codegen.
  *
  * This is the primitive under [[graft.llm.Dedup.bloomDedup]]: a Bloom
  * filter is k of these probes AND-ed over k seeded hash positions.
  * Out-of-range positions (callers are expected to `pmod` by the bit
  * width) return false rather than throwing, matching Bloom semantics
  * where an unknown position simply cannot have been set.
  */
case class BitsetProbe(child: Expression, bits: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bitset_probe needs a bigint position, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val pos = input.asInstanceOf[Long]
    // Range-check the long position itself (not the truncated word index,
    // which wraps negative past 2^37 and would dodge a `w < length` guard).
    pos >= 0 && pos < (bits.length.toLong << 6) &&
      ((bits((pos >>> 6).toInt) >>> (pos & 63)) & 1L) == 1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bitset", bits, "long[]")
    nullSafeCodeGen(ctx, ev, pos => {
      s"""
        ${ev.value} = $pos >= 0L && $pos < ((long) $b.length << 6)
          && (($b[(int) ($pos >>> 6)] >>> ($pos & 63L)) & 1L) == 1L;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BitsetProbe =
    copy(child = newChild)
}

object BitsetProbe {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(pos: Column, bits: Array[Long]): Column =
    ColumnBridge.column(BitsetProbe(ColumnBridge.expr(pos), bits))
}
