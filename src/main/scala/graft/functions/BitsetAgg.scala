package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Aggregate a stream of bit positions into a packed bitset (BinaryType,
  * bit `p` = bit `p & 7` of byte `p >>> 3`). The buffer is a fixed
  * `ceil(mBits/8)`-byte array regardless of row count; update is one OR,
  * merge is a byte-wise OR — commutative and associative, so the result
  * is partition-layout invariant and map-side partial aggregation applies.
  *
  * This is the GROUPED counterpart of [[graft.llm.Dedup.bloomBitset]]'s
  * driver-side treeAggregate: `groupBy(shard).agg(BitsetAgg(pos, m))`
  * builds B independent Bloom bitsets in ONE distributed pass over the
  * history, each bitset emitted as a row — the bitsets then flow through a
  * keyed join instead of a driver collect + broadcast, which is what makes
  * multi-GB total filter sizes feasible (no single array ever exceeds the
  * per-shard m/8 bytes). Out-of-range positions are ignored (callers pmod
  * by the bit width), mirroring [[BitsetProbe]]'s contract where an
  * unknown position cannot have been set.
  */
case class BitsetAgg(
    child: Expression,
    mBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val nBytes = (mBits + 7) >>> 3

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bitset_agg needs a bigint position, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](nBytes)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val pos = v.asInstanceOf[Long]
      if (pos >= 0 && pos < (buffer.length.toLong << 3)) {
        val b = (pos >>> 3).toInt
        buffer(b) = (buffer(b) | (1 << (pos & 7).toInt)).toByte
      }
    }
    buffer
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BitsetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitsetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitsetAgg =
    copy(child = newChild)
  override def prettyName: String = "bitset_agg"
}

object BitsetAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(pos: Column, mBits: Int): Column =
    ColumnBridge.column(
      BitsetAgg(ColumnBridge.expr(pos), mBits).toAggregateExpression())
}

/** Membership probe against a bitset that is a COLUMN value (BinaryType
  * from [[BitsetAgg]]), not a plan-embedded array like [[BitsetProbe]]:
  * true iff bit `pos` of `bits` is set. The column form is what the
  * sharded Bloom join needs — each row carries (position, its shard's
  * bitset) after the equi-join on shard, and the probe is one byte index
  * inside whole-stage codegen. Out-of-range positions return false.
  */
case class BitsetProbeBin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bitset_probe_bin needs (bigint, binary), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(posAny: Any, bitsAny: Any): Any = {
    val pos = posAny.asInstanceOf[Long]
    val bits = bitsAny.asInstanceOf[Array[Byte]]
    pos >= 0 && pos < (bits.length.toLong << 3) &&
      ((bits((pos >>> 3).toInt) >> (pos & 7).toInt) & 1) == 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pos, bits) => s"""
      ${ev.value} = $pos >= 0L && $pos < ((long) $bits.length << 3)
        && (($bits[(int) ($pos >>> 3)] >> (int) ($pos & 7L)) & 1) == 1;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitsetProbeBin =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bitset_probe_bin"
}

object BitsetProbeBin {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(pos: Column, bits: Column): Column =
    ColumnBridge.column(
      BitsetProbeBin(ColumnBridge.expr(pos), ColumnBridge.expr(bits)))
}
