package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer apply (Sennrich et al. 2016): encode one
  * word against a ranked merge table. Variant pinned for cross-engine
  * parity: each step merges the single LEFTMOST occurrence of the
  * best-ranked adjacent pair, repeated to fixpoint — deterministic, and
  * expressible as a DuckDB recursive CTE the gate replays step for step
  * (the batch all-occurrences variant's "finish current pair before
  * rescanning" rule is not; the two differ only when a merge creates a
  * better-ranked pair mid-word).
  *
  * Why a native Expression: the merge loop is inherently stateful
  * per-word (merge position feeds the next scan) — no Column/HOF
  * composition expresses it without per-element lambda dispatch. The
  * ranks live in a broadcast-ready HashMap reference object; each eval is
  * a plain Java loop, O(len²) worst case on the word length. At corpus
  * scale the operator runs this ONLY once per distinct word
  * (TextOps.bpeTokenCounts), so the cost is vocabulary-, not
  * corpus-proportional.
  */
object BpeUtil extends Serializable {

  def rankMap(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    m
  }

  /** Leftmost-best-pair merge loop; returns the final symbol array. */
  def encode(word: UTF8String, ranks: java.util.HashMap[String, Integer]): GenericArrayData = {
    val s = word.toString
    val syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) { syms.add(String.valueOf(s.charAt(i))); i += 1 }
    var done = syms.size <= 1
    while (!done) {
      var best = Integer.MAX_VALUE
      var bi = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r < best) { best = r; bi = j }
        j += 1
      }
      if (bi < 0) done = true
      else {
        syms.set(bi, syms.get(bi) + syms.get(bi + 1))
        syms.remove(bi + 1)
        if (syms.size <= 1) done = true
      }
    }
    val out = new Array[AnyRef](syms.size)
    var k = 0
    while (k < syms.size) { out(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new GenericArrayData(out)
  }

  /** Apply ONE merge (l, r) → l·r to a symbol array, non-overlapping
    * left-to-right — the BPE TRAINING-loop primitive (apply the freshly
    * learned pair everywhere before counting the next). A single left
    * fold suffices: the merge result can never be an operand of the same
    * merge (l·r = l or l·r = r would need an empty operand), so no
    * replacement can enable another occurrence to its left — fold ≡
    * replace-leftmost-then-rescan to fixpoint, which is what the DuckDB
    * oracle's recursive CTE replays.
    */
  def mergeOnce(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      l: UTF8String, r: UTF8String): GenericArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (!out.isEmpty && out.get(out.size - 1).equals(l) && cur.equals(r))
        out.set(out.size - 1, UTF8String.concat(l, r))
      else out.add(cur)
      i += 1
    }
    val res = new Array[AnyRef](out.size)
    var k = 0
    while (k < out.size) { res(k) = out.get(k); k += 1 }
    new GenericArrayData(res)
  }
}

case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs string, got ${other.simpleString}")
  }

  @transient private lazy val ranks = BpeUtil.rankMap(merges)

  override def nullSafeEval(w: Any): Any =
    BpeUtil.encode(w.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w => {
      val util = ctx.addReferenceObj("bpeUtil", BpeUtil,
        BpeUtil.getClass.getName.stripSuffix("$") + "$")
      val r = ctx.addReferenceObj("bpeRanks", ranks, classOf[java.util.HashMap[String, Integer]].getName)
      s"${ev.value} = $util.encode($w, $r);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expr(word), merges))
}

/** Apply a single learned merge to a symbol-array column (see
  * [[BpeUtil.mergeOnce]]) — evaluated once per distinct vocabulary word
  * per training iteration.
  */
case class BpeMergeOnce(child: Expression, l: String, r: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge_once needs array<string>, got ${other.simpleString}")
  }

  @transient private lazy val lu = UTF8String.fromString(l)
  @transient private lazy val ru = UTF8String.fromString(r)

  override def nullSafeEval(syms: Any): Any =
    BpeUtil.mergeOnce(
      syms.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], lu, ru)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val util = ctx.addReferenceObj("bpeUtil", BpeUtil,
        BpeUtil.getClass.getName.stripSuffix("$") + "$")
      val lv = ctx.addReferenceObj("bpeL", lu, classOf[UTF8String].getName)
      val rv = ctx.addReferenceObj("bpeR", ru, classOf[UTF8String].getName)
      s"${ev.value} = $util.mergeOnce($x, $lv, $rv);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeMergeOnce =
    copy(child = newChild)
}

object BpeMergeOnce {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(syms: Column, l: String, r: String): Column =
    ColumnBridge.column(BpeMergeOnce(ColumnBridge.expr(syms), l, r))
}
