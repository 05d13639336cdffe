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
