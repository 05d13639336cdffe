package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring search (Aho & Corasick 1975) —
  * the FlashText-scale blocklist matcher: ONE pass over the text finds
  * every pattern occurrence regardless of pattern count, where a
  * per-pattern `contains` chain is O(patterns × text). The automaton is
  * built once over UTF-8 BYTES (a 256-ary alphabet needs no unicode
  * decoding and matches byte-exact), shipped as a plan reference object,
  * and each row walks goto/fail transitions collecting the aggregated
  * output set.
  */
final class AcAutomaton(patterns: Seq[String]) extends Serializable {
  // trie over bytes: goto as per-node HashMap (pattern sets are small;
  // a flat 256-wide table would also work), fail links, aggregated
  // output pattern-ids per node (dict-suffix closure, so a pattern that
  // is a substring of another still reports)
  private val gotoMaps = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[java.lang.Byte, java.lang.Integer]())
  private val outSets = scala.collection.mutable.ArrayBuffer(
    new java.util.BitSet())
  private val failBuf = scala.collection.mutable.ArrayBuffer(0)

  patterns.zipWithIndex.foreach { case (p, id) =>
    var node = 0
    p.getBytes("UTF-8").foreach { b =>
      val next = gotoMaps(node).get(b)
      node = if (next == null) {
        gotoMaps += new java.util.HashMap[java.lang.Byte, java.lang.Integer]()
        outSets += new java.util.BitSet()
        failBuf += 0
        gotoMaps(node).put(b, gotoMaps.size - 1)
        gotoMaps.size - 1
      } else next.intValue()
    }
    outSets(node).set(id)
  }
  // BFS fail links + output closure
  locally {
    val queue = new java.util.ArrayDeque[Int]()
    gotoMaps(0).forEach((_, v) => { failBuf(v) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll()
      gotoMaps(u).forEach { (b, v) =>
        var f = failBuf(u)
        while (f != 0 && gotoMaps(f).get(b) == null) f = failBuf(f)
        val t = gotoMaps(f).get(b)
        failBuf(v) = if (t == null || t.intValue() == v) 0 else t.intValue()
        outSets(v).or(outSets(failBuf(v)))
        queue.add(v)
      }
    }
  }
  private val gotos: Array[java.util.HashMap[java.lang.Byte, java.lang.Integer]] = gotoMaps.toArray
  private val fails: Array[Int] = failBuf.toArray
  private val outs: Array[java.util.BitSet] = outSets.toArray

  /** Sorted distinct ids of every pattern occurring in `text`. */
  def findAll(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val found = new java.util.BitSet(gotos.length)
    var node = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      var next = gotos(node).get(b)
      while (next == null && node != 0) {
        node = fails(node)
        next = gotos(node).get(b)
      }
      if (next != null) node = next.intValue()
      if (!outs(node).isEmpty) found.or(outs(node))
      i += 1
    }
    val ids = new scala.collection.mutable.ArrayBuffer[Any]()
    var id = found.nextSetBit(0)
    while (id >= 0) { ids += id; id = found.nextSetBit(id + 1) }
    new GenericArrayData(ids.toArray)
  }
}

/** `ac_find_all(text)` → sorted distinct ids of the patterns present. */
case class AcFindAll(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ac_find_all needs string, got ${other.simpleString}")
  }

  @transient private lazy val automaton = new AcAutomaton(patterns)

  override def nullSafeEval(t: Any): Any =
    automaton.findAll(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ac = ctx.addReferenceObj("acAutomaton", automaton,
        classOf[AcAutomaton].getName)
      s"${ev.value} = $ac.findAll($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): AcFindAll =
    copy(child = newChild)
}

object AcFindAll {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AcFindAll(ColumnBridge.expr(text), patterns))
}
