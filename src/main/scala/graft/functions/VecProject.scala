package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Signed random projection of an `array<double>` vector: out_j =
  * scale · Σ_i x_i · r(i,j), with r(i,j) ∈ {+1, −1} derived from the
  * repo's shared md5 hash (so any engine can replay the matrix) and
  * scale = 1/√outDim (Achlioptas 2003, "Database-friendly random
  * projections" — the dense ±1 variant; Johnson–Lindenstrauss preserves
  * pairwise distances at d = O(log n / ε²)).
  *
  * Why a native Expression: the composed form is a `transform(sequence)`
  * whose lambda wraps an `aggregate(zip_with(...))` dot product —
  * higher-order functions run interpreted, and the lambda would pay
  * outDim array traversals per row. This is one codegen'd loop pair over
  * a reference-object weight matrix; accumulation is index-ascending,
  * matching the DuckDB oracle's list comprehension bit-for-bit.
  */
case class VecProject(child: Expression, inDim: Int, outDim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_project needs an array<double> input, got ${other.simpleString}")
    }

  /** Row-major ±1 matrix (index j·inDim + i), built once per plan. */
  private lazy val matrix: Array[Double] = VecProject.signMatrix(inDim, outDim)
  private val scale: Double = 1.0 / math.sqrt(outDim.toDouble)

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), inDim)
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * matrix(j * inDim + i); i += 1 }
      out(j) = s * scale
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("rpMatrix", matrix, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $inDim);
        double[] $out = new double[$outDim];
        for (int $j = 0; $j < $outDim; $j++) {
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $s += $x.getDouble($i) * $m[$j * $inDim + $i];
          }
          $out[$j] = $s * $scale;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecProject =
    copy(child = newChild)
}

object VecProject {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** ±1 sign for (out-row j, in-dim i): parity of the shared 60-bit md5
    * hash of "rp:j:i" (DuckDB twin:
    * `('0x'||substr(md5('rp:'||j||':'||i),1,15))::BIGINT % 2`).
    */
  def sign(j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$j:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(md.substring(0, 15), 16) % 2 == 0) 1.0 else -1.0
  }

  def signMatrix(inDim: Int, outDim: Int): Array[Double] = {
    val m = new Array[Double](inDim * outDim)
    var j = 0
    while (j < outDim) {
      var i = 0
      while (i < inDim) { m(j * inDim + i) = sign(j, i); i += 1 }
      j += 1
    }
    m
  }

  /** Column API: project an array<double> column to `outDim` dims. */
  def apply(v: Column, inDim: Int, outDim: Int): Column =
    ColumnBridge.column(VecProject(ColumnBridge.expr(v), inDim, outDim))
}
