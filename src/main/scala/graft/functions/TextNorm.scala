package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) — the first
  * step of a CCNet-style text-cleanup pass: combining sequences compose
  * ("e" + U+0301 → "é") so later hashing/dedup/tokenization see one
  * spelling per canonically-equivalent string. Spark has no built-in;
  * this wraps `java.text.Normalizer` (the JDK's UAX #15 implementation,
  * the same spec DuckDB's `nfc_normalize` implements — the gate
  * certifies they agree on the probe fixture).
  */
object TextNormUtil extends Serializable {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized avoids the rebuild for the
    // overwhelmingly-ASCII common case
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs string, got ${other.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    TextNormUtil.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val util = ctx.addReferenceObj("textNormUtil", TextNormUtil,
        TextNormUtil.getClass.getName.stripSuffix("$") + "$")
      s"${ev.value} = $util.nfc($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(s: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expr(s)))
}
