package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token classing for pattern mining: the whole
  * [[graft.patterns.Patterns.classTok]] when-chain applied to every
  * element of a token array in a single compiled loop.
  *
  * Why a native Expression: `transform(split(line), classTok(_))` is a
  * higher-order function — interpreted evaluation, ~20 expression-node
  * dispatches plus UTF8String→String conversions per TOKEN, re-walked for
  * every token of every line; token classing dominated the patterns_mine_*
  * bench entries. Here the class chain is plain Java with precompiled
  * `java.util.regex` patterns, evaluated with `find()` — with anchored
  * patterns that is exactly `rlike`'s semantics, including Java's rule
  * that `$` also matches before a trailing line terminator (a plain
  * `matches()` would diverge on tokens like `"03:04:05\n"`)
  * and the same precedence order; the classing logic lives in
  * [[ClassTokensUtil.classTok]] which MUST stay in lock-step with the
  * Column form (differential-tested in PatternsSpec) and the DuckDB mirror
  * `Patterns.duckClassTok`.
  */
object ClassTokensUtil extends Serializable {

  import java.util.regex.Pattern

  private val Uuid = Pattern.compile(
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")
  private val Pri = Pattern.compile("^<\\d+>$")
  private val TsIso = Pattern.compile(
    "^\\d{4}-\\d{2}-\\d{2}([T ]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?(Z|[+-]\\d{2}:?\\d{2})?)?$")
  private val TsTime = Pattern.compile("^\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?$")
  private val TsClf = Pattern.compile(
    "^\\[\\d{2}/[A-Za-z]{3}/\\d{4}:\\d{2}:\\d{2}:\\d{2}$")
  private val TsTz = Pattern.compile("^[+-]\\d{4}\\]$")
  private val PidTok = Pattern.compile("^[a-zA-Z][a-zA-Z0-9_-]+\\[\\d+\\]:$")
  private val PidRepl = Pattern.compile("\\[\\d+\\]:$")
  private val Ip = Pattern.compile("^\\d{1,3}(\\.\\d{1,3}){3}(:\\d+)?$")
  private val Hex = Pattern.compile("^(0x)?[0-9a-fA-F]{8,}$")
  private val HexLetter = Pattern.compile("[a-fA-F]")
  private val Path = Pattern.compile("^(/[^/ ]+){2,}/?$")
  private val Http = Pattern.compile("^HTTP(/[12]\\.[01])?$")
  private val Num3 = Pattern.compile("^\\d+(\\.\\d+)?$")
  private val DigitRun = Pattern.compile("[0-9]+")

  private val Levels: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    graft.patterns.Patterns.LogLevels.foreach(s.add)
    s
  }
  private val Methods: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    graft.patterns.Patterns.HttpMethods.foreach(s.add)
    s
  }

  /** Exact port of the Column when-chain, same precedence. Trailing line
    * terminators are stripped before classing: Java `$` matches before a
    * trailing `\n` but DuckDB's RE2 does not, so a token like `"1.2.3.4\n"`
    * would class `<IP>` here and `<N>.<N>.<N>.<N>\n` in the oracle —
    * stripping on all three sides (native / Column / DuckDB) makes the
    * newline question moot.
    */
  def classTok(raw: String): String = {
    var e = raw.length
    while (e > 0 && { val c = raw.charAt(e - 1); c == '\n' || c == '\r' }) e -= 1
    val t = if (e == raw.length) raw else raw.substring(0, e)
    if (t.isEmpty) return t
    val first = t.charAt(0)
    val digitFirst = first >= '0' && first <= '9'
    if (t.length == 36 && t.charAt(8) == '-' && Uuid.matcher(t).find())
      "<UUID>"
    else if (first == '<' && Pri.matcher(t).find()) "<PRI>"
    else if (digitFirst && t.length >= 10 && TsIso.matcher(t).find()) "<TS>"
    else if (digitFirst && TsTime.matcher(t).find()) "<TS>"
    else if (first == '[' && TsClf.matcher(t).find()) "<TS>"
    else if ((first == '+' || first == '-') && TsTz.matcher(t).find()) "<TS>"
    else if (Levels.contains(t)) t
    else if (t.endsWith("]:") && PidTok.matcher(t).find())
      PidRepl.matcher(t).replaceAll("[<PID>]:")
    else if (digitFirst && Ip.matcher(t).find()) "<IP>"
    else if (t.length >= 8 && Hex.matcher(t).find() &&
      HexLetter.matcher(t).find()) "<HEX>"
    else if (first == '/' && Path.matcher(t).find()) "<PATH>"
    else if (first == 'H' && Http.matcher(t).find()) t
    else if (Methods.contains(t)) t
    else if (digitFirst && first <= '5' && t.length == 3 &&
      Num3.matcher(t).find()) t
    else DigitRun.matcher(t).replaceAll("<N>")
  }

  def classAll(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i))
        out(i) = UTF8String.fromString(classTok(toks.getUTF8String(i).toString))
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class ClassTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"class_tokens needs array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    ClassTokensUtil.classAll(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val util = ctx.addReferenceObj("classTokensUtil", ClassTokensUtil,
        ClassTokensUtil.getClass.getName.stripSuffix("$") + "$")
      s"${ev.value} = $util.classAll($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): ClassTokens =
    copy(child = newChild)
}

object ClassTokens {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(toks: Column): Column =
    ColumnBridge.column(ClassTokens(ColumnBridge.expr(toks)))
}
