package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass multi-group regex extraction: ONE regex match returning ALL
  * capture groups as an array (null-safe: absent match → array of empty
  * strings, matching `regexp_extract`'s miss semantics).
  *
  * Why a native Expression: the LogQL `| regexp` parser stage
  * (`planner_parser_regexp.go`) needs N named groups; composing N
  * `regexp_extract` calls re-executes the regex N times per row — the
  * round-1 bench's worst outlier (~90 µs/row at 3 groups). This is the
  * preference-order (b) path from the build notes: a codegen'd Catalyst
  * expression, pattern compiled once per operator instance, one `find()`
  * per row.
  */
case class RegexpAllGroups(child: Expression, regex: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType)
  override def nullIntolerant: Boolean = true

  @transient private lazy val pattern: Pattern = Pattern.compile(regex)
  @transient private lazy val nGroups: Int = pattern.matcher("").groupCount()

  override def nullSafeEval(input: Any): Any = {
    val m = pattern.matcher(input.asInstanceOf[UTF8String].toString)
    val n = nGroups
    val out = new Array[Any](n)
    if (m.find()) {
      var i = 0
      while (i < n) {
        val g = m.group(i + 1)
        out(i) = UTF8String.fromString(if (g == null) "" else g)
        i += 1
      }
    } else {
      java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]],
        UTF8String.fromString(""))
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternRef = ctx.addReferenceObj("pattern", pattern, classOf[Pattern].getName)
    val arrCls = classOf[GenericArrayData].getName
    val utf8 = classOf[UTF8String].getName
    val groupCount = Pattern.compile(regex).matcher("").groupCount()
    nullSafeCodeGen(ctx, ev, input => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      val g = ctx.freshName("g")
      s"""
        java.util.regex.Matcher $m = $patternRef.matcher($input.toString());
        int $n = $groupCount;
        Object[] $arr = new Object[$n];
        if ($m.find()) {
          for (int $i = 0; $i < $n; $i++) {
            String $g = $m.group($i + 1);
            $arr[$i] = $utf8.fromString($g == null ? "" : $g);
          }
        } else {
          for (int $i = 0; $i < $n; $i++) {
            $arr[$i] = $utf8.fromString("");
          }
        }
        ${ev.value} = new $arrCls($arr);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RegexpAllGroups =
    copy(child = newChild)
}

object RegexpAllGroups {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: all capture groups of `regex`'s first match in `c`. */
  def apply(c: Column, regex: String): Column =
    ColumnBridge.column(RegexpAllGroups(ColumnBridge.expr(c), regex))
}
