package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass parse of a Datadog `ddtags` string ("env:prod,team:sre") into
  * a last-wins label map, mirroring the reference's tag pattern
  * (`datadog_json.go:25-60`): keys start with a letter and may contain
  * `[\p{L}_0-9\-.\/]`, values may additionally contain colons;
  * non-matching tokens drop; duplicate keys keep the last occurrence (Go
  * map assignment).
  *
  * Why native: the composed form — split + per-token transform with two
  * interpreted `regexp_extract` lambdas + filter + map-per-entry +
  * MapEntriesLastWins — is a five-stage HOF pipeline per row; here it is
  * one precompiled-regex loop. The composed Column form survives as the
  * executable spec (`WireFormats.datadogTagsSpec`, differential-tested).
  */
object DatadogTagsUtil extends Serializable {

  // key and value patterns fused: group(1) = keyRe's capture, group(2) =
  // valRe's capture; a token where only the key half matches would have
  // been dropped by the spec form's v != "" filter anyway
  private val Tag = java.util.regex.Pattern.compile(
    """^([\p{L}][\p{L}_0-9\-.\\/]*):([\p{L}_0-9\-.\\/:]+)""")

  def parse(s: UTF8String): AnyRef = {
    val pairs = new MapMergeUtil.Pairs(8)
    // Java split with -1 limit = Spark split's trailing-empty behavior;
    // empty tokens simply fail the match and drop
    val toks = s.toString.split(",", -1)
    var i = 0
    while (i < toks.length) {
      val m = Tag.matcher(toks(i))
      if (m.find())
        pairs.put(UTF8String.fromString(m.group(1)),
          UTF8String.fromString(m.group(2)))
      i += 1
    }
    pairs.toMap
  }
}

case class DatadogTagsParse(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MapMergeTypes.StrMap
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"datadog_tags needs a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    DatadogTagsUtil.parse(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val util = ctx.addReferenceObj("datadogTagsUtil", DatadogTagsUtil,
        DatadogTagsUtil.getClass.getName.stripSuffix("$") + "$")
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.MapData) $util.parse($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): DatadogTagsParse =
    copy(child = newChild)
}

object DatadogTags {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def parse(ddtags: Column): Column =
    ColumnBridge.column(DatadogTagsParse(ColumnBridge.expr(ddtags)))
}
