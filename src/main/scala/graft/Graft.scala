package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RegexpAllGroups

/** Session-level integration: the `spark.sql` surface.
  *
  *   - [[Graft.registerViews]] exposes the canonical tables as temp views,
  *     so any ANSI SQL runs against the same data the query frontends use
  *   - [[Graft.registerFunctions]] / [[GraftExtensions]] add the native
  *     expressions as SQL functions (extensions path for
  *     `spark.sql.extensions=graft.GraftExtensions` at session build;
  *     registerFunctions for an already-built session)
  */
object Graft {

  def registerViews(spark: SparkSession, dir: String): Unit = {
    model.Tables.logs(spark, dir).createOrReplaceTempView("logs")
    model.Tables.gaugeSamples(spark, dir).createOrReplaceTempView("metrics")
    model.Tables.spans(spark, dir).createOrReplaceTempView("spans")
    model.Tables.spanAttrs(spark, dir).createOrReplaceTempView("span_attrs")
    model.Tables.documents(spark, dir).createOrReplaceTempView("documents")
    model.Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    // derive path, like the spans/span_attrs views: view registration is an
    // ad-hoc SQL surface and must stay lazy — Profiles.profiles would
    // interpolate Store.ensure (the full store build) into registration
    prof.Profiles.derive(spark, dir).createOrReplaceTempView("profiles")
  }

  private[graft] def regexpAllGroupsBuilder(children: Seq[Expression]): Expression =
    children match {
      case Seq(input, Literal(re: UTF8String, _)) =>
        RegexpAllGroups(input, re.toString)
      case other =>
        throw new IllegalArgumentException(
          s"regexp_all_groups(input, 'regex literal'), got ${other.size} args")
    }

  def registerFunctions(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("regexp_all_groups"),
      new ExpressionInfo(classOf[RegexpAllGroups].getName, "regexp_all_groups"),
      regexpAllGroupsBuilder _)
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("regexp_all_groups"),
      new ExpressionInfo(classOf[RegexpAllGroups].getName, "regexp_all_groups"),
      Graft.regexpAllGroupsBuilder))
}
