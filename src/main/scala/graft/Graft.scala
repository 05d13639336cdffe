package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{ClassTokens, CosineSim, MapEntriesLastWins, MapFromArraysLastWins, MapUpdate, RegexpAllGroups}

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

  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression)(children: Seq[Expression]): Expression = {
    if (children.size != n)
      throw new IllegalArgumentException(s"$name expects $n arguments, got ${children.size}")
    f(children)
  }

  /** All native expressions as (name, info, builder) rows — one list feeds
    * both the extensions injection and the built-session registration.
    */
  private[graft] val nativeFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("regexp_all_groups"),
      new ExpressionInfo(classOf[RegexpAllGroups].getName, "regexp_all_groups"),
      regexpAllGroupsBuilder _),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      arity("cosine_sim", 2)(c => CosineSim(c(0), c(1))) _),
    (FunctionIdentifier("map_update"),
      new ExpressionInfo(classOf[MapUpdate].getName, "map_update"),
      arity("map_update", 2)(c => MapUpdate(c(0), c(1))) _),
    (FunctionIdentifier("map_entries_last_wins"),
      new ExpressionInfo(classOf[MapEntriesLastWins].getName, "map_entries_last_wins"),
      arity("map_entries_last_wins", 1)(c => MapEntriesLastWins(c(0))) _),
    (FunctionIdentifier("map_from_arrays_last_wins"),
      new ExpressionInfo(classOf[MapFromArraysLastWins].getName, "map_from_arrays_last_wins"),
      arity("map_from_arrays_last_wins", 2)(c => MapFromArraysLastWins(c(0), c(1))) _),
    (FunctionIdentifier("class_tokens"),
      new ExpressionInfo(classOf[ClassTokens].getName, "class_tokens"),
      arity("class_tokens", 1)(c => ClassTokens(c(0))) _))

  def registerFunctions(spark: SparkSession): Unit =
    nativeFunctions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    Graft.nativeFunctions.foreach(ext.injectFunction)
}
