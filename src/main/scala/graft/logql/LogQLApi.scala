package graft.logql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import LogQLAst._

/** The non-query_range LogQL HTTP surface, as real entry points over the
  * compiled plans (reference: `reader/service/query_range.go` +
  * `planner_series.go:25`, `planner_label_names.go:12`,
  * `planner_values.go:27`, `query_range.go:807-900`). Each takes selector
  * STRINGS and goes through the real parser — no hand-built ASTs.
  */
object LogQLApi {

  private def parseSelector(q: String): (Selector, Seq[Stage]) =
    LogQLParser.parseOrThrow(q) match {
      case LogExpr(s, st) => (s, st)
      case other => throw new IllegalArgumentException(s"not a selector: $other")
    }

  /** `/loki/api/v1/series` — distinct label sets matching the UNION of the
    * given selectors (reference MultiStreamSelectPlanner,
    * `planner_multi_stream_select.go:12` + SeriesPlanner).
    */
  def series(spark: SparkSession, dir: String, params: EvalParams,
      selectors: Seq[String]): DataFrame = {
    val c = new LogQLCompiler(spark, dir, params)
    val parts = selectors.map { s =>
      val (sel, stages) = parseSelector(s)
      c.compileLog(sel, stages).select(col("labels"))
    }
    // Spark forbids set ops on MapType: dedup on the sorted entry array.
    parts.reduce(_ union _)
      .select(array_sort(map_entries(col("labels"))).as("__e"))
      .distinct()
      .select(map_from_entries(col("__e")).as("labels"))
  }

  /** `/loki/api/v1/labels` — distinct label NAMES across matching streams. */
  def labelNames(spark: SparkSession, dir: String, params: EvalParams,
      selector: String = "{}"): DataFrame = {
    val c = new LogQLCompiler(spark, dir, params)
    val (sel, stages) = parseSelector(selector)
    c.compileLog(sel, stages)
      .select(explode(map_keys(col("labels"))).as("name"))
      .distinct()
  }

  /** `/loki/api/v1/label/{key}/values` — distinct values for one label. */
  def labelValues(spark: SparkSession, dir: String, params: EvalParams,
      key: String, selector: String = "{}"): DataFrame = {
    val c = new LogQLCompiler(spark, dir, params)
    val (sel, stages) = parseSelector(selector)
    c.compileLog(sel, stages)
      .select(element_at(col("labels"), key).as("value"))
      .filter(col("value").isNotNull)
      .distinct()
  }

  /** `/loki/api/v1/index/stats` — stream/entry/byte counts for a selector. */
  def indexStats(spark: SparkSession, dir: String, params: EvalParams,
      selector: String): DataFrame = {
    val c = new LogQLCompiler(spark, dir, params)
    val (sel, stages) = parseSelector(selector)
    c.compileLog(sel, stages).agg(
      countDistinct(col("fingerprint")).as("streams"),
      count(lit(1)).as("entries"),
      sum(length(col("line"))).cast("long").as("bytes"))
  }

  /** `/loki/api/v1/index/volume` — bytes per label value (aggregateBy one
    * label, as Grafana's volume panel queries it).
    */
  def indexVolume(spark: SparkSession, dir: String, params: EvalParams,
      selector: String, by: String): DataFrame = {
    val c = new LogQLCompiler(spark, dir, params)
    val (sel, stages) = parseSelector(selector)
    c.compileLog(sel, stages)
      .groupBy(element_at(col("labels"), by).as("name"))
      .agg(sum(length(col("line"))).cast("long").as("volume"))
  }
}
