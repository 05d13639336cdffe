package graft.promql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** The non-query PromQL HTTP surface beyond labels/values (reference
  * `reader/service/metadata.go:25-80`): `/api/v1/metadata` lists each
  * metric family with its type plus the live series count — the reference
  * scans the `time_series` dictionary for `__name__` + stored metadata;
  * here each family's dictionary scan aggregates distinct fingerprints.
  */
object PromQLApi {

  private val Families = Seq(
    ("events_bucket", "histogram"),
    ("events_total", "counter"),
    ("events_value", "gauge"))

  def metadata(spark: SparkSession, dir: String): DataFrame =
    Families.map { case (name, typ) =>
      Tables.promMetric(name).get(spark, dir)
        .agg(countDistinct(col("fingerprint")).as("series"))
        .select(lit(name).as("metric_name"), lit(typ).as("type"),
          col("series"))
    }.reduce(_ unionByName _)
}
