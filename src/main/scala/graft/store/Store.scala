package graft.store

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Materialized storage layer mirroring the reference's physical design
  * (`ctrl/qryn/sql/log.sql:16-120`, SURVEY §1.5):
  *
  *   samples      — date-partitioned, sorted within partitions by
  *                  (fingerprint, timestamp_ns): partition pruning on the
  *                  query window + parquet min/max skipping on fingerprint
  *                  replace ClickHouse's PARTITION BY day + primary key
  *   time_series  — the series DICTIONARY (fingerprint → labels), tiny;
  *                  label matchers evaluate here and broadcast into the
  *                  fact scan instead of re-deriving a labels map per row
  *                  per query (round-1's main scale defect)
  *   metrics_15s  — 15s pre-aggregated downsample with PLAIN partial
  *                  columns (cnt/sum/min/max/last/bytes), the rewrite
  *                  target for eligible range aggregations
  *   prom_*       — the PromQL metric families (gauge/counter/bucket)
  *                  materialized once instead of re-running the cumsum
  *                  window per query (ingest-time MV in the reference,
  *                  log.sql:96-107)
  *
  * Built once per (JVM, testdata dir) under target/graft-store and reused
  * across sessions via the parquet _SUCCESS markers. At 100 TB this build
  * is the ingest pipeline (§2.A Structured Streaming foreachBatch); query
  * compilers only depend on the table schemas.
  */
object Store {

  private val built = TrieMap[String, String]()

  /** Kill-switch: spark.graft.store.disabled=true falls back to the
    * derive-per-query path (used by tests to compare both paths).
    */
  def enabled(spark: SparkSession): Boolean =
    !spark.conf.getOption("spark.graft.store.disabled").contains("true")

  private def rootFor(dir: String): String =
    "/root/repo/target/graft-store/" + dir.replaceAll("[^a-zA-Z0-9.]+", "_")

  private def withDate(df: DataFrame): DataFrame =
    df.withColumn("date",
      to_date(timestamp_seconds(col("timestamp_ns") / 1000000000L)))

  private def haveTable(path: String): Boolean =
    new java.io.File(path + "/_SUCCESS").exists()

  private def writeSorted(df: DataFrame, path: String): Unit =
    if (!haveTable(path))
      withDate(df)
        .repartition(col("date"))
        .sortWithinPartitions(col("fingerprint"), col("timestamp_ns"))
        .write.mode("overwrite").partitionBy("date").parquet(path)

  /** Build (if absent) and return the store root for a testdata dir. */
  def ensure(spark: SparkSession, dir: String): String =
    built.getOrElseUpdate(dir, {
      val root = rootFor(dir)
      val logs = Tables.logs(spark, dir)
      writeSorted(logs.select(col("timestamp_ns"), col("fingerprint"),
        col("line"), col("value")), s"$root/samples")
      if (!haveTable(s"$root/time_series"))
        logs.select(col("fingerprint"), col("labels"))
          .dropDuplicates("fingerprint")
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$root/time_series")
      if (!haveTable(s"$root/metrics_15s"))
        withDate(Tables.metrics15s(spark, dir))
          .repartition(col("date"))
          .sortWithinPartitions(col("fingerprint"), col("timestamp_ns"))
          .write.mode("overwrite").partitionBy("date").parquet(s"$root/metrics_15s")
      writeSorted(Tables.gaugeSamples(spark, dir), s"$root/prom_gauge")
      writeSorted(Tables.counterSamples(spark, dir), s"$root/prom_counter")
      writeSorted(Tables.bucketSamples(spark, dir), s"$root/prom_bucket")
      if (!haveTable(s"$root/prom_gauge_15s")) {
        val bucketNs = 15L * 1000 * 1000 * 1000
        val g15 = Tables.gaugeSamples(spark, dir)
          .groupBy(col("fingerprint"),
            (col("timestamp_ns") - pmod(col("timestamp_ns"), lit(bucketNs)))
              .as("timestamp_ns"))
          .agg(first(col("labels")).as("labels"),
            max_by(col("value"), col("timestamp_ns")).as("last"),
            max(col("timestamp_ns")).as("last_ts"),
            min(col("value")).as("min"),
            max(col("value")).as("max"),
            sum(col("value")).as("sum"),
            count(lit(1)).as("cnt"))
        withDate(g15)
          .repartition(col("date"))
          .sortWithinPartitions(col("fingerprint"), col("timestamp_ns"))
          .write.mode("overwrite").partitionBy("date").parquet(s"$root/prom_gauge_15s")
      }
      root
    })

  /** Series dictionary (fingerprint → labels); small, broadcast at joins. */
  def timeSeries(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, dir)}/time_series")

  /** Fact scan over [loNs, hiNs): ts predicate + derived date predicate so
    * the partition pruning actually fires (the ts column alone can't prune
    * date directories).
    */
  private def scanWindow(spark: SparkSession, path: String,
      loNs: Long, hiNs: Long): DataFrame =
    spark.read.parquet(path)
      .filter(col("timestamp_ns") >= loNs && col("timestamp_ns") < hiNs)
      .filter(col("date") >= to_date(timestamp_seconds(lit(loNs / 1000000000L))) &&
        col("date") <= to_date(timestamp_seconds(lit(hiNs / 1000000000L))))

  def samples(spark: SparkSession, dir: String, loNs: Long, hiNs: Long): DataFrame =
    scanWindow(spark, s"${ensure(spark, dir)}/samples", loNs, hiNs)

  def metrics15s(spark: SparkSession, dir: String, loNs: Long, hiNs: Long): DataFrame =
    scanWindow(spark, s"${ensure(spark, dir)}/metrics_15s", loNs, hiNs)

  /** 15s pre-aggregated gauge downsample (the `metrics_15s` analog for the
    * PromQL families; the reference's raw-vs-downsample fork is
    * `prom_queryable.go:150-160`).
    */
  def promGauge15s(spark: SparkSession, dir: String,
      loNs: Long, hiNs: Long): DataFrame =
    scanWindow(spark, s"${ensure(spark, dir)}/prom_gauge_15s", loNs, hiNs)

  def promMetric(spark: SparkSession, dir: String, name: String,
      loNs: Long, hiNs: Long): Option[DataFrame] = {
    val table = name match {
      case "events_value"  => Some("prom_gauge")
      case "events_total"  => Some("prom_counter")
      case "events_bucket" => Some("prom_bucket")
      case _               => None
    }
    table.map(t => scanWindow(spark, s"${ensure(spark, dir)}/$t", loNs, hiNs))
  }
}
