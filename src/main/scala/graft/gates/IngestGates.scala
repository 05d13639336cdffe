package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.LokiPush
import graft.model.{OracleViews, Tables}

/** Ingest round-trip gates: the canonical log frame is serialized to Loki
  * push-API JSON bodies (what a client would send), decoded back through
  * the real wire decoder, and queried — the oracle sees only the original
  * events, so any encode/decode loss (escaping, ns precision, label
  * fan-out, fingerprint identity) breaks the hash.
  */
object IngestGates extends GateSet {

  private def o(body: String): Option[String] =
    Some(OracleViews.withViews(Seq(OracleViews.logs), body))

  override val gates: Seq[Gate] = Seq(

    Gate("ingest_loki_roundtrip",
      (spark: SparkSession, dir: String) => {
        val bodies = LokiPush.encode(Tables.logs(spark, dir))
        val (series, samples) = LokiPush.decode(bodies)
        samples.join(series, "fingerprint")
          .groupBy(
            element_at(col("labels"), "event_type").as("event_type"),
            element_at(col("labels"), "level").as("level"),
            element_at(col("labels"), "user").as("user"))
          .agg(count(lit(1)).as("entries"),
            sum(length(col("line"))).cast("long").as("bytes"))
          .orderBy("event_type", "level", "user")
      },
      o("""SELECT event_type, level, "user", count(*) AS entries,
          |  CAST(sum(length(line)) AS BIGINT) AS bytes
          |FROM logs GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // decoded samples preserve exact timestamps and line bodies: min/max
    // ns + a content checksum per stream survive the wire round trip
    Gate("ingest_loki_fidelity",
      (spark: SparkSession, dir: String) => {
        val bodies = LokiPush.encode(Tables.logs(spark, dir))
        val rows = LokiPush.decodeRows(bodies)
        rows.groupBy(element_at(col("labels"), "event_type").as("event_type"))
          .agg(min(col("timestamp_ns")).as("min_ts"),
            max(col("timestamp_ns")).as("max_ts"),
            sum(length(col("line"))).cast("long").as("bytes"))
          .orderBy("event_type")
      },
      o("""SELECT event_type, min(timestamp_ns) AS min_ts,
          |  max(timestamp_ns) AS max_ts,
          |  CAST(sum(length(line)) AS BIGINT) AS bytes
          |FROM logs GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
