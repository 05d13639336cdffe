package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Tables

/** Loki push-API decoder (`/loki/api/v1/push`), the JSON wire shape of
  * `writer/utils/unmarshal/unmarshal.go:36-241`:
  *
  * {{{
  * {"streams":[{"stream":{"label":"value",...},
  *              "values":[["<unix ns as string>","<log line>"],...]},...]}
  * }}}
  *
  * One call turns a DataFrame of request BODIES (one row per HTTP push)
  * into the canonical pair (time_series, samples) — the same fan-out the
  * reference's insert sinks perform (`writer/service/insert/time_series.go`,
  * `samples.go:58-62`). Decoding is a single `from_json` + two explodes,
  * fully codegen'd and parallel over request rows; at ingest scale this is
  * the map stage of a Structured Streaming `foreachBatch` writing both
  * sinks.
  */
object LokiPush {

  val pushSchema: StructType = StructType(Seq(
    StructField("streams", ArrayType(StructType(Seq(
      StructField("stream", MapType(StringType, StringType)),
      StructField("values", ArrayType(ArrayType(StringType)))))))))

  /** Decode push bodies → flat log rows
    * (fingerprint, timestamp_ns, labels, line).
    */
  def decodeRows(bodies: DataFrame): DataFrame =
    bodies
      .select(explode(from_json(col("body"), pushSchema).getField("streams")).as("st"))
      .select(col("st.stream").as("labels"), explode(col("st.values")).as("v"))
      .select(col("labels"),
        element_at(col("v"), 1).cast("long").as("timestamp_ns"),
        element_at(col("v"), 2).as("line"))
      .withColumn("fingerprint", Tables.fingerprintOf(col("labels")))

  /** Canonical fan-out: (time_series dictionary, samples). */
  def decode(bodies: DataFrame): (DataFrame, DataFrame) = {
    val rows = decodeRows(bodies)
    val series = rows.select(col("fingerprint"), col("labels"))
      .dropDuplicates("fingerprint")
    val samples = rows.select(col("fingerprint"), col("timestamp_ns"), col("line"))
    (series, samples)
  }

  /** Encode a canonical log frame into push bodies (one request per
    * stream) — the test/client side of the round trip. A real client
    * batches arbitrarily; stream-per-request is the degenerate batch.
    */
  def encode(logs: DataFrame): DataFrame =
    logs
      .groupBy(col("labels"))
      .agg(collect_list(array(col("timestamp_ns").cast("string"), col("line")))
        .as("values"))
      .select(to_json(struct(array(struct(col("labels").as("stream"),
        col("values").as("values"))).as("streams"))).as("body"))
}
