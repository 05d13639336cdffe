package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{MapOps, Tables}

/** Loki push-API decoder (`/loki/api/v1/push`), the JSON wire shapes of
  * `writer/utils/unmarshal/unmarshal.go:36-241`. The modern spelling:
  *
  * {{{
  * {"streams":[{"stream":{"label":"value",...},
  *              "values":[["<unix ns as string>","<log line>"],...]},...]}
  * }}}
  *
  * plus the legacy spellings the reference still accepts per stream:
  * `"labels": "{foo=\"bar\"}"` (Loki label-string form), `"entries":
  * [{"ts"/"timestamp": ..., "line": ...}]`, RFC3339 or unix-ns
  * timestamps (`parseTime`, unmarshal.go:284-311), an optional third
  * numeric element in each value tuple (qryn's metric-via-push), and
  * label sanitization (key regex + 100-char value truncation,
  * unmarshal.go:274-282).
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
      StructField("labels", StringType),
      StructField("values", ArrayType(ArrayType(StringType))),
      StructField("entries", ArrayType(StructType(Seq(
        StructField("ts", StringType),
        StructField("timestamp", StringType),
        StructField("line", StringType),
        StructField("value", DoubleType)))))))))))

  /** `{foo="bar", baz="q\"x"}` → label map (`parseLabelsLokiFormat`,
    * unmarshal.go:313-340). Duplicate names in one label string dedupe
    * last-wins (Go map assignment) — `map_from_entries` would throw
    * DUPLICATED_MAP_KEY and fail the whole push batch.
    */
  private def parseLabelString(s: Column): Column =
    graft.model.MapOps.entriesToMapLastWins(transform(
      regexp_extract_all(s, lit("""[a-zA-Z_][a-zA-Z0-9_]*="(?:[^"\\]|\\.)*""""), lit(0)),
      t => map(
        regexp_extract(t, "^([a-zA-Z_][a-zA-Z0-9_]*)=", 1),
        regexp_replace(
          regexp_extract(t, """^[^=]+="((?:[^"\\]|\\.)*)"$""", 1),
          """\\(["\\])""", "$1"))))

  /** sanitizeLabels (unmarshal.go:274-282): keys through the
    * `(^[^a-zA-Z_]|[^a-zA-Z0-9_])` → `_` regex, values over 100 chars
    * truncated to 100 + "...". Capture-free fold (entries evaluated once).
    */
  private def sanitizeLabels(m: Column): Column =
    MapOps.entriesToMapLastWins(transform(map_entries(m), e =>
      map(regexp_replace(e.getField("key"), "(^[^a-zA-Z_]|[^a-zA-Z0-9_])", "_"),
        when(length(e.getField("value")) > 100,
          concat(substring(e.getField("value"), 1, 100), lit("...")))
          .otherwise(e.getField("value")))))

  /** `parseTime` (unmarshal.go:284-310), used by the ENTRIES path only:
    * RFC3339 when the string contains any of `:-TZ` (the reference's
    * `strings.ContainsAny`, '-' included), unix ns otherwise. RFC3339
    * keeps FULL nanosecond precision: Spark timestamps are µs-granular,
    * so the sub-µs digits of the fraction are re-added from the string.
    */
  private def tsNsEntries(c: Column): Column = {
    val micros = unix_micros(to_timestamp(c)) * 1000L
    val frac = regexp_extract(c, """\.([0-9]+)""", 1)
    val nsRem = when(length(frac) > 6,
      substring(rpad(frac, 9, "0"), 7, 3).cast("long")).otherwise(lit(0L))
    when(c.rlike("[:TZ-]"), micros + nsRem)
      .otherwise(when(c =!= "", c).cast("long"))
  }

  /** The VALUES-tuple path accepts only integer unix ns
    * (`strconv.ParseInt`, unmarshal.go:139-144) — an RFC3339 string there
    * errors in the reference, so it decodes to null here.
    */
  private def tsNsValues(c: Column): Column =
    when(c.rlike("^-?[0-9]+$"), c.cast("long"))

  /** Decode push bodies → flat rows
    * (fingerprint, timestamp_ns, labels, line, value, sample_type).
    * `sample_type` mirrors the reference's bit pair: "log" when only a
    * line is present, "metric" when only a numeric value is, "both" when
    * a value tuple carries a third numeric element next to its line.
    */
  def decodeRows(bodies: DataFrame): DataFrame = {
    val streams = bodies
      .select(explode(from_json(col("body"), pushSchema).getField("streams")).as("st"))
      .withColumn("labels",
        sanitizeLabels(coalesce(col("st.stream"), parseLabelString(col("st.labels")),
          map().cast(MapType(StringType, StringType)))))
    val numRe = """^-?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?$"""
    val fromValues = streams
      .select(col("labels"), explode(col("st.values")).as("v"))
      .select(col("labels"),
        tsNsValues(element_at(col("v"), 1)).as("timestamp_ns"),
        element_at(col("v"), 2).as("line"),
        when(try_element_at(col("v"), lit(3)).rlike(numRe),
          try_element_at(col("v"), lit(3)).cast("double")).as("value"))
    val fromEntries = streams
      .select(col("labels"), explode(col("st.entries")).as("e"))
      .select(col("labels"),
        tsNsEntries(coalesce(col("e.ts"), col("e.timestamp"))).as("timestamp_ns"),
        col("e.line").as("line"),
        col("e.value").as("value"))
    fromValues.unionByName(fromEntries)
      .withColumn("sample_type",
        when(col("line").isNotNull && col("value").isNotNull, "both")
          .when(col("value").isNotNull, "metric")
          .otherwise("log"))
      .withColumn("line", coalesce(col("line"), lit("")))
      .withColumn("fingerprint", Tables.fingerprintOf(col("labels")))
  }

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
