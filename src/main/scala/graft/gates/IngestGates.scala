package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{LokiPush, PromRemoteWrite, WireFormats}
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

  /** Spread the encoded request bodies across the session's cores before
    * decoding: the encode side ends in a tiny groupBy whose output AQE
    * coalesces to ~1 partition (few KB of body strings), which then ran
    * the expensive from_json/regex decode single-task. In production each
    * body is its own request and decode parallelism comes from request
    * volume; the round-trip gates replay a whole table as one batch, so
    * they re-spread explicitly. Decode results are per-row, so the
    * placement is semantics-free.
    */
  private def spread(bodies: DataFrame): DataFrame =
    bodies.repartition(
      bodies.sparkSession.sparkContext.defaultParallelism)

  override val gates: Seq[Gate] = Seq(

    Gate("ingest_loki_roundtrip",
      (spark: SparkSession, dir: String) => {
        val bodies = LokiPush.encode(Tables.logs(spark, dir))
        val (series, samples) = LokiPush.decode(spread(bodies))
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
        val rows = LokiPush.decodeRows(spread(bodies))
        rows.groupBy(element_at(col("labels"), "event_type").as("event_type"))
          .agg(min(col("timestamp_ns")).as("min_ts"),
            max(col("timestamp_ns")).as("max_ts"),
            sum(length(col("line"))).cast("long").as("bytes"))
          .orderBy("event_type")
      },
      o("""SELECT event_type, min(timestamp_ns) AS min_ts,
          |  max(timestamp_ns) AS max_ts,
          |  CAST(sum(length(line)) AS BIGINT) AS bytes
          |FROM logs GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- Prometheus remote-write round trip: snappy-framed protobuf wire
    // format, hand-rolled varint codec (metrics_protobuf.go) ---------------
    Gate("ingest_promrw_roundtrip",
      (spark: SparkSession, dir: String) => {
        val bodies = PromRemoteWrite.encode(Tables.gaugeSamples(spark, dir))
        PromRemoteWrite.decode(spread(bodies))
          .groupBy(
            element_at(col("labels"), "event_type").as("event_type"),
            element_at(col("labels"), "level").as("level"))
          .agg(count(lit(1)).as("samples"),
            round(sum(col("value")), 6).as("total"),
            min(col("timestamp_ns")).as("min_ts"),
            max(col("timestamp_ns")).as("max_ts"))
          .orderBy("event_type", "level")
      },
      Some(OracleViews.withViews(Seq(OracleViews.logs, OracleViews.metrics),
        """SELECT event_type, level, count(*) AS samples,
          |  round(sum(value), 6) AS total,
          |  min((timestamp_ns // 1000000) * 1000000) AS min_ts,
          |  max((timestamp_ns // 1000000) * 1000000) AS max_ts
          |FROM metrics GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))),

    // --- OTLP/HTTP JSON logs round trip (otlplogs.go) ---------------------
    Gate("ingest_otlp_roundtrip",
      (spark: SparkSession, dir: String) => {
        val logs = Tables.logs(spark, dir)
        val attrs = transform(map_entries(col("labels")), e =>
          struct(e.getField("key").as("key"),
            struct(e.getField("value").as("stringValue")).as("value")))
        // one literal fixture body exercises the RECURSIVE AnyValue render:
        // a nested-kvlist body with extreme doubles plus a kvlist-valued
        // resource attr (renders as a JSON-string label value)
        val fixture =
          """{"resourceLogs":[{"resource":{"attributes":[
            |{"key":"event_type","value":{"stringValue":"zfixture"}},
            |{"key":"deploy","value":{"kvlistValue":{"values":[
            |{"key":"zone","value":{"stringValue":"eu"}},
            |{"key":"az","value":{"intValue":"2"}}]}}}]},
            |"scopeLogs":[{"logRecords":[{"timeUnixNano":"1704067200000000001",
            |"body":{"kvlistValue":{"values":[
            |{"key":"nest","value":{"kvlistValue":{"values":[
            |{"key":"a","value":{"intValue":"1"}}]}}},
            |{"key":"big","value":{"doubleValue":1e21}},
            |{"key":"tiny","value":{"doubleValue":5e-20}}]}}}]}]}]}"""
            .stripMargin.replace("\n", "")
        val bodies = logs
          .groupBy(col("labels"))
          .agg(collect_list(struct(col("timestamp_ns").as("ts"),
            col("line").as("line"))).as("vals"))
          .select(to_json(struct(array(struct(array(struct(
            transform(col("vals"), v => struct(
              v.getField("ts").cast("string").as("timeUnixNano"),
              struct(v.getField("line").as("stringValue")).as("body"),
              attrs.as("attributes"))).as("logRecords")))
            .as("scopeLogs"))).as("resourceLogs"))).as("body"))
          .unionByName({
            val s = spark; import s.implicits._
            Seq(fixture).toDF("body")
          })
        WireFormats.decodeOtlpLogs(spread(bodies))
          .groupBy(
            element_at(col("labels"), "event_type").as("event_type"),
            element_at(col("labels"), "level").as("level"),
            element_at(col("labels"), "user").as("user"))
          .agg(count(lit(1)).as("entries"),
            sum(length(col("line"))).cast("long").as("bytes"),
            max(element_at(col("labels"), "deploy")).as("deploy"))
          .orderBy("event_type", "level", "user")
      },
      o("""SELECT event_type, level, "user", count(*) AS entries,
          |  CAST(sum(length(line)) AS BIGINT) AS bytes,
          |  CAST(NULL AS VARCHAR) AS deploy
          |FROM logs GROUP BY 1, 2, 3
          |UNION ALL SELECT 'zfixture', NULL, NULL, 1, 87,
          |  '{"az":"2","zone":"eu"}'
          |ORDER BY 1, 2, 3""".stripMargin)),

    // --- Zipkin JSON spans round trip (zipkin_json.go) --------------------
    Gate("ingest_zipkin_roundtrip",
      (spark: SparkSession, dir: String) => {
        val spans = Tables.spans(spark, dir)
        val bodies = spans
          .groupBy(col("trace_id"))
          .agg(collect_list(struct(
            lpad(hex(col("trace_id")), 16, "0").as("traceId"),
            lpad(hex(col("span_id")), 16, "0").as("id"),
            when(col("parent_id").isNotNull,
              lpad(hex(col("parent_id")), 16, "0")).as("parentId"),
            col("name").as("name"),
            (col("timestamp_ns") / 1000L).cast("long").as("timestamp"),
            (col("duration_ns") / 1000L).cast("long").as("duration"),
            struct(col("service_name").as("serviceName")).as("localEndpoint")))
            .as("sp"))
          .select(to_json(col("sp")).as("body"))
        WireFormats.decodeZipkin(spread(bodies))
          .groupBy(col("service_name"))
          .agg(count(lit(1)).as("spans"),
            countDistinct(col("trace_id_hex")).as("traces"),
            sum(col("duration_ns")).as("dur_ns"))
          .orderBy("service_name")
      },
      Some(OracleViews.withViews(Seq(OracleViews.spans),
        """SELECT service_name, count(*) AS spans,
          |  count(DISTINCT trace_id) AS traces,
          |  CAST(sum((duration_ns // 1000) * 1000) AS BIGINT) AS dur_ns
          |FROM spans GROUP BY 1 ORDER BY 1""".stripMargin))),

    // --- Influx line protocol round trip (influx.go) ----------------------
    // metric branch: __name__ = sanitized field key, measurement → label
    Gate("ingest_influx_roundtrip",
      (spark: SparkSession, dir: String) => {
        val lines = Tables.events(spark, dir).select(concat(
          lit("events,event_type="), col("event_type"),
          lit(" value="), col("value").cast("string"),
          lit(" "), (col("ts") - pmod(col("ts"), lit(1000L))).cast("string"))
          .as("line"))
        WireFormats.decodeInflux(spread(lines))
          .groupBy(col("name"),
            element_at(col("labels"), "measurement").as("measurement"),
            element_at(col("labels"), "event_type").as("event_type"))
          .agg(count(lit(1)).as("samples"), round(sum(col("value")), 6).as("total"),
            min(col("timestamp_ns")).as("min_ts"))
          .orderBy("name", "measurement", "event_type")
      },
      Some(OracleViews.withViews(Seq(OracleViews.logs, OracleViews.metrics),
        """SELECT 'value' AS name, 'events' AS measurement, event_type,
          |  count(*) AS samples,
          |  round(sum(value), 6) AS total, min(timestamp_ns) AS min_ts
          |FROM metrics GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))),

    // --- Influx message→log branch (influx.go:16-37,61-73): lines whose
    // fields carry `message` ingest as LOG entries — message alone when it
    // is the only field, logfmt-joined with the remaining fields otherwise;
    // every entry labeled with its measurement ------------------------------
    Gate("ingest_influx_logs_roundtrip",
      (spark: SparkSession, dir: String) => {
        val esc = regexp_replace(col("line"), "([\"\\\\])", "\\\\$1")
        // error-level lines carry an extra int field (exercises the logfmt
        // join); the rest send message as the only field (raw passthrough)
        val lines = Tables.logs(spark, dir).select(concat(
          lit("syslog,host=h"),
          pmod(element_at(col("labels"), "user").cast("long"), lit(4)),
          lit(",event_type="), element_at(col("labels"), "event_type"),
          lit(" message=\""), esc, lit("\""),
          when(element_at(col("labels"), "level") === "error",
            concat(lit(",code="), length(col("line")), lit("i")))
            .otherwise(lit("")),
          lit(" "), col("timestamp_ns").cast("string")).as("line"))
          // one literal fixture exercises the Go %v float render: e-notation
          // outside [1e-4, 1e21) with signed two-digit exponents
          .unionByName({
            val s = spark; import s.implicits._
            Seq("zfloat message=\"x\",big=1e21,small=0.00005 1704067200000000002")
              .toDF("line")
          })
        WireFormats.decodeInflux(spread(lines))
          .filter(col("sample_type") === "log")
          .groupBy(
            element_at(col("labels"), "measurement").as("measurement"),
            element_at(col("labels"), "host").as("host"),
            element_at(col("labels"), "event_type").as("event_type"))
          .agg(count(lit(1)).as("entries"),
            sum(length(col("line"))).cast("long").as("bytes"),
            min(col("line")).as("first_line"),
            min(col("timestamp_ns")).as("min_ts"))
          .orderBy("measurement", "host", "event_type")
      },
      o(""", influx AS (
          |  SELECT 'syslog' AS measurement,
          |    'h' || CAST(CAST("user" AS BIGINT) % 4 AS VARCHAR) AS host,
          |    event_type, timestamp_ns,
          |    CASE WHEN level = 'error' THEN
          |      'message=' ||
          |      CASE WHEN regexp_matches(line, '[ ="]') THEN
          |        '"' || replace(replace(line, '\', '\\'), '"', '\"') || '"'
          |      ELSE line END ||
          |      ' code=' || CAST(length(line) AS VARCHAR)
          |    ELSE line END AS out_line
          |  FROM logs)
          |SELECT measurement, host, event_type, count(*) AS entries,
          |  CAST(sum(length(out_line)) AS BIGINT) AS bytes,
          |  min(out_line) AS first_line, min(timestamp_ns) AS min_ts
          |FROM influx GROUP BY 1, 2, 3
          |UNION ALL SELECT 'zfloat', NULL, NULL, 1, 31,
          |  'message=x big=1e+21 small=5e-05', 1704067200000000002
          |ORDER BY 1, 2, 3""".stripMargin)),

    // --- OTLP/HTTP JSON traces round trip (otlp.go) -----------------------
    Gate("ingest_otlp_traces_roundtrip",
      (spark: SparkSession, dir: String) => {
        val spans = Tables.spans(spark, dir)
        val bodies = spans
          .groupBy(col("trace_id"), col("service_name"))
          .agg(collect_list(struct(
            lpad(hex(col("trace_id")), 32, "0").as("traceId"),
            lpad(hex(col("span_id")), 16, "0").as("spanId"),
            when(col("parent_id").isNotNull,
              lpad(hex(col("parent_id")), 16, "0")).as("parentSpanId"),
            col("name").as("name"),
            col("timestamp_ns").cast("string").as("startTimeUnixNano"),
            (col("timestamp_ns") + col("duration_ns")).cast("string")
              .as("endTimeUnixNano"))).as("sp"))
          .select(to_json(struct(array(struct(
            struct(array(struct(lit("service.name").as("key"),
              struct(col("service_name").as("stringValue")).as("value")))
              .as("attributes")).as("resource"),
            array(struct(col("sp").as("spans"))).as("scopeSpans")))
            .as("resourceSpans"))).as("body"))
        WireFormats.decodeOtlpTraces(spread(bodies))
          .groupBy(col("service_name"))
          .agg(count(lit(1)).as("spans"),
            countDistinct(col("trace_id_hex")).as("traces"),
            sum(col("duration_ns")).as("dur_ns"),
            min(col("timestamp_ns")).as("min_ts"))
          .orderBy("service_name")
      },
      Some(OracleViews.withViews(Seq(OracleViews.spans),
        """SELECT service_name, count(*) AS spans,
          |  count(DISTINCT trace_id) AS traces,
          |  CAST(sum(duration_ns) AS BIGINT) AS dur_ns,
          |  min(timestamp_ns) AS min_ts
          |FROM spans GROUP BY 1 ORDER BY 1""".stripMargin))),

    // --- OTLP/HTTP JSON metrics round trip --------------------------------
    Gate("ingest_otlp_metrics_roundtrip",
      (spark: SparkSession, dir: String) => {
        val g = Tables.gaugeSamples(spark, dir)
        val attrs = transform(
          filter(map_entries(col("labels")), e => e.getField("key") =!= "__name__"),
          e => struct(e.getField("key").as("key"),
            struct(e.getField("value").as("stringValue")).as("value")))
        // one request per (series, day): real clients batch; a single
        // 10k-point body also balloons the parsed nested tree at decode
        val bodies = g
          .groupBy(col("labels"),
            expr("timestamp_ns div 86400000000000").as("__day"))
          .agg(collect_list(struct(col("timestamp_ns").as("ts"),
            col("value").as("v"))).as("dps"))
          .select(to_json(struct(array(struct(array(struct(array(struct(
            lit("events_value").as("name"),
            struct(transform(col("dps"), d => struct(
              d.getField("ts").cast("string").as("timeUnixNano"),
              d.getField("v").as("asDouble"),
              attrs.as("attributes"))).as("dataPoints")).as("gauge")))
            .as("metrics"))).as("scopeMetrics"))).as("resourceMetrics")))
            .as("body"))
        WireFormats.decodeOtlpMetrics(spread(bodies))
          .groupBy(
            element_at(col("labels"), "event_type").as("event_type"),
            element_at(col("labels"), "level").as("level"))
          .agg(count(lit(1)).as("samples"),
            round(sum(col("value")), 6).as("total"),
            min(col("timestamp_ns")).as("min_ts"))
          .orderBy("event_type", "level")
      },
      Some(OracleViews.withViews(Seq(OracleViews.logs, OracleViews.metrics),
        """SELECT event_type, level, count(*) AS samples,
          |  round(sum(value), 6) AS total, min(timestamp_ns) AS min_ts
          |FROM metrics GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))),

    // --- Datadog logs round trip (datadog_json.go) ------------------------
    Gate("ingest_datadog_roundtrip",
      (spark: SparkSession, dir: String) => {
        // error-level rows carry an explicit ms timestamp; the rest are
        // timestamp-less and take the PINNED ingest-time fallback (the
        // reference's now(), threaded as a deterministic parameter)
        val bodies = Tables.logs(spark, dir)
          .select(struct(
            col("line").as("message"),
            when(element_at(col("labels"), "level") === "error",
              (col("timestamp_ns") / 1000000L).cast("long")).as("timestamp"),
            concat(lit("event_type:"), element_at(col("labels"), "event_type"),
              lit(",level:"), element_at(col("labels"), "level")).as("ddtags"),
            concat(lit("svc"),
              element_at(col("labels"), "user").cast("long") % 5).as("service"))
            .as("m"))
          .groupBy((col("m.service")).as("g"))
          .agg(collect_list(col("m")).as("ms"))
          .select(to_json(col("ms")).as("body"))
        WireFormats.decodeDatadogLogs(spread(bodies),
            ingestTsNs = Some(1704067201000000000L))
          .groupBy(
            element_at(col("labels"), "event_type").as("event_type"),
            element_at(col("labels"), "service").as("service"))
          .agg(count(lit(1)).as("entries"),
            sum(length(col("line"))).cast("long").as("bytes"),
            min(col("timestamp_ns")).as("min_ts"))
          .orderBy("event_type", "service")
      },
      o("""SELECT event_type, 'svc' || CAST(CAST("user" AS BIGINT) % 5 AS VARCHAR) AS service,
          |  count(*) AS entries, CAST(sum(length(line)) AS BIGINT) AS bytes,
          |  CASE WHEN event_type = 'error'
          |    THEN min((timestamp_ns // 1000000) * 1000000)
          |    ELSE 1704067201000000000 END AS min_ts
          |FROM logs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- Datadog metrics round trip (datadog_metrics_json.go) -------------
    // (points carry epoch SECONDS; second-precision aggregates compared)
    Gate("ingest_datadog_metrics_roundtrip",
      (spark: SparkSession, dir: String) => {
        val g = Tables.gaugeSamples(spark, dir)
        val bodies = g
          .groupBy(element_at(col("labels"), "event_type").as("et"),
            element_at(col("labels"), "level").as("lv"),
            expr("timestamp_ns div 86400000000000").as("__day"))
          .agg(collect_list(array(col("timestamp_ns") / 1e9,
            col("value"))).as("pts"))
          .select(to_json(struct(array(struct(
            lit("events_value").as("metric"),
            col("pts").as("points"),
            array(concat(lit("event_type:"), col("et")),
              concat(lit("level:"), col("lv"))).as("tags"),
            lit("gauge").as("type"))).as("series"))).as("body"))
        WireFormats.decodeDatadogMetrics(spread(bodies))
          .groupBy(
            element_at(col("labels"), "event_type").as("event_type"),
            element_at(col("labels"), "level").as("level"))
          .agg(count(lit(1)).as("samples"),
            round(sum(col("value")), 6).as("total"),
            expr("min(timestamp_ns div 1000000000)").as("min_ts_s"))
          .orderBy("event_type", "level")
      },
      Some(OracleViews.withViews(Seq(OracleViews.logs, OracleViews.metrics),
        """SELECT event_type, level, count(*) AS samples,
          |  round(sum(value), 6) AS total,
          |  min(timestamp_ns // 1000000000) AS min_ts_s
          |FROM metrics GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))),

    // --- Cloudflare log push round trip (datadog_cf_json.go:14-146):
    // Workers/audit-shaped NDJSON records; label set = the decoder's
    // non-empty field list, raw record preserved as the line ---------------
    Gate("ingest_cloudflare_roundtrip",
      (spark: SparkSession, dir: String) => {
        val recs = Tables.logs(spark, dir).select(to_json(struct(
          element_at(col("labels"), "event_type").as("EventType"),
          element_at(col("labels"), "level").as("Outcome"),
          concat(lit("w"),
            pmod(element_at(col("labels"), "user").cast("long"), lit(5)))
            .as("ScriptName"),
          col("timestamp_ns").as("When"),
          (element_at(col("labels"), "level") =!= "error").as("ActionResult")))
          .as("r"),
          (col("timestamp_ns") % 16).as("g"))
        val bodies = recs.groupBy(col("g"))
          .agg(concat_ws("\n", collect_list(col("r"))).as("body"))
        WireFormats.decodeCloudflare(spread(bodies), ddsource = "cloudflare")
          .groupBy(element_at(col("labels"), "EventType").as("event_type"),
            element_at(col("labels"), "Outcome").as("outcome"),
            element_at(col("labels"), "ScriptName").as("script"),
            element_at(col("labels"), "ActionResult").as("action_result"),
            element_at(col("labels"), "ddsource").as("ddsource"))
          .agg(count(lit(1)).as("entries"),
            sum(length(col("line"))).cast("long").as("bytes"),
            min(col("timestamp_ns")).as("min_ts"))
          .orderBy("event_type", "outcome", "script")
      },
      o("""SELECT event_type, level AS outcome,
          |  'w' || CAST(CAST("user" AS BIGINT) % 5 AS VARCHAR) AS script,
          |  CAST(level != 'error' AS VARCHAR) AS action_result,
          |  'cloudflare' AS ddsource, count(*) AS entries,
          |  CAST(sum(length(
          |    '{"EventType":"' || event_type || '","Outcome":"' || level ||
          |    '","ScriptName":"w' || CAST(CAST("user" AS BIGINT) % 5 AS VARCHAR) ||
          |    '","When":' || CAST(timestamp_ns AS VARCHAR) ||
          |    ',"ActionResult":' || CAST(level != 'error' AS VARCHAR) || '}'
          |  )) AS BIGINT) AS bytes,
          |  min(timestamp_ns) AS min_ts
          |FROM logs GROUP BY 1, 2, 3, 4, 5 ORDER BY 1, 2, 3""".stripMargin)),

    // --- Elastic bulk NDJSON round trip (elastic.go) ----------------------
    Gate("ingest_elastic_roundtrip",
      (spark: SparkSession, dir: String) => {
        val bodies = Tables.logs(spark, dir)
          .select(element_at(col("labels"), "event_type").as("et"), col("line"))
          .groupBy(col("et"))
          .agg(concat_ws("\n", collect_list(concat(
            lit("{\"index\":{\"_index\":\"logs-"), col("et"), lit("\"}}\n"),
            col("line")))).as("body"))
          .select(col("body"))
        // elastic docs are timestamp-less: every entry takes the pinned
        // ingest-time parameter (the reference's time.Now(), elastic.go:113)
        WireFormats.decodeElasticBulk(spread(bodies),
            ingestTsNs = Some(1704067202000000000L))
          .groupBy(element_at(col("labels"), "_index").as("index"))
          .agg(count(lit(1)).as("docs"),
            sum(length(col("line"))).cast("long").as("bytes"),
            min(col("timestamp_ns")).as("min_ts"))
          .orderBy("index")
      },
      o("""SELECT 'logs-' || event_type AS index, count(*) AS docs,
          |  CAST(sum(length(line)) AS BIGINT) AS bytes,
          |  1704067202000000000 AS min_ts
          |FROM logs GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
