package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.logql.{EvalParams, LogQLApi, LogQLCompiler, LogQLParser}
import graft.model.OracleViews

/** Driver-gate queries exercising the LogQL operator inventory
  * (SURVEY.md §2.B/§2.C), each with its DuckDB oracle. Every query goes
  * through the real parser + compiler — not a hand-built DataFrame — so the
  * gate proves the engine end-to-end.
  */
object LogQLGates extends GateSet {
  import EvalWindow._

  private def engine(spark: SparkSession, dir: String) =
    new LogQLCompiler(spark, dir, EvalParams(StartNs, EndNs, StepS))

  /** Compile a log-stream query, project labels to flat columns. */
  private def logQ(q: String, labelCols: String*)(spark: SparkSession, dir: String): DataFrame = {
    val df = engine(spark, dir).compileLog(
      LogQLParser.parseOrThrow(q) match {
        case graft.logql.LogQLAst.LogExpr(s, st) => s
        case other => throw new IllegalArgumentException(s"not a log expr: $other")
      },
      LogQLParser.parseOrThrow(q) match {
        case graft.logql.LogQLAst.LogExpr(_, st) => st
        case _ => Nil
      })
    val cols = col("timestamp_ns") +: col("line") +:
      labelCols.map(k => element_at(col("labels"), k).as(k))
    df.select(cols: _*).orderBy(col("timestamp_ns"), col("line"))
  }

  /** Compile a metric query, project group labels, round values. */
  private def metricQ(q: String, labelCols: String*)(spark: SparkSession, dir: String): DataFrame = {
    val df = engine(spark, dir).compileMetric(LogQLParser.parseOrThrow(q))
    val cols = labelCols.map(k => element_at(col("labels"), k).as(k)) ++
      Seq(col("ts"), round(col("value"), 6).as("value"))
    df.select(cols: _*).orderBy(labelCols.map(col) :+ col("ts") :+ col("value"): _*)
  }

  private def o(body: String): Option[String] =
    Some(OracleViews.withViews(Seq(OracleViews.logs), body))

  // DuckDB helper fragments
  private val bucket = s"(timestamp_ns // ${StepS}000000000) * $StepS"

  override val gates: Seq[Gate] = Seq(

    // --- stream selection + line filters (StreamSelect/LineFilterPlanner) --
    Gate("logql_stream_select",
      logQ("""{event_type="error", level="error"} |= "7"""", "user"),
      o(s"""SELECT timestamp_ns, line, "user"
           |FROM logs WHERE event_type = 'error' AND level = 'error'
           |  AND line LIKE '%7%'
           |ORDER BY timestamp_ns, line""".stripMargin)),

    Gate("logql_line_filter_regex",
      logQ("""{level="info"} |~ "\"k\": 1[0-9]" != "view"""", "event_type"),
      o(s"""SELECT timestamp_ns, line, event_type
           |FROM logs WHERE level = 'info'
           |  AND regexp_matches(line, '"k": 1[0-9]')
           |  AND NOT contains(line, 'view')
           |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- or/and pattern groups after one filter op (model.go:181-212) ----
    // (`|= ("a" or "b") and "c"`: op applies per leaf, tree combines the
    // leaf conditions literally; negative op does not De Morgan)
    Gate("logql_line_filter_or",
      logQ("""{level="info"} |= (": 1" or ": 2") and "k" != "{" or "9"""", "event_type"),
      o(s"""SELECT timestamp_ns, line, event_type
           |FROM logs WHERE level = 'info'
           |  AND ((contains(line, ': 1') OR contains(line, ': 2')) AND contains(line, 'k'))
           |  AND (NOT contains(line, '{') OR NOT contains(line, '9'))
           |ORDER BY timestamp_ns, line""".stripMargin)),

    Gate("logql_line_pattern",
      logQ("""{event_type="signup"} |> "{\"k\": 1<_>}"""", "user"),
      o(s"""SELECT timestamp_ns, line, "user"
           |FROM logs WHERE event_type = 'signup'
           |  AND line LIKE '{"k": 1%}'
           |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- json parser + numeric label filter (ParserPlanner/LabelFilter) ---
    Gate("logql_json_label_filter",
      logQ("""{event_type="purchase"} | json | k >= 50""", "user", "k"),
      o(s"""SELECT timestamp_ns, line, "user",
           |  json_extract_string(line, '$$.k') AS k
           |FROM logs WHERE event_type = 'purchase'
           |  AND CAST(json_extract_string(line, '$$.k') AS DOUBLE) >= 50
           |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- regexp parser ----------------------------------------------------
    Gate("logql_regexp_parser",
      logQ("""{event_type="error"} | regexp "\"k\": (?P<kv>[0-9]+)" | kv > 80""", "kv"),
      o(s"""SELECT timestamp_ns, line, regexp_extract(line, '"k": ([0-9]+)', 1) AS kv
           |FROM logs WHERE event_type = 'error'
           |  AND CAST(regexp_extract(line, '"k": ([0-9]+)', 1) AS DOUBLE) > 80
           |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- line_format / label_format / drop (template + map rewrites) ------
    Gate("logql_line_format",
      logQ("""{event_type="signup"} | line_format "u={{.user}} t={{.event_type}}"""", "user"),
      o(s"""SELECT timestamp_ns,
           |  'u=' || "user" || ' t=' || event_type AS line, "user"
           |FROM logs WHERE event_type = 'signup'
           |ORDER BY timestamp_ns, line""".stripMargin)),

    Gate("logql_label_format_drop",
      logQ("""{event_type="view"} | label_format et=event_type | drop event_type, level""", "et", "user"),
      o(s"""SELECT timestamp_ns, line, event_type AS et, "user"
           |FROM logs WHERE event_type = 'view'
           |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- range aggregations (LRAPlanner) ----------------------------------
    Gate("logql_rate_sum_by",
      metricQ("""sum by (event_type) (rate({level=~"info|error"}[6h]))""", "event_type"),
      o(s"""SELECT event_type, $bucket AS ts,
           |  round(sum(r), 6) AS value
           |FROM (
           |  SELECT event_type, "user", timestamp_ns,
           |    1.0 / $StepS AS r
           |  FROM logs WHERE level IN ('info','error'))
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    // --- macro plugin hook (model.go:485-496): a registered macro expands
    // to LogQL source and compiles like the expansion ----------------------
    Gate("logql_macro",
      (spark: SparkSession, dir: String) => {
        graft.logql.LogQLMacros.register("_err_rate",
          ps => s"""sum by (event_type) (rate({level="error"}[${ps.head}]))""")
        metricQ("""_err_rate("6h")""", "event_type")(spark, dir)
      },
      o(s"""SELECT event_type, $bucket AS ts,
           |  round(count(*) / ${StepS}.0, 6) AS value
           |FROM logs WHERE level = 'error'
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    Gate("logql_count_over_time",
      metricQ("""sum by (level) (count_over_time({event_type=~"click|view"}[6h]))""", "level"),
      o(s"""SELECT level, $bucket AS ts, CAST(count(*) AS DOUBLE) AS value
           |FROM logs WHERE event_type IN ('click','view')
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    Gate("logql_bytes_over_time",
      metricQ("""sum by (event_type) (bytes_over_time({level="info"}[6h]))""", "event_type"),
      o(s"""SELECT event_type, $bucket AS ts,
           |  CAST(sum(length(line)) AS DOUBLE) AS value
           |FROM logs WHERE level = 'info'
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    // --- unwrap + value range aggs (UnwrapFunctionPlanner) ----------------
    Gate("logql_unwrap_sum",
      metricQ("""sum by (user) (sum_over_time({event_type="click"} | json | unwrap k [6h]))""", "user"),
      o(s"""SELECT "user", $bucket AS ts,
           |  round(sum(CAST(json_extract_string(line, '$$.k') AS DOUBLE)), 6) AS value
           |FROM logs WHERE event_type = 'click'
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    Gate("logql_unwrap_max_min",
      metricQ("""max by (level) (max_over_time({level=~".+"} | json | unwrap k [6h]))""", "level"),
      o(s"""SELECT level, $bucket AS ts,
           |  round(max(CAST(json_extract_string(line, '$$.k') AS DOUBLE)), 6) AS value
           |FROM logs
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    // --- qryn unwrap extensions (planner_unwrap.go:39-66) -----------------
    // unwrap _entry: the (line_format-rewritten) log line itself is the
    // sample value; unwrap_value: the ingested value column is
    Gate("logql_unwrap_entry",
      metricQ(
        """sum by (user) (sum_over_time({event_type="click"} | json | line_format "{{.k}}" | unwrap _entry [6h]))""",
        "user"),
      o(s"""SELECT "user", $bucket AS ts,
           |  round(sum(CAST(json_extract_string(line, '$$.k') AS DOUBLE)), 6) AS value
           |FROM logs WHERE event_type = 'click'
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    Gate("logql_unwrap_value",
      metricQ("""sum by (user) (sum_over_time({event_type="click"} | unwrap_value [6h]))""",
        "user"),
      o(s"""SELECT "user", $bucket AS ts, round(sum(value), 6) AS value
           |FROM logs WHERE event_type = 'click'
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    // --- first/last + stddev/stdvar over unwrapped values -----------------
    // (`drop k` re-coarsens the stream identity: after `| json` every
    // distinct k value is its own series — Loki semantics — which would
    // make per-series last/var degenerate)
    Gate("logql_first_last",
      metricQ("""max by (event_type) (last_over_time({event_type=~"click|view"} | json | unwrap k | drop k [6h]))""", "event_type"),
      o(s"""SELECT event_type, ts, round(max(lv), 6) AS value FROM (
           |  SELECT event_type, $bucket AS ts,
           |    arg_max(CAST(json_extract_string(line, '$$.k') AS DOUBLE), timestamp_ns) AS lv
           |  FROM logs WHERE event_type IN ('click', 'view')
           |  GROUP BY event_type, "user", level, 2) g
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    Gate("logql_stddev",
      metricQ("""sum by (event_type) (stdvar_over_time({level="info"} | json | unwrap k | drop k [6h]))""", "event_type"),
      o(s"""SELECT event_type, ts, round(sum(v), 6) AS value FROM (
           |  SELECT event_type, $bucket AS ts,
           |    var_pop(CAST(json_extract_string(line, '$$.k') AS DOUBLE)) AS v
           |  FROM logs WHERE level = 'info'
           |  GROUP BY event_type, "user", level, 2) g
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    // --- quantile (QuantilePlanner; exact == DuckDB quantile_cont) --------
    Gate("logql_quantile_over_time",
      metricQ("""quantile_over_time(0.9, {event_type="purchase"} | json | unwrap k [6h]) by (event_type)""", "event_type"),
      o(s"""SELECT event_type, $bucket AS ts,
           |  round(quantile_cont(CAST(json_extract_string(line, '$$.k') AS DOUBLE), 0.9), 6) AS value
           |FROM logs WHERE event_type = 'purchase'
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    // --- vector agg + topk (AggOp/TopKPlanner) ----------------------------
    Gate("logql_topk",
      metricQ("""topk(3, sum by (user) (count_over_time({level="info"}[6h])))""", "user"),
      o(s"""SELECT "user", ts, value FROM (
           |  SELECT *, row_number() OVER (PARTITION BY ts ORDER BY value DESC, "user") AS rn
           |  FROM (
           |    SELECT "user", $bucket AS ts, CAST(count(*) AS DOUBLE) AS value
           |    FROM logs WHERE level = 'info' GROUP BY 1, 2) agg) r
           |WHERE rn <= 3
           |ORDER BY "user", ts, value""".stripMargin)),

    // --- scalar comparison (ComparisonPlanner) ----------------------------
    Gate("logql_comparison",
      metricQ("""sum by (user) (count_over_time({event_type="error"}[6h])) > 2""", "user"),
      o(s"""SELECT "user", $bucket AS ts, CAST(count(*) AS DOUBLE) AS value
           |FROM logs WHERE event_type = 'error'
           |GROUP BY 1, 2 HAVING count(*) > 2 ORDER BY 1, 2, 3""".stripMargin)),

    // --- binary expression (BinaryExpr join on fingerprint+ts) ------------
    Gate("logql_binop",
      metricQ("""sum by (level) (bytes_over_time({event_type=~"click|view"}[6h])) / sum by (level) (count_over_time({event_type=~"click|view"}[6h]))""", "level"),
      o(s"""SELECT level, $bucket AS ts,
           |  round(CAST(sum(length(line)) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS value
           |FROM logs WHERE event_type IN ('click','view')
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    // --- absent_over_time (grid anti-join) --------------------------------
    Gate("logql_absent_over_time",
      metricQ("""absent_over_time({event_type="nosuch"}[6h])"""),
      o(s"""SELECT gs AS ts, 1.0 AS value
           |FROM generate_series($StartS, ${EndS - StepS}, $StepS) t(gs)
           |ORDER BY ts, value""".stripMargin)),

    // --- series / labels discovery (SeriesPlanner / ValuesPlanner), routed
    // through the real API entry points (graft.logql.LogQLApi) -------------
    Gate("logql_series",
      (spark: SparkSession, dir: String) =>
        LogQLApi.series(spark, dir, EvalParams(StartNs, EndNs, StepS),
            Seq("""{level="error"}"""))
          .select(
            element_at(col("labels"), "event_type").as("event_type"),
            element_at(col("labels"), "level").as("level"),
            element_at(col("labels"), "user").as("user"))
          .orderBy("event_type", "level", "user"),
      o(s"""SELECT DISTINCT event_type, level, "user"
           |FROM logs WHERE level = 'error'
           |ORDER BY 1, 2, 3""".stripMargin)),

    // multi-selector union (MultiStreamSelectPlanner)
    Gate("logql_series_multi",
      (spark: SparkSession, dir: String) =>
        LogQLApi.series(spark, dir, EvalParams(StartNs, EndNs, StepS),
            Seq("""{event_type="click"}""", """{event_type="view"}"""))
          .select(
            element_at(col("labels"), "event_type").as("event_type"),
            element_at(col("labels"), "level").as("level"),
            element_at(col("labels"), "user").as("user"))
          .orderBy("event_type", "level", "user"),
      o(s"""SELECT DISTINCT event_type, level, "user"
           |FROM logs WHERE event_type IN ('click', 'view')
           |ORDER BY 1, 2, 3""".stripMargin)),

    Gate("logql_label_values",
      (spark: SparkSession, dir: String) =>
        LogQLApi.labelValues(spark, dir, EvalParams(StartNs, EndNs, StepS),
          "event_type").orderBy("value"),
      o(s"""SELECT DISTINCT event_type AS value FROM logs ORDER BY 1""")),

    Gate("logql_index_volume",
      (spark: SparkSession, dir: String) =>
        LogQLApi.indexVolume(spark, dir, EvalParams(StartNs, EndNs, StepS),
          """{level=~".+"}""", "event_type").orderBy("name"),
      o(s"""SELECT event_type AS name, CAST(sum(length(line)) AS BIGINT) AS volume
           |FROM logs GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- detected labels: label names + value cardinality (Drilldown's
    // entry call, planner_labels_detect.go:14) -----------------------------
    Gate("logql_detected_labels",
      (spark: SparkSession, dir: String) =>
        LogQLApi.detectedLabels(spark, dir, EvalParams(StartNs, EndNs, StepS),
          """{level="info"}""").orderBy("label"),
      o(s"""SELECT label, CAST(cardinality AS BIGINT) AS cardinality FROM (
           |  SELECT 'event_type' AS label, count(DISTINCT event_type) AS cardinality
           |  FROM logs WHERE level = 'info'
           |  UNION ALL
           |  SELECT 'level', count(DISTINCT level) FROM logs WHERE level = 'info'
           |  UNION ALL
           |  SELECT 'user', count(DISTINCT "user") FROM logs WHERE level = 'info') u
           |ORDER BY label""".stripMargin)),

    // --- detected fields: pipeline output → parser + type sniff +
    // cardinality per field; the oracle re-renders the template lines and
    // re-extracts/re-sniffs them in SQL -----------------------------------
    Gate("logql_detected_fields",
      (spark: SparkSession, dir: String) =>
        LogQLApi.detectedFields(spark, dir, EvalParams(StartNs, EndNs, StepS),
          """{level="info"} | line_format "took={{.user}}ms size={{.user}}kb ok=true tag=u{{.user}}""""
        ).orderBy("field"),
      o(s"""SELECT field, parser, CASE WHEN bool_and(regexp_matches(v, '^(true|false)$$')) THEN 'boolean'
           |    WHEN bool_and(regexp_matches(v, '^-?[0-9]+$$')) THEN 'int'
           |    WHEN bool_and(regexp_matches(v, '^-?[0-9]+(\\.[0-9]+)?$$')) THEN 'float'
           |    WHEN bool_and(regexp_matches(v, '^-?[0-9]+(\\.[0-9]+)?(ns|us|µs|ms|s|m|h)$$')) THEN 'duration'
           |    WHEN bool_and(regexp_matches(v, '^-?[0-9]+(\\.[0-9]+)?\\s*([kKmMgGtTpP]i?[bB]|[bB])$$')) THEN 'bytes'
           |    ELSE 'string' END AS type,
           |  CAST(count(DISTINCT v) AS BIGINT) AS cardinality
           |FROM (
           |  SELECT unnest(regexp_extract_all(line, '([a-zA-Z_][a-zA-Z0-9_]*)=("(?:[^"\\\\]|\\\\.)*"|[^\\s"]*)', 1)) AS field,
           |    unnest(regexp_extract_all(line, '([a-zA-Z_][a-zA-Z0-9_]*)=("(?:[^"\\\\]|\\\\.)*"|[^\\s"]*)', 2)) AS v,
           |    'logfmt' AS parser
           |  FROM (
           |    SELECT 'took=' || "user" || 'ms size=' || "user" || 'kb ok=true tag=u' || "user" AS line
           |    FROM logs WHERE level = 'info') lines) kv
           |GROUP BY 1, 2 ORDER BY field""".stripMargin)),

    // --- index stats (QueryIndexStats: streams/entries/bytes) -------------
    Gate("logql_index_stats",
      (spark: SparkSession, dir: String) =>
        LogQLApi.indexStats(spark, dir, EvalParams(StartNs, EndNs, StepS), "{}"),
      o(s"""SELECT count(DISTINCT event_type || '|' || level || '|' || "user") AS streams,
           |  count(*) AS entries, CAST(sum(length(line)) AS BIGINT) AS bytes
           |FROM logs""".stripMargin)),

    // --- logfmt parser (round-trip through line_format; quoting exercised)
    Gate("logql_logfmt",
      logQ("""{event_type="click"} | line_format `uid={{.user}} msg="hello world"` | logfmt""",
        "uid", "msg"),
      o(s"""SELECT timestamp_ns,
           |  'uid=' || "user" || ' msg="hello world"' AS line,
           |  "user" AS uid, 'hello world' AS msg
           |FROM logs WHERE event_type = 'click'
           |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- keep (PlannerKeep): non-kept labels become NULL ------------------
    Gate("logql_keep",
      logQ("""{event_type="view"} | keep level, user""", "level", "user", "event_type"),
      o(s"""SELECT timestamp_ns, line, level, "user",
           |  CAST(NULL AS VARCHAR) AS event_type
           |FROM logs WHERE event_type = 'view'
           |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- keep preserves __error__ unconditionally; value-qualified drop ---
    // (`planner_keep.go:56-69`: parser-error labels survive any keep list;
    // `planner_drop.go:57-75`: `drop k="v"` drops only the matching value)
    Gate("logql_keep_error_valuedrop",
      logQ("""{event_type="purchase"} | line_format "{{.user}}-oops" | json | keep user | drop user="7"""",
        "user", "__error__"),
      o(s"""SELECT timestamp_ns, "user" || '-oops' AS line,
           |  CASE WHEN "user" = '7' THEN NULL ELSE "user" END AS "user",
           |  'JSONParserErr' AS __error__
           |FROM logs WHERE event_type = 'purchase'
           |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- without grouping (ByWithoutPlanner, without branch) --------------
    Gate("logql_without",
      metricQ("""sum without (user, level) (count_over_time({level="info"}[6h]))""", "event_type"),
      o(s"""SELECT event_type, $bucket AS ts, CAST(count(*) AS DOUBLE) AS value
           |FROM logs WHERE level = 'info'
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    // --- offset (model.go:548-556): window shifted back by 6h -------------
    Gate("logql_offset",
      metricQ("""sum by (event_type) (count_over_time({level="error"}[6h] offset 6h))""", "event_type"),
      o(s"""SELECT event_type,
           |  ((timestamp_ns + ${StepS}000000000) // ${StepS}000000000) * $StepS AS ts,
           |  CAST(count(*) AS DOUBLE) AS value
           |FROM logs WHERE level = 'error'
           |  AND timestamp_ns < ${EndS - StepS}000000000
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    // --- sliding window: range (12h) > step (6h) — each sample covers two
    // eval buckets, window = lookback ending at bucket end ----------------
    Gate("logql_sliding_count",
      metricQ("""sum by (event_type) (count_over_time({level="info"}[12h]))""", "event_type"),
      o(s"""SELECT event_type, t AS ts, CAST(count(*) AS DOUBLE) AS value FROM (
           |  SELECT event_type, unnest([b, b + $StepS]) AS t FROM (
           |    SELECT event_type, $bucket AS b FROM logs WHERE level = 'info'))
           |WHERE t >= $StartS AND t <= ${EndS - StepS}
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    Gate("logql_sliding_rate",
      metricQ("""sum by (level) (rate({event_type=~"click|view"}[12h]))""", "level"),
      o(s"""SELECT level, t AS ts, round(CAST(count(*) AS DOUBLE) / ${2 * StepS}, 6) AS value FROM (
           |  SELECT level, unnest([b, b + $StepS]) AS t FROM (
           |    SELECT level, $bucket AS b FROM logs WHERE event_type IN ('click','view')))
           |WHERE t >= $StartS AND t <= ${EndS - StepS}
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    // --- large range/step LRA: RANGE-frame window plan --------------------
    // (ratio 6h/15min = 24 ≥ threshold; routes through the 15s downsample
    // partials with the frame instead of the per-sample explode)
    Gate("logql_rate_window",
      (spark: SparkSession, dir: String) => {
        val ws = StartS + 86400
        val we = StartS + 2 * 86400
        new LogQLCompiler(spark, dir,
            EvalParams(ws * 1000000000L, we * 1000000000L, 900L))
          .compileMetric(LogQLParser.parseOrThrow(
            """sum by (event_type) (rate({level="info"}[6h]))"""))
          .select(element_at(col("labels"), "event_type").as("event_type"),
            col("ts"), round(col("value"), 6).as("value"))
          .orderBy("event_type", "ts")
      },
      o(s"""SELECT event_type, t AS ts, round(count(*) / 21600.0, 6) AS value FROM (
           |  SELECT event_type, unnest([b + 900 * i for i in generate_series(0, 23)]) AS t
           |  FROM (SELECT event_type, (timestamp_ns // 900000000000) * 900 AS b
           |        FROM logs WHERE level = 'info'))
           |WHERE t >= ${StartS + 86400} AND t <= ${StartS + 2 * 86400 - 900}
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    // --- unwrap conversions (UnwrapPlanner bytes/duration_seconds) --------
    Gate("logql_unwrap_bytes",
      metricQ("""sum by (user) (sum_over_time({event_type="click"} | json | label_format sz="{{.k}}KiB" | unwrap bytes(sz) [6h]))""", "user"),
      o(s"""SELECT "user", $bucket AS ts,
           |  round(sum(CAST(json_extract_string(line, '$$.k') AS DOUBLE) * 1024), 6) AS value
           |FROM logs WHERE event_type = 'click'
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    Gate("logql_unwrap_duration",
      metricQ("""sum by (user) (sum_over_time({event_type="purchase"} | json | label_format d="{{.k}}m30s" | unwrap duration_seconds(d) [6h]))""", "user"),
      o(s"""SELECT "user", $bucket AS ts,
           |  round(sum(CAST(json_extract_string(line, '$$.k') AS DOUBLE) * 60 + 30), 6) AS value
           |FROM logs WHERE event_type = 'purchase'
           |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin)),

    // --- __error__ label injection on json parse failure ------------------
    Gate("logql_error_label",
      logQ("""{event_type="purchase"} | line_format "{{.user}}-oops" | json | __error__="JSONParserErr"""",
        "user", "__error__"),
      o(s"""SELECT timestamp_ns, "user" || '-oops' AS line, "user",
           |  'JSONParserErr' AS __error__
           |FROM logs WHERE event_type = 'purchase'
           |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- __timestamp__ per-entry builtin (template_funcs.go:19): bare use
    // renders Go time.Time.String() (UTC, trimmed fraction); piped use
    // feeds the typed timestamp into date ------------------------------
    Gate("logql_line_format_timestamp",
      logQ("""{event_type="signup"} | line_format `{{ __timestamp__ }}#{{ __timestamp__ | date "2006-01-02" }}`""",
        "user"),
      o(s"""SELECT timestamp_ns,
           |  strftime(make_timestamp(timestamp_ns // 1000), '%Y-%m-%d %H:%M:%S') ||
           |    CASE WHEN timestamp_ns % 1000000000 = 0 THEN ''
           |         ELSE '.' || rtrim(lpad(CAST(timestamp_ns % 1000000000 AS VARCHAR), 9, '0'), '0') END ||
           |    ' +0000 UTC#' ||
           |    strftime(make_timestamp(timestamp_ns // 1000), '%Y-%m-%d') AS line,
           |  "user"
           |FROM logs WHERE event_type = 'signup'
           |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- sprig/template pipe functions (template_funcs.go:29-101) ---------
    Gate("logql_line_format_fns",
      logQ("""{event_type="view"} | line_format `{{.event_type | upper}}:{{.user | trunc 2}}-{{.level | replace "inf" "I"}}`""",
        "user"),
      o(s"""SELECT timestamp_ns,
           |  upper(event_type) || ':' || substr("user", 1, 2) || '-' ||
           |    replace(level, 'inf', 'I') AS line, "user"
           |FROM logs WHERE event_type = 'view'
           |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- template conditionals ({{ if }} / {{ else }} / {{ end }}) --------
    Gate("logql_line_format_if",
      logQ("""{event_type="click"} | line_format `{{ if .level }}L={{.level | upper}}{{ else }}nolevel{{ end }}/{{ if .nope }}?{{ else }}none{{ end }}`""",
        "user"),
      o(s"""SELECT timestamp_ns,
           |  'L=' || upper(level) || '/none' AS line, "user"
           |FROM logs WHERE event_type = 'click'
           |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- template tail: len/repeat/add/default/b64 round-trip +
    // toDate→unixEpoch chain + duration_seconds (template_funcs.go sprig
    // subset) --------------------------------------------------------------
    Gate("logql_line_format_fns2",
      logQ("""{event_type="signup"} | label_format d=`2024-01-02 03:04:05`, dur=`1m30s` | line_format `{{.user | len}}|{{.user | repeat 2}}|{{.user | add 10}}|{{.missing | default "none"}}|{{.user | b64enc | b64dec}}|{{.d | toDate "2006-01-02 15:04:05" | unixEpoch}}|{{.dur | duration_seconds}}`""",
        "user"),
      o(s"""SELECT timestamp_ns,
           |  CAST(length("user") AS VARCHAR) || '|' || "user" || "user" || '|' ||
           |  CAST(CAST("user" AS BIGINT) + 10 AS VARCHAR) || '|none|' || "user" ||
           |  '|1704164645|90' AS line, "user"
           |FROM logs WHERE event_type = 'signup'
           |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- {{ range .field }} over a JSON-array label ------------------------
    Gate("logql_line_format_range",
      logQ("""{event_type="purchase"} | label_format tags=`["u{{.user}}","lvl-{{.level}}"]` | line_format `{{.user}}:{{ range .tags }}<{{ . }}>{{ end }}`""",
        "user"),
      o(s"""SELECT timestamp_ns,
           |  "user" || ':<u' || "user" || '><lvl-' || level || '>' AS line, "user"
           |FROM logs WHERE event_type = 'purchase'
           |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- matrix densify: step grid + repeat-last per series (MatrixStep/
    // FixPeriod/ZeroEater) -------------------------------------------------
    Gate("logql_matrix_densify",
      (spark: SparkSession, dir: String) => {
        val eng = engine(spark, dir)
        eng.densify(eng.compileMetric(LogQLParser.parseOrThrow(
            """sum by (user) (count_over_time({event_type="error", user=~"1[0-9]"}[6h]))""")))
          .select(element_at(col("labels"), "user").as("user"),
            col("ts"), round(col("value"), 6).as("value"))
          .orderBy("user", "ts")
      },
      o(s"""SELECT "user", ts,
           |  round(last_value(value IGNORE NULLS) OVER (
           |    PARTITION BY "user" ORDER BY ts
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value
           |FROM (
           |  SELECT d."user", d.t AS ts, a.value
           |  FROM (
           |    SELECT b."user", g.t
           |    FROM (SELECT "user", min(ts) AS mn, max(ts) AS mx FROM (
           |            SELECT "user", $bucket AS ts FROM logs
           |            WHERE event_type = 'error'
           |              AND regexp_matches("user", '^(?:1[0-9])$$')
           |            GROUP BY 1, 2) q GROUP BY 1) b
           |    JOIN (SELECT unnest(generate_series($StartS, ${EndS - StepS}, $StepS)) AS t) g
           |      ON g.t BETWEEN b.mn AND b.mx) d
           |  LEFT JOIN (
           |    SELECT "user", $bucket AS ts, CAST(count(*) AS DOUBLE) AS value
           |    FROM logs WHERE event_type = 'error'
           |      AND regexp_matches("user", '^(?:1[0-9])$$')
           |    GROUP BY 1, 2) a
           |    ON a."user" = d."user" AND a.ts = d.t) j
           |ORDER BY 1, 2""".stripMargin)),

    // --- log-query limit + backward direction (MainLimit/MainOrderBy) -----
    Gate("logql_limit_backward",
      (spark: SparkSession, dir: String) =>
        engine(spark, dir)
          .compileLogQuery("""{level="error"} |= "3"""", Some(250), forward = false)
          .select(col("timestamp_ns"), col("line"),
            element_at(col("labels"), "user").as("user")),
      o(s"""SELECT timestamp_ns, line, "user"
           |FROM logs WHERE level = 'error' AND line LIKE '%3%'
           |ORDER BY timestamp_ns DESC, line DESC LIMIT 250""".stripMargin))
  )
}
