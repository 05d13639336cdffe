package graft.gates

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.http.{Frontend, Params}
import graft.logql.{EvalParams, LogQLCompiler}
import graft.model.{MapOps, OracleViews, Tables}

/** HTTP-roundtrip gates: the serving layer IS the unit under test — wire
  * payloads go through [[Frontend.route]] (the exact dispatcher the socket
  * server runs), land in the store via the live-append path, and the
  * query side reads them back; the DuckDB oracle replays the derivation
  * from the original events table. Each gate works on a FRESH small copy
  * of the fixture (events downsampled to user_id % 17 == 0) so the
  * per-gate store build stays bounded at any SF — the filter is mirrored
  * in the oracle's view text.
  */
object HttpGates extends GateSet {

  import EvalWindow._

  /** Filtered logs view for the oracle — [[OracleViews.logs]] with the
    * same user_id % 17 downsample [[freshSmallDir]] applies.
    */
  private val smallLogs: String =
    """logs AS (
      |  SELECT epoch_ns(ts) AS timestamp_ns,
      |         event_type,
      |         CASE WHEN event_type = 'error' THEN 'error' ELSE 'info' END AS level,
      |         CAST(user_id AS VARCHAR) AS "user",
      |         props AS line,
      |         value
      |  FROM events WHERE user_id % 17 = 0)""".stripMargin

  /** Events-only fixture dir at ~1/17 scale, memoized per (JVM, dir) so
    * repeated invocations (bench min-of-N samples) pay the store build
    * ONCE. The gates MUTATE this store via HTTP pushes — each invocation
    * pushes under a fresh `run` marker and queries only its own marker,
    * so accumulated appends from earlier samples never leak into a later
    * sample's result.
    */
  private val fixtures =
    scala.collection.concurrent.TrieMap[String, String]()
  private val fixtureLock = new Object

  private def fixtureDir(spark: SparkSession, dir: String): String =
    fixtures.getOrElse(dir, fixtureLock.synchronized {
      fixtures.getOrElseUpdate(dir, {
        val tmp = java.nio.file.Files.createTempDirectory("graft-http-gate")
          .toFile
        tmp.deleteOnExit()
        Tables.rawEvents(spark, dir)
          .filter(pmod(col("user_id"), lit(17L)) === 0)
          .coalesce(1)
          .write.parquet(tmp.getAbsolutePath + "/events.parquet")
        tmp.getAbsolutePath
      })
    })

  private val runCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Pre-pay the fixture build + its store materialization (the resident
    * query service's startup cost) so bench samples of the HTTP gates
    * measure the push-then-query loop, not a one-time store build.
    */
  def warm(spark: SparkSession, dir: String): Unit = {
    graft.store.Store.ensure(spark, fixtureDir(spark, dir))
    ()
  }

  /** One OTLP/HTTP logs request carrying every row of `logs`, resource
    * attributes = the row's label set plus `extra` (the push marker that
    * keeps pushed streams disjoint from the store-built ones).
    */
  private def otlpLogsBody(logs: DataFrame,
      extra: (String, String)): String = {
    val attrs = transform(
      map_entries(MapOps.update(col("labels"),
        map(lit(extra._1), lit(extra._2)))),
      e => struct(e.getField("key").as("key"),
        struct(e.getField("value").as("stringValue")).as("value")))
    logs
      .groupBy(col("labels"))
      .agg(collect_list(struct(
        col("timestamp_ns").cast("string").as("timeUnixNano"),
        struct(col("line").as("stringValue")).as("body"))).as("recs"))
      .select(struct(
        struct(attrs.as("attributes")).as("resource"),
        array(struct(col("recs").as("logRecords"))).as("scopeLogs")).as("rl"))
      .agg(to_json(struct(collect_list(col("rl")).as("resourceLogs"))))
      .head.getString(0)
  }

  /** One Loki push request: streams keyed by level under `eventType`,
    * tagged with the invocation's run marker.
    */
  private def lokiBody(logs: DataFrame, eventType: String,
      run: String): String =
    logs
      .groupBy(element_at(col("labels"), "level").as("level"))
      .agg(collect_list(array(col("timestamp_ns").cast("string"),
        col("line"))).as("values"))
      .select(struct(
        map(lit("event_type"), lit(eventType), lit("level"), col("level"),
          lit("run"), lit(run)).as("stream"),
        col("values").as("values")).as("st"))
      .agg(to_json(struct(collect_list(col("st")).as("streams"))))
      .head.getString(0)

  private def post(fe: Frontend, path: String, body: String,
      okStatus: Int): Unit = {
    val res = fe.route(path, Params(), "POST", body)
    if (res.status != okStatus)
      throw new IllegalStateException(
        s"POST $path -> ${res.status}: ${res.body.take(300)}")
  }

  override val gates: Seq[Gate] = Seq(

    // --- OTLP push over HTTP -> store append -> LogQL query ---------------
    // (the writer e2e shape: POST wire payload, GET it back — Makefile
    // qryn-test loop; route dispatch + decodeOtlpLogs + Store.appendLogs
    // + the compiled query path all in one certified loop)
    Gate("ingest_http_otlp_roundtrip",
      (spark: SparkSession, dir: String) => {
        val tmp = fixtureDir(spark, dir)
        val run = s"v${runCounter.incrementAndGet()}"
        val fe = new Frontend(spark, tmp, nowNs = () => StartNs)
        post(fe, "/v1/logs",
          otlpLogsBody(Tables.logs(spark, tmp), "otlp" -> run), 200)
        new LogQLCompiler(spark, tmp, EvalParams(StartNs, EndNs, StepS))
          .compileLogQuery(s"""{otlp="$run"}""")
          .groupBy(
            element_at(col("labels"), "event_type").as("event_type"),
            element_at(col("labels"), "level").as("level"),
            element_at(col("labels"), "user").as("user"))
          .agg(count(lit(1)).as("entries"),
            sum(length(col("line"))).cast("long").as("bytes"),
            min(col("timestamp_ns")).as("min_ts"),
            max(col("timestamp_ns")).as("max_ts"))
          .orderBy("event_type", "level", "user")
      },
      Some(OracleViews.withViews(Seq(smallLogs),
        """SELECT event_type, level, "user", count(*) AS entries,
          |  CAST(sum(length(line)) AS BIGINT) AS bytes,
          |  min(timestamp_ns) AS min_ts, max(timestamp_ns) AS max_ts
          |FROM logs GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))),

    // --- full-stack e2e: HTTP push (Loki + OTLP) -> downsample-maintained
    // store -> range query OVER HTTP (matrix JSON parsed back) -> alert
    // rule POSTED over HTTP evaluated by the alert engine ------------------
    Gate("streaming_http_e2e",
      (spark: SparkSession, dir: String) => {
        val tmp = fixtureDir(spark, dir)
        val run = s"v${runCounter.incrementAndGet()}"
        val fe = new Frontend(spark, tmp, nowNs = () => StartNs)
        val logs = Tables.logs(spark, tmp)
        post(fe, "/loki/api/v1/push", lokiBody(logs, "e2e", run), 204)
        post(fe, "/v1/logs", otlpLogsBody(
          logs.withColumn("labels",
            map(lit("event_type"), lit("e2eotlp"),
              lit("level"), element_at(col("labels"), "level"))),
          "run" -> run), 200)
        // range query over HTTP; parse the matrix JSON back into rows
        val res = fe.route("/loki/api/v1/query_range", Params(
          "query" -> ("""sum by (event_type, level) (count_over_time(""" +
            s"""{event_type=~"e2e|e2eotlp", run="$run"}[6h]))"""),
          "start" -> StartS.toString, "end" -> EndS.toString,
          "step" -> "6h"))
        if (res.status != 200)
          throw new IllegalStateException(s"query_range -> ${res.status}")
        val seriesRe =
          ("""\{"metric":\{"event_type":"([^"]+)","level":"([^"]+)"\},""" +
            """"values":\[(.*?)\]\}""").r
        val pairRe = """\[(\d+),"([0-9.]+)"\]""".r
        val parsed = seriesRe.findAllMatchIn(res.body).flatMap { m =>
          pairRe.findAllMatchIn(m.group(3)).map(pm =>
            Row(m.group(1), m.group(2), pm.group(1).toLong,
              pm.group(2).toDouble))
        }.toSeq
        val counts = spark.createDataFrame(
          spark.sparkContext.parallelize(parsed, 1),
          StructType(Seq(StructField("event_type", StringType),
            StructField("level", StringType),
            StructField("ts", LongType),
            StructField("value", DoubleType))))
        // alert rule arrives over the CRUD route, evaluates via the engine
        post(fe, s"/loki/api/v1/rules/e2e-$run",
          s"""name: g1
             |interval: 1m
             |rules:
             |  - alert: E2EFlow
             |    expr: "sum by (level) (count_over_time({event_type=\\"e2e\\", run=\\"$run\\"}[6h])) > 0"
             |    for: 12h
             |""".stripMargin, 202)
        val rule = graft.streaming.Rules
          .groups(spark, tmp, "loki", s"e2e-$run").head.rules.head
        val states = graft.streaming.Ruler.alertStates(spark, tmp,
            "E2EFlow", rule.expr,
            graft.streaming.Rules.parseIntervalS(rule.forDur),
            EvalParams(StartNs, EndNs, StepS))
          .select(element_at(col("labels"), "level").as("level"),
            col("ts"), col("state"))
        counts.join(states, Seq("level", "ts"), "left")
          .select(col("event_type"), col("level"), col("ts"),
            round(col("value"), 6).as("value"),
            coalesce(col("state"), lit("none")).as("state"))
          .orderBy("event_type", "level", "ts")
      },
      Some(OracleViews.withViews(Seq(smallLogs,
        s"""base AS (
           |  SELECT level, (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
           |    CAST(count(*) AS DOUBLE) AS value
           |  FROM logs GROUP BY 1, 2)""".stripMargin,
        """cnts AS (
          |  SELECT s.src AS event_type, b.level, b.ts, b.value
          |  FROM base b
          |  CROSS JOIN (SELECT unnest(['e2e', 'e2eotlp']) AS src) s)"""
          .stripMargin,
        s"""eps AS (
           |  SELECT level, ts, ts - $StepS * row_number()
           |    OVER (PARTITION BY level ORDER BY ts) AS ep
           |  FROM base WHERE value > 0)""".stripMargin,
        s"""states AS (
           |  SELECT level, ts,
           |    CASE WHEN ts - min(ts) OVER (PARTITION BY level, ep)
           |      >= ${2 * StepS} THEN 'firing' ELSE 'pending' END AS state
           |  FROM eps)""".stripMargin),
        """SELECT c.event_type, c.level, c.ts, round(c.value, 6) AS value,
          |  coalesce(st.state, 'none') AS state
          |FROM cnts c LEFT JOIN states st USING (level, ts)
          |ORDER BY 1, 2, 3""".stripMargin)))
  )
}
