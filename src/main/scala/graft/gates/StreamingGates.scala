package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.logql.EvalParams
import graft.model.{OracleViews, Tables}
import graft.streaming.{LiveTail, Ruler, StatefulOps}

/** Oracle gates for the streaming surface (SURVEY §2.H): each gate drives
  * the REAL Structured Streaming path deterministically — live tail runs
  * the tail predicates over a `readStream` source with an AvailableNow
  * trigger into a memory sink (the bounded replay of an unbounded tail);
  * the ruler evaluates a rule and reads back its written samples. The
  * DuckDB oracle re-derives the same result from the batch view, so the
  * stream path is checked against batch semantics (exactly the reference's
  * contract: tail = the query re-run over new data,
  * `reader/service/query_range.go:670-800`).
  */
object StreamingGates extends GateSet {
  import EvalWindow._

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmrf))
    f.delete(): Unit
  }

  private def o(body: String): Option[String] =
    Some(OracleViews.withViews(Seq(OracleViews.logs), body))

  /** ONE oracle for both alert-evaluation gates (the batch window plan
    * and the incremental cursor form must agree by construction): the
    * gaps-and-islands replay of the pending->firing state machine over
    * the thresholded 6h count grid.
    */
  private lazy val alertStatesOracle: Option[String] =
    o(s"""SELECT * FROM (
         |  SELECT 'HighTraffic' AS alertname, event_type, ts, value,
         |    min(ts) OVER (PARTITION BY event_type, ep) AS active_since,
         |    CASE WHEN ts - min(ts) OVER (PARTITION BY event_type, ep)
         |           >= ${2 * StepS} THEN 'firing' ELSE 'pending' END AS state
         |  FROM (
         |    SELECT *, ts - $StepS * row_number()
         |        OVER (PARTITION BY event_type ORDER BY ts) AS ep
         |    FROM (
         |      SELECT event_type,
         |        (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
         |        CAST(count(*) AS DOUBLE) AS value
         |      FROM logs WHERE level IN ('info', 'error')
         |      GROUP BY 1, 2) b
         |    WHERE value > 17))
         |ORDER BY event_type, ts""".stripMargin)

  override val gates: Seq[Gate] = Seq(

    // --- live tail: selector + line filter over a streaming source --------
    Gate("streaming_live_tail",
      (spark: SparkSession, dir: String) => {
        val schema = Tables.rawEvents(spark, dir).schema
        val stream = Tables.logsFrom(
          spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet").parquet(dir))
        val tailed = LiveTail(stream, """{level="error"} |= "7"""")
        spark.catalog.dropTempView("live_tail_sink"): Unit
        tailed.writeStream.format("memory").queryName("live_tail_sink")
          .trigger(Trigger.AvailableNow()).start().awaitTermination()
        spark.table("live_tail_sink")
          .select(col("timestamp_ns"), col("line"),
            element_at(col("labels"), "user").as("user"))
          .orderBy("timestamp_ns", "line")
      },
      o("""SELECT timestamp_ns, line, "user"
          |FROM logs WHERE level = 'error' AND line LIKE '%7%'
          |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- live tail WITH parser stages: the reference tails the full
    // transpiled query (query_range.go:670-800), parsers included — so a
    // `| json | k >= 50` pipeline must stream. All stages are narrow
    // expressions, so the micro-batch plan stays stateless.
    Gate("streaming_live_tail_parsed",
      (spark: SparkSession, dir: String) => {
        val schema = Tables.rawEvents(spark, dir).schema
        val stream = Tables.logsFrom(
          spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet").parquet(dir))
        val tailed = LiveTail(stream,
          """{event_type="purchase"} | json | k >= 50""")
        spark.catalog.dropTempView("live_tail_parsed_sink"): Unit
        tailed.writeStream.format("memory").queryName("live_tail_parsed_sink")
          .trigger(Trigger.AvailableNow()).start().awaitTermination()
        spark.table("live_tail_parsed_sink")
          .select(col("timestamp_ns"), col("line"),
            element_at(col("labels"), "user").as("user"),
            element_at(col("labels"), "k").as("k"))
          .orderBy("timestamp_ns", "line")
      },
      o(s"""SELECT timestamp_ns, line, "user",
           |  json_extract_string(line, '$$.k') AS k
           |FROM logs WHERE event_type = 'purchase'
           |  AND CAST(json_extract_string(line, '$$.k') AS DOUBLE) >= 50
           |ORDER BY timestamp_ns, line""".stripMargin)),

    // --- recording rule: evaluate + write back + read back ----------------
    Gate("streaming_ruler_record",
      (spark: SparkSession, dir: String) => {
        rmrf(new java.io.File(Ruler.recordedPath(dir))) // deterministic replay
        Ruler.record(spark, dir, "error_count_6h",
          """sum by (event_type) (count_over_time({level="error"}[6h]))""",
          EvalParams(StartNs, EndNs, StepS))
        Ruler.recorded(spark, dir)
          .select(element_at(col("labels"), "__name__").as("name"),
            element_at(col("labels"), "event_type").as("event_type"),
            expr("timestamp_ns div 1000000000").as("ts"),
            round(col("value"), 6).as("value"))
          .orderBy("event_type", "ts")
      },
      o(s"""SELECT 'error_count_6h' AS name, event_type,
           |  (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
           |  CAST(count(*) AS DOUBLE) AS value
           |FROM logs WHERE level = 'error'
           |GROUP BY 2, 3 ORDER BY event_type, ts""".stripMargin)),

    // --- alerting-rule EVALUATION: pending -> firing state machine --------
    // Beyond reference parity (the reference stores alert rules but never
    // evaluates them, ruler/manager.go:12-41): the Prometheus/Loki ruler
    // state machine run relationally. Threshold 17 over the 6h count grid
    // makes activity flicker (sf0.01: 150 episodes, lengths 1-7, 18 of
    // them reaching firing at for=2 steps), so pending-only episodes,
    // pending->firing transitions, AND gap-resets are all in the gate.
    Gate("streaming_ruler_alerts",
      (spark: SparkSession, dir: String) =>
        Ruler.alertStates(spark, dir, "HighTraffic",
          """sum by (event_type) (count_over_time({level=~"info|error"}[6h])) > 17""",
          forS = 2 * StepS, EvalParams(StartNs, EndNs, StepS))
          .select(col("alertname"),
            element_at(col("labels"), "event_type").as("event_type"),
            col("ts"), round(col("value"), 6).as("value"),
            col("active_since"), col("state"))
          .orderBy("event_type", "ts"),
      alertStatesOracle),

    // --- STREAMING alert evaluation: same state machine, incremental ------
    // The flatMapGroupsWithState cursor form of streaming_ruler_alerts: a
    // one-batch replay of the same rule must reproduce the batch window
    // plan's output exactly (same oracle); cross-batch episode continuity
    // is pinned in StreamingSpec with a mid-episode MemoryStream split.
    Gate("streaming_alert_states",
      (spark: SparkSession, dir: String) => {
        import spark.implicits._
        import graft.logql.{LogQLCompiler, LogQLParser}
        val frame = new LogQLCompiler(spark, dir,
            EvalParams(StartNs, EndNs, StepS))
          .compileMetric(LogQLParser.parseOrThrow(
            """sum by (event_type) (count_over_time({level=~"info|error"}[6h])) > 17"""))
          .select(element_at(col("labels"), "event_type").as("series"),
            col("ts"), col("value"))
          .as[StatefulOps.AlertEval]
        StatefulOps.streamingAlertStates(frame, StepS, 2 * StepS)
          .toDF()
          .select(lit("HighTraffic").as("alertname"),
            col("series").as("event_type"), col("ts"),
            round(col("value"), 6).as("value"),
            col("active_since"), col("state"))
          .orderBy("event_type", "ts")
      },
      alertStatesOracle),

    // --- rule groups: PromQL recording rule with label-override writeback -
    // (`ruler/writeback.go:13-41`: sample labels < rule static labels <
    // __name__; `router/init.go:100` prom manager; the alerting rule in the
    // same group is stored but NEVER evaluated, `model.go:5-8` — the gate
    // output would contain its series if it ran)
    Gate("streaming_ruler_group_prom",
      (spark: SparkSession, dir: String) => {
        import graft.streaming.Rules
        rmrf(new java.io.File(Ruler.recordedPath(dir)))
        rmrf(new java.io.File(Rules.rulesPath(dir)))
        Rules.setGroup(spark, dir, "prom", "ns1", Rules.RuleGroup("g1", 60, Seq(
          Rules.Rule(record = "clicks_last",
            expr = """events_value{event_type="click"}""",
            labels = Map("team" -> "sre", "event_type" -> "checkout")),
          Rules.Rule(alert = "NeverEvaluated",
            expr = """events_value{event_type="click"}""",
            labels = Map("team" -> "oncall")))))
        Rules.recordGroup(spark, dir, "prom", "ns1", "g1",
          EvalParams(StartNs, EndNs, StepS))
        Ruler.recorded(spark, dir)
          .select(element_at(col("labels"), "__name__").as("name"),
            element_at(col("labels"), "team").as("team"),
            element_at(col("labels"), "event_type").as("event_type"),
            element_at(col("labels"), "level").as("level"),
            expr("timestamp_ns div 1000000000").as("ts"),
            round(col("value"), 6).as("value"))
          .orderBy("ts")
      },
      Some(OracleViews.withViews(
        Seq(OracleViews.metrics,
          s"grid AS (SELECT unnest(generate_series($StartS, $EndS, $StepS)) AS t)"),
        s"""SELECT 'clicks_last' AS name, 'sre' AS team, 'checkout' AS event_type,
           |  'info' AS level, g.t AS ts,
           |  round(arg_max(value, timestamp_ns), 6) AS value
           |FROM metrics m JOIN grid g
           |  ON m.timestamp_ns > (g.t - 300) * 1000000000
           | AND m.timestamp_ns <= g.t * 1000000000
           |WHERE m.event_type = 'click'
           |GROUP BY g.t ORDER BY ts""".stripMargin))),

    // --- watermarked tumbling-window aggregation over the stream ----------
    // (readStream → withWatermark → window agg → memory sink; complete
    // mode so the result is deterministic under AvailableNow — the oracle
    // is the batch tumbling count, proving stream==batch semantics)
    Gate("streaming_window_counts",
      (spark: SparkSession, dir: String) => {
        val schema = Tables.rawEvents(spark, dir).schema
        val stream = Tables.logsFrom(
          spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet").parquet(dir))
        val agg = stream
          .withColumn("ts", timestamp_micros(expr("timestamp_ns div 1000")))
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "6 hours"),
            element_at(col("labels"), "event_type").as("event_type"))
          .count()
        spark.catalog.dropTempView("win_counts_sink"): Unit
        // state layout pinned at stream start (see statePartitions doc)
        graft.streaming.StatefulOps.withStatePartitions(spark) {
          agg.writeStream.format("memory").queryName("win_counts_sink")
            .outputMode("complete").trigger(Trigger.AvailableNow())
            .start().awaitTermination()
        }
        spark.table("win_counts_sink")
          .select(col("event_type"),
            col("window.start").cast("long").as("ts"), col("count").as("n"))
          .orderBy("event_type", "ts")
      },
      o("""SELECT event_type, (timestamp_ns // 21600000000000) * 21600 AS ts,
          |  count(*) AS n
          |FROM logs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- streaming ingest MV fan-out: one stream, multiple sinks ----------
    // (the reference's ClickHouse MVs fan each insert into samples/gin/
    // trace tables — traces.sql:44-89; here foreachBatch applies each
    // derivation to the micro-batch and appends to per-table sinks;
    // checksums over the read-back prove lossless fan-out)
    Gate("streaming_ingest_fanout",
      (spark: SparkSession, dir: String) => {
        val out = "/root/repo/target/stream-fanout/" +
          dir.replaceAll("[^a-zA-Z0-9.]+", "_")
        rmrf(new java.io.File(out))
        val schema = Tables.rawEvents(spark, dir).schema
        val stream = spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
        stream.writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            Tables.logsFrom(batch)
              .select(col("timestamp_ns"), col("fingerprint"),
                col("line"), col("value"))
              .write.mode("append").parquet(s"$out/samples")
            Tables.spansFrom(batch)
              .select(col("trace_id"), col("span_id"), col("name"),
                col("timestamp_ns"))
              .write.mode("append").parquet(s"$out/spans")
        }.trigger(Trigger.AvailableNow()).start().awaitTermination()
        val samples = spark.read.parquet(s"$out/samples")
          .agg(count(lit(1)).as("n"),
            sum(length(col("line"))).cast("long").as("chk"))
          .select(lit("samples").as("sink"), col("n"), col("chk"))
        val spansOut = spark.read.parquet(s"$out/spans")
          .agg(count(lit(1)).as("n"), sum(col("span_id")).cast("long").as("chk"))
          .select(lit("spans").as("sink"), col("n"), col("chk"))
        samples.unionByName(spansOut).orderBy("sink")
      },
      o("""SELECT 'samples' AS sink, count(*) AS n,
          |  CAST(sum(length(line)) AS BIGINT) AS chk FROM logs
          |UNION ALL
          |SELECT 'spans', count(*), CAST(sum(event_id) AS BIGINT) FROM events
          |ORDER BY sink""".stripMargin)),

    // --- session windows: gap-based stateful grouping over the stream -----
    // (session_window keeps per-key open-session state; complete mode
    // under AvailableNow is deterministic; oracle = gaps-and-islands
    // sessionization in SQL — 30min gap over each user's event times)
    Gate("streaming_session_windows",
      (spark: SparkSession, dir: String) => {
        val schema = Tables.rawEvents(spark, dir).schema
        val stream = Tables.logsFrom(
          spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet").parquet(dir))
        val agg = stream
          .withColumn("ts", timestamp_micros(expr("timestamp_ns div 1000")))
          .withWatermark("ts", "1 hour")
          .groupBy(session_window(col("ts"), "30 minutes"),
            element_at(col("labels"), "user").as("user"))
          .count()
        spark.catalog.dropTempView("sess_sink"): Unit
        // state layout pinned at stream start (see statePartitions doc)
        graft.streaming.StatefulOps.withStatePartitions(spark) {
          agg.writeStream.format("memory").queryName("sess_sink")
            .outputMode("complete").trigger(Trigger.AvailableNow())
            .start().awaitTermination()
        }
        spark.table("sess_sink")
          .select(col("user"),
            col("session_window.start").cast("long").as("start_s"),
            col("session_window.end").cast("long").as("end_s"),
            col("count").as("n"))
          .orderBy("user", "start_s")
      },
      o("""SELECT "user",
          |  CAST(min(tus) // 1000000 AS BIGINT) AS start_s,
          |  CAST((max(tus) + 1800000000) // 1000000 AS BIGINT) AS end_s,
          |  count(*) AS n
          |FROM (
          |  SELECT "user", tus,
          |    sum(CASE WHEN prev IS NULL OR tus - prev >= 1800000000 THEN 1 ELSE 0 END)
          |      OVER (PARTITION BY "user" ORDER BY tus
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
          |  FROM (
          |    SELECT "user", timestamp_ns // 1000 AS tus,
          |      lag(timestamp_ns // 1000)
          |        OVER (PARTITION BY "user" ORDER BY timestamp_ns) AS prev
          |    FROM logs))
          |GROUP BY "user", grp ORDER BY 1, 2""".stripMargin)),

    // --- two-batch pattern-mining replay == one-shot mining ---------------
    // (the foreachBatch streaming form folds each batch's mined patterns
    // into a state table via Patterns.mergeMined; the oracle mines the
    // WHOLE log in one pass, so a pass proves the merge is associative)
    Gate("streaming_patterns_merge",
      (spark: SparkSession, dir: String) => {
        import graft.patterns.Patterns
        val logs = Tables.logs(spark, dir).select(
          element_at(col("labels"), "event_type").as("stream"),
          col("line"), col("timestamp_ns"))
        val mid = (StartNs + EndNs) / 2
        val b1 = Patterns.mineLines(
          logs.filter(col("timestamp_ns") < mid).drop("timestamp_ns"))
        val b2 = Patterns.mineLines(
          logs.filter(col("timestamp_ns") >= mid).drop("timestamp_ns"))
        Patterns.mergeMined(b1.unionByName(b2))
          .withColumnRenamed("stream", "event_type")
          .orderBy("event_type", "pattern")
      },
      Some(OracleViews.withViews(Seq(OracleViews.logs,
        s"""toksm AS (SELECT event_type,
           |    [${graft.patterns.Patterns.duckClassTok("w")} for w in string_split(line, ' ')] AS ws
           |  FROM logs)""".stripMargin,
        """keyedm AS (SELECT event_type, len(ws) AS n, ws[1] AS head, ws FROM toksm)""",
        """posedm AS (SELECT event_type, n, head,
          |    unnest([i for i in generate_series(1, len(ws))]) AS pos,
          |    unnest(ws) AS tok
          |  FROM keyedm)""".stripMargin,
        """postokm AS (SELECT event_type, n, head, pos,
          |    CASE WHEN count(DISTINCT tok) = 1 THEN min(tok) ELSE '<_>' END AS tok_out
          |  FROM posedm GROUP BY 1, 2, 3, 4)""".stripMargin,
        """patsm AS (SELECT event_type, n, head,
          |    string_agg(tok_out, ' ' ORDER BY pos) AS pattern
          |  FROM postokm GROUP BY 1, 2, 3)""".stripMargin,
        """cntsm AS (SELECT event_type, n, head, count(*) AS samples_count
          |  FROM keyedm GROUP BY 1, 2, 3)""".stripMargin),
        """SELECT p.event_type, p.pattern, c.samples_count
          |FROM patsm p JOIN cntsm c USING (event_type, n, head)
          |ORDER BY 1, 2""".stripMargin))),

    // --- streaming exact dedup: flatMapGroupsWithState over doc hashes ----
    // the state store keeps the first-arrived doc per content hash; a
    // single-batch replay of the static table must equal the batch
    // operator (min doc_id per hash) — cross-batch first-arrival is the
    // StreamingSpec MemoryStream test
    Gate("streaming_exact_dedup",
      (spark: SparkSession, dir: String) => {
        import spark.implicits._
        import graft.streaming.StatefulOps
        val schema = Tables.documents(spark, dir).schema
        val stream = spark.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
        val hashed = stream.select(col("doc_id"),
            md5(graft.llm.Dedup.normalized(col("text"))).as("h"))
          .as[StatefulOps.DocHash]
        val out = StatefulOps.streamingExactDedup(hashed)
        spark.catalog.dropTempView("stream_dedup_sink"): Unit
        // production-shape state: RocksDB provider (off-heap state store);
        // restored after the query so other gates keep their pinned config
        val q = StatefulOps.withStateProvider(spark,
            StatefulOps.RocksDbProvider) {
          StatefulOps.withStatePartitions(spark) {
            val q0 = out.writeStream.format("memory")
              .queryName("stream_dedup_sink")
              .outputMode("append")
              .trigger(Trigger.AvailableNow()).start()
            q0.awaitTermination()
            q0
          }
        }
        // the oracle equivalence (first-arrival == min doc_id) silently
        // assumes (a) the glob matched the single generator-written file —
        // a multi-file layout would stream 0/partial rows — and (b) the
        // whole table arrived in ONE micro-batch; fail loudly if either
        // layout assumption ever breaks instead of diverging downstream
        val streamed = q.recentProgress.map(_.numInputRows).sum
        val expected = Tables.documents(spark, dir).count()
        require(streamed == expected,
          s"streaming_exact_dedup streamed $streamed of $expected rows — " +
            "pathGlobFilter/layout assumption broken")
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches == 1,
          s"streaming_exact_dedup ran $dataBatches data micro-batches — " +
            "single-batch first-arrival no longer equals min(doc_id)")
        spark.table("stream_dedup_sink").orderBy("doc_id")
      },
      Some(LlmGates.exactDedupOracleSql)),

    // --- streaming curation filter: the stateless quality + blocklist
    // front door in the live path — ONE plan (Curation.curationFilter)
    // serves batch and stream; the gate certifies the streaming result
    // against the batch DuckDB oracle
    Gate("streaming_quality_filter",
      (spark: SparkSession, dir: String) => {
        val schema = Tables.documents(spark, dir).schema
        val stream = spark.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
        val out = graft.llm.Curation.curationFilter(stream, LlmGates.BlockTerms)
        spark.catalog.dropTempView("stream_qf_sink"): Unit
        val q = out.writeStream.format("memory")
          .queryName("stream_qf_sink")
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val streamed = q.recentProgress.map(_.numInputRows).sum
        val expected = Tables.documents(spark, dir).count()
        require(streamed == expected,
          s"streaming_quality_filter streamed $streamed of $expected rows")
        spark.table("stream_qf_sink").orderBy("doc_id")
      },
      Some(graft.llm.Curation.curationFilterOracleSql(LlmGates.BlockTerms))),

    // --- streaming Bloom snapshot filter -----------------------------------
    // The cross-snapshot dedup in the LIVE path: the bitset of prior
    // snapshots (even doc_ids here) broadcasts once; the stream probes it
    // STATELESSLY — no state store, no watermark, O(m) memory at any
    // history size. Same plan as the batch llm_bloom_dedup probe; the
    // gate certifies the streaming result against the batch oracle.
    Gate("streaming_bloom_filter",
      (spark: SparkSession, dir: String) => {
        val docsB = Tables.documents(spark, dir)
        val bits = graft.llm.Dedup.bloomBitset(
          docsB.filter(col("doc_id") % 2 === 0))
        val stream = spark.readStream.schema(docsB.schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
        val out = graft.llm.Dedup.bloomDedup(stream, bits)
          .select(col("doc_id"), col("maybe_dup"))
        spark.catalog.dropTempView("stream_bloom_sink"): Unit
        val q = out.writeStream.format("memory")
          .queryName("stream_bloom_sink")
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val streamed = q.recentProgress.map(_.numInputRows).sum
        val expected = docsB.count()
        require(streamed == expected,
          s"streaming_bloom_filter streamed $streamed of $expected rows")
        spark.table("stream_bloom_sink").orderBy("doc_id")
      },
      Some(graft.llm.Dedup.bloomDedupOracleSql(
        "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0",
        "SELECT doc_id, text FROM documents"))),

    // --- streaming URL-level dedup: the crawl front door incrementally ----
    // same first-arrived-wins state machine as streaming_exact_dedup, but
    // keyed by the CANONICAL URL (Web.canonicalizeUrl over the shared
    // llm_url_canon fixture) — the frontier dedup a continuous crawl runs
    // before fetching content
    Gate("streaming_url_dedup",
      (spark: SparkSession, dir: String) => {
        import spark.implicits._
        import graft.streaming.StatefulOps
        val schema = Tables.documents(spark, dir).schema
        val stream = spark.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
        val keyed = stream.select(col("doc_id"),
            graft.llm.Web.canonicalizeUrl(LlmGates.urlFixtureCol).as("h"))
          .as[StatefulOps.DocHash]
        val out = StatefulOps.streamingExactDedup(keyed)
        spark.catalog.dropTempView("stream_url_sink"): Unit
        val q = StatefulOps.withStateProvider(spark,
            StatefulOps.RocksDbProvider) {
          StatefulOps.withStatePartitions(spark) {
            val q0 = out.writeStream.format("memory")
              .queryName("stream_url_sink")
              .outputMode("append")
              .trigger(Trigger.AvailableNow()).start()
            q0.awaitTermination()
            q0
          }
        }
        val streamed = q.recentProgress.map(_.numInputRows).sum
        val expected = Tables.documents(spark, dir).count()
        require(streamed == expected,
          s"streaming_url_dedup streamed $streamed of $expected rows — " +
            "pathGlobFilter/layout assumption broken")
        require(q.recentProgress.count(_.numInputRows > 0) == 1,
          "streaming_url_dedup needs the single-batch first-arrival " +
            "equivalence to mirror the min(doc_id) oracle")
        spark.table("stream_url_sink").orderBy("doc_id")
      },
      Some(LlmGates.urlDedupOracleSql)),

    // --- incremental near-dup replay: batch-split arrival == one-shot -----
    // the ingestion contract at scale: each batch's near-dups come from
    // within-batch banding plus a new×corpus band join against the
    // accumulated index; replaying the corpus in two batches must emit
    // EXACTLY the one-shot pair set (the llm_ngram_jaccard oracle)
    Gate("streaming_incremental_dedup",
      (spark: SparkSession, dir: String) => {
        import graft.llm.Dedup
        val d = Tables.documents(spark, dir)
        val b1 = d.filter(col("doc_id") % 2 === 0)
        val b2 = d.filter(col("doc_id") % 2 === 1)
        val pairs = Dedup.nearDupPairs(b1, 0.8)
          .select(col("i"), col("j"), col("jaccard"))
          .unionByName(Dedup.nearDupPairs(b2, 0.8)
            .select(col("i"), col("j"), col("jaccard")))
          .unionByName(Dedup.incrementalNearDups(b2, b1, 0.8)
            .select(col("i"), col("j"), col("jaccard")))
        pairs.select(least(col("i"), col("j")).as("i"),
            greatest(col("i"), col("j")).as("j"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy("i", "j")
      },
      Some(LlmGates.ngramJaccardOracleSql)))
}
