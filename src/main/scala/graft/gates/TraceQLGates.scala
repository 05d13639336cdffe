package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.OracleViews
import graft.traceql.{TraceQLCompiler, TraceQLParser}
import graft.traceql.TraceQLAst._

/** Driver gates for the TraceQL engine (SURVEY §2.E) over the derived
  * spans/span-attrs tables. Every query goes through the real parser +
  * bitmask compiler.
  */
object TraceQLGates extends GateSet {
  import EvalWindow._

  private def engine(spark: SparkSession, dir: String) =
    new TraceQLCompiler(spark, dir, StartNs, EndNs)

  private def parsed(q: String): Query = TraceQLParser.parseOrThrow(q)

  // the engine windows every scan to [StartNs, EndNs); the oracle must be
  // windowed identically or the two silently diverge the day the testdata
  // generator emits rows at/after EndNs
  private val spansWindowed: String =
    OracleViews.spans.stripSuffix(")") +
      s" WHERE epoch_ns(ts) >= $StartNs AND epoch_ns(ts) < $EndNs)"

  private def o(body: String): Option[String] =
    Some(OracleViews.withViews(Seq(spansWindowed), body))

  /** Events-only scratch dir for the RETENTION gate (the expire MUTATES
    * its store, so the shared fixtures stay untouched); memoized per JVM —
    * expiring at a fixed cutoff is idempotent, so later bench samples see
    * the same post-expiry state the first one produced.
    */
  private val retentionFixtures =
    scala.collection.concurrent.TrieMap[String, String]()
  private def retentionFixture(spark: SparkSession, dir: String): String =
    retentionFixtures.getOrElseUpdate(dir, {
      val tmp = java.nio.file.Files.createTempDirectory("graft-retention")
        .toFile
      tmp.deleteOnExit()
      graft.model.Tables.rawEvents(spark, dir)
        .filter(pmod(col("user_id"), lit(17L)) === 0)
        .coalesce(1)
        .write.parquet(tmp.getAbsolutePath + "/events.parquet")
      tmp.getAbsolutePath
    })

  /** Bench warm hook (untimed, like HttpGates.warm): pre-pay the retention
    * fixture and its store build so the gate's samples measure the
    * expire + query loop, not a one-time materialization.
    */
  def warmRetention(spark: SparkSession, dir: String): Unit = {
    graft.store.Store.ensure(spark, retentionFixture(spark, dir)): Unit
  }

  /** Events-only scratch dir whose store root is bound to a SCHEME-
    * QUALIFIED `file://` URI ([[graft.store.Store.overrideRoot]]) — the
    * push→maintain→query gate over it pins the FileSystem-path contract
    * (every walk, swap and scan resolving through the Hadoop FileSystem
    * for the root's URI, the hdfs://-or-s3a:// cluster shape) in the
    * oracle suite, not just in StoreSpec.
    */
  private val fsFixtures =
    scala.collection.concurrent.TrieMap[String, String]()
  private val fsRuns = new java.util.concurrent.atomic.AtomicLong()
  private def fsSchemeFixture(spark: SparkSession, dir: String): String =
    fsFixtures.getOrElseUpdate(dir, {
      val tmp = java.nio.file.Files.createTempDirectory("graft-fsscheme")
        .toFile
      tmp.deleteOnExit()
      graft.model.Tables.rawEvents(spark, dir)
        .filter(pmod(col("user_id"), lit(101L)) === 0)
        .coalesce(1)
        .write.parquet(tmp.getAbsolutePath + "/events.parquet")
      val root = java.nio.file.Files.createTempDirectory("graft-fsroot")
        .toFile
      root.deleteOnExit()
      graft.store.Store.overrideRoot(tmp.getAbsolutePath,
        "file://" + root.getAbsolutePath + "/store")
      tmp.getAbsolutePath
    })

  /** Bench warm hook: pre-pay the scheme-root fixture + its store build. */
  def warmFsScheme(spark: SparkSession, dir: String): Unit = {
    graft.store.Store.ensure(spark, fsSchemeFixture(spark, dir)): Unit
  }

  override val gates: Seq[Gate] = Seq(

    // --- attr-condition bitmask search (attr_condition.go:26-441) ---------
    Gate("traceql_attr_search",
      (spark: SparkSession, dir: String) => {
        val Query(Sel(ss), _, _, _, _, _) = parsed("""{ .name="error" && .service_name="svc1" }"""): @unchecked
        engine(spark, dir).spanSetSpans(ss)
          .select(col("trace_id"), col("span_id"))
          .orderBy("trace_id", "span_id")
      },
      o("""SELECT trace_id, span_id FROM spans
          |WHERE name = 'error' AND service_name = 'svc1'
          |ORDER BY 1, 2""".stripMargin)),

    // --- OR across attr + duration intrinsic ------------------------------
    Gate("traceql_attr_or_duration",
      (spark: SparkSession, dir: String) => {
        val Query(Sel(ss), _, _, _, _, _) = parsed("""{ .name="purchase" || duration > 300ms }"""): @unchecked
        engine(spark, dir).spanSetSpans(ss)
          .select(col("trace_id"), col("span_id"), col("duration_ns"))
          .orderBy("trace_id", "span_id")
      },
      o("""SELECT trace_id, span_id, duration_ns FROM spans
          |WHERE name = 'purchase' OR duration_ns > 300000000
          |ORDER BY 1, 2""".stripMargin)),

    // --- intrinsic tail: root spans + unquoted enum values ----------------
    // (`attr_condition.go:195-221`: nestedSetParent < 0 ⇒ root spans;
    // rootName maps to the span-level name column; `= error` unquoted
    // behaves like the quoted string)
    Gate("traceql_root_spans",
      (spark: SparkSession, dir: String) => {
        val Query(Sel(ss), _, _, _, _, _) =
          parsed("""{ nestedSetParent < 0 && rootName = error }"""): @unchecked
        engine(spark, dir).spanSetSpans(ss)
          .select(col("trace_id"), col("span_id"))
          .orderBy("trace_id", "span_id")
      },
      o("""SELECT trace_id, span_id FROM spans
          |WHERE parent_id IS NULL AND name = 'error'
          |ORDER BY 1, 2""".stripMargin)),

    // --- span-set aggregator: count (aggregator.go:23-76) -----------------
    Gate("traceql_agg_count",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .service_name="svc2" } | count() > 2""")
        engine(spark, dir).aggregate(q.expr, q.agg.get).orderBy("trace_id")
      },
      o("""SELECT trace_id, CAST(count(DISTINCT span_id) AS DOUBLE) AS value
          |FROM spans WHERE service_name = 'svc2'
          |GROUP BY 1 HAVING count(DISTINCT span_id) > 2
          |ORDER BY 1""".stripMargin)),

    // --- span-set aggregator: avg(duration) -------------------------------
    Gate("traceql_agg_avg_duration",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="click" } | avg(duration) > 150ms""")
        engine(spark, dir).aggregate(q.expr, q.agg.get)
          .select(col("trace_id"), round(col("value"), 6).as("value"))
          .orderBy("trace_id")
      },
      o("""SELECT trace_id, round(avg(CAST(duration_ns AS DOUBLE)), 6) AS value
          |FROM spans WHERE name = 'click'
          |GROUP BY 1 HAVING avg(CAST(duration_ns AS DOUBLE)) > 150000000
          |ORDER BY 1""".stripMargin)),

    // --- structural && = same-trace co-occurrence (complex_and.go) --------
    Gate("traceql_struct_and",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="view" } && { .name="purchase" }""")
        engine(spark, dir).matchingTraces(q.expr).orderBy("trace_id")
      },
      o("""SELECT DISTINCT trace_id FROM spans WHERE name = 'view'
          |INTERSECT
          |SELECT DISTINCT trace_id FROM spans WHERE name = 'purchase'
          |ORDER BY 1""".stripMargin)),

    // --- structural > = parent→child join over parent_id ------------------
    Gate("traceql_struct_child",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="view" } > { .name="purchase" }""")
        engine(spark, dir).matchingTraces(q.expr).orderBy("trace_id")
      },
      o("""SELECT DISTINCT c.trace_id
          |FROM spans c JOIN spans p
          |  ON c.trace_id = p.trace_id AND c.parent_id = p.span_id
          |WHERE c.name = 'purchase' AND p.name = 'view'
          |ORDER BY 1""".stripMargin)),

    // --- structural >> = true descendant via ancestor-chain closure -------
    // (oracle exploits the synthetic traces' linear chains: ancestor ⟺
    // earlier span in the same trace)
    Gate("traceql_struct_descendant",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="view" } >> { .name="purchase" }""")
        engine(spark, dir).matchingTraces(q.expr).orderBy("trace_id")
      },
      o("""SELECT DISTINCT c.trace_id
          |FROM spans c JOIN spans p
          |  ON c.trace_id = p.trace_id AND p.span_id < c.span_id
          |WHERE c.name = 'purchase' AND p.name = 'view'
          |ORDER BY 1""".stripMargin)),

    // --- structural << = exact ancestor (descendant with roles swapped) ---
    Gate("traceql_struct_ancestor",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="purchase" } << { .name="view" }""")
        engine(spark, dir).matchingTraces(q.expr).orderBy("trace_id")
      },
      o("""SELECT DISTINCT c.trace_id
          |FROM spans c JOIN spans p
          |  ON c.trace_id = p.trace_id AND p.span_id < c.span_id
          |WHERE c.name = 'purchase' AND p.name = 'view'
          |ORDER BY 1""".stripMargin)),

    // --- structural < = exact parent (child with roles swapped) -----------
    Gate("traceql_struct_parent",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="purchase" } < { .name="view" }""")
        engine(spark, dir).matchingTraces(q.expr).orderBy("trace_id")
      },
      o("""SELECT DISTINCT c.trace_id
          |FROM spans c JOIN spans p
          |  ON c.trace_id = p.trace_id AND c.parent_id = p.span_id
          |WHERE c.name = 'purchase' AND p.name = 'view'
          |ORDER BY 1""".stripMargin)),

    // --- negated structural ops (`lexer_rules v2.go` NotDescendant !>> /
    // NotAncestor <<~; the reference planner flattens them to && —
    // planner.go:100-105 — exact anti-join evaluation here). The oracle
    // uses the linear-chain property of the synthetic traces: ancestor ⟺
    // same trace, smaller span_id.
    Gate("traceql_struct_not_descendant",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="view" } !>> { .name="purchase" }""")
        engine(spark, dir).matchingTraces(q.expr).orderBy("trace_id")
      },
      o("""SELECT DISTINCT c.trace_id
          |FROM spans c
          |WHERE c.name = 'purchase' AND NOT EXISTS (
          |  SELECT 1 FROM spans p
          |  WHERE p.trace_id = c.trace_id AND p.span_id < c.span_id
          |    AND p.name = 'view')
          |ORDER BY 1""".stripMargin)),

    Gate("traceql_struct_not_ancestor",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="purchase" } <<~ { .name="view" }""")
        engine(spark, dir).matchingTraces(q.expr).orderBy("trace_id")
      },
      o("""SELECT DISTINCT a.trace_id
          |FROM spans a
          |WHERE a.name = 'view' AND NOT EXISTS (
          |  SELECT 1 FROM spans c
          |  WHERE c.trace_id = a.trace_id AND c.span_id > a.span_id
          |    AND c.name = 'purchase')
          |ORDER BY 1""".stripMargin)),

    // --- trace synthetics fetch (traces_data.go:21-86) --------------------
    Gate("traceql_trace_meta",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="error" && .service_name="svc3" }""")
        engine(spark, dir).traceMeta(q.expr).orderBy("trace_id")
      },
      o("""SELECT s.trace_id,
          |  min(s.timestamp_ns) AS start_ns,
          |  CAST((max(s.timestamp_ns + s.duration_ns) - min(s.timestamp_ns)) // 1000000 AS BIGINT) AS duration_ms,
          |  arg_min(s.service_name, s.timestamp_ns) AS root_service,
          |  arg_min(s.name, s.timestamp_ns) AS root_name,
          |  count(*) AS span_count
          |FROM spans s
          |JOIN (SELECT DISTINCT trace_id FROM spans
          |      WHERE name = 'error' AND service_name = 'svc3') ids
          |  USING (trace_id)
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- trace-by-id point lookup -----------------------------------------
    Gate("traceql_trace_by_id",
      (spark: SparkSession, dir: String) =>
        engine(spark, dir).traceById(42L).orderBy("timestamp_ns", "span_id"),
      o("""SELECT span_id, parent_id, name, service_name, timestamp_ns, duration_ns
          |FROM spans WHERE trace_id = 42
          |ORDER BY timestamp_ns, span_id""".stripMargin)),

    // --- metrics stage: rate() by (attr) (tempo_metrics.go:18-326) --------
    Gate("traceql_metrics_rate",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="click" } | rate() by (service_name)""")
        engine(spark, dir)
          .metrics(q.expr, q.metrics.get, StartNs, EndNs, StepS)
          .select(col("service_name"), col("ts"), round(col("value"), 6).as("value"))
          .orderBy("service_name", "ts")
      },
      o(s"""SELECT service_name, (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
           |  round(CAST(count(*) AS DOUBLE) / $StepS, 6) AS value
           |FROM spans WHERE name = 'click'
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- metrics stage: rate() grouped by a span ATTR (pivot join) --------
    Gate("traceql_metrics_rate_by_attr",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .service_name="svc1" } | rate() by (.user)""")
        engine(spark, dir)
          .metrics(q.expr, q.metrics.get, StartNs, EndNs, StepS)
          .select(col("user"), col("ts"), round(col("value"), 6).as("value"))
          .orderBy("user", "ts")
      },
      o(s"""SELECT CAST(user_id AS VARCHAR) AS "user",
           |  (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
           |  round(CAST(count(*) AS DOUBLE) / $StepS, 6) AS value
           |FROM spans WHERE service_name = 'svc1'
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- operand-level aggregator in a complex OR -------------------------
    // (`model_v2.go` Selector-owned aggregator; planner_test.go shape
    // `{a} | count() > 2 || {b}`: union of the aggregated trace set with
    // the plain match set)
    Gate("traceql_agged_or",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .service_name="svc1" } | count() > 3 || { .name="error" }""")
        engine(spark, dir).matchingTraces(q.expr)
          .orderBy("trace_id")
      },
      o("""SELECT DISTINCT trace_id FROM (
          |  SELECT trace_id FROM spans WHERE service_name = 'svc1'
          |  GROUP BY 1 HAVING count(DISTINCT span_id) > 3
          |  UNION ALL
          |  SELECT trace_id FROM spans WHERE name = 'error')
          |ORDER BY 1""".stripMargin)),

    // --- legacy tag search: k=v terms + duration bounds, newest first -----
    // (`tempo/sql_index_query.go:13-129` + `traces_query.go:11-50`: per-tag
    // attr scans intersected on (trace_id, span_id), duration_ms bounds,
    // ORDER BY start DESC LIMIT n; here one bitmask attr scan)
    Gate("traceql_tag_search",
      (spark: SparkSession, dir: String) =>
        engine(spark, dir).tagSearch(
          """name=click service_name!=svc0""",
          minDurNs = 100000000L, limit = 50),
      o(s"""SELECT trace_id, span_id,
           |  service_name AS root_service_name, name AS root_trace_name,
           |  timestamp_ns AS start_time_unix_nano,
           |  duration_ns // 1000000 AS duration_ms
           |FROM spans
           |WHERE name = 'click' AND service_name <> 'svc0'
           |  AND duration_ns // 1000000 > 100
           |ORDER BY start_time_unix_nano DESC, span_id LIMIT 50""".stripMargin)),

    // --- instant metrics: one value per group over the whole window -------
    // (`tempo/metrics_query.go:143-167` BuildMetricsInstantQuery: rate
    // divides by window seconds, no time buckets)
    Gate("traceql_metrics_instant",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="click" } | rate() by (service_name)""")
        engine(spark, dir)
          .metricsInstant(q.expr, q.metrics.get, StartNs, EndNs)
          .select(col("service_name"), round(col("value"), 6).as("value"))
          .orderBy("service_name")
      },
      o(s"""SELECT service_name,
           |  round(CAST(count(*) AS DOUBLE) / ${EndS - StartS}, 6) AS value
           |FROM spans WHERE name = 'click'
           |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- metrics exemplars: one sampled span per (bucket, series) ---------
    // (`tempo/metrics_query.go:636-720` BuildGenericExemplarsQuery; the
    // reference samples with any(), we take the deterministic earliest span
    // per bucket so the oracle can reproduce the exact choice)
    Gate("traceql_metrics_exemplars",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="click" } | rate() by (service_name)""")
        engine(spark, dir)
          .exemplars(q.expr, q.metrics.get, StartNs, EndNs, StepS)
          .orderBy("service_name", "ts")
      },
      o(s"""SELECT service_name, (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
           |  trace_id, duration_ns AS dur_ns, timestamp_ns AS span_ts
           |FROM (
           |  SELECT *, row_number() OVER (
           |      PARTITION BY service_name, timestamp_ns // ${StepS}000000000
           |      ORDER BY timestamp_ns, trace_id, span_id) AS rn
           |  FROM spans WHERE name = 'click')
           |WHERE rn = 1 ORDER BY 1, 2""".stripMargin)),

    // --- metrics stage: per-step duration quantile ------------------------
    Gate("traceql_metrics_quantile",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .service_name="svc1" } | quantile_over_time(duration, 0.9) by (name)""")
        engine(spark, dir)
          .metrics(q.expr, q.metrics.get, StartNs, EndNs, StepS)
          .select(col("name"), col("ts"), round(col("value"), 6).as("value"))
          .orderBy("name", "ts")
      },
      o(s"""SELECT name, (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
           |  round(quantile_cont(CAST(duration_ns AS DOUBLE), 0.9), 6) AS value
           |FROM spans WHERE service_name = 'svc1'
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- metrics stage: quantile over a span ATTR target ------------------
    // (the attr resolves through the attr-value join, not duration —
    // `tempo_metrics.go:110-130`, buildAggExpr)
    Gate("traceql_metrics_quantile_attr",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .service_name="svc1" } | quantile_over_time(.user, 0.5) by (name)""")
        engine(spark, dir)
          .metrics(q.expr, q.metrics.get, StartNs, EndNs, StepS)
          .select(col("name"), col("ts"), round(col("value"), 6).as("value"))
          .orderBy("name", "ts")
      },
      o(s"""SELECT name, (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
           |  round(quantile_cont(CAST(user_id AS DOUBLE), 0.5), 6) AS value
           |FROM spans WHERE service_name = 'svc1'
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- metrics stage: avg/min/max/sum_over_time (metricsAggFn tail) -----
    // (`tempo/metrics_query.go:23-29`: avg/min/max/sum over the resolved
    // target — duration intrinsic here, attr target in the max gate)
    Gate("traceql_metrics_avg_duration",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .service_name="svc2" } | avg_over_time(duration) by (name)""")
        engine(spark, dir)
          .metrics(q.expr, q.metrics.get, StartNs, EndNs, StepS)
          .select(col("name"), col("ts"), round(col("value"), 6).as("value"))
          .orderBy("name", "ts")
      },
      o(s"""SELECT name, (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
           |  round(avg(CAST(duration_ns AS DOUBLE)), 6) AS value
           |FROM spans WHERE service_name = 'svc2'
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Gate("traceql_metrics_max_attr",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="click" } | max_over_time(.user) by (service_name)""")
        engine(spark, dir)
          .metrics(q.expr, q.metrics.get, StartNs, EndNs, StepS)
          .select(col("service_name"), col("ts"), round(col("value"), 6).as("value"))
          .orderBy("service_name", "ts")
      },
      o(s"""SELECT service_name, (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
           |  round(max(CAST(user_id AS DOUBLE)), 6) AS value
           |FROM spans WHERE name = 'click'
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- metrics stage: histogram over a span ATTR target -----------------
    Gate("traceql_metrics_histogram_attr",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="click" } | histogram_over_time(.user) by (service_name)""")
        engine(spark, dir)
          .metrics(q.expr, q.metrics.get, StartNs, EndNs, StepS)
          .orderBy("service_name", "le", "ts")
      },
      o(s"""SELECT service_name,
           |  CASE WHEN user_id <= 1 THEN 1::BIGINT
           |       ELSE (1::BIGINT << length(bin(user_id - 1))) END AS le,
           |  (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
           |  CAST(count(*) AS DOUBLE) AS value
           |FROM spans WHERE name = 'click'
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // --- metrics stage: power-of-2 duration histogram ---------------------
    Gate("traceql_metrics_histogram",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="click" } | histogram_over_time(duration) by (service_name)""")
        engine(spark, dir)
          .metrics(q.expr, q.metrics.get, StartNs, EndNs, StepS)
          .orderBy("service_name", "le", "ts")
      },
      o(s"""SELECT service_name,
           |  CASE WHEN (duration_ns // 1000000) <= 1 THEN 1
           |       ELSE (1::BIGINT << length(bin((duration_ns // 1000000) - 1))) END AS le,
           |  (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
           |  CAST(count(*) AS DOUBLE) AS value
           |FROM spans WHERE name = 'click'
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // --- second stage topk over metrics -----------------------------------
    Gate("traceql_metrics_topk",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="click" } | rate() by (service_name) | topk(2)""")
        val Some(sec: SecondStage) = q.second: @unchecked
        val eng = engine(spark, dir)
        eng.secondStage(
            eng.metrics(q.expr, q.metrics.get, StartNs, EndNs, StepS),
            sec, Seq("service_name"))
          .select(col("service_name"), col("ts"), round(col("value"), 6).as("value"))
          .orderBy("service_name", "ts")
      },
      o(s"""SELECT service_name, ts, round(value, 6) AS value FROM (
           |  SELECT service_name, ts, value,
           |    row_number() OVER (PARTITION BY ts ORDER BY value DESC, service_name) AS rn
           |  FROM (
           |    SELECT service_name, (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
           |      CAST(count(*) AS DOUBLE) / $StepS AS value
           |    FROM spans WHERE name = 'click' GROUP BY 1, 2) a) r
           |WHERE rn <= 2 ORDER BY 1, 2""".stripMargin)),

    // --- second stage select(): attr columns onto matched spans -----------
    // (model_v2.go:259-268; pivot per span over ONE key-filtered attrs scan)
    Gate("traceql_select",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="error" } | select(.user, service_name)""")
        engine(spark, dir).run(q, StartNs, EndNs, StepS)
          .orderBy("trace_id", "span_id")
      },
      o("""SELECT trace_id, span_id, timestamp_ns, duration_ns,
          |  CAST(user_id AS VARCHAR) AS "user", service_name
          |FROM spans WHERE name = 'error'
          |ORDER BY trace_id, span_id""".stripMargin)),

    // --- with(sample=N): deterministic 1/N trace sampling ------------------
    // (model_v2.go:240-261 RandomFilter; two-step Lehmer hash reproduced
    // exactly by the oracle, so the SELECTION is gated, not just the count)
    Gate("traceql_sample",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="click" } with(sample=4)""")
        engine(spark, dir).run(q, StartNs, EndNs, StepS).orderBy("trace_id")
      },
      o("""SELECT s.trace_id,
          |  min(s.timestamp_ns) AS start_ns,
          |  CAST((max(s.timestamp_ns + s.duration_ns) - min(s.timestamp_ns)) // 1000000 AS BIGINT) AS duration_ms,
          |  arg_min(s.service_name, s.timestamp_ns) AS root_service,
          |  arg_min(s.name, s.timestamp_ns) AS root_name,
          |  count(*) AS span_count
          |FROM spans s
          |JOIN (SELECT DISTINCT trace_id FROM spans
          |      WHERE name = 'click'
          |        AND ((trace_id % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647 % 4 = 0) ids
          |  USING (trace_id)
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- compare(): selection vs baseline attr diff -----------------------
    Gate("traceql_compare",
      (spark: SparkSession, dir: String) => {
        val q = parsed("""{ .name="error" } | compare({ .service_name="svc1" }, 5)""")
        engine(spark, dir).compare(q.expr, q.compare.get)
      },
      o("""SELECT key, val, sel_count, base_count - sel_count AS baseline_count FROM (
          |  SELECT a.key, a.val,
          |    count(*) AS base_count,
          |    count(*) FILTER (WHERE s.service_name = 'svc1') AS sel_count
          |  FROM (
          |    SELECT span_id, 'name' AS key, name AS val FROM spans WHERE name = 'error'
          |    UNION ALL
          |    SELECT span_id, 'service_name', service_name FROM spans WHERE name = 'error'
          |    UNION ALL
          |    SELECT span_id, 'user', CAST(user_id AS VARCHAR) FROM spans WHERE name = 'error') a
          |  JOIN spans s ON s.span_id = a.span_id
          |  GROUP BY 1, 2) c
          |ORDER BY sel_count DESC, key, val LIMIT 5""".stripMargin)),

    // --- compare() with explicit baseline window ---------------------------
    // (model_v2.go:208-229 CompareSelector BaselineFrom/To;
    // metrics_query.go:748-758: the baseline set evaluates over its own
    // [from, to) while the selection keeps the request window — here the
    // baseline is the first half of January, selection the whole month)
    Gate("traceql_compare_baseline",
      (spark: SparkSession, dir: String) => {
        val mid = StartNs + 15L * 86400L * 1000000000L
        val q = parsed(
          s"""{ .service_name="svc1" } | compare({ .name="error" }, 7, $StartNs, $mid)""")
        engine(spark, dir).compare(q.expr, q.compare.get)
      },
      o(s"""SELECT key, val, sel_count, baseline_count FROM (
          |  SELECT a.key, a.val,
          |    count(*) FILTER (WHERE s.name = 'error') AS sel_count,
          |    count(*) FILTER (WHERE s.name <> 'error') AS baseline_count
          |  FROM (
          |    SELECT span_id, 'name' AS key, name AS val FROM spans
          |    WHERE service_name = 'svc1' AND timestamp_ns < ${StartNs + 15L * 86400L * 1000000000L}
          |    UNION ALL
          |    SELECT span_id, 'service_name', service_name FROM spans
          |    WHERE service_name = 'svc1' AND timestamp_ns < ${StartNs + 15L * 86400L * 1000000000L}
          |    UNION ALL
          |    SELECT span_id, 'user', CAST(user_id AS VARCHAR) FROM spans
          |    WHERE service_name = 'svc1' AND timestamp_ns < ${StartNs + 15L * 86400L * 1000000000L}) a
          |  JOIN spans s ON s.span_id = a.span_id
          |  GROUP BY 1, 2) c
          |ORDER BY sel_count DESC, key, val LIMIT 7""".stripMargin)),

    // --- multi-tenancy: per-tenant oid partitions + scan filter -----------
    // (traces.sql:7 leads every key with oid; the spark.graft.tenant conf
    // is the per-request tenant context — two tenants must see disjoint
    // slices whose union is the untenanted answer)
    Gate("store_multitenant",
      (spark: SparkSession, dir: String) => {
        def forTenant(o: String): DataFrame = {
          spark.conf.set("spark.graft.tenant", o)
          try {
            val Query(Sel(ss), _, _, _, _, _) =
              parsed("""{ .name="click" }"""): @unchecked
            engine(spark, dir).spanSetSpans(ss)
              .agg(count(lit(1)).as("n"))
              .select(lit(o).as("oid"), col("n"))
          } finally spark.conf.unset("spark.graft.tenant")
        }
        forTenant("0").unionByName(forTenant("1")).orderBy("oid")
      },
      o("""SELECT CAST(trace_id % 2 AS VARCHAR) AS oid, count(*) AS n
          |FROM spans WHERE name = 'click'
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- TTL retention: `date=` partitions strictly before the cutoff are
    // DROPPED at the filesystem level (`rotate.go:48-66`'s per-day DROP
    // PARTITION) across every dated table; a full-window query afterwards
    // sees only the surviving days. Own fixture (memoized per JVM — expire
    // is idempotent at a fixed cutoff, so repeated bench samples converge
    // to the same store state); the oracle applies the same day cutoff to
    // the raw events -------------------------------------------------------
    Gate("store_retention_expire",
      (spark: SparkSession, dir: String) => {
        val tmp = retentionFixture(spark, dir)
        val cutoffDay = StartNs / 86400000000000L + 15
        val cutoff = java.time.LocalDate.ofEpochDay(cutoffDay).toString
        graft.store.Store.expire(spark, tmp, cutoff)
        import graft.logql.{EvalParams, LogQLCompiler, LogQLParser}
        new LogQLCompiler(spark, tmp, EvalParams(StartNs, EndNs, StepS))
          .compileMetric(LogQLParser.parseOrThrow(
            """sum by (level) (count_over_time({level=~".+"}[6h]))"""))
          .select(element_at(col("labels"), "level").as("level"),
            col("ts"), round(col("value"), 6).as("value"))
          .orderBy("level", "ts")
      },
      Some(OracleViews.withViews(Seq(
        """logs AS (
          |  SELECT epoch_ns(ts) AS timestamp_ns,
          |         CASE WHEN event_type = 'error' THEN 'error'
          |              ELSE 'info' END AS level
          |  FROM events WHERE user_id % 17 = 0)""".stripMargin),
        s"""SELECT level,
           |  (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
           |  round(CAST(count(*) AS DOUBLE), 6) AS value
           |FROM logs
           |WHERE timestamp_ns >= ${(StartNs / 86400000000000L + 15) * 86400000000000L}
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))),

    // --- FileSystem-path contract end-to-end: push → maintain → query on
    // a store root that is a SCHEME-QUALIFIED file:// URI, so every append
    // write, maintenance walk, compaction swap and query scan resolves
    // through the Hadoop FileSystem API exactly as it would against
    // hdfs:// or s3a:// on a cluster. The pushed stream is run-marked, so
    // repeated bench samples read back only their own copy and the oracle
    // (a replay of the same events subset) stays static ------------------
    Gate("store_fs_scheme",
      (spark: SparkSession, dir: String) => {
        val tmp = fsSchemeFixture(spark, dir)
        val root = graft.store.Store.ensure(spark, tmp)
        if (!root.startsWith("file:"))
          throw new IllegalStateException(
            s"expected a scheme-qualified store root, got $root")
        val run = s"fs${fsRuns.incrementAndGet()}"
        import graft.model.Tables
        val batch = Tables.logs(spark, tmp)
          .withColumn("labels",
            map_concat(col("labels"), map(lit("run"), lit(run))))
          .withColumn("fingerprint", Tables.fingerprintOf(col("labels")))
        if (graft.store.Store.appendLogs(spark, tmp, batch) == 0)
          throw new IllegalStateException("scheme-root push appended nothing")
        // background merge: walks + crash-safe swaps over file:// leaves
        graft.store.Store.maintain(spark, tmp, maxFiles = 4): Unit
        import graft.logql.{EvalParams, LogQLCompiler, LogQLParser}
        new LogQLCompiler(spark, tmp, EvalParams(StartNs, EndNs, StepS))
          .compileMetric(LogQLParser.parseOrThrow(
            s"""sum by (level) (count_over_time({run="$run"}[6h]))"""))
          .select(element_at(col("labels"), "level").as("level"),
            col("ts"), round(col("value"), 6).as("value"))
          .orderBy("level", "ts")
      },
      // LogQL range windows are FLOOR-aligned ([t, t+range)); the oracle
      // replays the fixture's events subset with the same level mapping
      Some(OracleViews.withViews(Seq(
        """flogs AS (
          |  SELECT epoch_ns(ts) AS timestamp_ns,
          |         CASE WHEN event_type = 'error' THEN 'error'
          |              ELSE 'info' END AS level
          |  FROM events WHERE user_id % 101 = 0)""".stripMargin),
        s"""SELECT level,
           |  (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
           |  round(CAST(count(*) AS DOUBLE), 6) AS value
           |FROM flogs
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))),

    // --- tag-name autocomplete (/api/search/tags) -------------------------
    Gate("traceql_tag_names",
      (spark: SparkSession, dir: String) =>
        engine(spark, dir).tagNames().orderBy("key"),
      o("""SELECT DISTINCT key FROM (
          |  SELECT 'name' AS key FROM spans
          |  UNION ALL SELECT 'service_name' FROM spans
          |  UNION ALL SELECT 'user' FROM spans)
          |ORDER BY 1""".stripMargin)),

    // --- tag-value autocomplete -------------------------------------------
    Gate("traceql_tag_values",
      (spark: SparkSession, dir: String) =>
        engine(spark, dir).tagValues("service_name").orderBy("val"),
      o("""SELECT DISTINCT service_name AS val FROM spans ORDER BY 1""")),

    // --- v2 selector-scoped autocomplete (tagsV2Planner/valuesV2Planner) --
    Gate("traceql_tag_values_scoped",
      (spark: SparkSession, dir: String) => {
        val Query(Sel(ss), _, _, _, _, _) = parsed("""{ .name="error" }"""): @unchecked
        engine(spark, dir).tagValuesV2("user", Some(ss)).orderBy("val")
      },
      o("""SELECT DISTINCT CAST(user_id AS VARCHAR) AS val
          |FROM spans WHERE name = 'error' ORDER BY 1""".stripMargin)),

    Gate("traceql_tag_names_scoped",
      (spark: SparkSession, dir: String) => {
        val Query(Sel(ss), _, _, _, _, _) =
          parsed("""{ .service_name="svc3" }"""): @unchecked
        engine(spark, dir).tagNamesV2(Some(ss)).orderBy("key")
      },
      o("""SELECT DISTINCT key FROM (
          |  SELECT 'name' AS key FROM spans WHERE service_name = 'svc3'
          |  UNION ALL SELECT 'service_name' FROM spans WHERE service_name = 'svc3'
          |  UNION ALL SELECT 'user' FROM spans WHERE service_name = 'svc3')
          |ORDER BY 1""".stripMargin))
  )
}
