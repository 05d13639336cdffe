package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType}

import graft.ingest.{OtlpProfiles, Pprof}
import graft.model.{OracleViews, Tables}
import graft.patterns.Patterns
import graft.prof.Profiles

/** Gates for the profiling slice (§2.F: call-tree merge + series) and log
  * pattern mining (§2.G). The profile oracle rebuilds the 3-row tree per
  * event via UNION ALL; the pattern oracle replays the Drain-style
  * cluster+generalize passes with parallel-unnest position indexing.
  */
object ProfGates extends GateSet {
  import EvalWindow._

  private val profViews =
    """profs AS (
      |  SELECT event_id AS profile_id,
      |         'svc' || CAST(user_id % 5 AS VARCHAR) AS service_name,
      |         epoch_ns(ts) AS timestamp_ns,
      |         user_id % 100 AS mid_self,
      |         CAST(round(value * 1000, 0) AS BIGINT) AS leaf_self,
      |         'op' || CAST(user_id % 3 AS VARCHAR) AS leaf_fn,
      |         event_type
      |  FROM events)""".stripMargin

  private val ptree =
    """ptree AS (
      |  SELECT service_name, CAST(0 AS BIGINT) AS parent, CAST(1 AS BIGINT) AS node,
      |         'main' AS fn, CAST(0 AS BIGINT) AS self, mid_self + leaf_self AS total
      |  FROM profs
      |  UNION ALL
      |  SELECT service_name, 1, 2, event_type, mid_self, mid_self + leaf_self FROM profs
      |  UNION ALL
      |  SELECT service_name, 2, 3, leaf_fn, leaf_self, leaf_self FROM profs)""".stripMargin

  override val gates: Seq[Gate] = Seq(

    // --- flamegraph merge: explode tree → group by node identity ----------
    Gate("profiles_merge",
      (spark: SparkSession, dir: String) =>
        Profiles.mergeTree(spark, dir, "svc1").orderBy("parent", "node", "fn"),
      Some("WITH " + profViews + ",\n" + ptree + "\n" +
        """SELECT parent, node, fn, CAST(sum(self) AS BIGINT) AS self,
          |  CAST(sum(total) AS BIGINT) AS total
          |FROM ptree WHERE service_name = 'svc1'
          |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // --- profile value series per service (SelectSeriesPlanner) -----------
    // oracle computes root totals WITHOUT the tree (independent derivation)
    Gate("profiles_series",
      (spark: SparkSession, dir: String) =>
        Profiles.selectSeries(spark, dir, StepS).orderBy("service_name", "ts"),
      Some("WITH " + profViews + "\n" +
        s"""SELECT service_name,
           |  (timestamp_ns // ${StepS}000000000) * $StepS AS ts,
           |  CAST(sum(mid_self + leaf_self) AS BIGINT) AS value
           |FROM profs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- flamegraph BFS level assembly over the merged tree ---------------
    // (oracle derives levels from the known synthetic depth: level = node-1)
    Gate("profiles_flamegraph",
      (spark: SparkSession, dir: String) =>
        Profiles.flamegraphLevels(Profiles.mergeTree(spark, dir, "svc2"))
          .orderBy("level", "fn"),
      Some("WITH " + profViews + ",\n" + ptree + "\n" +
        """SELECT node - 1 AS level, fn, CAST(sum(self) AS BIGINT) AS self,
          |  CAST(sum(total) AS BIGINT) AS total
          |FROM ptree WHERE service_name = 'svc2'
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- flamegraph diff: two merged trees full-outer on node identity ----
    // (computeFlameGraphDiff, reader/service/prof_tree.go:21-656; level =
    // node-1 in the synthetic trees, so the oracle joins on (level, fn))
    Gate("profiles_flamegraph_diff",
      (spark: SparkSession, dir: String) =>
        Profiles.flamegraphDiff(spark, dir, "svc1", "svc2")
          .orderBy("level", "fn"),
      Some("WITH " + profViews + ",\n" + ptree + ",\n" +
        """lt AS (SELECT node - 1 AS level, fn,
          |    CAST(sum(self) AS BIGINT) AS self_left,
          |    CAST(sum(total) AS BIGINT) AS total_left
          |  FROM ptree WHERE service_name = 'svc1' GROUP BY 1, 2),
          |rt AS (SELECT node - 1 AS level, fn,
          |    CAST(sum(self) AS BIGINT) AS self_right,
          |    CAST(sum(total) AS BIGINT) AS total_right
          |  FROM ptree WHERE service_name = 'svc2' GROUP BY 1, 2)
          |SELECT level, fn,
          |  COALESCE(self_left, 0) AS self_left,
          |  COALESCE(total_left, 0) AS total_left,
          |  COALESCE(self_right, 0) AS self_right,
          |  COALESCE(total_right, 0) AS total_right
          |FROM lt FULL OUTER JOIN rt USING (level, fn)
          |ORDER BY 1, 2""".stripMargin)),

    // --- profile label dictionary (planner_label_values.go) ---------------
    Gate("profiles_services",
      (spark: SparkSession, dir: String) =>
        Profiles.profiles(spark, dir)
          .select(col("service_name")).distinct().orderBy("service_name"),
      Some("WITH " + profViews + "\n" +
        """SELECT DISTINCT service_name FROM profs ORDER BY 1""")),

    // --- /querier.v1.QuerierService/ProfileTypes (prof.go:33-84) ----------
    Gate("profiles_types",
      (spark: SparkSession, dir: String) =>
        Profiles.profileTypes(spark, dir),
      Some(
        """WITH p AS (
          |  SELECT DISTINCT
          |    CASE WHEN event_type IN ('click','view','signup')
          |         THEN 'process_cpu:cpu:nanoseconds'
          |         ELSE 'memory:space:bytes' END AS type_id,
          |    CASE WHEN event_type IN ('click','view','signup')
          |         THEN [['cpu','nanoseconds'],['samples','count']]
          |         ELSE [['alloc_space','bytes'],['alloc_objects','count']] END AS stu
          |  FROM events),
          |x AS (
          |  SELECT DISTINCT
          |    split_part(type_id, ':', 1) AS name,
          |    u[1] AS sample_type, u[2] AS sample_unit,
          |    split_part(type_id, ':', 2) AS period_type,
          |    split_part(type_id, ':', 3) AS period_unit
          |  FROM p, unnest(p.stu) AS t(u))
          |SELECT name || ':' || sample_type || ':' || sample_unit || ':' ||
          |       period_type || ':' || period_unit AS id,
          |       name, sample_type, sample_unit, period_type, period_unit
          |FROM x ORDER BY id""".stripMargin)),

    // --- /querier.v1.QuerierService/LabelNames (planner_label_names.go) ---
    Gate("profiles_label_names",
      (spark: SparkSession, dir: String) =>
        Profiles.labelNames(spark, dir, Some("svc1")),
      Some(
        """SELECT DISTINCT t.tag.key AS name FROM (
          |  SELECT unnest([
          |    struct_pack(key := 'service_name',
          |                val := 'svc' || CAST(user_id % 5 AS VARCHAR)),
          |    struct_pack(key := 'event_type', val := event_type),
          |    struct_pack(key := 'host',
          |                val := 'host' || CAST(user_id % 7 AS VARCHAR))]) AS tag
          |  FROM events WHERE user_id % 5 = 1) t
          |ORDER BY name""".stripMargin)),

    // --- /querier.v1.QuerierService/LabelValues (planner_label_values.go) -
    Gate("profiles_label_values",
      (spark: SparkSession, dir: String) =>
        Profiles.labelValues(spark, dir, "host", Some("svc1")),
      Some(
        """SELECT DISTINCT 'host' || CAST(user_id % 7 AS VARCHAR) AS value
          |FROM events WHERE user_id % 5 = 1 ORDER BY value""".stripMargin)),

    // --- /querier.v1.QuerierService/Series (distinct label sets) ----------
    Gate("profiles_series_labels",
      (spark: SparkSession, dir: String) =>
        Profiles.seriesLabels(spark, dir, Some("svc2")),
      Some(
        """SELECT DISTINCT
          |  'svc' || CAST(user_id % 5 AS VARCHAR) AS service_name,
          |  event_type,
          |  'host' || CAST(user_id % 7 AS VARCHAR) AS host
          |FROM events WHERE user_id % 5 = 2
          |ORDER BY 1, 2, 3""".stripMargin)),

    // --- /querier.v1.QuerierService/GetProfileStats (prof.go:334-420) -----
    Gate("profiles_stats",
      (spark: SparkSession, dir: String) =>
        Profiles.profileStats(spark, dir),
      Some(
        """SELECT CAST(1 AS INT) AS non_empty,
          |  min(epoch_ns(ts) - epoch_ns(ts) % 1000) // 1000000 AS oldest_ms,
          |  max(epoch_ns(ts) - epoch_ns(ts) % 1000) // 1000000 AS newest_ms
          |FROM events""".stripMargin)),

    // --- pprof binary round trip: gzip+protobuf wire codec → stack rows →
    // merge (go_pprof.go ingest + prof_merge groupBy semantics) ------------
    Gate("profiles_pprof_roundtrip",
      (spark: SparkSession, dir: String) => {
        val src = Tables.events(spark, dir).select(
          concat(lit("svc"), (col("user_id") % 5).cast("string")).as("svc"),
          col("event_type"),
          concat(lit("op"), (col("user_id") % 3).cast("string")).as("op"),
          round(col("value") * 1000, 0).cast("long").as("v"))
        val bodies = spark.createDataFrame(
          src.rdd
            .map(r => (r.getString(0),
              (Seq("main", r.getString(1), r.getString(2)), r.getLong(3))))
            .groupBy(_._1)
            .map { case (_, rows) =>
              Row(Pprof.encodeProfile(rows.map(_._2).toSeq))
            },
          StructType(Seq(StructField("body", BinaryType))))
        Pprof.merge(Pprof.decode(bodies))
          .select(array_join(col("stack"), ",").as("stack"),
            col("value"), col("samples"))
          .orderBy("stack")
      },
      Some(
        """SELECT 'main,' || event_type || ',op' || CAST(user_id % 3 AS VARCHAR) AS stack,
          |  CAST(sum(CAST(round(value * 1000, 0) AS BIGINT)) AS BIGINT) AS value,
          |  count(*) AS samples
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- /pyroscope/analyze size estimate (planner_profiles_size.go:15) ---
    Gate("profiles_analyze",
      (spark: SparkSession, dir: String) => Profiles.analyze(spark, dir),
      Some(
        """SELECT CAST(sum(103 + length(event_type)) AS BIGINT) AS profile_size,
          |  CAST(count(DISTINCT user_id % 5) AS BIGINT) AS fingerprint_count
          |FROM events""".stripMargin)),

    // --- OTLP profiles (pprofile) round trip: dictionary-table JSON →
    // index-resolved stack rows → per-service merge (otlp_profile.go:1-458)
    Gate("ingest_otlp_profiles_roundtrip",
      (spark: SparkSession, dir: String) => {
        val src = Tables.events(spark, dir).select(
          concat(lit("svc"), (col("user_id") % 5).cast("string")).as("svc"),
          col("event_type"),
          concat(lit("op"), (col("user_id") % 3).cast("string")).as("op"),
          round(col("value") * 1000, 0).cast("long").as("v"))
        val bodies = spark.createDataFrame(
          src.rdd
            .map(r => (r.getString(0),
              (Seq("main", r.getString(1), r.getString(2)), r.getLong(3))))
            .groupBy(_._1)
            .map { case (svc, rows) =>
              Row(OtlpProfiles.encode(svc, 1704067200000000000L,
                rows.map(_._2).toSeq))
            },
          StructType(Seq(StructField("body", StringType))))
        OtlpProfiles.decode(bodies)
          .groupBy(col("service_name"),
            array_join(col("stack"), ",").as("stack"))
          .agg(sum(col("value")).cast("long").as("value"),
            count(lit(1)).as("samples"))
          .orderBy("service_name", "stack")
      },
      Some(
        """SELECT 'svc' || CAST(user_id % 5 AS VARCHAR) AS service_name,
          |  'main,' || event_type || ',op' || CAST(user_id % 3 AS VARCHAR) AS stack,
          |  CAST(sum(CAST(round(value * 1000, 0) AS BIGINT)) AS BIGINT) AS value,
          |  count(*) AS samples
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- tokenizer classes: UUID/IP/timestamp/path/hex masking over
    // synthesized rich lines (clustering/lexer.go dominant classes); the
    // oracle re-derives the classing per token in SQL --------------------
    Gate("patterns_mine_classes",
      (spark: SparkSession, dir: String) => {
        val logs = Tables.logs(spark, dir)
        val u = element_at(col("labels"), "user")
        val h = md5(u)
        val uuid = concat_ws("-", substring(h, 1, 8), substring(h, 9, 4),
          substring(h, 13, 4), substring(h, 17, 4), substring(h, 21, 12))
        val ip = concat(lit("10.0."),
          pmod(u.cast("long"), lit(250)).cast("string"), lit(".7"))
        val line = concat_ws(" ", lit("req"), uuid, lit("from"), ip,
          lit("at"), lit("2024-01-02T03:04:05Z"),
          lit("path"), concat(lit("/api/u"), u, lit("/get")),
          lit("took"), concat(u, lit("ms")))
        Patterns.mineLines(logs.select(
            element_at(col("labels"), "event_type").as("stream"),
            line.as("line")))
          .withColumnRenamed("stream", "event_type")
          .orderBy("event_type", "pattern")
      },
      Some(OracleViews.withViews(Seq(OracleViews.logs,
        """clines AS (SELECT event_type,
          |    'req ' || substr(md5("user"),1,8) || '-' || substr(md5("user"),9,4) || '-' ||
          |      substr(md5("user"),13,4) || '-' || substr(md5("user"),17,4) || '-' ||
          |      substr(md5("user"),21,12) ||
          |    ' from 10.0.' || CAST(CAST("user" AS BIGINT) % 250 AS VARCHAR) || '.7' ||
          |    ' at 2024-01-02T03:04:05Z path /api/u' || "user" || '/get took ' || "user" || 'ms' AS line
          |  FROM logs)""".stripMargin,
        s"""cmask AS (SELECT event_type, array_to_string(
           |    [${Patterns.duckClassTok("w")}
           |     for w in string_split(line, ' ')], ' ') AS pattern
           |  FROM clines)""".stripMargin),
        """SELECT event_type, pattern, count(*) AS samples_count
          |FROM cmask GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))),

    // --- trailing-newline edge tokens, oracle-backed: tokens carrying
    // trailing \n / \r\n must class identically in the native classer and
    // the DuckDB mirror (Java '$' matches before a trailing \n, RE2 '$'
    // does not — both sides strip trailing [\r\n]+ before classing) ------
    Gate("patterns_class_edge",
      (spark: SparkSession, dir: String) => {
        val logs = Tables.logs(spark, dir)
        // distinct on the ~150 users FIRST: the edge-token arrays are
        // functions of the user label alone, so classing runs once per
        // user, not once per log row
        val du = logs
          .select(element_at(col("labels"), "user").as("user")).distinct()
        val u = col("user")
        val h = md5(u)
        val uuid = concat_ws("-", substring(h, 1, 8), substring(h, 9, 4),
          substring(h, 13, 4), substring(h, 17, 4), substring(h, 21, 12))
        val ip = concat(lit("10.0."),
          pmod(u.cast("long"), lit(250)).cast("string"), lit(".7"))
        val base = array(uuid, ip, lit("2024-01-02T03:04:05Z"),
          lit("03:04:05"), concat(lit("/api/u"), u, lit("/get")),
          lit("ERROR"), lit("GET"), lit("HTTP/1.1"),
          concat(u, lit("ms")), lit("deadbeef00"), u)
        val edged = flatten(array(
          transform(base, t => concat(t, lit("\n"))),
          transform(base, t => concat(t, lit("\r\n")))))
        du.select(col("user"),
            concat_ws(" ", graft.functions.ClassTokens(edged)).as("classed"))
          .orderBy("user")
      },
      Some(OracleViews.withViews(Seq(OracleViews.logs,
        """ebase AS (SELECT DISTINCT "user",
          |    [substr(md5("user"),1,8)||'-'||substr(md5("user"),9,4)||'-'||
          |       substr(md5("user"),13,4)||'-'||substr(md5("user"),17,4)||'-'||
          |       substr(md5("user"),21,12),
          |     '10.0.'||CAST(CAST("user" AS BIGINT) % 250 AS VARCHAR)||'.7',
          |     '2024-01-02T03:04:05Z', '03:04:05',
          |     '/api/u'||"user"||'/get', 'ERROR', 'GET', 'HTTP/1.1',
          |     "user"||'ms', 'deadbeef00', "user"] AS base
          |  FROM logs)""".stripMargin,
        s"""eclassed AS (SELECT "user", array_to_string(
           |    [${Patterns.duckClassTok("w || chr(10)")} for w in base] ||
           |    [${Patterns.duckClassTok("w || chr(13) || chr(10)")} for w in base],
           |    ' ') AS classed
           |  FROM ebase)""".stripMargin),
        """SELECT "user", classed FROM eclassed ORDER BY "user""""))),

    // --- HTTP access-log + syslog classes: method/code/version kept as
    // valuable literals, CLF timestamp halves, RFC5424 priority, and
    // prog[pid]: masking (clustering/_lexer.go:40-130, pattern.go:47-62) --
    Gate("patterns_mine_http",
      (spark: SparkSession, dir: String) => {
        val logs = Tables.logs(spark, dir)
        val u = element_at(col("labels"), "user")
        val lvl = element_at(col("labels"), "level")
        val code = when(lvl === "error", lit("500")).otherwise(lit("200"))
        val access = concat_ws(" ",
          concat(lit("10.0."), pmod(u.cast("long"), lit(250)).cast("string"),
            lit(".7")),
          lit("-"), lit("-"), lit("[06/Jan/2024:15:04:05"), lit("+0000]"),
          lit("GET"), concat(lit("/api/u"), u, lit("/get")), lit("HTTP/1.1"),
          code, length(col("line")).cast("string"))
        val syslog = concat_ws(" ",
          lit("<34>"), lit("Jan"), lit("23"), lit("14:59:01"),
          concat(lit("host"), pmod(u.cast("long"), lit(3)).cast("string")),
          concat(lit("sshd["), u, lit("]:")),
          upper(lvl), lit("auth"), lit("event"))
        val stream = element_at(col("labels"), "event_type").as("stream")
        Patterns.mineLines(
            logs.select(stream, access.as("line"))
              .unionByName(logs.select(stream, syslog.as("line"))))
          .withColumnRenamed("stream", "event_type")
          .orderBy("event_type", "pattern")
      },
      Some(OracleViews.withViews(Seq(OracleViews.logs,
        """hlines AS (
          |  SELECT event_type,
          |    '10.0.' || CAST(CAST("user" AS BIGINT) % 250 AS VARCHAR) ||
          |    '.7 - - [06/Jan/2024:15:04:05 +0000] GET /api/u' || "user" ||
          |    '/get HTTP/1.1 ' ||
          |    CASE WHEN level = 'error' THEN '500' ELSE '200' END ||
          |    ' ' || CAST(length(line) AS VARCHAR) AS line
          |  FROM logs
          |  UNION ALL
          |  SELECT event_type,
          |    '<34> Jan 23 14:59:01 host' ||
          |    CAST(CAST("user" AS BIGINT) % 3 AS VARCHAR) ||
          |    ' sshd[' || "user" || ']: ' || upper(level) ||
          |    ' auth event' AS line
          |  FROM logs)""".stripMargin,
        s"""htoks AS (SELECT event_type,
           |    [${Patterns.duckClassTok("w")} for w in string_split(line, ' ')] AS ws
           |  FROM hlines)""".stripMargin,
        """hkeyed AS (SELECT event_type, len(ws) AS n, ws[1] AS head, ws FROM htoks)""",
        """hposed AS (SELECT event_type, n, head,
          |    unnest([i for i in generate_series(1, len(ws))]) AS pos,
          |    unnest(ws) AS tok
          |  FROM hkeyed)""".stripMargin,
        """hpostok AS (SELECT event_type, n, head, pos,
          |    CASE WHEN count(DISTINCT tok) = 1 THEN min(tok) ELSE '<_>' END AS tok_out
          |  FROM hposed GROUP BY 1, 2, 3, 4)""".stripMargin,
        """hpats AS (SELECT event_type, n, head,
          |    string_agg(tok_out, ' ' ORDER BY pos) AS pattern
          |  FROM hpostok GROUP BY 1, 2, 3)""".stripMargin,
        """hcnts AS (SELECT event_type, n, head, count(*) AS samples_count
          |  FROM hkeyed GROUP BY 1, 2, 3)""".stripMargin),
        """SELECT p.event_type, p.pattern, c.samples_count
          |FROM hpats p JOIN hcnts c USING (event_type, n, head)
          |ORDER BY 1, 2""".stripMargin))),

    // --- Drain-style pattern mining ---------------------------------------
    Gate("patterns_mine",
      (spark: SparkSession, dir: String) =>
        Patterns.mine(spark, dir).orderBy("event_type", "pattern"),
      Some(OracleViews.withViews(Seq(OracleViews.logs,
        s"""toksp AS (SELECT event_type,
           |    [${Patterns.duckClassTok("w")} for w in string_split(line, ' ')] AS ws
           |  FROM logs)""".stripMargin,
        """keyedp AS (SELECT event_type, len(ws) AS n, ws[1] AS head, ws FROM toksp)""",
        """posed AS (SELECT event_type, n, head,
          |    unnest([i for i in generate_series(1, len(ws))]) AS pos,
          |    unnest(ws) AS tok
          |  FROM keyedp)""".stripMargin,
        """postok AS (SELECT event_type, n, head, pos,
          |    CASE WHEN count(DISTINCT tok) = 1 THEN min(tok) ELSE '<_>' END AS tok_out
          |  FROM posed GROUP BY 1, 2, 3, 4)""".stripMargin,
        """pats AS (SELECT event_type, n, head,
          |    string_agg(tok_out, ' ' ORDER BY pos) AS pattern
          |  FROM postok GROUP BY 1, 2, 3)""".stripMargin,
        """cnts AS (SELECT event_type, n, head, count(*) AS samples_count
          |  FROM keyedp GROUP BY 1, 2, 3)""".stripMargin),
        """SELECT p.event_type, p.pattern, c.samples_count
          |FROM pats p JOIN cnts c USING (event_type, n, head)
          |ORDER BY 1, 2""".stripMargin)))
  )
}
