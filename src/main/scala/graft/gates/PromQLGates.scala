package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, element_at}

import graft.model.OracleViews
import graft.promql.{PromParams, PromQLCompiler}

/** Driver gates for the native PromQL engine (SURVEY §2.D). Every query
  * goes through the real parser + compiler; each oracle re-derives the
  * same semantics in portable DuckDB SQL (counter resets via window lag,
  * instant vectors via staleness-window arg_max, histogram quantiles via
  * sorted bucket lists) — two independent formulations of the same
  * definition.
  */
object PromQLGates extends GateSet {
  import EvalWindow._

  // PromQL eval grid: end-INCLUSIVE eval points every step.
  private def engine(spark: SparkSession, dir: String) =
    new PromQLCompiler(spark, dir, PromParams(StartNs, EndNs, StepS))

  private def q(query: String, labelCols: String*)(spark: SparkSession, dir: String): DataFrame =
    engine(spark, dir).result(query, labelCols)

  /** Instant query pinned at the window end (single-point grid) — the only
    * eval mode in which a top-level range vector is legal.
    */
  private def qi(query: String, labelCols: String*)(spark: SparkSession, dir: String): DataFrame =
    new PromQLCompiler(spark, dir, PromParams(EndNs, EndNs, StepS))
      .result(query, labelCols)

  private def o(body: String, extraViews: String*): Option[String] =
    Some(OracleViews.withViews(
      Seq(OracleViews.logs, OracleViews.metrics) ++ extraViews, body))

  private val grid =
    s"grid AS (SELECT unnest(generate_series($StartS, $EndS, $StepS)) AS t)"

  /** lag-augmented counters (for reset detection), mirroring the engine's
    * rangeFrame prev columns.
    */
  private val lagCounters =
    """lc AS (
      |  SELECT *,
      |    lag(value) OVER (PARTITION BY event_type ORDER BY timestamp_ns) AS prev_val,
      |    lag(timestamp_ns) OVER (PARTITION BY event_type ORDER BY timestamp_ns) AS prev_ts
      |  FROM counters)""".stripMargin

  private val R12 = 43200L // 12h range in seconds

  override val gates: Seq[Gate] = Seq(

    // --- instant vector with 5m staleness carry (fill_gaps/instant path) --
    Gate("promql_instant",
      q("""events_value{event_type="click"}""", "event_type"),
      o(s"""SELECT event_type, g.t AS ts, round(arg_max(value, timestamp_ns), 6) AS value
           |FROM metrics m JOIN grid g
           |  ON m.timestamp_ns > (g.t - 300) * 1000000000
           | AND m.timestamp_ns <= g.t * 1000000000
           |WHERE event_type = 'click'
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin, grid)),

    // --- rate with counter-reset compensation (counter.go:62-175) ---------
    // (output scaled by the range via scalar binop: rate values are exact
    // ties at the 6th decimal — k/100/43200 — so last-ulp noise would flip
    // rounding; ×range makes compared values 2-decimal-exact)
    Gate("promql_rate",
      q("""rate(events_total{level="info"}[12h]) * 43200""", "event_type"),
      o(s"""SELECT event_type, t AS ts, round(l - f + rc, 6) AS value FROM (
           |  SELECT c.event_type, g.t,
           |    count(*) AS n,
           |    arg_min(c.value, c.timestamp_ns) AS f,
           |    arg_max(c.value, c.timestamp_ns) AS l,
           |    sum(CASE WHEN c.prev_ts > (g.t - $R12) * 1000000000
           |              AND c.prev_val > c.value THEN c.prev_val ELSE 0 END) AS rc
           |  FROM lc c JOIN grid g
           |    ON c.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND c.timestamp_ns <= g.t * 1000000000
           |  WHERE c.level = 'info'
           |  GROUP BY 1, 2) w
           |WHERE n >= 2 ORDER BY 1, 2""".stripMargin,
        OracleViews.counters, lagCounters, grid)),

    // --- increase + vector agg re-key (sum.go:18-168) ---------------------
    Gate("promql_increase_sum",
      q("""sum by (level) (increase(events_total[12h]))""", "level"),
      o(s"""SELECT level, t AS ts, round(sum(l - f + rc), 6) AS value FROM (
           |  SELECT c.event_type, c.level, g.t,
           |    count(*) AS n,
           |    arg_min(c.value, c.timestamp_ns) AS f,
           |    arg_max(c.value, c.timestamp_ns) AS l,
           |    sum(CASE WHEN c.prev_ts > (g.t - $R12) * 1000000000
           |              AND c.prev_val > c.value THEN c.prev_val ELSE 0 END) AS rc
           |  FROM lc c JOIN grid g
           |    ON c.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND c.timestamp_ns <= g.t * 1000000000
           |  GROUP BY 1, 2, 3) w
           |WHERE n >= 2
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
        OracleViews.counters, lagCounters, grid)),

    // --- delta (gauge, no reset compensation) -----------------------------
    Gate("promql_delta",
      q("""delta(events_value{event_type=~"click|view"}[12h])""", "event_type"),
      o(s"""SELECT event_type, t AS ts, round(l - f, 6) AS value FROM (
           |  SELECT m.event_type, g.t, count(*) AS n,
           |    arg_min(m.value, m.timestamp_ns) AS f,
           |    arg_max(m.value, m.timestamp_ns) AS l
           |  FROM metrics m JOIN grid g
           |    ON m.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND m.timestamp_ns <= g.t * 1000000000
           |  WHERE m.event_type IN ('click', 'view')
           |  GROUP BY 1, 2) w
           |WHERE n >= 2 ORDER BY 1, 2""".stripMargin, grid)),

    // --- resets / changes (counter.go:177-230) ----------------------------
    Gate("promql_resets",
      q("""resets(events_total[24h])""", "event_type"),
      o(s"""SELECT c.event_type, g.t AS ts,
           |  round(sum(CASE WHEN c.prev_ts > (g.t - 86400) * 1000000000
           |                  AND c.prev_val > c.value THEN 1.0 ELSE 0.0 END), 6) AS value
           |FROM lc c JOIN grid g
           |  ON c.timestamp_ns > (g.t - 86400) * 1000000000
           | AND c.timestamp_ns <= g.t * 1000000000
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
        OracleViews.counters, lagCounters, grid)),

    Gate("promql_changes",
      q("""changes(events_total{event_type="error"}[12h])""", "event_type"),
      o(s"""SELECT c.event_type, g.t AS ts,
           |  round(sum(CASE WHEN c.prev_ts > (g.t - $R12) * 1000000000
           |                  AND c.prev_val <> c.value THEN 1.0 ELSE 0.0 END), 6) AS value
           |FROM lc c JOIN grid g
           |  ON c.timestamp_ns > (g.t - $R12) * 1000000000
           | AND c.timestamp_ns <= g.t * 1000000000
           |WHERE c.event_type = 'error'
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
        OracleViews.counters, lagCounters, grid)),

    // --- irate/idelta: last consecutive pair in the window ----------------
    Gate("promql_irate",
      q("""irate(events_total{event_type="click"}[12h])""", "event_type"),
      o(s"""SELECT event_type, t AS ts,
           |  round((CASE WHEN lv >= lpv THEN lv - lpv ELSE lv END) /
           |    ((lts - lpts) / 1000000000.0), 6) AS value
           |FROM (
           |  SELECT c.event_type, g.t,
           |    arg_max(c.value, c.timestamp_ns) AS lv,
           |    arg_max(c.prev_val, c.timestamp_ns) AS lpv,
           |    arg_max(c.prev_ts, c.timestamp_ns) AS lpts,
           |    max(c.timestamp_ns) AS lts
           |  FROM lc c JOIN grid g
           |    ON c.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND c.timestamp_ns <= g.t * 1000000000
           |  WHERE c.event_type = 'click'
           |  GROUP BY 1, 2) w
           |WHERE lpts IS NOT NULL AND lpts > (t - $R12) * 1000000000
           |ORDER BY 1, 2""".stripMargin,
        OracleViews.counters, lagCounters, grid)),

    Gate("promql_idelta",
      q("""idelta(events_total{event_type="view"}[12h])""", "event_type"),
      o(s"""SELECT event_type, t AS ts, round(lv - lpv, 6) AS value
           |FROM (
           |  SELECT c.event_type, g.t,
           |    arg_max(c.value, c.timestamp_ns) AS lv,
           |    arg_max(c.prev_val, c.timestamp_ns) AS lpv,
           |    arg_max(c.prev_ts, c.timestamp_ns) AS lpts
           |  FROM lc c JOIN grid g
           |    ON c.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND c.timestamp_ns <= g.t * 1000000000
           |  WHERE c.event_type = 'view'
           |  GROUP BY 1, 2) w
           |WHERE lpts IS NOT NULL AND lpts > (t - $R12) * 1000000000
           |ORDER BY 1, 2""".stripMargin,
        OracleViews.counters, lagCounters, grid)),

    // --- *_over_time windowed aggs (over_time.go:30-127) ------------------
    Gate("promql_avg_over_time",
      q("""avg_over_time(events_value{level="error"}[12h])""", "event_type"),
      o(s"""SELECT m.event_type, g.t AS ts, round(avg(m.value), 6) AS value
           |FROM metrics m JOIN grid g
           |  ON m.timestamp_ns > (g.t - $R12) * 1000000000
           | AND m.timestamp_ns <= g.t * 1000000000
           |WHERE m.level = 'error'
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin, grid)),

    Gate("promql_last_over_time",
      q("""last_over_time(events_value[6h])""", "event_type", "level"),
      o(s"""SELECT m.event_type, m.level, g.t AS ts,
           |  round(arg_max(m.value, m.timestamp_ns), 6) AS value
           |FROM metrics m JOIN grid g
           |  ON m.timestamp_ns > (g.t - $StepS) * 1000000000
           | AND m.timestamp_ns <= g.t * 1000000000
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin, grid)),

    // --- topk over aggregated series --------------------------------------
    Gate("promql_topk",
      q("""topk(2, sum by (event_type) (count_over_time(events_value[12h])))""", "event_type"),
      o(s"""SELECT event_type, ts, value FROM (
           |  SELECT event_type, ts, value,
           |    row_number() OVER (PARTITION BY ts ORDER BY value DESC, event_type) AS rn
           |  FROM (
           |    SELECT m.event_type, g.t AS ts, CAST(count(*) AS DOUBLE) AS value
           |    FROM metrics m JOIN grid g
           |      ON m.timestamp_ns > (g.t - $R12) * 1000000000
           |     AND m.timestamp_ns <= g.t * 1000000000
           |    GROUP BY 1, 2) a) r
           |WHERE rn <= 2 ORDER BY 1, 2""".stripMargin, grid)),

    // --- vector/vector binary op with label matching (subtraction keeps
    // compared values 2-decimal-exact; a ratio would land on rounding ties)
    Gate("promql_binop_diff",
      q("""sum by (event_type) (sum_over_time(events_value[12h])) - sum by (event_type) (sum_over_time(events_value[6h]))""",
        "event_type"),
      o(s"""SELECT w12.event_type, w12.t AS ts, round(w12.s - w6.s, 6) AS value
           |FROM w12 JOIN w6 USING (event_type, t)
           |ORDER BY 1, 2""".stripMargin, grid,
        s"""w12 AS (
           |  SELECT m.event_type, g.t, sum(m.value) AS s
           |  FROM metrics m JOIN grid g
           |    ON m.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND m.timestamp_ns <= g.t * 1000000000
           |  GROUP BY 1, 2)""".stripMargin,
        s"""w6 AS (
           |  SELECT m.event_type, g.t, sum(m.value) AS s
           |  FROM metrics m JOIN grid g
           |    ON m.timestamp_ns > (g.t - $StepS) * 1000000000
           |   AND m.timestamp_ns <= g.t * 1000000000
           |  GROUP BY 1, 2)""".stripMargin)),

    // --- scalar math + instant function chain -----------------------------
    Gate("promql_scalar_math",
      q("""ceil(avg_over_time(events_value{event_type="purchase"}[12h]) * 2)""", "event_type"),
      o(s"""SELECT m.event_type, g.t AS ts, round(ceil(avg(m.value) * 2), 6) AS value
           |FROM metrics m JOIN grid g
           |  ON m.timestamp_ns > (g.t - $R12) * 1000000000
           | AND m.timestamp_ns <= g.t * 1000000000
           |WHERE m.event_type = 'purchase'
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin, grid)),

    // --- comparison filter ------------------------------------------------
    Gate("promql_cmp_filter",
      q("""avg_over_time(events_value[12h]) > 95""", "event_type", "level"),
      o(s"""SELECT event_type, level, ts, round(raw, 6) AS value FROM (
           |  SELECT m.event_type, m.level, g.t AS ts, avg(m.value) AS raw
           |  FROM metrics m JOIN grid g
           |    ON m.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND m.timestamp_ns <= g.t * 1000000000
           |  GROUP BY 1, 2, 3) w
           |WHERE raw > 95 ORDER BY 1, 2, 3""".stripMargin, grid)),

    // --- cross-series quantile agg ----------------------------------------
    Gate("promql_quantile_agg",
      q("""quantile(0.5, last_over_time(events_value[6h]))"""),
      o(s"""SELECT g.t AS ts, round(quantile_cont(lv, 0.5), 6) AS value FROM (
           |  SELECT m.event_type, g2.t, arg_max(m.value, m.timestamp_ns) AS lv
           |  FROM metrics m JOIN grid g2
           |    ON m.timestamp_ns > (g2.t - $StepS) * 1000000000
           |   AND m.timestamp_ns <= g2.t * 1000000000
           |  GROUP BY 1, 2) s JOIN grid g ON s.t = g.t
           |GROUP BY 1 ORDER BY 1""".stripMargin, grid)),

    // --- absent(): 1 where the selector matches nothing -------------------
    Gate("promql_absent",
      q("""absent(events_value{event_type="nosuch"})"""),
      o(s"""SELECT gs AS ts, 1.0 AS value
           |FROM generate_series($StartS, $EndS, $StepS) t(gs)
           |ORDER BY 1""".stripMargin, grid)),

    // --- holt_winters: Holt's linear-trend smoothing; the oracle runs the
    // IDENTICAL struct fold via list_reduce (constants interpolated from
    // the same Scala doubles, so every intermediate double matches) -------
    Gate("promql_holt_winters", {
      val sfp = 0.3; val tfp = 0.6
      q(s"""holt_winters(events_value{event_type="view"}[12h], $sfp, $tfp)""",
        "event_type")
    },
    {
      val sfp = 0.3; val tfp = 0.6
      // accumulator is a DOUBLE list [s0, s1, b, i] — struct_pack inside a
      // list_reduce lambda mis-evaluates fields in DuckDB 1.0
      val bNew = s"CASE WHEN e[4] = 1 THEN e[2] - a[2] ELSE $tfp*(a[2]-a[1]) + ${1 - tfp}*a[3] END"
      o(s"""SELECT event_type, t AS ts, round(
           |  list_reduce(
           |    [[0.0::DOUBLE, vs[i], 0.0::DOUBLE, (i-1)::DOUBLE]
           |     for i in generate_series(1, len(vs))],
           |    (a, e) -> [
           |      a[2],
           |      $sfp*e[2] + ${1 - sfp}*(a[2] + $bNew),
           |      $bNew,
           |      e[4]])[2], 6) AS value
           |FROM (
           |  SELECT m.event_type, g.t, count(*) AS n,
           |    list(m.value ORDER BY m.timestamp_ns) AS vs
           |  FROM metrics m JOIN grid g
           |    ON m.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND m.timestamp_ns <= g.t * 1000000000
           |  WHERE m.event_type = 'view'
           |  GROUP BY 1, 2) w
           |WHERE n >= 2 ORDER BY 1, 2""".stripMargin, grid)
    }),

    // --- absent_over_time: 1 where the range window holds no sample -------
    Gate("promql_absent_over_time",
      q("""absent_over_time(events_value{event_type="purchase"}[30m])"""),
      o(s"""SELECT gs AS ts, 1.0 AS value
           |FROM generate_series($StartS, $EndS, $StepS) t(gs)
           |WHERE NOT EXISTS (
           |  SELECT 1 FROM metrics m
           |  WHERE m.event_type = 'purchase'
           |    AND m.timestamp_ns > (gs - 1800) * 1000000000
           |    AND m.timestamp_ns <= gs * 1000000000)
           |ORDER BY 1""".stripMargin, grid)),

    // --- vector set operators (and / unless) ------------------------------
    Gate("promql_and_cmp",
      q("""avg_over_time(events_value[12h]) > 95 and avg_over_time(events_value[12h]) < 150""",
        "event_type", "level"),
      o(s"""SELECT event_type, level, ts, round(raw, 6) AS value FROM (
           |  SELECT m.event_type, m.level, g.t AS ts, avg(m.value) AS raw
           |  FROM metrics m JOIN grid g
           |    ON m.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND m.timestamp_ns <= g.t * 1000000000
           |  GROUP BY 1, 2, 3) w
           |WHERE raw > 95 AND raw < 150 ORDER BY 1, 2, 3""".stripMargin, grid)),

    Gate("promql_unless",
      q("""avg_over_time(events_value[12h]) > 95 unless avg_over_time(events_value{event_type="error"}[12h])""",
        "event_type", "level"),
      o(s"""SELECT event_type, level, ts, round(raw, 6) AS value FROM (
           |  SELECT m.event_type, m.level, g.t AS ts, avg(m.value) AS raw
           |  FROM metrics m JOIN grid g
           |    ON m.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND m.timestamp_ns <= g.t * 1000000000
           |  GROUP BY 1, 2, 3) w
           |WHERE raw > 95 AND NOT (event_type = 'error' AND ts IN (
           |  SELECT g.t FROM metrics m JOIN grid g
           |    ON m.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND m.timestamp_ns <= g.t * 1000000000
           |  WHERE m.event_type = 'error' GROUP BY 1))
           |ORDER BY 1, 2, 3""".stripMargin, grid)),

    // --- @ modifier: pinned evaluation spread across the grid -------------
    Gate("promql_at",
      q(s"""avg_over_time(events_value{event_type="click"}[24h] @ $EndS)""", "event_type"),
      o(s"""SELECT x.event_type, g.t AS ts, round(x.a, 6) AS value FROM (
           |  SELECT event_type, avg(value) AS a
           |  FROM metrics
           |  WHERE event_type = 'click'
           |    AND timestamp_ns > ${EndS - 86400}000000000
           |    AND timestamp_ns <= ${EndS}000000000
           |  GROUP BY 1) x CROSS JOIN grid g
           |ORDER BY 1, 2""".stripMargin, grid)),

    // --- @ start() / @ end() + negative offset (Prometheus StartOrEnd):
    // end-pinned 24h count minus a start-pinned count whose `offset -24h`
    // looks FORWARD into (start, start+24h] — both spread over the grid ----
    Gate("promql_at_start_end",
      q("""count_over_time(events_value{event_type="click"}[24h] @ end()) - count_over_time(events_value{event_type="click"}[24h] @ start() offset -24h)""",
        "event_type"),
      o(s"""SELECT e.event_type, g.t AS ts, round(e.c - s.c, 6) AS value
           |FROM (
           |  SELECT event_type, CAST(count(*) AS DOUBLE) AS c FROM metrics
           |  WHERE event_type = 'click'
           |    AND timestamp_ns > ${EndS - 86400}000000000
           |    AND timestamp_ns <= ${EndS}000000000
           |  GROUP BY 1) e
           |JOIN (
           |  SELECT event_type, CAST(count(*) AS DOUBLE) AS c FROM metrics
           |  WHERE event_type = 'click'
           |    AND timestamp_ns > ${StartS}000000000
           |    AND timestamp_ns <= ${StartS + 86400}000000000
           |  GROUP BY 1) s USING (event_type)
           |CROSS JOIN grid g ORDER BY 1, 2""".stripMargin, grid)),

    // --- negative offset on a range selector: the window looks forward,
    // counting the NEXT 6h of samples at each eval point -------------------
    Gate("promql_negative_offset",
      q("""sum by (event_type) (count_over_time(events_value[6h] offset -6h))""",
        "event_type"),
      o(s"""SELECT m.event_type, g.t AS ts,
           |  round(CAST(count(*) AS DOUBLE), 6) AS value
           |FROM metrics m JOIN grid g
           |  ON m.timestamp_ns > g.t * 1000000000
           | AND m.timestamp_ns <= (g.t + $StepS) * 1000000000
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin, grid)),

    // --- many-to-one matching with group_left (integer-exact values) ------
    Gate("promql_group_left",
      q("""sum by (event_type, le) (count_over_time(events_bucket[12h])) - on(event_type) group_left sum by (event_type) (count_over_time(events_value[12h]))""",
        "event_type", "le"),
      o(s"""SELECT l.event_type,
           |  CASE WHEN l.le = 'inf'::DOUBLE THEN '+Inf'
           |       ELSE CAST(l.le AS VARCHAR) END AS le,
           |  l.t AS ts, round(l.v - r.v, 6) AS value
           |FROM (
           |  SELECT b.event_type, b.le, g.t, CAST(count(*) AS DOUBLE) AS v
           |  FROM buckets b JOIN grid g
           |    ON b.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND b.timestamp_ns <= g.t * 1000000000
           |  GROUP BY 1, 2, 3) l
           |JOIN (
           |  SELECT m.event_type, g.t, CAST(count(*) AS DOUBLE) AS v
           |  FROM metrics m JOIN grid g
           |    ON m.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND m.timestamp_ns <= g.t * 1000000000
           |  GROUP BY 1, 2) r
           |  ON l.event_type = r.event_type AND l.t = r.t
           |ORDER BY 1, 2, 3""".stripMargin, OracleViews.buckets, grid)),

    // --- subquery: inner expr on a finer grid, outer window over it -------
    Gate("promql_subquery",
      q("""max_over_time(sum by (event_type) (count_over_time(events_value[6h]))[24h:6h])""",
        "event_type"),
      o(s"""SELECT i.event_type, g.t AS ts, round(max(i.v), 6) AS value
           |FROM (
           |  SELECT m.event_type, g2.t AS t6, CAST(count(*) AS DOUBLE) AS v
           |  FROM metrics m
           |  JOIN (SELECT unnest(generate_series(${StartS - 86400}, $EndS, $StepS)) AS t) g2
           |    ON m.timestamp_ns > (g2.t - $StepS) * 1000000000
           |   AND m.timestamp_ns <= g2.t * 1000000000
           |  GROUP BY 1, 2) i
           |JOIN grid g ON i.t6 > g.t - 86400 AND i.t6 <= g.t
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin, grid)),

    // --- counter semantics over a subquery's inner series -----------------
    Gate("promql_subquery_increase",
      q("""increase(sum by (event_type) (count_over_time(events_value[6h]))[24h:6h])""",
        "event_type"),
      o(s"""SELECT event_type, t AS ts, round(l2 - f + rc, 6) AS value FROM (
           |  SELECT li.event_type, g.t,
           |    count(*) AS n,
           |    arg_min(li.v, li.t6) AS f,
           |    arg_max(li.v, li.t6) AS l2,
           |    sum(CASE WHEN li.pt > g.t - 86400 AND li.pv > li.v
           |             THEN li.pv ELSE 0 END) AS rc
           |  FROM (
           |    SELECT *,
           |      lag(v) OVER (PARTITION BY event_type ORDER BY t6) AS pv,
           |      lag(t6) OVER (PARTITION BY event_type ORDER BY t6) AS pt
           |    FROM (
           |      SELECT m.event_type, g2.t AS t6, CAST(count(*) AS DOUBLE) AS v
           |      FROM metrics m
           |      JOIN (SELECT unnest(generate_series(${StartS - 86400}, $EndS, $StepS)) AS t) g2
           |        ON m.timestamp_ns > (g2.t - $StepS) * 1000000000
           |       AND m.timestamp_ns <= g2.t * 1000000000
           |      GROUP BY 1, 2)) li
           |  JOIN grid g ON li.t6 > g.t - 86400 AND li.t6 <= g.t
           |  GROUP BY 1, 2) w
           |WHERE n >= 2 ORDER BY 1, 2""".stripMargin, grid)),

    // --- quantile over a subquery's inner grid ----------------------------
    Gate("promql_subquery_quantile",
      q("""quantile_over_time(0.5, sum by (event_type) (count_over_time(events_value[6h]))[24h:6h])""",
        "event_type"),
      o(s"""SELECT i.event_type, g.t AS ts,
           |  round(quantile_cont(i.v, 0.5), 6) AS value
           |FROM (
           |  SELECT m.event_type, g2.t AS t6, CAST(count(*) AS DOUBLE) AS v
           |  FROM metrics m
           |  JOIN (SELECT unnest(generate_series(${StartS - 86400}, $EndS, $StepS)) AS t) g2
           |    ON m.timestamp_ns > (g2.t - $StepS) * 1000000000
           |   AND m.timestamp_ns <= g2.t * 1000000000
           |  GROUP BY 1, 2) i
           |JOIN grid g ON i.t6 > g.t - 86400 AND i.t6 <= g.t
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin, grid)),

    // --- large range/step subquery: RANGE-frame window plan ---------------
    // (over_time.go:30-127; ratio 6h/15min = 24 ≥ threshold → windowed
    // path, no per-sample explode; one day at a 15min eval step)
    Gate("promql_subquery_window",
      (spark: SparkSession, dir: String) => {
        val ws = StartS + 86400
        val we = StartS + 2 * 86400
        new PromQLCompiler(spark, dir,
          PromParams(ws * 1000000000L, we * 1000000000L, 900L))
          .result(
            """max_over_time(sum by (event_type) (count_over_time(events_value[1h]))[6h:900s])""",
            Seq("event_type"))
      },
      o(s"""SELECT i.event_type, go.t AS ts, round(max(i.v), 6) AS value
           |FROM (
           |  SELECT m.event_type, g2.t AS ti, CAST(count(*) AS DOUBLE) AS v
           |  FROM metrics m
           |  JOIN (SELECT unnest(generate_series(${StartS + 86400 - 21600}, ${StartS + 2 * 86400}, 900)) AS t) g2
           |    ON m.timestamp_ns > (g2.t - 3600) * 1000000000
           |   AND m.timestamp_ns <= g2.t * 1000000000
           |  GROUP BY 1, 2) i
           |JOIN (SELECT unnest(generate_series(${StartS + 86400}, ${StartS + 2 * 86400}, 900)) AS t) go
           |  ON i.ti > go.t - 21600 AND i.ti <= go.t
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- top-level range vector (instant query → raw matrix) --------------
    // (`promql/engine.go exec`: a range-vector result is only legal for an
    // instant query; the matrix rows keep the samples' own timestamps in
    // the left-open window (T−range, T])
    Gate("promql_matrix_selector",
      qi("""events_value{event_type="click"}[12h]""", "event_type"),
      o(s"""SELECT event_type, timestamp_ns // 1000000000 AS ts,
           |  round(value, 6) AS value
           |FROM metrics
           |WHERE event_type = 'click'
           |  AND timestamp_ns > ${(EndS - 43200) * 1000000000L}
           |  AND timestamp_ns <= ${EndS * 1000000000L}
           |ORDER BY 2""".stripMargin)),

    // --- top-level subquery (instant query → inner eval points) -----------
    // (matrix rows are the inner instant-vector evals on the [12h:30m]
    // grid anchored at T−range, staleness carry 5m, left-open window)
    Gate("promql_subquery_toplevel",
      qi("""events_value{event_type="click"}[12h:30m]""", "event_type"),
      o(s"""SELECT event_type, p.t AS ts,
           |  round(arg_max(value, timestamp_ns), 6) AS value
           |FROM metrics m JOIN pts p
           |  ON m.timestamp_ns > (p.t - 300) * 1000000000
           | AND m.timestamp_ns <= p.t * 1000000000
           |WHERE event_type = 'click'
           |GROUP BY 1, 2 ORDER BY 2""".stripMargin,
        s"pts AS (SELECT unnest(generate_series(${EndS - 43200 + 1800}, $EndS, 1800)) AS t)")),

    // --- large range/step rate: RANGE-frame counter plan ------------------
    // (ratio 6h/15min = 24 ≥ threshold; reset compensation with the
    // boundary-pair correction; ×range makes values rounding-stable)
    Gate("promql_rate_window",
      (spark: SparkSession, dir: String) => {
        val ws = StartS + 86400
        val we = StartS + 2 * 86400
        new PromQLCompiler(spark, dir,
          PromParams(ws * 1000000000L, we * 1000000000L, 900L))
          .result("""rate(events_total{level="info"}[6h]) * 21600""",
            Seq("event_type"))
      },
      o(s"""SELECT event_type, t AS ts, round(l - f + rc, 6) AS value FROM (
           |  SELECT c.event_type, g.t,
           |    count(*) AS n,
           |    arg_min(c.value, c.timestamp_ns) AS f,
           |    arg_max(c.value, c.timestamp_ns) AS l,
           |    sum(CASE WHEN c.prev_ts > (g.t - 21600) * 1000000000
           |              AND c.prev_val > c.value THEN c.prev_val ELSE 0 END) AS rc
           |  FROM lc c JOIN (SELECT unnest(generate_series(${StartS + 86400}, ${StartS + 2 * 86400}, 900)) AS t) g
           |    ON c.timestamp_ns > (g.t - 21600) * 1000000000
           |   AND c.timestamp_ns <= g.t * 1000000000
           |  WHERE c.level = 'info'
           |  GROUP BY 1, 2) w
           |WHERE n >= 2 ORDER BY 1, 2""".stripMargin,
        OracleViews.counters, lagCounters)),

    // --- /api/v1/metadata: families + type + live series count ------------
    Gate("promql_metadata",
      (spark: SparkSession, dir: String) =>
        graft.promql.PromQLApi.metadata(spark, dir).orderBy("metric_name"),
      o("""SELECT * FROM (
          |  SELECT 'events_bucket' AS metric_name, 'histogram' AS type,
          |    CAST(count(DISTINCT event_type || '|' || CAST(le AS VARCHAR)) AS BIGINT) AS series
          |  FROM buckets
          |  UNION ALL
          |  SELECT 'events_total', 'counter',
          |    CAST(count(DISTINCT event_type || '|' || level) AS BIGINT)
          |  FROM counters
          |  UNION ALL
          |  SELECT 'events_value', 'gauge',
          |    CAST(count(DISTINCT event_type || '|' || level) AS BIGINT)
          |  FROM metrics) u
          |ORDER BY metric_name""".stripMargin,
        OracleViews.counters, OracleViews.buckets)),

    // --- /api/v1/series + /api/v1/labels: dictionary-surface entry points -
    // series = UNION of two selectors (one regex-matched, one exact) over
    // the family dictionaries; labels = distinct label names across all
    // families (le appears only via events_bucket).
    Gate("promql_series_api",
      (spark: SparkSession, dir: String) =>
        graft.promql.PromQLApi.series(spark, dir, Seq(
            """events_value{event_type=~"click|view"}""",
            """events_total{level="info"}"""))
          .select(element_at(col("labels"), "__name__").as("name"),
            element_at(col("labels"), "event_type").as("event_type"),
            element_at(col("labels"), "level").as("level"))
          .orderBy("name", "event_type"),
      o("""SELECT * FROM (
          |  SELECT DISTINCT 'events_value' AS name, event_type, level
          |  FROM metrics
          |  WHERE regexp_matches(event_type, '^(?:click|view)$')
          |  UNION ALL
          |  SELECT DISTINCT 'events_total', event_type, level
          |  FROM metrics WHERE level = 'info') u
          |ORDER BY name, event_type""".stripMargin)),

    Gate("promql_labels_api",
      (spark: SparkSession, dir: String) =>
        graft.promql.PromQLApi.labelNames(spark, dir).orderBy("name"),
      o("""SELECT unnest(['__name__', 'event_type', 'le', 'level']) AS name
          |ORDER BY name""".stripMargin)),

    // --- label_replace: regex capture into a new label --------------------
    Gate("promql_label_replace",
      q("""label_replace(sum by (event_type) (count_over_time(events_value[6h])), "abbr", "$1", "event_type", "(..).*")""",
        "event_type", "abbr"),
      o(s"""SELECT m.event_type, substr(m.event_type, 1, 2) AS abbr, g.t AS ts,
           |  CAST(count(*) AS DOUBLE) AS value
           |FROM metrics m JOIN grid g
           |  ON m.timestamp_ns > (g.t - $StepS) * 1000000000
           | AND m.timestamp_ns <= g.t * 1000000000
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin, grid)),

    // --- label_join: concatenate source labels into a new label -----------
    Gate("promql_label_join",
      q("""label_join(sum by (event_type, level) (count_over_time(events_total[12h])), "combo", "-", "event_type", "level")""",
        "event_type", "level", "combo"),
      o(s"""SELECT c.event_type, c.level, c.event_type || '-' || c.level AS combo,
           |  g.t AS ts, CAST(count(*) AS DOUBLE) AS value
           |FROM counters c JOIN grid g
           |  ON c.timestamp_ns > (g.t - $R12) * 1000000000
           | AND c.timestamp_ns <= g.t * 1000000000
           |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin,
        OracleViews.counters, grid)),

    // --- deriv: least-squares slope over the window (×range so compared
    // values are window-deltas, not 1e-4-scale slopes) ----------------------
    Gate("promql_deriv",
      q("""deriv(events_value{event_type="click"}[12h]) * 43200""", "event_type"),
      o(s"""SELECT event_type, t AS ts,
           |  round(covar_pop(x, value) / var_pop(x) * 43200, 6) AS value
           |FROM (
           |  SELECT m.event_type, g.t, m.value,
           |    (m.timestamp_ns - g.t * 1000000000) / 1e9 AS x
           |  FROM metrics m JOIN grid g
           |    ON m.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND m.timestamp_ns <= g.t * 1000000000
           |  WHERE m.event_type = 'click') w
           |GROUP BY 1, 2
           |HAVING count(*) >= 2 AND var_pop(x) > 0
           |ORDER BY 1, 2""".stripMargin, grid)),

    // --- predict_linear: regression extrapolated 1h past the eval point ---
    Gate("promql_predict_linear",
      q("""predict_linear(events_value{event_type="view"}[12h], 3600)""", "event_type"),
      o(s"""SELECT event_type, t AS ts,
           |  round(avg(value) - (covar_pop(x, value) / var_pop(x)) * avg(x)
           |    + (covar_pop(x, value) / var_pop(x)) * 3600, 6) AS value
           |FROM (
           |  SELECT m.event_type, g.t, m.value,
           |    (m.timestamp_ns - g.t * 1000000000) / 1e9 AS x
           |  FROM metrics m JOIN grid g
           |    ON m.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND m.timestamp_ns <= g.t * 1000000000
           |  WHERE m.event_type = 'view') w
           |GROUP BY 1, 2
           |HAVING count(*) >= 2 AND var_pop(x) > 0
           |ORDER BY 1, 2""".stripMargin, grid)),

    // --- sort_desc: value-ordered instant vector (row order IS the test) --
    Gate("promql_sort_desc",
      q("""sort_desc(sum by (event_type) (count_over_time(events_value[6h])))""",
        "event_type"),
      o(s"""SELECT m.event_type, g.t AS ts, CAST(count(*) AS DOUBLE) AS value
           |FROM metrics m JOIN grid g
           |  ON m.timestamp_ns > (g.t - $StepS) * 1000000000
           | AND m.timestamp_ns <= g.t * 1000000000
           |GROUP BY 1, 2 ORDER BY 2, 3 DESC, 1""".stripMargin, grid)),

    // --- count_values: series count per distinct value ---------------------
    Gate("promql_count_values",
      q("""count_values("cnt", sum by (event_type) (count_over_time(events_value[6h])))""",
        "cnt"),
      o(s"""SELECT CAST(cnt AS VARCHAR) AS cnt, ts, CAST(count(*) AS DOUBLE) AS value
           |FROM (
           |  SELECT m.event_type, g.t AS ts, count(*) AS cnt
           |  FROM metrics m JOIN grid g
           |    ON m.timestamp_ns > (g.t - $StepS) * 1000000000
           |   AND m.timestamp_ns <= g.t * 1000000000
           |  GROUP BY 1, 2) w
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin, grid)),

    // --- time()/vector() + calendar function (UTC) -------------------------
    Gate("promql_day_of_month",
      q("""day_of_month(vector(time()))"""),
      o(s"""SELECT gs AS ts,
           |  CAST(date_part('day', make_timestamp(gs * 1000000)) AS DOUBLE) AS value
           |FROM generate_series($StartS, $EndS, $StepS) t(gs)
           |ORDER BY 1""".stripMargin, grid)),

    // --- timestamp(): the chosen sample's own timestamp --------------------
    Gate("promql_timestamp",
      q("""timestamp(events_value{event_type="click"})""", "event_type"),
      o(s"""SELECT event_type, g.t AS ts,
           |  round(max(m.timestamp_ns) / 1000000000.0, 6) AS value
           |FROM metrics m JOIN grid g
           |  ON m.timestamp_ns > (g.t - 300) * 1000000000
           | AND m.timestamp_ns <= g.t * 1000000000
           |WHERE event_type = 'click'
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin, grid)),

    // --- clamp + sgn chain -------------------------------------------------
    Gate("promql_clamp_sgn",
      q("""clamp(sgn(avg_over_time(events_value[12h]) - 100), -0.5, 1)""",
        "event_type", "level"),
      o(s"""SELECT event_type, level, ts,
           |  round(least(greatest(
           |    CASE WHEN a > 100 THEN 1.0 WHEN a < 100 THEN -1.0 ELSE 0.0 END,
           |    -0.5), 1.0), 6) AS value
           |FROM (
           |  SELECT m.event_type, m.level, g.t AS ts, avg(m.value) AS a
           |  FROM metrics m JOIN grid g
           |    ON m.timestamp_ns > (g.t - $R12) * 1000000000
           |   AND m.timestamp_ns <= g.t * 1000000000
           |  GROUP BY 1, 2, 3) w
           |ORDER BY 1, 2, 3""".stripMargin, grid)),

    // --- histogram_quantile over le buckets (engine-side in the reference;
    // native bucket-array interpolation here) ------------------------------
    Gate("promql_histogram_quantile",
      q("""histogram_quantile(0.9, sum by (le, event_type) (rate(events_bucket{event_type=~"click|purchase"}[12h])))""",
        "event_type"),
      o(s"""SELECT event_type, t AS ts, round(val, 6) AS value FROM (
           |  SELECT event_type, t,
           |    CASE
           |      WHEN total <= 0 THEN NULL
           |      WHEN ls[bc + 1] = 'inf'::DOUBLE THEN ls[len(ls) - 1]
           |      ELSE (CASE WHEN bc = 0 THEN 0.0 ELSE ls[bc] END)
           |           + (ls[bc + 1] - (CASE WHEN bc = 0 THEN 0.0 ELSE ls[bc] END))
           |           * (rank - (CASE WHEN bc = 0 THEN 0.0 ELSE vs[bc] END))
           |           / (vs[bc + 1] - (CASE WHEN bc = 0 THEN 0.0 ELSE vs[bc] END))
           |    END AS val
           |  FROM (
           |    SELECT event_type, t, ls, vs,
           |      vs[len(vs)] AS total,
           |      vs[len(vs)] * 0.9 AS rank,
           |      len(vs) - len(list_filter(vs, x -> x >= vs[len(vs)] * 0.9)) AS bc
           |    FROM (
           |      SELECT event_type, t,
           |        list(le ORDER BY le) AS ls,
           |        list(v ORDER BY le) AS vs
           |      FROM (
           |        SELECT b.event_type, b.le, g.t, count(*) AS n,
           |          (arg_max(b.value, b.timestamp_ns) - arg_min(b.value, b.timestamp_ns)) / $R12.0 AS v
           |        FROM buckets b JOIN grid g
           |          ON b.timestamp_ns > (g.t - $R12) * 1000000000
           |         AND b.timestamp_ns <= g.t * 1000000000
           |        WHERE b.event_type IN ('click', 'purchase')
           |        GROUP BY 1, 2, 3)
           |      WHERE n >= 2
           |      GROUP BY 1, 2)))
           |WHERE val IS NOT NULL
           |ORDER BY 1, 2""".stripMargin,
        OracleViews.buckets, grid))
  )
}
