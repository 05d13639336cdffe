package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.logql.EvalParams

/** Scheduled rule evaluation — the reference's ruler manager loop
  * (`ruler/manager.go:43-250`: one manager per engine, an interval ticker
  * per rule group). Each [[tick]] evaluates every stored group whose
  * interval has elapsed since its last evaluation:
  *
  *   - RECORDING rules write back through the live metrics append path
  *     ([[Ruler.writeback]] → `Store.appendMetrics`, the reference's
  *     `writeback.go` into its writer), so each tick's vector is
  *     immediately PromQL-queryable and gains downsample partials;
  *   - ALERTING rules run the [[Ruler.alertStates]] state machine over a
  *     bounded lookback (the `for` duration plus slack, so pending→firing
  *     transitions accumulate across ticks exactly like Prometheus's
  *     in-memory active-since) and export the NEW grid points as
  *     Prometheus-style `ALERTS{alertname=…, alertstate=…}` samples
  *     through the same append path.
  *
  * Tick windows tile: a group's evaluation grid runs at its own interval,
  * and each tick covers exactly the grid points after the previous tick's
  * last point — re-running a tick never double-records. Per-group
  * last-eval bookkeeping is in memory (a restart re-seeds from "one
  * interval back", the reference's restart behavior); per-RULE health is
  * persisted through [[Rules]]' health table, so `/api/v1/rules` reflects
  * the last outcome and evaluation timestamp.
  *
  * The clock is injectable so a spec can drive deterministic ticks; the
  * production wrapper is [[start]], a daemon timer polling at `pollS`
  * (groups fire only when their own interval has elapsed — the poll just
  * bounds the firing latency, like the reference's ticker resolution).
  */
final class RulerScheduler(spark: SparkSession, dir: String,
    nowNs: () => Long = () => System.currentTimeMillis() * 1000000L) {

  private val NsPerS = 1000000000L
  // (kind, namespace, group) -> last evaluated grid point (ns)
  private val lastEvalNs = TrieMap[(String, String, String), Long]()

  /** Engines swept: the HTTP ruler surface stores under "loki"; the
    * library surface also uses "prom" ([[Rules.evalVector]] picks the
    * engine per kind — one manager per engine, `router/init.go:91,100`).
    */
  private val Kinds = Seq("loki", "prom")

  private def forSeconds(forDur: String): Long =
    if (forDur.isEmpty) 0L else Rules.parseIntervalS(forDur)

  /** One scheduler pass over every stored group of both engines. Returns
    * the number of samples appended (recorded vectors + ALERTS exports).
    */
  def tick(): Long = {
    val now = nowNs()
    var written = 0L
    for (kind <- Kinds;
         (ns, gs) <- Rules.allGroups(spark, dir, kind).toSeq.sortBy(_._1);
         g <- gs) {
      val key = (kind, ns, g.name)
      val stepNs = math.max(1L, g.intervalS) * NsPerS
      // work in BUCKET space: the compilers evaluate on the floor-aligned
      // step grid (gridStart = ⌊start/step⌋·step, end-exclusive), so the
      // tick bookkeeping aligns too — consecutive ticks then tile the
      // grid exactly, never re-recording or skipping a bucket
      val nowBucket = (now / stepNs) * stepNs
      val last = lastEvalNs.getOrElse(key, nowBucket - stepNs)
      if (nowBucket > last) {
        // new grid points: (last, nowBucket]
        written += evalGroup(kind, ns, g, last + stepNs, nowBucket, now)
        lastEvalNs(key) = nowBucket
      }
    }
    written
  }

  /** Evaluate one group over the grid points [startNs, lastPointNs] (both
    * bucket-aligned, inclusive). The engines' own grid conventions differ
    * at the edges (the LogQL/PromQL grids are floor-aligned end-exclusive,
    * the `vector(N)` shortcut is end-inclusive — both gate-pinned), so
    * every evaluated frame is clamped to exactly these points before the
    * append: the tick tiling stays exact regardless of engine.
    */
  private def evalGroup(kind: String, ns: String, g: Rules.RuleGroup,
      startNs: Long, lastPointNs: Long, nowNsVal: Long): Long = {
    var written = 0L
    val healths = g.rules.map { r =>
      val t0 = System.nanoTime()
      val name = if (r.isRecording) r.record else r.alert
      // a failing rule records health=err and must not block its group
      // siblings (`manager.go`: per-rule health, evaluation continues)
      val (health, err) =
        try {
          written +=
            (if (r.isRecording)
              recordWriteback(kind, r, g.intervalS, startNs, lastPointNs)
            else
              exportAlerts(kind, r, g.intervalS, startNs, lastPointNs))
          ("ok", "")
        } catch {
          case e: Exception =>
            ("err", Option(e.getMessage).getOrElse(e.toString))
        }
      Rules.HealthRow(kind, ns, g.name, name, health, err,
        nowNsVal / 1000000L, (System.nanoTime() - t0) / 1e9)
    }
    Rules.saveHealth(spark, dir, healths)
    written
  }

  /** Evaluate one recording rule on its OWN engine ([[Rules.evalVector]]
    * per kind) and write the vector back through the live metrics append
    * path — the [[Ruler.writeback]] semantics (`writeback.go:13-41` label
    * precedence: sample < rule labels < `__name__`), engine-dispatched.
    */
  private def recordWriteback(kind: String, r: Rules.Rule, intervalS: Long,
      startNs: Long, lastPointNs: Long): Long = {
    val stepS = math.max(1L, intervalS)
    val overrides = r.labels + ("__name__" -> r.record)
    val keys = overrides.keys.toSeq
    val overrideMap = map(
      overrides.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)
    val merged = map_concat(
      map_filter(col("labels"), (k, _) => !k.isin(keys: _*)), overrideMap)
    val out = Rules.evalVector(spark, dir, kind, r.expr,
        EvalParams(startNs, lastPointNs + stepS * NsPerS, stepS))
      .filter(col("ts") * NsPerS >= startNs &&
        col("ts") * NsPerS <= lastPointNs) // clamp to the tick's points
      .select(merged.as("labels"),
        (col("ts") * NsPerS).as("timestamp_ns"), col("value"))
      .withColumn("fingerprint",
        graft.model.Tables.fingerprintOf(col("labels")))
    graft.store.Store.appendMetrics(spark, dir, out)
  }

  /** Evaluate one alerting rule's state machine and push the NEW grid
    * points' firing/pending states as `ALERTS` samples. The state frame
    * is computed over a lookback long enough for `for`-episodes to
    * accumulate (forS + one extra interval before the first new point),
    * then filtered to ts > the previous tick's last point so each point
    * exports exactly once.
    */
  private def exportAlerts(kind: String, r: Rules.Rule, intervalS: Long,
      startNs: Long, lastPointNs: Long): Long = {
    val stepS = math.max(1L, intervalS)
    val forS = forSeconds(r.forDur)
    val lookbackNs = (forS + stepS) * NsPerS
    val grid = Rules.evalVector(spark, dir, kind, r.expr,
        EvalParams(startNs - lookbackNs, lastPointNs + stepS * NsPerS, stepS))
      .filter(col("ts") * NsPerS <= lastPointNs)
      .withColumn("fingerprint",
        graft.model.Tables.fingerprintOf(col("labels")))
    val frame = Ruler.alertStatesFrom(grid, r.alert, forS, stepS)
    val fresh = frame.filter(col("ts") * NsPerS >= startNs)
    val overlay = (r.labels ++ Map(
        "__name__" -> "ALERTS", "alertname" -> r.alert)).toSeq
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    val samples = fresh.select(
        graft.model.MapOps.update(col("labels"),
          map_concat(map(overlay: _*),
            map(lit("alertstate"), col("state")))).as("labels"),
        (col("ts") * NsPerS).as("timestamp_ns"),
        lit(1.0).as("value"))
      .withColumn("fingerprint",
        graft.model.Tables.fingerprintOf(col("labels")))
    graft.store.Store.appendMetrics(spark, dir, samples)
  }

  /** Spec hook: the last evaluated grid point for a group, if any. */
  private[streaming] def lastEval(kind: String, ns: String,
      group: String): Option[Long] = lastEvalNs.get((kind, ns, group))

  /** Production timer: poll every `pollS` seconds on a daemon thread; a
    * failed pass must never kill the loop (same contract as the store
    * maintenance timer). Returns the scheduler service for shutdown.
    */
  def start(pollS: Long = 15)
      : java.util.concurrent.ScheduledExecutorService = {
    val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-ruler"); t.setDaemon(true); t
      })
    ex.scheduleWithFixedDelay(() => {
      try tick(): Unit
      catch { case _: Throwable => () }
    }, pollS, pollS, java.util.concurrent.TimeUnit.SECONDS)
    ex
  }
}
