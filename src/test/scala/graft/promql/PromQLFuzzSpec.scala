package graft.promql

import scala.util.Random

import graft.SparkSpec
import graft.gates.EvalWindow._

/** Generator-driven PromQL grammar fuzz: deterministic random compositions
  * of selector × range-fn × instant-fn × aggregation × binop × modifier
  * over the real sf0.001 metric families (events_value gauge,
  * events_total counter, events_bucket le-histogram). Complements the
  * fixed oracle gates by covering stage interactions they never combine.
  */
class PromQLFuzzSpec extends SparkSpec {

  private val rnd = new Random(20260813L)

  private def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

  private val eventTypes = Seq("click", "view", "purchase", "error")

  private def selector(name: String): String = rnd.nextInt(4) match {
    case 0 => name
    case 1 => s"""$name{event_type="${pick(eventTypes)}"}"""
    case 2 => s"""$name{event_type=~"${pick(Seq("click|view", "p.*", "error"))}"}"""
    case _ => s"""$name{event_type!="${pick(eventTypes)}"}"""
  }

  private def range(): String = pick(Seq("[6h]", "[12h]", "[24h]", "[1h]"))

  private def counterExpr(): String = {
    val fn = pick(Seq("rate", "increase", "delta", "irate", "idelta",
      "resets", "changes"))
    val mod = rnd.nextInt(4) match {
      case 0 => " offset 6h"
      case 1 => " @ end()"
      case _ => ""
    }
    s"$fn(${selector("events_total")}${range()}$mod)"
  }

  private def gaugeExpr(): String = rnd.nextInt(3) match {
    case 0 =>
      val fn = pick(Seq("avg_over_time", "min_over_time", "max_over_time",
        "sum_over_time", "count_over_time", "last_over_time",
        "present_over_time", "stddev_over_time", "stdvar_over_time"))
      s"$fn(${selector("events_value")}${range()})"
    case 1 =>
      s"quantile_over_time(0.${1 + rnd.nextInt(9)}, ${selector("events_value")}${range()})"
    case _ => selector("events_value")
  }

  private def instantFn(inner: String): String = rnd.nextInt(6) match {
    case 0 => s"abs($inner)"
    case 1 => s"${pick(Seq("ceil", "floor", "sqrt", "sgn"))}($inner)"
    case 2 => s"clamp_min($inner, ${rnd.nextInt(10)})"
    case 3 => s"clamp_max($inner, ${50 + rnd.nextInt(100)})"
    case 4 => s"round($inner, ${pick(Seq("1", "5", "0.5"))})"
    case _ => inner
  }

  private def agg(inner: String): String = rnd.nextInt(6) match {
    case 0 => s"sum by (event_type) ($inner)"
    case 1 => s"${pick(Seq("min", "max", "avg", "count"))} without (level) ($inner)"
    case 2 => s"topk(${1 + rnd.nextInt(3)}, $inner)"
    case 3 => s"quantile(0.${1 + rnd.nextInt(9)}, $inner)"
    case 4 => s"group($inner)"
    case _ => s"sum($inner)"
  }

  private def query(): String = {
    val base = if (rnd.nextBoolean()) counterExpr() else gaugeExpr()
    val wrapped = rnd.nextInt(3) match {
      case 0 => instantFn(base)
      case 1 => agg(base)
      case _ => base
    }
    rnd.nextInt(5) match {
      case 0 => s"$wrapped ${pick(Seq("*", "+", "-", "/"))} ${1 + rnd.nextInt(9)}"
      case 1 => s"$wrapped ${pick(Seq(">", ">=", "<", "!="))} ${rnd.nextInt(50)}"
      case 2 =>
        s"${agg(wrapped)} ${pick(Seq("and", "or", "unless"))} ${agg(gaugeExpr())}"
      case _ => wrapped
    }
  }

  private def subquery(): String = {
    val inner = pick(Seq(
      s"rate(${selector("events_total")}[6h])",
      selector("events_value"),
      s"sum(${selector("events_value")})"))
    val fn = pick(Seq("max_over_time", "avg_over_time", "min_over_time"))
    pick(Seq(
      s"$fn($inner[24h:6h])",
      s"$fn($inner[24h:])",
      s"$fn($inner[24h:6h] offset 6h)"))
  }

  private val queries: Seq[String] =
    (Seq.fill(230)(query()) ++ Seq.fill(40)(subquery())).distinct

  test(s"${queries.size} generated queries parse") {
    val failures = queries.flatMap(q =>
      try { PromQLParser.parseOrThrow(q); None }
      catch { case e: Throwable => Some(s"$q -> ${e.getMessage}") })
    assert(failures.isEmpty, failures.take(5).mkString("\n"))
  }

  test(s"${queries.size} generated queries execute at sf0.001") {
    val eng = new PromQLCompiler(spark, sf, PromParams(StartNs, EndNs, StepS))
    val failures = queries.flatMap { q =>
      try { eng.result(q, Seq("event_type")).count(); None }
      catch { case e: Throwable =>
        Some(s"$q -> ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.take(5).mkString("\n"))
  }

  test("metamorphic: clamp bounds hold; topk never exceeds the full set") {
    val eng = new PromQLCompiler(spark, sf, PromParams(StartNs, EndNs, StepS))
    def df(q: String) = eng.result(q, Seq("event_type"))
    (1 to 8).foreach { _ =>
      val inner = gaugeExpr()
      val lo = rnd.nextInt(20)
      import org.apache.spark.sql.functions.col
      val bad = df(s"clamp_min($inner, $lo)")
        .filter(col("value") < lo).count()
      assert(bad == 0, s"clamp_min($inner, $lo) emitted values below $lo")
    }
    (1 to 6).foreach { _ =>
      val inner = s"sum by (event_type) (${gaugeExpr()})"
      val k = 1 + rnd.nextInt(2)
      assert(df(s"topk($k, $inner)").count() <= df(inner).count())
    }
  }
}
