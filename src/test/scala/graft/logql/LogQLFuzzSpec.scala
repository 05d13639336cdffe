package graft.logql

import scala.util.Random

import graft.SparkSpec
import graft.gates.EvalWindow._

/** Generator-driven grammar fuzz: random-but-deterministic compositions of
  * selector × line-filter × parser × label-filter × format × unwrap ×
  * range-agg × vector-agg × binop, all over the REAL sf0.001 label/field
  * vocabulary, so every query both parses and EXECUTES. The 180 fixed
  * oracle gates pin point semantics; this suite hunts interaction bugs
  * between stages the fixed corpus never combines. Seeded, so CI is
  * reproducible.
  */
class LogQLFuzzSpec extends SparkSpec {

  private val rnd = new Random(20260813L)

  private def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

  private val eventTypes = Seq("purchase", "view", "signup", "error", "login")

  private def selector(): String = {
    val ms = rnd.nextInt(3) match {
      case 0 => Seq(s"""event_type="${pick(eventTypes)}"""")
      case 1 => Seq(s"""level=~"${pick(Seq("info|error", "err.*", "info"))}"""")
      case _ => Seq(
        s"""event_type!="${pick(eventTypes)}"""",
        s"""level="${pick(Seq("info", "error"))}"""")
    }
    ms.mkString("{", ", ", "}")
  }

  private def lineFilter(): String = rnd.nextInt(4) match {
    case 0 => s"""|= "${pick(Seq("k", "7", "0", "e"))}""""
    case 1 => s"""!= "${pick(Seq("zz-never", "42"))}""""
    case 2 => s"""|~ "${pick(Seq("[0-9]+", "k.*7"))}""""
    case _ => s"""!~ "${pick(Seq("xyzzy.*", "[a-c]{9}"))}""""
  }

  // the sf0.001 `line` is the events props JSON carrying a numeric "k"
  private def parser(): String = rnd.nextInt(3) match {
    case 0 => "| json"
    case 1 => """| json kv="k""""
    case _ => """| regexp "\"k\": (?P<kv>[0-9]+)""""
  }

  private def parsedLabel(p: String): String =
    if (p == "| json") "k" else "kv"

  private def labelFilter(lbl: String): String = rnd.nextInt(4) match {
    case 0 => s"| $lbl > ${rnd.nextInt(90)}"
    case 1 => s"| $lbl <= ${10 + rnd.nextInt(90)}"
    case 2 => s"""| $lbl != "${rnd.nextInt(100)}""""
    case _ => s"| $lbl >= ${rnd.nextInt(50)} and $lbl < ${50 + rnd.nextInt(50)}"
  }

  private def format(lbl: String): String = rnd.nextInt(4) match {
    case 0 => s"""| line_format "v={{.$lbl}} t={{.event_type}}""""
    case 1 => s"""| label_format z=$lbl"""
    case 2 => s"| drop level"
    case _ => s"| keep event_type, $lbl"
  }

  private def range(): String = pick(Seq("[6h]", "[12h]", "[1h]", "[24h]"))

  private def rangeAgg(pipeline: String): String = {
    val r = range()
    val off = if (rnd.nextBoolean()) "" else " offset 6h"
    rnd.nextInt(4) match {
      case 0 => s"rate($pipeline$r$off)"
      case 1 => s"count_over_time($pipeline$r$off)"
      case 2 => s"bytes_over_time($pipeline$r$off)"
      case _ => s"bytes_rate($pipeline$r$off)"
    }
  }

  private def unwrapAgg(pipeline: String, lbl: String): String = {
    val fn = pick(Seq("sum_over_time", "avg_over_time", "max_over_time",
      "min_over_time", "stddev_over_time", "first_over_time",
      "last_over_time"))
    if (fn == "quantile_over_time")
      s"quantile_over_time(0.9, $pipeline | unwrap $lbl ${range()})"
    else s"$fn($pipeline | unwrap $lbl ${range()})"
  }

  private def vectorAgg(inner: String): String = rnd.nextInt(5) match {
    case 0 => s"sum by (event_type) ($inner)"
    case 1 => s"max without (level) ($inner)"
    case 2 => s"avg by (level) ($inner)"
    case 3 => s"topk(${1 + rnd.nextInt(4)}, $inner)"
    case _ => s"sum($inner)"
  }

  private def logQuery(): String = {
    val parts = Seq.newBuilder[String]
    parts += selector()
    if (rnd.nextBoolean()) parts += lineFilter()
    val p = if (rnd.nextBoolean()) Some(parser()) else None
    p.foreach { pp =>
      parts += pp
      if (rnd.nextBoolean()) parts += labelFilter(parsedLabel(pp))
      if (rnd.nextInt(3) == 0) parts += format(parsedLabel(pp))
    }
    parts.result().mkString(" ")
  }

  private def metricQuery(): String = {
    val base = logQuery()
    val hasParser = base.contains("json") || base.contains("regexp")
    val inner =
      if (hasParser && rnd.nextBoolean())
        unwrapAgg(base, parsedLabel(if (base.contains("regexp")) "| regexp" else "| json"))
      else rangeAgg(base)
    rnd.nextInt(3) match {
      case 0 => inner
      case 1 => vectorAgg(inner)
      case _ =>
        val cmp = pick(Seq(">", ">=", "<", "!="))
        s"${vectorAgg(inner)} $cmp ${rnd.nextInt(5)}"
    }
  }

  private val queries: Seq[String] =
    Seq.fill(120)(logQuery()) ++ Seq.fill(120)(metricQuery())

  test(s"${queries.size} generated queries parse") {
    val failures = queries.flatMap(q =>
      LogQLParser.parse(q).left.toOption.map(e => s"$q -> $e"))
    assert(failures.isEmpty, failures.take(5).mkString("\n"))
  }

  test(s"${queries.size} generated queries execute at sf0.001") {
    val eng = new LogQLCompiler(spark, sf, EvalParams(StartNs, EndNs, StepS))
    val failures = queries.distinct.flatMap { q =>
      try { eng.compileExpr(LogQLParser.parseOrThrow(q)).count(); None }
      catch { case e: Throwable =>
        Some(s"$q -> ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.take(5).mkString("\n"))
  }

  test("metamorphic: appending a line filter never adds rows; topk bounds groups") {
    val eng = new LogQLCompiler(spark, sf, EvalParams(StartNs, EndNs, StepS))
    def rows(q: String): Long =
      eng.compileExpr(LogQLParser.parseOrThrow(q)).count()
    (1 to 12).foreach { _ =>
      val sel = selector()
      val filtered = s"$sel ${lineFilter()}"
      assert(rows(filtered) <= rows(sel), s"$filtered grew vs $sel")
    }
    (1 to 6).foreach { _ =>
      val inner = s"sum by (event_type) (${rangeAgg(selector())})"
      val k = 1 + rnd.nextInt(3)
      // per evaluation step topk keeps <= k series; over the whole grid the
      // topk result can never exceed the unlimited result
      assert(rows(s"topk($k, $inner)") <= rows(inner))
    }
  }
}
