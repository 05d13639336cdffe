package graft.traceql

import scala.util.Random

import graft.SparkSpec
import graft.gates.EvalWindow._
import graft.traceql.TraceQLAst._

/** Generator-driven TraceQL grammar fuzz: deterministic random spansets
  * (attr conditions × intrinsics × and/or), aggregates, and structural
  * operators over the real sf0.001 span vocabulary. Every query parses
  * AND executes through the real compiler paths (spanSetSpans /
  * aggregate / matchingTraces).
  */
class TraceQLFuzzSpec extends SparkSpec {

  private val rnd = new Random(20260813L)

  private def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

  private val names = Seq("purchase", "view", "signup", "error", "login")

  private def cond(): String = rnd.nextInt(5) match {
    case 0 => s""".name="${pick(names)}""""
    case 1 => s""".service_name="svc${rnd.nextInt(5)}""""
    case 2 => s"duration > ${50 + rnd.nextInt(400)}ms"
    case 3 => s"duration <= ${100 + rnd.nextInt(800)}ms"
    case _ => s""".name!="${pick(names)}""""
  }

  private def spanset(): String = rnd.nextInt(4) match {
    case 0 => s"{ ${cond()} }"
    case 1 => s"{ ${cond()} && ${cond()} }"
    case 2 => s"{ ${cond()} || ${cond()} }"
    case _ => s"{ ${cond()} && (${cond()} || ${cond()}) }"
  }

  private def structural(): String = {
    val op = pick(Seq(">", ">>", "<", "<<", "!>>", "<<~", "~"))
    s"${spanset()} $op ${spanset()}"
  }

  private def aggregated(): String = {
    val fn = rnd.nextInt(4) match {
      case 0 => "count()"
      case 1 => "avg(duration)"
      case 2 => "min(duration)"
      case _ => "max(duration)"
    }
    val cmpVal = if (fn == "count()") s"${1 + rnd.nextInt(4)}"
      else s"${50 + rnd.nextInt(300)}ms"
    s"${spanset()} | $fn ${pick(Seq(">", ">=", "<"))} $cmpVal"
  }

  private val spansets = Seq.fill(130)(spanset()).distinct
  private val structurals = Seq.fill(80)(structural()).distinct
  private val aggregateds = Seq.fill(80)(aggregated()).distinct

  test(s"${spansets.size + structurals.size + aggregateds.size} generated queries parse") {
    val failures = (spansets ++ structurals ++ aggregateds).flatMap(q =>
      try { TraceQLParser.parseOrThrow(q); None }
      catch { case e: Throwable => Some(s"$q -> ${e.getMessage}") })
    assert(failures.isEmpty, failures.take(5).mkString("\n"))
  }

  test("generated spansets execute (attr-condition bitmask path)") {
    val eng = new TraceQLCompiler(spark, sf, StartNs, EndNs)
    val failures = spansets.flatMap { q =>
      try {
        val parsed = TraceQLParser.parseOrThrow(q)
        eng.spanSetSpans(parsed.expr.asInstanceOf[Sel].ss).count(); None
      } catch { case e: Throwable =>
        Some(s"$q -> ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.take(5).mkString("\n"))
  }

  test("generated structural + aggregate queries execute") {
    val eng = new TraceQLCompiler(spark, sf, StartNs, EndNs)
    val failures = (structurals ++ aggregateds).flatMap { q =>
      try {
        val parsed = TraceQLParser.parseOrThrow(q)
        parsed.agg match {
          case Some(a) => eng.aggregate(parsed.expr, a).count()
          case None    => eng.matchingTraces(parsed.expr).count()
        }
        None
      } catch { case e: Throwable =>
        Some(s"$q -> ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.take(5).mkString("\n"))
  }

  test("metamorphic: AND narrows, OR widens") {
    val eng = new TraceQLCompiler(spark, sf, StartNs, EndNs)
    def rows(q: String): Long = {
      val parsed = TraceQLParser.parseOrThrow(q)
      eng.spanSetSpans(parsed.expr.asInstanceOf[Sel].ss).count()
    }
    (1 to 8).foreach { _ =>
      val (a, b) = (cond(), cond())
      val base = rows(s"{ $a }")
      assert(rows(s"{ $a && $b }") <= base, s"AND grew: {$a && $b}")
      assert(rows(s"{ $a || $b }") >= base, s"OR shrank: {$a || $b}")
    }
  }
}
