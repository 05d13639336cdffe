package graft.logql

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.gates.EvalWindow._
import LogQLAst._

/** Property-based tests over the parser/pipeline surface. ScalaCheck
  * generators with FIXED seeds (no scalatestplus bridge in the offline
  * cache, and fixed seeds keep CI deterministic); each property evaluates
  * its whole case batch through one DataFrame pass rather than one Spark
  * job per case.
  */
class PropertySpec extends SparkSpec {

  private val N = 120

  private def cases[T](g: Gen[T]): Seq[T] =
    (0 until N).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def compiler =
    new LogQLCompiler(spark, sf, EvalParams(StartNs, EndNs, StepS))

  private val lineSchema = StructType(Seq(
    StructField("line", StringType),
    StructField("labels", MapType(StringType, StringType))))

  private def linesDf(lines: Seq[String]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        lines.zipWithIndex.map { case (l, i) =>
          Row(l, Map("__case__" -> i.toString)) }, 4),
      lineSchema)

  // --- logfmt roundtrip ----------------------------------------------------

  private val keyGen: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
  } yield (h :: t).mkString

  // printable ASCII incl. spaces, quotes, backslashes, '=' — everything the
  // quoted-value grammar must survive
  private val valGen: Gen[String] =
    Gen.listOfN(8, Gen.choose(32.toChar, 126.toChar)).map(_.mkString)

  private val kvGen: Gen[Map[String, String]] =
    Gen.mapOfN(4, Gen.zip(keyGen, valGen)).suchThat(_.nonEmpty)

  private def renderLogfmt(kv: Map[String, String]): String =
    kv.toSeq.sortBy(_._1).map { case (k, v) =>
      s"""$k="${v.replace("\\", "\\\\").replace("\"", "\\\"")}""""
    }.mkString(" ")

  test("property: logfmt roundtrips arbitrary printable values") {
    val maps = cases(kvGen)
    val df = compiler.applyStage(
      linesDf(maps.map(renderLogfmt)), LogfmtStage)
    val got = df.select(col("labels")).collect()
      .map(_.getAs[Map[String, String]](0))
      .map(m => (m("__case__").toInt, m - "__case__")).toMap
    maps.zipWithIndex.foreach { case (kv, i) =>
      assert(got(i) == kv, s"case $i: line=${renderLogfmt(kv)}")
    }
  }

  // --- json parser roundtrip ----------------------------------------------

  private def renderJson(kv: Map[String, String]): String =
    kv.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + k + "\":\"" +
        v.flatMap {
          case '"'           => "\\\""
          case '\\'          => "\\\\"
          case c if c < ' '  => f"\\u${c.toInt}%04x"
          case c             => c.toString
        } + "\""
    }.mkString("{", ",", "}")

  test("property: json full-extract roundtrips arbitrary printable values") {
    val maps = cases(kvGen)
    val df = compiler.applyStage(
      linesDf(maps.map(renderJson)), JsonStage(Nil))
    val got = df.select(col("labels")).collect()
      .map(_.getAs[Map[String, String]](0))
      .map(m => (m("__case__").toInt, m - "__case__")).toMap
    maps.zipWithIndex.foreach { case (kv, i) =>
      assert(got(i) == kv, s"case $i: line=${renderJson(kv)}")
    }
  }

  // --- duration literals ---------------------------------------------------

  private val durGen: Gen[(Long, String)] = for {
    h <- Gen.choose(0, 48)
    m <- Gen.choose(0, 59)
    s <- Gen.choose(0, 59)
    if h + m + s > 0
  } yield {
    val ns = (h * 3600L + m * 60L + s) * 1000000000L
    val txt = (if (h > 0) s"${h}h" else "") +
      (if (m > 0) s"${m}m" else "") +
      (if (s > 0) s"${s}s" else "")
    (ns, txt)
  }

  test("property: compound duration literals parse to exact nanos") {
    cases(durGen).foreach { case (ns, txt) =>
      LogQLParser.parseOrThrow(s"""count_over_time({a="b"}[$txt])""") match {
        case RangeAgg(_, r, _, _, _) => assert(r.rangeNs == ns, s"[$txt]")
        case other => fail(s"unexpected AST for [$txt]: $other")
      }
    }
  }

  // --- line-filter or/and pattern trees: parse+eval vs direct eval ---------

  private sealed trait TreeG
  private case class LeafG(s: String) extends TreeG
  private case class AndG(l: TreeG, r: TreeG) extends TreeG
  private case class OrG(l: TreeG, r: TreeG) extends TreeG

  private val needleGen: Gen[String] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  private def treeGen(depth: Int): Gen[TreeG] =
    if (depth == 0) needleGen.map(LeafG.apply)
    else Gen.frequency(
      3 -> needleGen.map(LeafG.apply),
      2 -> Gen.zip(treeGen(depth - 1), treeGen(depth - 1)).map((AndG.apply _).tupled),
      2 -> Gen.zip(treeGen(depth - 1), treeGen(depth - 1)).map((OrG.apply _).tupled))

  private def render(t: TreeG): String = t match {
    case LeafG(s)  => "\"" + s + "\""
    case AndG(l, r) => s"(${render(l)} and ${render(r)})"
    case OrG(l, r)  => s"(${render(l)} or ${render(r)})"
  }

  private def evalTree(t: TreeG, line: String, pos: Boolean): Boolean = t match {
    case LeafG(s)   => if (pos) line.contains(s) else !line.contains(s)
    case AndG(l, r) => evalTree(l, line, pos) && evalTree(r, line, pos)
    case OrG(l, r)  => evalTree(l, line, pos) || evalTree(r, line, pos)
  }

  private val lineGen: Gen[String] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  test("property: or/and line-filter trees agree with direct evaluation") {
    val trees = cases(treeGen(2))
    val lines = cases(lineGen).distinct
    // all (tree, polarity) conditions evaluated in ONE DataFrame pass;
    // both polarities exercise the no-De-Morgan rule
    val parsedConds = for {
      (t, ti) <- trees.zipWithIndex
      (op, pos) <- Seq("|=" -> true, "!=" -> false)
    } yield {
      val q = s"""{x="y"} $op ${render(t)}"""
      val f = LogQLParser.parseOrThrow(q) match {
        case LogExpr(_, Seq(f: LineFilter)) => f
        case other => fail(s"unexpected AST for $q: $other")
      }
      (t, ti, op, pos, LogQLPredicates.lineFilterCond(f))
    }
    val rows = linesDf(lines).select(
      col("line") +: parsedConds.map { case (_, ti, _, pos, c) =>
        c.as(s"c_${ti}_${if (pos) "p" else "n"}") }: _*).collect()
    rows.foreach { r =>
      val line = r.getString(0)
      parsedConds.zipWithIndex.foreach { case ((t, ti, op, pos, _), i) =>
        assert(r.getBoolean(i + 1) == evalTree(t, line, pos),
          s"line '$line' tree #$ti $op ${render(t)}")
      }
    }
  }

  // --- parser totality: garbage never escapes as a non-parse error ---------

  private val garbageGen: Gen[String] =
    Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        6 -> Gen.choose(32.toChar, 126.toChar),
        2 -> Gen.oneOf('{', '}', '|', '=', '"', '[', ']', '(', ')'),
        1 -> Gen.oneOf("rate", "sum", "count_over_time", "by", "level")
      ).map(_.toString)).map(_.mkString))

  test("property: parsers reject garbage with a parse error, never crash") {
    cases(garbageGen).foreach { q =>
      def total(parse: String => Any): Unit =
        try { parse(q); () }
        catch { case _: IllegalArgumentException => () }
      total(LogQLParser.parseOrThrow)
      total(graft.promql.PromQLParser.parseOrThrow)
      total(graft.traceql.TraceQLParser.parseOrThrow)
      total(graft.traceql.TempoTagsParser.parseOrThrow)
    }
  }
}
