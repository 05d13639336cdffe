package graft.logql

import org.scalatest.funsuite.AnyFunSuite
import LogQLAst._

/** Golden-AST parser tests, mirroring the reference's snapshot corpus
  * (`reader/logql/logql_parser/parser_test.go:10-63`).
  */
class LogQLParserSpec extends AnyFunSuite {

  private def p(q: String): Expr = LogQLParser.parseOrThrow(q)

  test("selector with all matcher ops") {
    assert(p("""{a="x", b!="y", c=~"z.*", d!~"w"}""") ==
      LogExpr(Selector(Seq(
        LabelMatcher("a", "=", "x"), LabelMatcher("b", "!=", "y"),
        LabelMatcher("c", "=~", "z.*"), LabelMatcher("d", "!~", "w"))), Nil))
  }

  test("empty selector value matcher") {
    assert(p("""{a=""}""") == LogExpr(Selector(Seq(LabelMatcher("a", "=", ""))), Nil))
  }

  test("line filters chain") {
    assert(p("""{a="x"} |= "inc" != "exc" |~ "re.*" !~ "nre" |> "pat<_>"""") ==
      LogExpr(Selector(Seq(LabelMatcher("a", "=", "x"))), Seq(
        LineFilter("|=", "inc"), LineFilter("!=", "exc"),
        LineFilter("|~", "re.*"), LineFilter("!~", "nre"),
        LineFilter("|>", "pat<_>"))))
  }

  test("line filter or/and pattern groups (model.go:181-212)") {
    // right-recursive, no and/or precedence: a and b or c = And(a, Or(b, c))
    assert(p("""{a="x"} |= "a" and "b" or "c"""") ==
      LogExpr(Selector(Seq(LabelMatcher("a", "=", "x"))), Seq(
        LineFilter("|=", PatAnd(PatLeaf("a"), PatOr(PatLeaf("b"), PatLeaf("c")))))))
    // parens group; next filter op starts a new stage
    assert(p("""{a="x"} |= ("foo" or "bar") and "baz" != "q"""") ==
      LogExpr(Selector(Seq(LabelMatcher("a", "=", "x"))), Seq(
        LineFilter("|=", PatAnd(PatOr(PatLeaf("foo"), PatLeaf("bar")), PatLeaf("baz"))),
        LineFilter("!=", "q"))))
    assert(p("""{app="x"} |~ "POST" or "GET"""") ==
      LogExpr(Selector(Seq(LabelMatcher("app", "=", "x"))), Seq(
        LineFilter("|~", PatOr(PatLeaf("POST"), PatLeaf("GET"))))))
  }

  test("backtick strings keep escapes raw") {
    assert(p("""{a="x"} |~ `\d+`""") ==
      LogExpr(Selector(Seq(LabelMatcher("a", "=", "x"))),
        Seq(LineFilter("|~", "\\d+"))))
  }

  test("json stage with and without params") {
    assert(p("""{a="x"} | json""") ==
      LogExpr(Selector(Seq(LabelMatcher("a", "=", "x"))), Seq(JsonStage(Nil))))
    assert(p("""{a="x"} | json lbl="path.to.field"""") ==
      LogExpr(Selector(Seq(LabelMatcher("a", "=", "x"))),
        Seq(JsonStage(Seq(("lbl", "path.to.field"))))))
  }

  test("logfmt, regexp, formats, drop, keep stages") {
    assert(p("""{a="x"} | logfmt | regexp "(?P<n>\\d+)" | line_format "{{.n}}" | label_format b=a | drop a, b | keep c""") ==
      LogExpr(Selector(Seq(LabelMatcher("a", "=", "x"))), Seq(
        LogfmtStage, RegexpStage("(?P<n>\\d+)"),
        LineFormatStage("{{.n}}"),
        LabelFormatStage(Seq(("b", Left("a")))),
        DropStage(Seq("a", "b")), KeepStage(Seq("c")))))
  }

  test("value-qualified drop/keep entries (planner_drop.go:57-75)") {
    assert(p("""{a="x"} | drop a, b="v" | keep c="w", d""") ==
      LogExpr(Selector(Seq(LabelMatcher("a", "=", "x"))), Seq(
        DropStage(Seq("a" -> None, "b" -> Some("v"))),
        KeepStage(Seq("c" -> Some("w"), "d" -> None)))))
  }

  test("label filter predicates: and binds tighter than or") {
    val LogExpr(_, Seq(LabelFilterStage(pred))) =
      p("""{s="1"} | a="1" or b="2" and c="3""""): @unchecked
    assert(pred == OrPred(
      StrPred("a", "=", "1"),
      AndPred(StrPred("b", "=", "2"), StrPred("c", "=", "3"))))
  }

  test("parenthesized or inside and") {
    val LogExpr(_, Seq(LabelFilterStage(pred))) =
      p("""{s="1"} | (a="1" or b="2") and c="3""""): @unchecked
    assert(pred == AndPred(
      OrPred(StrPred("a", "=", "1"), StrPred("b", "=", "2")),
      StrPred("c", "=", "3")))
  }

  test("numeric label predicates") {
    val LogExpr(_, Seq(LabelFilterStage(pred))) =
      p("""{s="1"} | n > 5, m <= 2.5"""): @unchecked
    assert(pred == AndPred(NumPred("n", ">", 5.0), NumPred("m", "<=", 2.5)))
  }

  test("range agg with by grouping") {
    assert(p("""sum by (a, b) (rate({x="1"}[5m]))""") ==
      VectorAgg("sum", RangeAgg("rate",
        LogRange(Selector(Seq(LabelMatcher("x", "=", "1"))), Nil,
          300000000000L, 0L)), Seq("a", "b"), Nil))
  }

  test("without grouping and offset") {
    assert(p("""sum without (u) (count_over_time({x="1"}[1h] offset 30m))""") ==
      VectorAgg("sum", RangeAgg("count_over_time",
        LogRange(Selector(Seq(LabelMatcher("x", "=", "1"))), Nil,
          3600000000000L, 1800000000000L)), Nil, Seq("u")))
  }

  test("sub-second and compound durations") {
    assert(durationToNs("500ms") == 500000000L)
    assert(durationToNs("1h30m") == 5400000000000L)
    assert(durationToNs("1.5h") == 5400000000000L)
    assert(durationToNs("2us") == 2000L)
    assert(durationToNs("3ns") == 3L)
    assert(durationToNs("1w") == 604800000000000L)
  }

  test("quantile_over_time with grouping") {
    assert(p("""quantile_over_time(0.99, {x="1"} | json | unwrap v [5m]) by (a)""") ==
      RangeAgg("quantile_over_time",
        LogRange(Selector(Seq(LabelMatcher("x", "=", "1"))),
          Seq(JsonStage(Nil), UnwrapStage("v", None)), 300000000000L, 0L),
        Some(0.99), Seq("a"), Nil))
  }

  test("unwrap conversions") {
    val LogExpr(_, Seq(UnwrapStage(l1, c1))) = p("""{x="1"} | unwrap bytes(sz)"""): @unchecked
    assert((l1, c1) == ("sz", Some("bytes")))
    val LogExpr(_, Seq(UnwrapStage(l2, c2))) = p("""{x="1"} | unwrap duration_seconds(d)"""): @unchecked
    assert((l2, c2) == ("d", Some("duration_seconds")))
  }

  test("topk and comparison") {
    assert(p("""topk(5, sum by (a) (rate({x="1"}[1m]))) > 3""") ==
      Cmp(VectorAgg("topk",
        VectorAgg("sum", RangeAgg("rate",
          LogRange(Selector(Seq(LabelMatcher("x", "=", "1"))), Nil,
            60000000000L, 0L)), Seq("a"), Nil),
        param = Some(5.0)), ">", 3.0))
  }

  test("binary arithmetic precedence: mul before add") {
    val BinOp("+", _, BinOp("*", _, _)) =
      p("""sum(rate({a="1"}[1m])) + sum(rate({b="2"}[1m])) * sum(rate({c="3"}[1m]))"""): @unchecked
  }

  test("parse error reported, not crash") {
    assert(LogQLParser.parse("""sum by ( (rate({x=}[5m]))""").isLeft)
    assert(LogQLParser.parse("""{a=}""").isLeft)
  }

  test("registered macro expands in place; unregistered is rejected") {
    LogQLMacros.register("_t_rate",
      ps => s"""sum by (a) (rate({x="1"}[${ps.head}]))""")
    try assert(p("""_t_rate("1m")""") ==
      p("""sum by (a) (rate({x="1"}[1m]))"""))
    finally LogQLMacros.unregister("_t_rate")
    val err = intercept[IllegalArgumentException](p("""_nope("1m")"""))
    assert(err.getMessage.contains("not implemented"))
    // macro as an arithmetic atom
    LogQLMacros.register("_t_c", _ => """sum(count_over_time({x="1"}[1m]))""")
    try { val BinOp("+", _, _) = p("""_t_c() + _t_c()"""): @unchecked }
    finally LogQLMacros.unregister("_t_c")
  }
}
