package graft.traceql

import scala.util.parsing.combinator.RegexParsers

import graft.logql.LogQLAst.durationToNs

/** TraceQL AST + parser (subset mirroring
  * `reader/traceql/traceql_parser/model_v2.go:9-276`): span-set selectors
  * `{ cond }` with `&&`/`||` attr terms, structural ops between span-sets
  * (flattened to same-trace co-occurrence, as the reference does —
  * `clickhouse_transpiler/planner.go:100-105`), span-set aggregators
  * `| count()/avg(x)/min/max/sum cmp N`, and the metrics stage
  * `| rate() by (attr)`.
  */
object TraceQLAst {

  sealed trait AttrCond
  /** `.attr op value` / `name op v` / `duration op 10ms`. */
  final case class StrCond(key: String, op: String, value: String) extends AttrCond
  final case class NumCond(key: String, op: String, value: Double) extends AttrCond
  /** duration intrinsic, value in ns. */
  final case class DurCond(op: String, ns: Long) extends AttrCond
  /** bare `true`/`false` literal term (`model_v2.go:81` BoolLiteral →
    * `attr_condition.go:171-174` 1=1 / 0=1).
    */
  final case class BoolCond(value: Boolean) extends AttrCond
  /** `nestedSetParent < 0` — root spans (`attr_condition.go:206-216`:
    * parent_id empty ⇒ here parent_id IS NULL; every other nestedSet*
    * comparison is a no-op true there, [[BoolCond]] here).
    */
  case object RootCond extends AttrCond
  final case class CondAnd(l: AttrCond, r: AttrCond) extends AttrCond
  final case class CondOr(l: AttrCond, r: AttrCond) extends AttrCond

  /** `{}` (attrless) or `{ cond }`. */
  final case class SpanSet(cond: Option[AttrCond])

  sealed trait TExpr
  final case class Sel(ss: SpanSet) extends TExpr
  /** A span-set operand carrying its OWN aggregator inside a complex
    * expression — `{a} | count() > 2 || {b}` (`model_v2.go`: each Selector
    * owns an optional aggregator; `complex_or.go` unions the resulting
    * trace sets).
    */
  final case class AggedSel(ss: SpanSet, agg: SpanAgg) extends TExpr
  final case class StructAnd(l: TExpr, r: TExpr) extends TExpr
  final case class StructOr(l: TExpr, r: TExpr) extends TExpr
  /** `{a} > {b}` — direct parent→child: a span matching `r` whose parent
    * matches `l`, in the same trace. (The reference flattens ALL structural
    * ops to same-trace && — `clickhouse_transpiler/planner.go:100-105`; the
    * span table carries parent_id, so the child op evaluates exactly here.)
    */
  final case class StructChild(l: TExpr, r: TExpr) extends TExpr
  /** `{a} >> {b}` — TRUE descendant via bounded parent-closure iteration
    * (the reference flattens this to &&; exact evaluation here).
    */
  final case class StructDescendant(l: TExpr, r: TExpr) extends TExpr
  /** `{a} !>> {b}` — traces containing a `r`-span that is NOT a descendant
    * of any `l`-span (`lexer_rules v2.go` NotDescendant; the reference
    * flattens negated structural ops to && too — exact evaluation here).
    */
  final case class StructNotDescendant(l: TExpr, r: TExpr) extends TExpr
  /** `{a} <<~ {b}` — traces containing a `r`-span that is NOT an ancestor
    * of any `l`-span (NotAncestor).
    */
  final case class StructNotAncestor(l: TExpr, r: TExpr) extends TExpr

  /** `| count() > 2`, `| avg(duration) > 40ms` (aggregator.go:23-76). */
  final case class SpanAgg(fn: String, attr: Option[String], op: String, value: Double)

  /** Metrics stage: `| rate() / count_over_time() / quantile_over_time(x, φ)
    * / histogram_over_time(x) [by (attrs)]` (`model_v2.go:181-204`).
    */
  final case class Metrics(fn: String, attr: Option[String],
      param: Option[Double], by: Seq[String])

  /** Second stage (`model_v2.go:259-268`): `| topk(n)` / `| bottomk(n)`
    * over a metrics frame, or `| select(attr, ...)` projecting attr
    * columns onto matched spans.
    */
  sealed trait SecondStageOp
  final case class SecondStage(fn: String, k: Int) extends SecondStageOp
  final case class SelectStage(attrs: Seq[String]) extends SecondStageOp

  /** `| compare({sel}, topN[, baselineFromNs, baselineToNs])` —
    * selection-vs-baseline attr diff (`tempo_metrics.go:658-830`,
    * `model_v2.go:208-229`); explicit baseline epoch-ns bounds evaluate
    * the baseline span set over its own window
    * (`tempo/metrics_query.go:748-758`).
    */
  final case class CompareStage(sel: SpanSet, topN: Int,
      baselineFromNs: Option[Long] = None, baselineToNs: Option[Long] = None)

  final case class Query(expr: TExpr, agg: Option[SpanAgg],
      metrics: Option[Metrics], second: Option[SecondStageOp] = None,
      compare: Option[CompareStage] = None,
      hints: Map[String, String] = Map.empty)
}

object TraceQLParser extends RegexParsers {
  import TraceQLAst._

  override def skipWhitespace = true

  private def ident: Parser[String] = """[a-zA-Z_][a-zA-Z0-9_]*""".r
  private def number: Parser[Double] = """-?[0-9]+(\.[0-9]+)?""".r ^^ (_.toDouble)
  private def durLit: Parser[Long] =
    """[0-9]+(\.[0-9]+)?(ns|us|µs|ms|s|m|h)""".r ^^ durationToNs
  private def quoted: Parser[String] =
    ("\"" + """([^"\\]|\\.)*""" + "\"").r ^^ (s => s.substring(1, s.length - 1))

  private def cmpOp: Parser[String] = ">=" | "<=" | "!=" | "=~" | ">" | "<" | "="

  /** `.attr`, `span.attr`, `resource.attr` → attr key; `name`,
    * `service_name` intrinsics hit the same attr rows; `duration` is the
    * span intrinsic.
    */
  /** Dotted attr names (`.service.name`, `.http.status_code`) — OTLP
    * attribute keys; the store's key normalization maps the well-known
    * `service.name` onto its intrinsic column key.
    */
  private def dottedIdent: Parser[String] =
    ident ~ rep("." ~> ident) ^^ { case h ~ t => (h +: t).mkString(".") }
  private def normKey(k: String): String =
    if (k == "service.name") "service_name" else k

  private def field: Parser[String] =
    ("resource." ~> dottedIdent ^^ normKey) |
    ("span." ~> dottedIdent ^^ normKey) |
    ("." ~> dottedIdent ^^ normKey) |
    // root intrinsics map onto the span-level columns
    // (`attr_condition.go:195-204`); statusMessage before status so the
    // longer literal wins
    "rootServiceName" ^^^ "service_name" | "rootName" ^^^ "name" |
    "statusMessage" | "status" | "kind" |
    "duration" | "name" | "service_name"

  private def term: Parser[AttrCond] =
    "duration" ~> cmpOp ~ durLit ^^ { case op ~ ns => DurCond(op, ns) } |
    // nestedSetParent < 0 selects root spans; all other nestedSet*
    // comparisons are schema-less no-ops (`attr_condition.go:206-221`)
    "nestedSetParent" ~> cmpOp ~ number ^^ {
      case "<" ~ n if n == 0.0 => RootCond
      case _                   => BoolCond(true)
    } |
    ("nestedSetLeft" | "nestedSetRight") ~> cmpOp ~ number ^^^ BoolCond(true) |
    "true" ^^^ BoolCond(true) | "false" ^^^ BoolCond(false) |
    field ~ cmpOp ~ (quoted ^^ (Left(_)) | durLit ^^ (d => Right(d.toDouble)) |
      number ^^ (Right(_)) |
      "nil" ~> err("nil comparisons are not supported") |
      ident ^^ (Left(_))) ^^ {
      case f ~ op ~ Left(s)  => StrCond(f, op, s)
      case f ~ op ~ Right(n) => NumCond(f, op, n)
    } |
    "(" ~> condExpr <~ ")"

  private def andCond: Parser[AttrCond] =
    term ~ rep("&&" ~> term) ^^ { case f ~ r => r.foldLeft(f)(CondAnd.apply) }
  private def condExpr: Parser[AttrCond] =
    andCond ~ rep("||" ~> andCond) ^^ { case f ~ r => r.foldLeft(f)(CondOr.apply) }

  private def spanset: Parser[TExpr] =
    "{" ~> opt(condExpr) <~ "}" ^^ (c => Sel(SpanSet(c)))

  private def structOp: Parser[String] =
    "&>>" | "&&" | "||" | "!>>" | ">>" | ">" |
      "<<&" | "<<~" | "<<" | "<" | "~"

  /** Each Selector of a complex expression may carry its own aggregator
    * (`model_v2.go`; planner test `{a} | count() > 2 || {b}`). The HEAD
    * operand takes one only when a structural op follows (guard) — a lone
    * `{a} | count() > 2` keeps its aggregator at the query level; tail
    * operands take theirs unconditionally.
    */
  private def headOperand: Parser[TExpr] =
    spanset ~ opt("|" ~> aggStage <~ guard(structOp)) ^^ {
      case Sel(ss) ~ Some(a) => AggedSel(ss, a)
      case s ~ _             => s
    }
  private def tailOperand: Parser[TExpr] =
    spanset ~ opt("|" ~> aggStage) ^^ {
      case Sel(ss) ~ Some(a) => AggedSel(ss, a)
      case s ~ _             => s
    }

  // both op dialects: Tempo's `> >> < <<` and the reference lexer's
  // `&>>` (Descendant) / `<<&` (Ancestor) / `!>>` (NotDescendant) /
  // `<<~` (NotAncestor) — longest spellings first so `<<&`/`<<~` win
  // over `<<` and `&>>` over `&&`
  private def structExpr: Parser[TExpr] =
    headOperand ~ rep(structOp ~ tailOperand) ^^ { case f ~ r =>
      r.foldLeft(f) {
        case (a, "&&" ~ b)  => StructAnd(a, b)
        case (a, "||" ~ b)  => StructOr(a, b)
        case (a, ">" ~ b)   => StructChild(a, b)
        case (a, ">>" ~ b)  => StructDescendant(a, b)
        case (a, "&>>" ~ b) => StructDescendant(a, b)
        case (a, "!>>" ~ b) => StructNotDescendant(a, b)
        // ancestor/parent are the descendant/child relations with the
        // roles swapped: `{a} << {b}` keeps traces where a b-span is an
        // ANCESTOR of an a-span ⟺ an a-span is a descendant of a b-span
        // (exact here; the reference flattens ALL structural ops to
        // same-trace && — planner.go:100-105)
        case (a, "<<" ~ b)  => StructDescendant(b, a)
        case (a, "<<&" ~ b) => StructDescendant(b, a)
        case (a, "<<~" ~ b) => StructNotAncestor(a, b)
        case (a, "<" ~ b)   => StructChild(b, a)
        // sibling flattens to same-trace co-occurrence, as the reference
        // does (the synthetic linear traces have no true siblings)
        case (a, _ ~ b)     => StructAnd(a, b)
      }
    }

  private def aggStage: Parser[SpanAgg] =
    "count" ~> "(" ~> ")" ~> cmpOp ~ number ^^ {
      case op ~ n => SpanAgg("count", None, op, n)
    } |
    ("avg" | "min" | "max" | "sum") ~ ("(" ~> ("duration" | "." ~> ident) <~ ")") ~ cmpOp ~ (durLit ^^ (_.toDouble) | number) ^^ {
      case fn ~ f ~ op ~ n => SpanAgg(fn, Some(f), op, n)
    }

  private def byClause: Parser[Seq[String]] =
    "by" ~> "(" ~> repsep(field, ",") <~ ")"

  private def metricsStage: Parser[Metrics] =
    ("rate" | "count_over_time") ~ ("(" ~> ")" ~> opt(byClause)) ^^ {
      case fn ~ by => Metrics(fn, None, None, by.getOrElse(Nil))
    } |
    "quantile_over_time" ~> ("(" ~> field) ~ ("," ~> number <~ ")") ~ opt(byClause) ^^ {
      case f ~ q ~ by => Metrics("quantile_over_time", Some(f), Some(q), by.getOrElse(Nil))
    } |
    "histogram_over_time" ~> ("(" ~> field <~ ")") ~ opt(byClause) ^^ {
      case f ~ by => Metrics("histogram_over_time", Some(f), None, by.getOrElse(Nil))
    } |
    // attr-target aggregations (`tempo/metrics_query.go:23-29` metricsAggFn)
    ("avg_over_time" | "min_over_time" | "max_over_time" | "sum_over_time") ~
      ("(" ~> field <~ ")") ~ opt(byClause) ^^ {
      case fn ~ f ~ by => Metrics(fn, Some(f), None, by.getOrElse(Nil))
    }

  private def secondStage: Parser[SecondStageOp] =
    ("topk" | "bottomk") ~ ("(" ~> number <~ ")") ^^ {
      case fn ~ k => SecondStage(fn, k.toInt)
    } |
    "select" ~> "(" ~> rep1sep(field | ident, ",") <~ ")" ^^ SelectStage.apply

  /** `with(key=value, ...)` hints (`model_v2.go:240-261`); values are
    * bare words/numbers or quoted strings.
    */
  private def withClause: Parser[Map[String, String]] =
    "with" ~> "(" ~> rep1sep(
      ident ~ ("=" ~> (quoted | """[a-zA-Z0-9_.\-]+""".r)), ",") <~ ")" ^^ (
      _.map { case k ~ v => k -> v }.toMap)

  // baseline bounds parse as Long: epoch-ns exceeds Double's 2^53 exact
  // integer range, so routing them through `number` would round them
  private def longLit: Parser[Long] = """[0-9]+""".r ^^ (_.toLong)

  private def compareStage: Parser[CompareStage] =
    "compare" ~> ("(" ~> "{" ~> opt(condExpr) <~ "}") ~ ("," ~> number) ~
      opt(("," ~> longLit) ~ ("," ~> longLit)) <~ ")" ^^ {
      case c ~ n ~ bl => CompareStage(SpanSet(c), n.toInt,
        bl.map { case f ~ _ => f }, bl.map { case _ ~ t => t })
    }

  // stage order mirrors TraceQLScript (model_v2.go:9-18): selector,
  // optional agg/metrics/compare stage, optional with() hints, optional
  // second stage (which may carry its own with() — model_v2.go:263-268)
  private def query: Parser[Query] =
    structExpr ~ opt("|" ~> (compareStage ^^ (c => (None, None, Some(c))) |
      metricsStage ^^ (m => (None, Some(m), None)) |
      aggStage ^^ (a => (Some(a), None, None)))) ~
      opt(withClause) ~ opt("|" ~> secondStage) ~ opt(withClause) ^^ {
      case e ~ stage ~ h1 ~ s ~ h2 =>
        val (a, m, c) = stage.getOrElse((None, None, None))
        Query(e, a, m, s, c,
          h1.getOrElse(Map.empty) ++ h2.getOrElse(Map.empty))
    }

  def parse(q: String): Either[String, Query] =
    parseAll(query, q) match {
      case Success(e, _)      => Right(e)
      case NoSuccess(m, rest) => Left(s"$m at ${rest.pos}")
      case other              => Left(other.toString)
    }

  def parseOrThrow(q: String): Query =
    parse(q).fold(m => throw new IllegalArgumentException(s"TraceQL parse error: $m in: $q"), identity)
}

/** Legacy Tempo tag-search string (`/api/search?tags=...`): whitespace-
  * separated `key{=,!=,=~,!~}value` terms, keys/values bare or quoted
  * (`reader/tempo/tags.go:10-53`).
  */
object TempoTagsParser extends RegexParsers {
  private def bare: Parser[String] = """[^ !=~"]+""".r
  private def quoted: Parser[String] =
    "\"" ~> """(\\.|[^"\\])*""".r <~ "\"" ^^ (s =>
      s.replace("\\\"", "\"").replace("\\\\", "\\"))
  private def cond: Parser[String] = "!=" | "=~" | "!~" | "="
  private def tag: Parser[(String, String, String)] =
    (quoted | bare) ~ cond ~ (quoted | bare) ^^ { case k ~ op ~ v => (k, op, v) }

  def parse(s: String): Either[String, Seq[(String, String, String)]] =
    parseAll(rep(tag), s) match {
      case Success(t, _)      => Right(t)
      case NoSuccess(m, rest) => Left(s"$m at ${rest.pos}")
      case other              => Left(other.toString)
    }

  def parseOrThrow(s: String): Seq[(String, String, String)] =
    parse(s).fold(m => throw new IllegalArgumentException(
      s"tags parse error: $m in: $s"), identity)
}
