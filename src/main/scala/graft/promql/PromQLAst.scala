package graft.promql

/** PromQL abstract syntax tree (native subset).
  *
  * The reference embeds the upstream Prometheus engine and substitutes
  * accelerated subtrees (`reader/promql/transpiler_v2.go:15-99`); we compile
  * the whole expression natively to DataFrame plans (SURVEY §2.D), so the
  * AST covers the full expression shapes the reference accelerates PLUS the
  * engine-side ones it delegates (histogram_quantile, vector matching).
  */
object PromQLAst {

  final case class Matcher(label: String, op: String, value: String)

  sealed trait PExpr

  /** `@` modifier target: a literal epoch timestamp, or the query range's
    * own start/end (`@ start()` / `@ end()` — Prometheus `parser/ast.go`
    * StartOrEnd; resolved against the evaluation params at compile time).
    */
  sealed trait AtMod
  final case class AtNs(ns: Long) extends AtMod
  case object AtStart extends AtMod
  case object AtEnd extends AtMod

  /** `metric{l="v"}[5m] offset 1h @ 1704067200` — range is present only
    * inside range fns; `at` pins evaluation to a fixed instant (the `@`
    * modifier), spreading the pinned value across the whole grid.
    * `offsetNs` may be negative (`offset -5m` looks forward).
    */
  final case class Selector(
      name: String,
      matchers: Seq[Matcher],
      rangeNs: Option[Long],
      offsetNs: Long,
      at: Option[AtMod] = None) extends PExpr

  /** rate/increase/…/abs/ceil/histogram_quantile — args are exprs;
    * scalar args are NumLit.
    */
  final case class FnCall(fn: String, args: Seq[PExpr]) extends PExpr

  /** sum/min/max/avg/count/group/stddev/stdvar/topk/bottomk/quantile/
    * count_values with by/without grouping (`planner/sum.go:18-168`).
    * `sparam` carries count_values' destination-label string.
    */
  final case class Agg(
      fn: String,
      inner: PExpr,
      by: Seq[String] = Nil,
      without: Seq[String] = Nil,
      param: Option[Double] = None,
      sparam: Option[String] = None) extends PExpr

  /** Binary op with vector matching. `boolMod` turns comparisons into 0/1;
    * `group` is `Some(("group_left"|"group_right", extraLabels))` for
    * many-to-one matching with label copy from the "one" side.
    */
  final case class BinOp(
      op: String,
      lhs: PExpr,
      rhs: PExpr,
      on: Option[Seq[String]] = None,
      ignoring: Option[Seq[String]] = None,
      boolMod: Boolean = false,
      group: Option[(String, Seq[String])] = None) extends PExpr

  final case class NumLit(v: Double) extends PExpr

  /** String literal argument (label_replace/label_join name args). */
  final case class StrLit(s: String) extends PExpr

  /** `expr[range:step]` — inner expr re-evaluated on the finer step grid,
    * consumed by an outer *_over_time function. Like selectors, subqueries
    * take `offset` (shifts the inner eval window) and `@` (pins it).
    */
  final case class Subquery(
      inner: PExpr,
      rangeNs: Long,
      stepNs: Long,
      offsetNs: Long = 0L,
      at: Option[AtMod] = None) extends PExpr

  val RangeFns: Set[String] = Set(
    "rate", "increase", "delta", "irate", "idelta", "resets", "changes",
    "deriv",
    "sum_over_time", "avg_over_time", "min_over_time", "max_over_time",
    "count_over_time", "last_over_time", "present_over_time",
    "stddev_over_time", "stdvar_over_time")

  val InstantFns: Set[String] = Set(
    "abs", "ceil", "floor", "sqrt", "exp", "ln", "log2", "log10", "sgn",
    "day_of_week", "day_of_month", "day_of_year", "hour", "minute",
    "month", "year", "deg", "rad",
    "sin", "cos", "tan", "asin", "acos", "atan",
    "sinh", "cosh", "tanh")

  val AggFns: Set[String] = Set(
    "sum", "min", "max", "avg", "count", "group", "stddev", "stdvar")

  val ParamAggFns: Set[String] = Set("topk", "bottomk", "quantile")
}
