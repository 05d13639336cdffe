package graft.logql

/** LogQL abstract syntax tree.
  *
  * Shape mirrors the reference grammar
  * (`reader/logql/logql_parser/model.go:1-563`, participle PEG): stream
  * selector, pipeline stages, range aggregations, vector aggregations,
  * topk/bottomk, quantile_over_time, by/without grouping, scalar
  * comparison, offset, binary arithmetic.
  */
object LogQLAst {

  /** `{label op "value"}` — ops `=`, `!=`, `=~`, `!~` (model.go:97-101). */
  final case class LabelMatcher(label: String, op: String, value: String)

  final case class Selector(matchers: Seq[LabelMatcher])

  sealed trait Stage

  /** Line-filter pattern expression: a single needle or an `and`/`or`
    * tree of needles (`logql_parser/model.go:181-212` LineFilterExp; the
    * filter op applies to each LEAF and the tree combines the leaf
    * conditions literally — no De Morgan on negative ops,
    * `planner_line_filter.go:30-53`).
    */
  sealed trait LinePat
  final case class PatLeaf(value: String) extends LinePat
  final case class PatAnd(l: LinePat, r: LinePat) extends LinePat
  final case class PatOr(l: LinePat, r: LinePat) extends LinePat

  /** `|= != |~ !~ |>` line filters (planner_line_filter.go:18-148). */
  final case class LineFilter(op: String, pat: LinePat) extends Stage
  object LineFilter {
    /** Single-needle convenience form (the overwhelmingly common case). */
    def apply(op: String, needle: String): LineFilter =
      LineFilter(op, PatLeaf(needle))
  }

  /** Label predicate tree (planner_label_filter.go:25-172). */
  sealed trait LabelPred
  final case class StrPred(label: String, op: String, value: String) extends LabelPred
  final case class NumPred(label: String, op: String, value: Double) extends LabelPred
  final case class AndPred(l: LabelPred, r: LabelPred) extends LabelPred
  final case class OrPred(l: LabelPred, r: LabelPred) extends LabelPred
  final case class LabelFilterStage(pred: LabelPred) extends Stage

  /** `| json` (full extract) or `| json lbl="json.path"` (params). */
  final case class JsonStage(params: Seq[(String, String)]) extends Stage
  /** `| logfmt` — full key=value extraction. */
  case object LogfmtStage extends Stage
  /** `| regexp "re"` — named capture groups become labels. */
  final case class RegexpStage(re: String) extends Stage
  /** `| line_format "tpl"` (Go template subset). */
  final case class LineFormatStage(tpl: String) extends Stage
  /** `| label_format dst=src` or `dst="tpl"`. */
  final case class LabelFormatStage(ops: Seq[(String, Either[String, String])]) extends Stage
  /** `| drop a, b="v"` / `| keep a, b="v"`: bare names match the key,
    * value-qualified entries match the (key, value) pair
    * (`planner_drop.go:57-75`, `planner_keep.go:56-88`; keep additionally
    * preserves `__error__`/`__error_details__` regardless of the list).
    */
  final case class DropStage(entries: Seq[(String, Option[String])]) extends Stage
  object DropStage {
    def apply(keys: Seq[String])(implicit d: DummyImplicit): DropStage =
      DropStage(keys.map(_ -> None))
  }
  final case class KeepStage(entries: Seq[(String, Option[String])]) extends Stage
  object KeepStage {
    def apply(keys: Seq[String])(implicit d: DummyImplicit): KeepStage =
      KeepStage(keys.map(_ -> None))
  }
  /** `| unwrap lbl` with optional conversion fn (duration/bytes). */
  final case class UnwrapStage(label: String, conv: Option[String]) extends Stage

  /** `selector stages [range] offset` — the operand of a range agg.
    * Durations carried in ns so sub-second ranges (`[500ms]`) stay exact.
    */
  final case class LogRange(
      selector: Selector,
      stages: Seq[Stage],
      rangeNs: Long,
      offsetNs: Long)

  sealed trait Expr

  /** Plain log-stream query: selector + pipeline, no aggregation. */
  final case class LogExpr(selector: Selector, stages: Seq[Stage]) extends Expr

  /** rate/count_over_time/bytes_rate/.../quantile_over_time(φ, r).
    * (model.go:404-429, 524-531)
    */
  final case class RangeAgg(
      fn: String,
      range: LogRange,
      param: Option[Double] = None,
      by: Seq[String] = Nil,
      without: Seq[String] = Nil) extends Expr

  /** sum/min/max/avg/stddev/stdvar/count [by/without] (model.go:461-467),
    * topk/bottomk(k, e) (model.go:500-507).
    */
  final case class VectorAgg(
      fn: String,
      inner: Expr,
      by: Seq[String] = Nil,
      without: Seq[String] = Nil,
      param: Option[Double] = None) extends Expr

  /** Binary arithmetic `/ * + - %` between metric exprs or scalars
    * (model.go:11-34).
    */
  final case class BinOp(op: String, lhs: Expr, rhs: Expr) extends Expr

  final case class ScalarLit(v: Double) extends Expr

  /** Scalar comparison filter `expr > n` (model.go:431-434). */
  final case class Cmp(lhs: Expr, op: String, rhs: Double) extends Expr

  /** Parse `5m`/`1h30m`/`500ms`-style durations to NANOSECONDS.
    * Integer-exact for whole units; fractional parts (`1.5h`) go through
    * double math (safe: ns mantissa for sane ranges). Round 1 truncated
    * `ms` to 0 seconds (`500ms` → rate ÷0) — ns carry fixes that.
    */
  def durationToNs(s: String): Long = {
    val re = "([0-9]+(?:\\.[0-9]+)?)(ns|us|µs|ms|s|m|h|d|w)".r
    val multNs = Map(
      "ns" -> 1L, "us" -> 1000L, "µs" -> 1000L, "ms" -> 1000000L,
      "s" -> 1000000000L, "m" -> 60000000000L, "h" -> 3600000000000L,
      "d" -> 86400000000000L, "w" -> 604800000000000L)
    re.findAllMatchIn(s).map { m =>
      val num = m.group(1)
      val mult = multNs(m.group(2))
      if (num.contains('.')) (num.toDouble * mult).toLong
      else num.toLong * mult
    }.sum
  }
}
