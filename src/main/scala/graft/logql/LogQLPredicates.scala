package graft.logql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import LogQLAst._

/** Selector/pipeline predicates as pure Column builders — shared by the
  * batch compiler and the streaming live-tail path (identical semantics on
  * both, per the reference where tail re-runs the transpiled query each
  * poll tick, `reader/service/query_range.go:670-800`).
  *
  * Null semantics: an absent label behaves as the empty string (Loki:
  * `{l=~".*"}` matches streams without `l`).
  */
object LogQLPredicates {

  def matcherCond(m: LabelMatcher): Column = {
    val v = element_at(col("labels"), m.label)
    m.op match {
      case "="  => if (m.value.isEmpty) v.isNull || v === "" else v === m.value
      case "!=" => !(v <=> lit(m.value))
      case "=~" => coalesce(v, lit("")).rlike("^(?:" + m.value + ")$")
      case "!~" => !coalesce(v, lit("")).rlike("^(?:" + m.value + ")$")
    }
  }

  def predCond(p: LabelPred): Column = p match {
    case StrPred(l, op, v) =>
      val c = element_at(col("labels"), l)
      op match {
        case "=" | "==" => if (v.isEmpty) c.isNull || c === "" else c === v
        case "!="       => !(c <=> lit(v))
        case "=~"       => coalesce(c, lit("")).rlike("^(?:" + v + ")$")
        case "!~"       => !coalesce(c, lit("")).rlike("^(?:" + v + ")$")
      }
    case NumPred(l, op, n) =>
      val c = element_at(col("labels"), l).cast("double")
      op match {
        case "==" | "=" => c === n
        case "!=" => c =!= n
        case ">"  => c > n
        case ">=" => c >= n
        case "<"  => c < n
        case "<=" => c <= n
      }
    case AndPred(a, b) => predCond(a) && predCond(b)
    case OrPred(a, b)  => predCond(a) || predCond(b)
  }

  /** `<_>`-wildcard line pattern (`|>`) → SQL LIKE, as the reference
    * demotes it (`planner_line_filter.go`, patternMatch).
    */
  def patternToLike(p: String): String =
    p.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_").replace("<\\_>", "%")

  /** The filter op applied to ONE leaf needle. */
  private def leafCond(op: String, needle: String): Column = op match {
    case "|=" => col("line").contains(needle)
    case "!=" => !col("line").contains(needle)
    case "|~" => col("line").rlike(needle)
    case "!~" => !col("line").rlike(needle)
    case "|>" => col("line").like(patternToLike(needle))
  }

  /** `and`/`or` pattern trees combine the LEAF conditions literally —
    * negative ops do NOT distribute De Morgan-style
    * (`planner_line_filter.go:30-53`): `!= "a" or "b"` is
    * `NOT contains(a) OR NOT contains(b)`.
    */
  def lineFilterCond(f: LineFilter): Column = {
    def eval(p: LinePat): Column = p match {
      case PatLeaf(v)   => leafCond(f.op, v)
      case PatAnd(l, r) => eval(l) && eval(r)
      case PatOr(l, r)  => eval(l) || eval(r)
    }
    eval(f.pat)
  }
}
