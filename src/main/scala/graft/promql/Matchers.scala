package graft.promql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import PromQLAst.Matcher

/** THE label-matcher semantics, shared by the compiler's sample scans and
  * the series-API dictionary scans (one implementation so the two
  * surfaces can never drift). Prometheus treats a missing label as the
  * empty string (`model/labels`): every operator therefore evaluates
  * against `coalesce(label, "")` —
  *
  *   - `l=""`  matches series WITHOUT the label (and explicit empties)
  *   - `l!=""` matches only series that HAVE a non-empty value
  *     (a missing label equals "", so it must NOT match — the classic
  *     three-valued-logic bug when written as `!(v <=> value)`)
  *   - `=~` / `!~` are fully anchored, like Prometheus
  */
object Matchers {

  def cond(m: Matcher): Column = {
    val v = coalesce(element_at(col("labels"), m.label), lit(""))
    m.op match {
      case "="  => v === m.value
      case "!=" => v =!= m.value
      case "=~" => v.rlike("^(?:" + m.value + ")$")
      case "!~" => !v.rlike("^(?:" + m.value + ")$")
    }
  }
}
