package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.logql.{LogQLParser, LogQLPredicates}
import graft.logql.LogQLAst._

/** Live tail (`/loki/api/v1/tail`): the reference re-runs the transpiled
  * query every poll second over `(last_ts, now]` with a cursor
  * (`reader/service/query_range.go:670-800`). In Spark the SAME selector +
  * filter predicates apply to a STREAMING DataFrame — the micro-batch
  * trigger is the poll loop, the checkpoint offset is the cursor, and no
  * re-transpilation happens per tick.
  *
  * Supported tail stages are the streamable subset (line filters + label
  * filters — Loki's tail restriction too); parser stages would need the
  * same expressions but are rejected here to keep tail latency flat.
  */
object LiveTail {

  def apply(stream: DataFrame, query: String): DataFrame =
    LogQLParser.parseOrThrow(query) match {
      case LogExpr(sel, stages) =>
        var df = stream
        for (m <- sel.matchers) df = df.filter(LogQLPredicates.matcherCond(m))
        stages.foreach {
          case f: LineFilter        => df = df.filter(LogQLPredicates.lineFilterCond(f))
          case LabelFilterStage(p)  => df = df.filter(LogQLPredicates.predCond(p))
          case other => throw new IllegalArgumentException(
            s"stage not supported in tail: $other")
        }
        df
      case other =>
        throw new IllegalArgumentException(s"tail needs a log query: $other")
    }
}
