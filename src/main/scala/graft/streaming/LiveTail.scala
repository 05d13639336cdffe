package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.logql.{EvalParams, LogQLCompiler, LogQLParser, LogQLPredicates}
import graft.logql.LogQLAst._

/** Live tail (`/loki/api/v1/tail`): the reference re-runs the transpiled
  * query every poll second over `(last_ts, now]` with a cursor
  * (`reader/service/query_range.go:670-800`). In Spark the SAME selector +
  * filter predicates apply to a STREAMING DataFrame — the micro-batch
  * trigger is the poll loop, the checkpoint offset is the cursor, and no
  * re-transpilation happens per tick.
  *
  * The full log-pipeline stage set is supported, exactly as in the
  * reference (which tails whatever the transpiler produced — parsers,
  * formats, drop/keep included): every stage compiles to narrow
  * per-row expressions (`LogQLCompiler.applyStage` — withColumn/filter
  * only, no shuffle), so the streaming micro-batch plan stays stateless
  * and tail latency stays flat.
  */
object LiveTail {

  def apply(stream: DataFrame, query: String): DataFrame =
    LogQLParser.parseOrThrow(query) match {
      case LogExpr(sel, stages) =>
        // stage application is pure per-row Column logic — it never touches
        // the compiler's store dir or eval window, so a throwaway instance
        // bound to the stream's session reuses the exact batch expressions
        val stager = new LogQLCompiler(stream.sparkSession, "", EvalParams(0L, 0L, 1L))
        var df = stream
        for (m <- sel.matchers) df = df.filter(LogQLPredicates.matcherCond(m))
        stages.foreach { s => df = stager.applyStage(df, s) }
        df
      case other =>
        throw new IllegalArgumentException(s"tail needs a log query: $other")
    }
}
