package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state via flatMapGroupsWithState — the
  * primitive behind live alerting / high-water-mark tracking (the
  * reference's alerting re-runs its query per tick and diffs against a
  * stored cursor; here the cursor IS the group state and survives across
  * micro-batches in the state store).
  */
object StatefulOps {

  final case class KV(k: String, ts: Long, v: Double)
  final case class MaxState(mx: Double)
  final case class Breach(k: String, ts: Long, v: Double, prevMax: Double)

  /** Emit a row whenever a key's value strictly exceeds its running max
    * over the WHOLE stream history (not just the current batch). Rows
    * within a batch are processed in (ts, v) order so replays are
    * deterministic.
    */
  def breaches(ds: Dataset[KV]): Dataset[Breach] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.k)
      .flatMapGroupsWithState[MaxState, Breach](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: String, rows: Iterator[KV], state: GroupState[MaxState]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts, r.v))
          var mx = state.getOption.map(_.mx).getOrElse(Double.NegativeInfinity)
          val out = Seq.newBuilder[Breach]
          for (r <- sorted) if (r.v > mx) {
            out += Breach(k, r.ts, r.v, mx)
            mx = r.v
          }
          state.update(MaxState(mx))
          out.result().iterator
      }
  }
}
