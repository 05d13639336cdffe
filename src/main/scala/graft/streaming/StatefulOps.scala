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

  /** Production state-store provider: at 100 TB of stream history the
    * dedup state (one long per distinct content hash) must live off-heap
    * in RocksDB, not in the in-memory HDFS-backed default provider.
    * Provider choice is pure config — the operator logic is identical,
    * which StreamingSpec asserts by running the same two-batch stream
    * under both providers.
    */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the given state-store provider set, restoring the
    * previous setting after (the provider is read at stream START, so the
    * query must be started AND terminated inside `body`).
    */
  def withStateProvider[T](spark: org.apache.spark.sql.SparkSession,
      provider: String)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, provider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Streaming STATE partition count — a persistence-layout knob, not a
    * parallelism setting: Spark freezes a stateful query's state
    * partitioning into its first checkpoint (it cannot change across
    * restarts without a state rebuild), so production deployments pin it
    * deliberately per query, sized to state VOLUME. Inheriting whatever
    * `spark.sql.shuffle.partitions` the launching session happened to
    * carry is wrong in both directions: a core-count-sized value pays one
    * state-store instance + commit + (RocksDB) native-handle open per
    * partition per micro-batch — measured 20× the micro-batch's actual
    * work on a bounded stream — and would silently change with executor
    * count. Default 8 (the `dictShards` precedent: same layout-vs-
    * parallelism distinction); raise `spark.graft.stream.statePartitions`
    * for TB-scale state. Upstream micro-batch stages (scan, filter,
    * hash) still parallelize by core count regardless of this value.
    */
  def statePartitions(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("spark.graft.stream.statePartitions")
      .map(_.toInt).getOrElse(8)

  /** Run `body` (which must start AND terminate a stateful stream) with
    * shuffle partitions pinned to [[statePartitions]], restoring after —
    * the stream start is the one moment the setting becomes the query's
    * permanent state layout.
    */
  def withStatePartitions[T](spark: org.apache.spark.sql.SparkSession)
      (body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, statePartitions(spark).toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  final case class KV(k: String, ts: Long, v: Double)
  final case class MaxState(mx: Double)
  final case class Breach(k: String, ts: Long, v: Double, prevMax: Double)

  final case class DocHash(doc_id: Long, h: String)
  final case class CanonState(canonical: Long)
  final case class DedupDecision(doc_id: Long, canonical_id: Long, is_dup: Long)

  /** Dedup-on-ingest: the streaming form of [[graft.llm.Dedup.exactDedup]].
    * Keyed by the normalized-text hash, the group state remembers the
    * FIRST-ARRIVED doc per hash across the whole stream history (the
    * production contract: the copy already ingested is the one kept);
    * within a micro-batch, ties resolve to the smallest doc_id, so a
    * single-batch replay of a static table reproduces the batch
    * operator's min-doc_id canonical exactly — that equivalence is the
    * streaming_exact_dedup oracle gate, and cross-batch first-arrival
    * is pinned in StreamingSpec with a two-batch MemoryStream.
    *
    * Scale shape: state is ONE long per distinct document hash, hash-
    * partitioned by the state store; each micro-batch shuffles only its
    * own rows.
    */
  def streamingExactDedup(ds: Dataset[DocHash]): Dataset[DedupDecision] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.h)
      .flatMapGroupsWithState[CanonState, DedupDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[DocHash], state: GroupState[CanonState]) =>
          val sorted = rows.toSeq.sortBy(_.doc_id)
          var canon = state.getOption.map(_.canonical).getOrElse(-1L)
          val out = Seq.newBuilder[DedupDecision]
          for (r <- sorted) {
            if (canon < 0) canon = r.doc_id
            out += DedupDecision(r.doc_id, canon,
              if (r.doc_id == canon) 0L else 1L)
          }
          if (canon >= 0) state.update(CanonState(canon))
          out.result().iterator
      }
  }

  final case class AlertEval(series: String, ts: Long, value: Double)
  final case class AlertCursor(activeSince: Long, lastTs: Long)
  final case class AlertRow(series: String, ts: Long, value: Double,
      active_since: Long, state: String)

  /** Streaming form of [[graft.streaming.Ruler.alertStates]]: the
    * pending → firing state machine run INCREMENTALLY — the group state
    * is the per-series episode cursor (active_since, last active tick),
    * so episodes survive micro-batch boundaries and the output is
    * split-invariant (asserted in StreamingSpec with a mid-episode batch
    * split; single-batch parity with the batch operator is the
    * streaming_alert_states oracle gate).
    *
    * Contract: evaluation points arrive in event-time order ACROSS
    * batches per series (a ruler evaluates ticks in order); within a
    * batch they sort. A point continues its episode iff it lands exactly
    * one `stepS` after the last active tick; anything else starts a new
    * episode (the gap reset).
    *
    * Scale shape: state is two longs per ACTIVE series, hash-partitioned
    * by the state store (RocksDB in production, like the dedup state);
    * each micro-batch shuffles only its own evaluation rows.
    */
  def streamingAlertStates(ds: Dataset[AlertEval], stepS: Long,
      forS: Long): Dataset[AlertRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.series)
      .flatMapGroupsWithState[AlertCursor, AlertRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: String, rows: Iterator[AlertEval], state: GroupState[AlertCursor]) =>
          val sorted = rows.toSeq.sortBy(_.ts)
          var cur = state.getOption.getOrElse(AlertCursor(-1L, Long.MinValue))
          val out = Seq.newBuilder[AlertRow]
          for (r <- sorted) {
            val since =
              if (cur.lastTs != Long.MinValue && r.ts == cur.lastTs + stepS)
                cur.activeSince
              else r.ts
            cur = AlertCursor(since, r.ts)
            out += AlertRow(k, r.ts, r.value, since,
              if (r.ts - since >= forS) "firing" else "pending")
          }
          if (cur.lastTs != Long.MinValue) state.update(cur)
          out.result().iterator
      }
  }

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
