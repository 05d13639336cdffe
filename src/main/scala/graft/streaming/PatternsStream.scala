package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.patterns.Patterns

/** Streaming pattern mining: the batch miner inside `foreachBatch`, folding
  * each micro-batch's mined patterns into a persistent state table via the
  * associative cross-batch merge (`Patterns.mergeMined`) — the streaming
  * form of `writer/pattern/clustering/pattern.go:70-501`, whose in-memory
  * per-stream tree is replaced by a re-mergeable pattern table keyed by
  * (stream, token count, head). Because the merge is associative (gated by
  * `streaming_patterns_merge`), any micro-batch boundary yields the same
  * state as one-shot mining.
  *
  * State-table filesystem ops go through the Hadoop FileSystem for the
  * state path's URI (like the store's maintenance walks), so the
  * foreachBatch state lives on HDFS/S3 in a cluster deployment exactly as
  * on local disk.
  */
object PatternsStream {

  /** Fold one micro-batch of (stream, line) into the state table at
    * `statePath` — the `foreachBatch(foldBatch(_, path, id))` body. Reads
    * the prior state (if any), merges, and atomically replaces it.
    * Idempotent per batchId: foreachBatch re-delivers a batch after a
    * failure, and re-folding the same lines would double every count — a
    * done-marker makes the replay a no-op (the standard foreachBatch
    * exactly-once recipe).
    */
  def foldBatch(batch: DataFrame, statePath: String,
      batchId: Long = -1L): Unit = {
    val (fs, state) = graft.store.Store.fsFor(statePath)
    val marker = new Path(statePath + s".done-$batchId")
    if (batchId >= 0 && fs.exists(marker)) return
    val spark = batch.sparkSession
    val mined = Patterns.mineLines(batch)
    val prior = readState(spark, statePath)
    val merged = prior.fold(mined)(p =>
      Patterns.mergeMined(p.unionByName(mined)))
    // state tables are small (unique patterns); write-new-then-swap keeps
    // the replace atomic for readers of the previous version
    val tmp = new Path(statePath + ".next")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(state, true): Unit
    if (!fs.rename(tmp, state))
      throw new java.io.IOException(s"state swap failed: $tmp -> $state")
    if (batchId >= 0) fs.create(marker, false).close()
  }

  def readState(spark: SparkSession, statePath: String): Option[DataFrame] = {
    val (fs, state) = graft.store.Store.fsFor(statePath)
    if (fs.exists(new Path(state, "_SUCCESS")))
      Some(spark.read.parquet(statePath))
    else None
  }
}
