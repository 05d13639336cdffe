package graft.streaming

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
    val marker = new java.io.File(statePath + s".done-$batchId")
    if (batchId >= 0 && marker.exists()) return
    val spark = batch.sparkSession
    val mined = Patterns.mineLines(batch)
    val prior = readState(spark, statePath)
    val merged = prior.fold(mined)(p =>
      Patterns.mergeMined(p.unionByName(mined)))
    // state tables are small (unique patterns); write-new-then-swap keeps
    // the replace atomic for readers of the previous version
    val tmp = statePath + ".next"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    rmrf(new java.io.File(statePath))
    if (!new java.io.File(tmp).renameTo(new java.io.File(statePath)))
      throw new java.io.IOException(s"state swap failed: $tmp -> $statePath")
    if (batchId >= 0) marker.createNewFile(): Unit
  }

  def readState(spark: SparkSession, statePath: String): Option[DataFrame] =
    if (new java.io.File(statePath, "_SUCCESS").exists())
      Some(spark.read.parquet(statePath))
    else None

  private def rmrf(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rmrf)
    f.delete(): Unit
  }
}
