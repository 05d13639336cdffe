package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.logql.{EvalParams, LogQLCompiler, LogQLParser}

/** Recording rules (ruler): periodically evaluate a LogQL metric query and
  * WRITE the result back as new metric samples
  * (`ruler/manager.go:43-250`, `ruler/logql_evaluator.go:44`,
  * `ruler/writeback.go`). Each evaluation is one batch append — in
  * production a scheduled job (or `foreachBatch` on the ingest stream);
  * the recorded series gets the rule name as its `__name__`.
  */
object Ruler {

  def recordedPath(dir: String): String =
    graft.store.Store.storeRoot + "/" +
      dir.replaceAll("[^a-zA-Z0-9.]+", "_") + "/recorded"

  /** Evaluate `query` over the window and append the result as samples of
    * metric `ruleName`. Returns the number of samples written.
    */
  def record(spark: SparkSession, dir: String, ruleName: String,
      query: String, params: EvalParams): Long = {
    val df = new LogQLCompiler(spark, dir, params)
      .compileMetric(LogQLParser.parseOrThrow(query))
      .select(
        graft.model.MapOps.update(col("labels"),
          map(lit("__name__"), lit(ruleName))).as("labels"),
        (col("ts") * 1000000000L).as("timestamp_ns"),
        col("value"))
      .withColumn("fingerprint", graft.model.Tables.fingerprintOf(col("labels")))
    val out = df.cache()
    val n = out.count()
    out.write.mode(SaveMode.Append).parquet(recordedPath(dir))
    out.unpersist()
    n
  }

  def recorded(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(recordedPath(dir))
}
