package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps.mdhash64

/** Deterministic sampling operators for training-data pipelines.
  *
  * Everything here is HASH-based, never `rand()`: a sample must be stable
  * across reruns, executor counts, and partition layouts, or downstream
  * dedup/eval splits silently drift between pipeline runs. The md5-derived
  * hash is the same one the MinHash/SimHash family uses, so the DuckDB
  * oracle replays every selection bit-for-bit.
  *
  * Scale shape: each sampler is a narrow filter (no shuffle) except
  * [[topNPerStratum]], which shuffles once on the stratum key.
  */
object Sampling {

  private val M = 1000000L

  private def bucket(key: Column, salt: String): Column =
    pmod(mdhash64(concat(lit(salt), key.cast("string"))), lit(M))

  /** Keep ~`fraction` of rows, chosen by key hash: deterministic, uniform,
    * and consistent — the sample at fraction f is a SUBSET of the sample
    * at f' > f (same hash, higher cutoff), which makes nested train /
    * validation carve-outs free.
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
      salt: String = "smp:"): DataFrame =
    df.filter(bucket(key, salt) < (fraction * M).toLong)

  /** Per-stratum keep fractions (training-mix rebalancing): strata not in
    * the map fall back to `default`. One narrow filter, no shuffle — the
    * per-row fraction is a CASE chain over the stratum column.
    */
  def stratifiedSample(df: DataFrame, stratum: Column,
      fractions: Map[String, Double], default: Double = 0.0,
      key: Column, salt: String = "smp:"): DataFrame = {
    val frac = fractions.foldLeft(lit((default * M).toLong)) {
      case (acc, (s, f)) => when(stratum === s, lit((f * M).toLong)).otherwise(acc)
    }
    df.filter(bucket(key, salt) < frac)
  }

  /** Exactly-N-per-stratum sample: rank rows within each stratum by
    * (hash, key) and keep the first n — a deterministic "reservoir" that
    * needs no driver state. One shuffle on the stratum key; a skewed
    * giant stratum ranks inside one partition, so for heavy-tailed strata
    * pre-thin with [[hashSample]] at ~n/|stratum| first (the hash-subset
    * property keeps the final pick identical).
    */
  def topNPerStratum(df: DataFrame, stratum: Column, n: Int,
      key: Column, salt: String = "smp:"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(bucket(key, salt), key)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n).drop("__rk")
  }
}
