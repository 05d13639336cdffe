package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-gate entry: a named Spark query over the testdata dir plus
  * (optionally) the equivalent DuckDB SQL the driver's oracle executes.
  * Numeric outputs are DOUBLE and rounded to 6 decimals on BOTH sides;
  * every query is fully ordered so row order can never flip a hash.
  */
final case class Gate(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait GateSet {
  def gates: Seq[Gate]
}

/** Shared evaluation constants for the observability gates: the testdata
  * spans 2024-01-01..2024-01-31 at every SF; we evaluate over the whole
  * span at a 6h step.
  */
object EvalWindow {
  val StartS = 1704067200L // 2024-01-01T00:00:00Z
  val EndS = 1706659200L   // 2024-01-31T00:00:00Z
  val StepS = 21600L       // 6h
  val StartNs: Long = StartS * 1000000000L
  val EndNs: Long = EndS * 1000000000L
}
