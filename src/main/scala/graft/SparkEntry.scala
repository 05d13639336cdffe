package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gates.{Gate, GateSet}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Gate queries live in `graft.gates.*` grouped by query family; each runs
  * through the real parser/compiler stack and carries its DuckDB oracle.
  */
object SparkEntry {

  private def gateSets: Seq[GateSet] = Seq(
    gates.LogQLGates,
    gates.PromQLGates,
    gates.LlmGates,
    gates.TraceQLGates,
    gates.IngestGates,
    gates.ProfGates,
    gates.StreamingGates,
    gates.HttpGates)

  private lazy val allGates: Seq[Gate] = gateSets.flatMap(_.gates)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.logql.{EvalParams, LogQLCompiler}
    import graft.gates.EvalWindow._
    new LogQLCompiler(spark, "/root/testdata/sf0.001",
      EvalParams(StartNs, EndNs, StepS))
      .compile("""sum by (event_type) (rate({level=~"info|error"} |= "k" [6h]))""")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allGates.map(g => g.name -> g.query).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allGates.flatMap(g => g.oracle.map(g.name -> _)).toMap
}
