package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Label-map merge semantics shared by the compilers and decoders.
  *
  * The reference merges label maps with ClickHouse `mapUpdate(m1, m2)`
  * (`clickhouse_planner/sql_misc.go:41-51`, used by the json/regexp
  * parsers and label_format): keys of m2 OVERWRITE keys of m1. Spark's
  * `map_concat` instead throws DUPLICATED_MAP_KEY under the default
  * dedup policy, so every label merge goes through [[update]] — explicit
  * last-wins, independent of the session's `spark.sql.mapKeyDedupPolicy`.
  */
object MapOps {

  /** `mapUpdate(base, over)`: merge with `over` winning on key clashes.
    * Native codegen'd single pass (graft.functions.MapUpdate); the HOF
    * form `map_concat(map_filter(base, !contains(over)), over)` ran
    * interpreted and the decoders chain 3-4 merges per row. Entry-order
    * semantics are identical (clashing keys move to the end).
    */
  def update(base: Column, over: Column): Column =
    graft.functions.MapMerge.update(base, over)

  /** Build a map from parallel key/value arrays keeping the LAST
    * occurrence of each duplicated key (Go map-assignment order — a
    * logfmt line `a=1 a=2` yields a=2). `map_from_arrays` would throw.
    */
  def fromArraysLastWins(keys: Column, vals: Column): Column =
    graft.functions.MapMerge.fromArraysLastWins(keys, vals)

  /** Fold an array of maps (typically single-entry `map(k, v)` per
    * element) into one last-wins map, in one native pass.
    */
  def entriesToMapLastWins(entryMaps: Column): Column =
    graft.functions.MapMerge.entriesLastWins(entryMaps)
}
