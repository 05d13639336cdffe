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

  /** `mapUpdate(base, over)`: merge with `over` winning on key clashes. */
  def update(base: Column, over: Column): Column =
    map_concat(map_filter(base, (k, _) => !map_contains_key(over, k)), over)

  /** Build a map from parallel key/value arrays keeping the LAST
    * occurrence of each duplicated key (Go map-assignment order — a
    * logfmt line `a=1 a=2` yields a=2). `map_from_arrays` would throw.
    */
  def fromArraysLastWins(keys: Column, vals: Column): Column = {
    val n = size(keys)
    val keep = filter(sequence(lit(1), n), i =>
      !array_contains(slice(keys, i + 1, n), element_at(keys, i)))
    when(n > 0, map_from_arrays(
      transform(keep, i => element_at(keys, i)),
      transform(keep, i => element_at(vals, i))))
      .otherwise(map_from_arrays(keys, vals))
  }
}
