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
    * CALLER BEWARE: `keys` is captured inside the filter lambda and
    * re-evaluated per element — pass attribute refs or cheap expressions,
    * never a heavy transform tree (use [[entriesToMapLastWins]] there).
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

  /** Fold an array of SINGLE-ENTRY maps (`map(k, v)` per element) into one
    * last-wins map. Unlike [[fromArraysLastWins]] this captures NOTHING in
    * its lambdas (only the accumulator and element variables), so the
    * entry expressions — however expensive — are evaluated exactly once
    * per row. O(n²) in the entry count per row, which label/tag sets never
    * make large. (Single-entry maps instead of structs because struct
    * field aliases inside a transform lambda don't survive into a sibling
    * aggregate lambda's element type.)
    */
  def entriesToMapLastWins(entryMaps: Column): Column =
    aggregate(entryMaps,
      map().cast(org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType)),
      (acc, m) => map_concat(
        map_filter(acc, (k, _) => !map_contains_key(m, k)), m))
}
