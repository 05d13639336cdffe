package graft

/** Mirror of the driver's t1 smoke: the flagship entry must return rows at
  * sf0.001 — a broken store/logs derivation would otherwise only surface
  * in the driver's own run.
  */
class EntrySmokeSpec extends SparkSpec {

  test("SparkEntry.entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a unique name; every oracle key has a query") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.size == names.distinct.size)
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracle without query: $orphan")
  }
}
