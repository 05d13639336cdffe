package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native merges must be BIT-compatible with the HOF forms they
  * replaced — including entry order, observable through to_json.
  */
class MapMergeSpec extends SparkSpec {

  private def hofUpdate(base: org.apache.spark.sql.Column,
      over: org.apache.spark.sql.Column) =
    map_concat(map_filter(base, (k, _) => !map_contains_key(over, k)), over)

  test("update equals the HOF form, including entry order") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (Map("a" -> "1", "b" -> "2", "c" -> "3"), Map("b" -> "9", "d" -> "4")),
      (Map("x" -> "1"), Map[String, String]()),
      (Map[String, String](), Map("k" -> "v"))
    ).toDF("base", "over")
    val got = df.select(to_json(MapMerge.update(col("base"), col("over"))))
      .as[String].collect()
    val want = df.select(to_json(hofUpdate(col("base"), col("over"))))
      .as[String].collect()
    assert(got.sameElements(want))
    // clashing key moved to the end, over's value wins
    assert(got(0) == """{"a":"1","c":"3","b":"9","d":"4"}""")
  }

  test("update: null on either side is null; interpreted path matches codegen") {
    val sp = spark; import sp.implicits._
    val df = Seq((Map("a" -> "1"), Option.empty[Map[String, String]])).toDF("base", "over")
    assert(df.select(MapMerge.update(col("base"), col("over"))).head.isNullAt(0))
    assert(df.select(MapMerge.update(col("over"), col("base"))).head.isNullAt(0))
    // force interpreted evaluation via filter on a non-codegen context
    val r = MapMergeUtil.update(
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        Array("a", "b").map(org.apache.spark.unsafe.types.UTF8String.fromString),
        Array("1", "2").map(org.apache.spark.unsafe.types.UTF8String.fromString)),
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        Array("a").map(org.apache.spark.unsafe.types.UTF8String.fromString),
        Array("9").map(org.apache.spark.unsafe.types.UTF8String.fromString)))
    assert(r.numElements() == 2)
  }

  test("entriesLastWins equals the aggregate-fold form on duplicated keys") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      Seq(Map("a" -> "1"), Map("b" -> "2"), Map("a" -> "3")),
      Seq.empty[Map[String, String]]
    ).toDF("ms")
    val hof = aggregate(col("ms"),
      map().cast(org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType)),
      (acc, m) => map_concat(
        map_filter(acc, (k, _) => !map_contains_key(m, k)), m))
    val got = df.select(to_json(MapMerge.entriesLastWins(col("ms"))))
      .as[String].collect()
    val want = df.select(to_json(hof)).as[String].collect()
    assert(got.sameElements(want))
    assert(got(0) == """{"b":"2","a":"3"}""")
  }

  test("fromArraysLastWins keeps the last occurrence at its last position") {
    val sp = spark; import sp.implicits._
    val df = Seq((Seq("a", "b", "a"), Seq("1", "2", "3"))).toDF("ks", "vs")
    val got = df.select(to_json(
      MapMerge.fromArraysLastWins(col("ks"), col("vs")))).as[String].head
    assert(got == """{"b":"2","a":"3"}""")
    val empty = Seq((Seq.empty[String], Seq.empty[String])).toDF("ks", "vs")
    assert(empty.select(size(map_keys(
      MapMerge.fromArraysLastWins(col("ks"), col("vs"))))).as[Int].head == 0)
  }
}
