package graft.ingest

import graft.SparkSpec

class PprofSpec extends SparkSpec {

  test("pprof wire codec round trip with shared and distinct stacks") {
    val rows = Seq(
      (Seq("main", "serve", "parse"), 100L),
      (Seq("main", "serve", "parse"), 50L),
      (Seq("main", "serve", "encode"), 25L),
      (Seq("main"), 7L))
    val parsed = Pprof.parseProfile(Pprof.encodeProfile(rows))
    assert(parsed == rows)
  }

  test("merge sums values per identical stack") {
    import graft.TestSpark.spark.implicits._
    val rows = Seq(
      (Seq("a", "b"), 10L), (Seq("a", "b"), 5L), (Seq("a", "c"), 1L))
    val df = rows.toDF("stack", "value")
    val merged = Pprof.merge(df).orderBy("stack").collect()
    assert(merged.length == 2)
    assert(merged(0).getAs[Long]("value") == 15L)
    assert(merged(0).getAs[Long]("samples") == 2L)
    assert(merged(1).getAs[Long]("value") == 1L)
  }

  test("varint boundaries: values needing 1, 2, and 5 bytes") {
    val rows = Seq((Seq("f"), 1L), (Seq("f", "g"), 300L), (Seq("h"), 1L << 33))
    assert(Pprof.parseProfile(Pprof.encodeProfile(rows)) == rows)
  }
}
