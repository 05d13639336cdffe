package graft.patterns

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PatternsSpec extends SparkSpec {

  test("numeric tokens mask to <N>, varying positions generalize to <_>") {
    import graft.TestSpark.spark.implicits._
    val lines = Seq(
      ("api", "GET /api/user/123 took 45ms"),
      ("api", "GET /api/user/999 took 12ms"),
      ("api", "GET /api/order/7 took 9ms"),
      ("db", "connection pool exhausted")).toDF("stream", "line")
    val out = Patterns.mineLines(lines).orderBy("stream", "pattern").collect()
    assert(out.length == 2)
    val api = out(0)
    // user/order differ → <_>; numbers → <N> (inside the path token too)
    assert(api.getAs[String]("pattern") == "GET <_> took <N>ms")
    assert(api.getAs[Long]("samples_count") == 3L)
    assert(out(1).getAs[String]("pattern") == "connection pool exhausted")
  }

  test("distinct token counts split clusters by length and head") {
    import graft.TestSpark.spark.implicits._
    val lines = Seq(
      ("s", "a b c"), ("s", "a b d"), ("s", "a b"), ("s", "x y z"))
      .toDF("stream", "line")
    val out = Patterns.mineLines(lines).orderBy("pattern").collect()
    // clusters: (3,"a"): "a b <_>" x2 ; (2,"a"): "a b" ; (3,"x"): "x y z"
    assert(out.map(_.getAs[String]("pattern")).toSeq ==
      Seq("a b", "a b <_>", "x y z"))
    assert(out.map(_.getAs[Long]("samples_count")).toSeq == Seq(1L, 2L, 1L))
  }
}
