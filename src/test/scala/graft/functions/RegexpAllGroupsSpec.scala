package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RegexpAllGroupsSpec extends SparkSpec {

  test("single pass returns all groups; miss yields empty strings") {
    import graft.TestSpark.spark.implicits._
    val df = Seq("code=404 path=/api dur=12ms", "malformed").toDF("line")
    val out = df.select(RegexpAllGroups(col("line"),
        "code=([0-9]+) path=(\\S+) dur=([0-9]+)ms").as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("404", "/api", "12"))
    assert(out(1) == Seq("", "", ""))
  }

  test("codegen and interpreted eval agree") {
    import graft.TestSpark.spark.implicits._
    val df = (1 to 100).map(i => s"v=$i k=${i * 2}").toDF("line")
    val viaExpr = df.select(RegexpAllGroups(col("line"), "v=([0-9]+) k=([0-9]+)").as("g"))
      .select(element_at(col("g"), 1).cast("int").as("v"),
        element_at(col("g"), 2).cast("int").as("k"))
    assert(viaExpr.filter(col("k") =!= col("v") * 2).count() == 0)
    assert(viaExpr.count() == 100)
  }

  test("optional group that does not participate is empty not null") {
    import graft.TestSpark.spark.implicits._
    val df = Seq("ab").toDF("line")
    val out = df.select(RegexpAllGroups(col("line"), "(a)(x)?(b)").as("g"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("a", "", "b"))
  }
}
