package graft

import org.apache.spark.sql.functions._

class GraftSqlSpec extends SparkSpec {

  test("registered views answer plain spark.sql queries") {
    Graft.registerViews(spark, sf)
    val n = spark.sql(
      """SELECT labels['event_type'] AS et, count(*) AS c
        |FROM logs GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(n.length == 5)
    val spansPerTrace = spark.sql(
      "SELECT count(*) / count(DISTINCT trace_id) FROM spans")
      .collect()(0).getDouble(0)
    assert(spansPerTrace > 5 && spansPerTrace <= 10)
  }

  test("native regexp_all_groups is callable from SQL") {
    Graft.registerFunctions(spark)
    val row = spark.sql(
      """SELECT regexp_all_groups('code=7 op=get', 'code=([0-9]+) op=(\\w+)') AS g""")
      .collect()(0).getSeq[String](0)
    assert(row == Seq("7", "get"))
  }
}
