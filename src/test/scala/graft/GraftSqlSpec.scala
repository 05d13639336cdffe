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

  test("all native expressions are callable from SQL") {
    Graft.registerFunctions(spark)
    val cs = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d))")
      .collect()(0).getDouble(0)
    assert(math.abs(cs - 1.0) < 1e-12)
    val mu = spark.sql(
      "SELECT to_json(map_update(map('a','1','b','2'), map('b','9')))")
      .collect()(0).getString(0)
    assert(mu == """{"a":"1","b":"9"}""")
    val lw = spark.sql(
      "SELECT to_json(map_entries_last_wins(array(map('a','1'), map('a','2'))))")
      .collect()(0).getString(0)
    assert(lw == """{"a":"2"}""")
    val fa = spark.sql(
      "SELECT to_json(map_from_arrays_last_wins(array('k','k'), array('1','2')))")
      .collect()(0).getString(0)
    assert(fa == """{"k":"2"}""")
    val ct = spark.sql(
      "SELECT class_tokens(array('GET', '10.1.2.3', 'took', '45ms'))")
      .collect()(0).getSeq[String](0)
    assert(ct == Seq("GET", "<IP>", "took", "<N>ms"))
  }
}
