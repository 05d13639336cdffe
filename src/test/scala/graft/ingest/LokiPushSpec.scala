package graft.ingest

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LokiPushSpec extends SparkSpec {

  test("decodes a multi-stream push body with escapes and ns timestamps") {
    import graft.TestSpark.spark.implicits._
    val body =
      """{"streams":[
        |  {"stream":{"job":"api","env":"prod"},
        |   "values":[["1704067200000000001","line \"one\" with quotes"],
        |             ["1704067200000000002","tab\there"]]},
        |  {"stream":{"job":"db"},
        |   "values":[["1704067200000000003","{\"k\": 7}"]]}
        |]}""".stripMargin
    val (series, samples) = LokiPush.decode(Seq(body).toDF("body"))
    assert(series.count() == 2)
    assert(samples.count() == 3)
    val rows = LokiPush.decodeRows(Seq(body).toDF("body"))
      .orderBy("timestamp_ns").collect()
    assert(rows(0).getAs[Long]("timestamp_ns") == 1704067200000000001L)
    assert(rows(0).getAs[String]("line") == "line \"one\" with quotes")
    assert(rows(1).getAs[String]("line") == "tab\there")
    assert(rows(2).getAs[Map[String, String]]("labels") == Map("job" -> "db"))
  }

  test("legacy spellings: labels string, entries, RFC3339 ts, metric values") {
    import graft.TestSpark.spark.implicits._
    val body =
      """{"streams":[
        |  {"labels":"{job=\"api\", env=\"pr\\\"od\"}",
        |   "entries":[{"ts":"2024-01-01T00:00:00Z","line":"legacy"},
        |              {"timestamp":"1704067200000000005","line":"l2","value":1.5}]},
        |  {"stream":{"job":"push-metrics","bad key":"v"},
        |   "values":[["1704067200000000007","", 2.5],
        |             ["1704067200000000008","plain line"]]}
        |]}""".stripMargin
    val rows = LokiPush.decodeRows(Seq(body).toDF("body"))
      .orderBy("timestamp_ns").collect()
    assert(rows.length == 4)
    // labels-string form parses, escapes unescape; RFC3339 ts → ns
    assert(rows(0).getAs[Map[String, String]]("labels") ==
      Map("job" -> "api", "env" -> "pr\"od"))
    assert(rows(0).getAs[Long]("timestamp_ns") == 1704067200000000000L)
    assert(rows(0).getAs[String]("sample_type") == "log")
    // entry carrying both line and value → "both" (tp bits 3 → 0)
    assert(rows(1).getAs[String]("sample_type") == "both")
    assert(rows(1).getAs[Double]("value") == 1.5)
    // a value tuple's third numeric element is qryn's metric-via-push;
    // the second element always sets the LOG bit too
    assert(rows(2).getAs[Double]("value") == 2.5)
    assert(rows(2).getAs[String]("sample_type") == "both")
    assert(rows(3).getAs[String]("sample_type") == "log")
    // stream keys sanitize
    assert(rows(3).getAs[Map[String, String]]("labels") ==
      Map("job" -> "push-metrics", "bad_key" -> "v"))
  }

  test("duplicate names in a legacy label string dedupe last-wins") {
    import graft.TestSpark.spark.implicits._
    val body =
      """{"streams":[{"labels":"{job=\"a\", job=\"b\"}",
        |"entries":[{"ts":"1","line":"x"}]}]}""".stripMargin
    val rows = LokiPush.decodeRows(Seq(body).toDF("body")).collect()
    assert(rows(0).getAs[Map[String, String]]("labels") == Map("job" -> "b"))
  }

  test("RFC3339 entry timestamps keep nanosecond precision; values path is integer-only") {
    import graft.TestSpark.spark.implicits._
    val body =
      """{"streams":[
        |  {"stream":{"job":"t"},
        |   "entries":[{"ts":"2024-01-01T00:00:00.123456789Z","line":"ns"}],
        |   "values":[["2024-01-01T00:00:00Z","rfc-in-values"]]}
        |]}""".stripMargin
    val rows = LokiPush.decodeRows(Seq(body).toDF("body"))
      .select("line", "timestamp_ns").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    // parseTime keeps full UnixNano (sub-µs digits re-added)
    assert(rows("ns").contains(1704067200123456789L))
    // the values-tuple path is strconv.ParseInt only — RFC3339 errors there
    assert(rows("rfc-in-values").isEmpty)
  }

  test("encode → decode is lossless on the canonical frame") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.select(
      col("fingerprint"), col("timestamp_ns"), col("line"),
      to_json(map_from_entries(array_sort(map_entries(col("labels"))))).as("lbl"))
    val logs = canon(graft.model.Tables.logs(spark, sf))
    val rt = canon(LokiPush.decodeRows(LokiPush.encode(
      graft.model.Tables.logs(spark, sf))))
    assert(rt.count() == logs.count())
    // exact multiset equality via anti-joins both ways on all columns
    val a = logs.exceptAll(rt).count()
    val b = rt.exceptAll(logs).count()
    assert(a == 0 && b == 0)
  }
}
