package graft.ingest

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PromRemoteWriteSpec extends SparkSpec {

  test("wire codec round trip on a handcrafted WriteRequest") {
    val series = Seq(
      (Map("__name__" -> "http_requests_total", "job" -> "api", "code" -> "200"),
        Seq((1704067200000L, 42.5), (1704067215000L, 43.0))),
      (Map("__name__" -> "up", "job" -> "db"),
        Seq((1704067200123L, 1.0))))
    val bytes = PromRemoteWrite.encodeWriteRequest(series)
    val parsed = PromRemoteWrite.parseWriteRequest(bytes)
    assert(parsed.size == 3)
    assert(parsed.head._1 == series.head._1)
    assert(parsed.head._2 == 1704067200000L && parsed.head._3 == 42.5)
    assert(parsed(2)._1 == Map("__name__" -> "up", "job" -> "db"))
    assert(parsed(2)._2 == 1704067200123L)
  }

  test("labels sanitize on decode: key regex + 100-char value truncation") {
    val longVal = "v" * 120
    val bytes = PromRemoteWrite.encodeWriteRequest(Seq(
      (Map("bad.key" -> "x", "9lead" -> "y", "ok" -> longVal),
        Seq((1704067200000L, 1.0)))))
    val parsed = PromRemoteWrite.parseWriteRequest(bytes)
    assert(parsed.head._1 == Map(
      "bad_key" -> "x", "_lead" -> "y", "ok" -> ("v" * 100 + "...")))
  }

  test("varint edge values survive (large timestamps, negative-bit doubles)") {
    val series = Seq((Map("a" -> "b"),
      Seq((Long.MaxValue / 2, -123.456), (0L, 0.0))))
    val parsed = PromRemoteWrite.parseWriteRequest(
      PromRemoteWrite.encodeWriteRequest(series))
    assert(parsed.map(p => (p._2, p._3)) ==
      Seq((Long.MaxValue / 2, -123.456), (0L, 0.0)))
  }

  test("DataFrame encode → decode preserves per-series sample sets") {
    val g = graft.model.Tables.gaugeSamples(spark, sf)
    val rt = PromRemoteWrite.decode(PromRemoteWrite.encode(g))
    assert(rt.count() == g.count())
    val a = g.groupBy(col("fingerprint")).agg(count(lit(1)).as("n"),
      round(sum(col("value")), 6).as("s"))
    val b = rt.groupBy(col("fingerprint")).agg(count(lit(1)).as("n"),
      round(sum(col("value")), 6).as("s"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
