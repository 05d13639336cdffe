package graft.ingest

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Influx line-protocol decode semantics (`influx.go:15-112`):
  * measurement label, message→log branch with logfmt join, sanitized
  * metric names, escape handling.
  */
class InfluxSpec extends SparkSpec {

  private def decode(lines: String*): Seq[Row] = {
    val s = spark
    import s.implicits._
    WireFormats.decodeInflux(lines.toDF("line"))
      .select(col("name"), col("labels"), col("timestamp_ns"),
        col("value"), col("line"), col("sample_type"))
      .collect().toSeq
  }

  test("metric fields: one sample per numeric field, sanitized field name") {
    val rows = decode("""cpu,host=a,dc=us-1 usage=0.5,count=3i,2xx=7i,skip="s" 1000""")
    assert(rows.length == 3)
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName.keySet == Set("usage", "count", "_xx")) // 2xx → _xx
    val usage = byName("usage")
    val labels = usage.getMap[String, String](1)
    assert(labels("measurement") == "cpu")
    assert(labels("host") == "a")
    assert(labels("dc") == "us-1")
    assert(labels("__name__") == "usage")
    assert(usage.getLong(2) == 1000L)
    assert(usage.getDouble(3) == 0.5)
    assert(usage.getString(5) == "metric")
    assert(byName("count").getDouble(3) == 3.0)
  }

  test("message as only field: raw passthrough log entry") {
    val rows = decode("""app,env=prod message="hello, world = \"x\"" 42""")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.isNullAt(0)) // no metric name
    assert(r.getString(5) == "log")
    assert(r.getString(4) == """hello, world = "x"""")
    assert(r.getDouble(3) == 0.0)
    assert(r.getMap[String, String](1)("measurement") == "app")
  }

  test("message + other fields: logfmt join, message first, line order") {
    val rows = decode(
      """app message="disk full",level="warn",code=507i,ratio=0.5,up=true 7""")
    assert(rows.length == 1)
    assert(rows.head.getString(4) ==
      """message="disk full" level=warn code=507 ratio=0.5 up=true""")
  }

  test("tag key sanitization and 100-char value truncation") {
    val long = "v" * 120
    val rows = decode(s"""m,bad-key.x=$long n=1i""")
    val labels = rows.head.getMap[String, String](1)
    assert(labels("bad_key_x") == "v" * 100 + "...")
  }

  test("escaped separators in measurement and tags") {
    val rows = decode("""my\ db,tag\,1=a\=b n=2i 5""")
    val labels = rows.head.getMap[String, String](1)
    assert(labels("measurement") == "my db")
    assert(labels("tag_1") == "a=b") // `tag,1` key sanitized, value unescaped
  }

  test("strings and bools are skipped by the metric branch") {
    val rows = decode("""m s="x",b=true,f=1.5 9""")
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "f")
  }
}
