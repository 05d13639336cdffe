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

  test("native InfluxParse equals the composed-HOF spec forms") {
    val s = spark
    import s.implicits._
    val fieldCases = Seq(
      """usage=0.5,count=3i,unsigned=7u,skip="s"""",
      """message="hello, \"world\" = ok",lvl="x y"""",
      """big=1e21,small=0.00005,edge=0.0001,mid=2.5,neg=-2.5e-7,ovf=1e309""",
      """b1=t,b2=TRUE,b3=False,b4=f,bare=xyz,empty=,dup=1,dup=2""",
      """esc\ key=1,9bad=2,k-2=3,unterm="abc""",
      """f1=.5,f2=3.,f3=-0.0,f4=1e-4,f5=123456789012345678901""",
      "", "   ", "novalue", "=nokey")
    val tagCases = Seq(
      "host=a,dc=us-1", "h\\ ost=a\\,b,empty=,9bad=x,dup=1,dup=2",
      "long=" + ("x" * 150), "", "k=v=w")
    val fdf = fieldCases.toDF("fs")
    val fboth = fdf.select(
      to_json(graft.functions.InfluxParse.fields(col("fs"))).as("n"),
      to_json(WireFormats.influxFieldsSpec(col("fs"))).as("s")).collect()
    fboth.zip(fieldCases).foreach { case (r, c) =>
      assert(r.getString(0) == r.getString(1), s"fields[$c]: $r") }
    val tdf = tagCases.toDF("ts")
    val tboth = tdf.select(
      to_json(graft.functions.InfluxParse.tags(col("ts"))).as("n"),
      to_json(WireFormats.influxTagsSpec(col("ts"))).as("s")).collect()
    tboth.zip(tagCases).foreach { case (r, c) =>
      assert(r.getString(0) == r.getString(1), s"tags[$c]: $r") }
    // (real testdata-derived lines are covered end-to-end by the two
    // oracle-gated influx roundtrips, which run the native parse)
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
