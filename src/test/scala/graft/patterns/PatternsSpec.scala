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
    // path tokens CLASS to <PATH> (lexer classes beat per-position
    // generalization — all three collapse); numbers → <N>
    assert(api.getAs[String]("pattern") == "GET <PATH> took <N>ms")
    assert(api.getAs[Long]("samples_count") == 3L)
    assert(out(1).getAs[String]("pattern") == "connection pool exhausted")
  }

  test("lexer token classes mask UUID/IP/timestamp/hex/path") {
    import graft.TestSpark.spark.implicits._
    val lines = Seq(
      ("s", "id=1 550e8400-e29b-41d4-a716-446655440000 10.1.2.3:8080 2024-01-02T03:04:05Z deadbeefcafe /v1/users/42 ok"),
      ("s", "id=2 6ba7b810-9dad-11d1-80b4-00c04fd430c8 192.168.0.1 2023-12-31 c0ffee00c0ffee /v1/orders/7 ok"))
      .toDF("stream", "line")
    val out = Patterns.mineLines(lines).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("pattern") ==
      "id=<N> <UUID> <IP> <TS> <HEX> <PATH> ok")
  }

  test("lexer classes: level/method/code/version literal, PID/priority/CLF-ts masked") {
    import graft.TestSpark.spark.implicits._
    val lines = Seq(
      ("web", """10.0.3.7 - - [06/Jan/2024:15:04:05 +0000] GET /api/users HTTP/1.1 200 1234"""),
      ("web", """10.0.9.7 - - [07/Jan/2024:16:05:06 +0000] GET /api/users HTTP/1.1 200 987"""),
      ("sys", """<34> Jan 23 14:59:01 host1 sshd[4321]: ERROR auth fail"""),
      ("sys", """<34> Jan 24 09:01:02 host2 sshd[9876]: ERROR auth fail"""))
      .toDF("stream", "line")
    val out = Patterns.mineLines(lines).orderBy("stream").collect()
    assert(out.length == 2)
    // valuable classes (method, version, code) keep literals; low-cost
    // classes (IP, CLF timestamp halves, byte count) mask
    assert(out.find(_.getString(0) == "web").get.getString(1) ==
      "<IP> - - <TS> <TS> GET <PATH> HTTP/1.1 200 <N>")
    // priority + BSD-ts + prog[pid]: masking; hostN digit-masks; level kept
    assert(out.find(_.getString(0) == "sys").get.getString(1) ==
      "<PRI> Jan <N> <TS> host<N> sshd[<PID>]: ERROR auth fail")
  }

  test("HTTP code quirk: 3-char numbers starting 0-5 keep literals (incl 0.5)") {
    import graft.TestSpark.spark.implicits._
    val lines = Seq(
      ("s", "code 200 ratio 0.5 big 900 tiny 42"),
      ("s", "code 200 ratio 0.5 big 901 tiny 7")).toDF("stream", "line")
    val out = Patterns.mineLines(lines).collect()
    // 200 and 0.5 are HTTPCode-class (len 3, first digit 0-5) → literal;
    // 900 fails the first-digit test → <N>; 42/7 → <N>
    assert(out(0).getString(1) == "code 200 ratio 0.5 big <N> tiny <N>")
  }

  test("two-batch mergeMined equals one-shot mining (associativity)") {
    import graft.TestSpark.spark.implicits._
    // the (s, 3, req) cluster spans BOTH batches with tokens that only
    // differ across the batch boundary — the cross-batch generalize case
    val b1 = Seq(("s", "req 1 ok"), ("s", "req 2 ok"), ("t", "a b"))
      .toDF("stream", "line")
    val b2 = Seq(("s", "req 3 failed"), ("s", "warm up"), ("t", "a c"))
      .toDF("stream", "line")
    val all = b1.unionByName(b2)
    val merged = Patterns.mergeMined(
        Patterns.mineLines(b1).unionByName(Patterns.mineLines(b2)))
      .orderBy("stream", "pattern").collect()
    val oneShot = Patterns.mineLines(all)
      .orderBy("stream", "pattern").collect()
    assert(merged.length == oneShot.length)
    merged.zip(oneShot).foreach { case (m, o) =>
      assert(m.getAs[String]("pattern") == o.getAs[String]("pattern"))
      assert(m.getAs[Long]("samples_count") == o.getAs[Long]("samples_count"))
    }
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

  test("native ClassTokens equals the Column classTok chain on real + edge tokens") {
    import graft.TestSpark.spark.implicits._
    // the real testdata lines, plus every class's edge literals
    val edges = Seq(
      "550e8400-e29b-41d4-a716-446655440000", "<123>", "2024-01-02T03:04:05Z",
      "2024-01-02", "03:04:05.123", "[06/Jan/2024:15:04:05", "+0000]",
      "-0800]", "INFO", "WARNING", "kernel[123]:", "10.1.2.3:8080",
      "192.168.0.1", "deadbeefcafe", "0xDEADBEEF00", "12345678",
      "/v1/users/42", "/a/b/", "HTTP/1.1", "HTTP", "GET", "TRACE",
      "200", "0.5", "599", "600", "999", "abc123def", "x", "", "<", "[",
      "a[1]:", "ab[12]:", "id=42", "<N>", "<_>",
      // embedded line terminators: all three classer forms strip trailing
      // [\r\n]+ before classing (Java '$' matches before a trailing \n,
      // DuckDB's RE2 '$' does not — stripping removes the divergence), so
      // "10.1.2.3\n" classes <IP> and "INFO\n" stays the INFO literal
      "03:04:05\n", "200\n", "deadbeefcafe\n", "10.1.2.3\n",
      "INFO\n", "ERROR\r\n", "10.1.2.3\r\n", "03:04:05\r", "\n", "\r\n",
      "a\nb", "42\n\n").mkString(" ")
    val real = graft.model.Tables.logs(spark, sf)
      .select(col("line")).as[String].take(200)
    val df = (real :+ edges).toSeq.toDF("line")
    val native = df.select(Patterns.maskedTokens(col("line")).as("t"))
    val columnForm = df.select(
      transform(split(col("line"), " "), Patterns.classTok(_)).as("t"))
    assert(native.exceptAll(columnForm).count() == 0)
    assert(columnForm.exceptAll(native).count() == 0)
  }
}
