package graft.traceql

import graft.SparkSpec
import graft.gates.EvalWindow._

/** TraceQL grammar-coverage corpus (model_v2.go shapes). */
class TraceQLCorpusSpec extends SparkSpec {

  private val corpus = Seq(
    """{}""",
    """{ .name="GET /api" }""",
    """{ .service_name="checkout" && .name="charge" }""",
    """{ .http_status=500 || .http_status=502 }""",
    """{ duration > 100ms }""",
    """{ duration >= 1s && .service_name="db" }""",
    """{ .name=~"GET.*" }""",
    """{ (.a="1" || .b="2") && duration < 5ms }""",
    """{ span.kind="server" }""",
    """{ resource.region="us-east" }""",
    """{ .name="a" } && { .name="b" }""",
    """{ .name="a" } || { .name="b" }""",
    """{ .name="parent" } > { .name="child" }""",
    """{ .name="root" } >> { .name="leaf" }""",
    """{ .name="a" } ~ { .name="b" }""",
    """{ .service_name="api" } | count() > 3""",
    """{ .name="q" } | avg(duration) > 50ms""",
    """{ .name="q" } | max(duration) <= 2s""",
    """{ .name="q" } | sum(.bytes) > 1000""",
    """{} | rate()""",
    """{} | rate() by (service_name)""",
    """{} | count_over_time() by (name, service_name)""",
    """{ .name="q" } | quantile_over_time(duration, 0.99)""",
    """{ .name="q" } | quantile_over_time(duration, 0.5) by (name)""",
    """{} | histogram_over_time(duration)""",
    """{ .name="q" } | avg_over_time(duration) by (name)""",
    """{ .name="q" } | min_over_time(.latency)""",
    """{ .name="q" } | max_over_time(.user) by (service_name)""",
    """{ .name="q" } | sum_over_time(.bytes)""",
    """{} | rate() by (name) | topk(5)""",
    """{} | rate() | bottomk(2)""",
    """{ .name="err" } | compare({ .service_name="svc1" }, 10)""",
    """{ .service.name="svc1" }""",
    """{ .http.status_code = 500 || resource.service.name="svc2" }""",
    """{ .service_name="svc1" } | count() > 2 || { .name="error" }""",
    """{ .name="view" } && { .name="click" } | avg(duration) > 1ms""")

  test(s"corpus of ${corpus.size} TraceQL queries parses") {
    val failures = corpus.flatMap { q =>
      TraceQLParser.parse(q).left.toOption.map(err => s"$q -> $err")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test(s"corpus of ${corpus.size} TraceQL queries COMPILES via run()") {
    val eng = new TraceQLCompiler(spark, sf, StartNs, EndNs)
    val failures = corpus.flatMap { q =>
      try {
        // full execution, not just plan analysis (see LogQLCorpusSpec)
        eng.run(TraceQLParser.parseOrThrow(q), StartNs, EndNs, StepS).count()
        None
      } catch { case e: Throwable =>
        Some(s"$q -> ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("malformed TraceQL rejected") {
    Seq("""{ name= }""", """{} | count(""", """{ .a="1" } |""", """{ duration > }""")
      .foreach(q => assert(TraceQLParser.parse(q).isLeft, s"should fail: $q"))
  }
}
