package graft.logql

import graft.SparkSpec
import graft.gates.EvalWindow._

/** Parse-corpus test mirroring the reference's 50-query golden suite
  * (`reader/logql/logql_parser/parser_test.go:10-63`): every query a real
  * user shape the engine must accept. Shape checks are in
  * LogQLParserSpec; this guards grammar coverage against regressions.
  */
class LogQLCorpusSpec extends SparkSpec {

  private val corpus = Seq(
    // selectors
    """{job="api"}""",
    """{job="api", env!="dev"}""",
    """{job=~"api|web", pod!~"canary-.*"}""",
    """{job=""}""",
    """{}""",
    // line filters
    """{job="api"} |= "error"""",
    """{job="api"} |= "error" != "timeout"""",
    """{job="api"} |~ "5\\d\\d" !~ "healthz"""",
    """{job="api"} |> "GET <_> 200"""",
    """{job="api"} |= `raw "quoted"`""",
    // parsers
    """{job="api"} | json""",
    """{job="api"} | json status="response.status"""",
    """{job="api"} | json status="response.status", dur="response.ms"""",
    """{job="api"} | logfmt""",
    """{job="api"} | regexp "(?P<method>\\w+) (?P<path>/\\S*)"""",
    // label filters
    """{job="api"} | json | status="500"""",
    """{job="api"} | json | status!="200"""",
    """{job="api"} | json | dur > 250""",
    """{job="api"} | json | dur >= 0.5 and status="500"""",
    """{job="api"} | json | status="500" or status="502"""",
    """{job="api"} | json | (status="500" or status="502") and dur > 1""",
    """{job="api"} | json | __error__=""""",
    // formats
    """{job="api"} | line_format "{{.status}}: {{.path}}"""",
    """{job="api"} | label_format s=status""",
    """{job="api"} | label_format s="{{.status | upper}}"""",
    """{job="api"} | json | drop status, path""",
    """{job="api"} | json | keep status""",
    """{job="api"} | line_format "{{.status | len}}x{{.path | repeat 2}}"""",
    """{job="api"} | line_format `{{.missing | default "-"}} {{.b | b64enc | b64dec}}`""",
    """{job="api"} | line_format `{{.d | toDate "2006-01-02" | unixEpoch}}`""",
    """{job="api"} | line_format `{{.dur | duration_seconds}} {{.n | add 5}}`""",
    """{job="api"} | line_format `{{ range .tags }}[{{ . }}]{{ end }}`""",
    """{job="api"} | line_format `line was: {{ __line__ }}`""",
    // unwrap + conversions
    """sum_over_time({job="api"} | json | unwrap dur [5m])""",
    """sum_over_time({job="api"} | json | unwrap bytes(sz) [5m])""",
    """avg_over_time({job="api"} | json | unwrap duration_seconds(d) [5m])""",
    // range aggregations
    """rate({job="api"}[5m])""",
    """rate({job="api"}[500ms])""",
    """count_over_time({job="api"}[1h])""",
    """bytes_rate({job="api"}[1m])""",
    """bytes_over_time({job="api"}[30s])""",
    """absent_over_time({job="api"}[10m])""",
    """max_over_time({job="api"} | json | unwrap dur [5m])""",
    """min_over_time({job="api"} | json | unwrap dur [5m] offset 1h)""",
    """stddev_over_time({job="api"} | json | unwrap dur [5m])""",
    """first_over_time({job="api"} | json | unwrap dur [5m])""",
    """quantile_over_time(0.99, {job="api"} | json | unwrap dur [5m])""",
    """quantile_over_time(0.5, {job="api"} | json | unwrap dur [5m]) by (pod)""",
    // vector aggregations
    """sum(rate({job="api"}[5m]))""",
    """sum by (pod) (rate({job="api"}[5m]))""",
    """sum without (pod) (count_over_time({job="api"}[5m]))""",
    """avg by (pod, env) (rate({job="api"}[5m]))""",
    """topk(5, sum by (pod) (rate({job="api"}[5m])))""",
    """bottomk(3, count_over_time({job="api"}[1h]))""",
    // comparisons + arithmetic
    """sum(rate({job="api"}[5m])) > 100""",
    """count_over_time({job="api"}[5m]) != 0""",
    """sum by (p) (bytes_over_time({j="a"}[1m])) / sum by (p) (count_over_time({j="a"}[1m]))""",
    """sum(rate({a="1"}[1m])) + sum(rate({b="2"}[1m])) * 2""",
    """rate({job="api"}[1h30m])""")

  test(s"reference-shaped corpus of ${corpus.size} queries parses") {
    val failures = corpus.flatMap { q =>
      LogQLParser.parse(q).left.toOption.map(err => s"$q -> $err")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test(s"corpus of ${corpus.size} queries EXECUTES at sf0.001") {
    // full execution, not just plan analysis: codegen failures, runtime
    // casts on real data, and window-frame evaluation only surface here
    val eng = new LogQLCompiler(spark, sf, EvalParams(StartNs, EndNs, StepS))
    val failures = corpus.flatMap { q =>
      try { eng.compileExpr(LogQLParser.parseOrThrow(q)).count(); None }
      catch { case e: Throwable => Some(s"$q -> ${e.getClass.getSimpleName}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("malformed queries are rejected") {
    val bad = Seq(
      """{job=api}""",            // unquoted value
      """{job="a"} |""",          // dangling pipe
      """rate({job="a"})""",      // missing range
      """sum by () rate({a="1"}[5m]) (""",
      """{a="1"} | unwrap""",     // missing label
      """topk(, sum(rate({a="1"}[1m])))""")
    bad.foreach(q => assert(LogQLParser.parse(q).isLeft, s"should fail: $q"))
  }
}
