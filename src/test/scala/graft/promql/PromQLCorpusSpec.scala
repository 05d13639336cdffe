package graft.promql

import graft.SparkSpec
import graft.gates.EvalWindow._

/** PromQL grammar-coverage corpus (the shapes served by the reference's
  * embedded engine + accelerated planners).
  */
class PromQLCorpusSpec extends SparkSpec {

  private val corpus = Seq(
    """up""",
    """up{job="api"}""",
    """http_requests_total{code=~"5..", method!="OPTIONS"}""",
    """rate(http_requests_total[5m])""",
    """rate(http_requests_total{job="api"}[5m] offset 1h)""",
    """irate(http_requests_total[1m])""",
    """idelta(gauge_metric[5m])""",
    """increase(http_requests_total[1h])""",
    """delta(cpu_temp[10m])""",
    """resets(counter_metric[1d])""",
    """changes(config_version[1h])""",
    """sum(rate(http_requests_total[5m]))""",
    """sum by (job) (rate(http_requests_total[5m]))""",
    """sum without (instance) (rate(http_requests_total[5m]))""",
    """avg by (job, env) (up)""",
    """topk(5, sum by (job) (rate(http_requests_total[5m])))""",
    """bottomk(3, node_memory_free)""",
    """quantile(0.9, http_request_duration)""",
    """count(up == 1)""",
    """min_over_time(node_load1[10m])""",
    """max_over_time(node_load1[10m])""",
    """avg_over_time(node_load1[10m])""",
    """sum_over_time(requests[1h])""",
    """count_over_time(requests[1h])""",
    """last_over_time(up[5m])""",
    """present_over_time(up[5m])""",
    """stddev_over_time(node_load1[30m])""",
    """quantile_over_time(0.99, http_request_duration[5m])""",
    """histogram_quantile(0.9, sum by (le) (rate(http_request_duration_bucket[5m])))""",
    """abs(delta(gauge_metric[5m]))""",
    """ceil(node_load1)""",
    """clamp_min(node_load1, 0)""",
    """round(node_load1, 0.5)""",
    """sqrt(node_load1)""",
    """rate(a[5m]) / rate(b[5m])""",
    """sum by (job) (rate(a[5m])) / on(job) sum by (job) (rate(b[5m]))""",
    """metric_a / ignoring(instance) metric_b""",
    """a - on(job) group_left sum by (job) (b)""",
    """a * on(job) group_right(extra) b""",
    """node_load1 > 0.8""",
    """node_load1 > bool 0.8""",
    """up == 1 and node_load1 < 2""",
    """up == 1 unless on(instance) maintenance""",
    """a or b""",
    """max_over_time(rate(http_requests_total[5m])[30m:5m])""",
    """quantile_over_time(0.5, sum by (job) (rate(a[1m]))[10m:1m])""",
    """absent(nonexistent_metric)""",
    """avg_over_time(node_load1[1h] @ 1704067200)""",
    """rate(http_requests_total[5m]) ^ 2 + 1""",
    """label_replace(up, "host", "$1", "instance", "(.*):.*")""",
    """label_join(up, "endpoint", "/", "job", "instance")""",
    """deriv(node_load1[10m])""",
    """predict_linear(node_filesystem_free[1h], 4 * 3600)""",
    """sort(sum by (job) (up))""",
    """sort_desc(rate(http_requests_total[5m]))""",
    """count_values("version", build_info)""",
    """count_values by (job) ("code", http_responses)""",
    """scalar(sum(up))""",
    """vector(1)""",
    """time()""",
    """timestamp(up)""",
    """day_of_week(vector(time()))""",
    """hour(vector(time()))""",
    """clamp(node_load1, 0, 10)""",
    """sgn(delta(gauge_metric[5m]))""",
    """absent_over_time(up[10m])""",
    """holt_winters(node_load1[10m], 0.5, 0.1)""",
    """double_exponential_smoothing(node_load1[10m], 0.5, 0.1)""",
    """sin(node_load1)""",
    """atan(cos(node_load1))""",
    """tanh(rate(http_requests_total[5m]))""")

  test(s"corpus of ${corpus.size} PromQL queries parses") {
    val failures = corpus.flatMap { q =>
      PromQLParser.parse(q).left.toOption.map(err => s"$q -> $err")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test(s"corpus of ${corpus.size} queries COMPILES against the metric families") {
    // corpus metric names map onto the three concrete families so the
    // whole operator stack (not just the grammar) is exercised
    val eng = new PromQLCompiler(spark, sf, PromParams(StartNs, EndNs, StepS))
    def mapped(q: String): String = q
      .replaceAll("[a-zA-Z_][a-zA-Z0-9_]*_bucket", "events_bucket")
      .replaceAll("[a-zA-Z_][a-zA-Z0-9_]*_total", "events_total")
      .replaceAll("\\b(up|gauge_metric|cpu_temp|counter_metric|config_version|node_load1|node_memory_free|http_request_duration|some_metric|errors|requests|cache_hits|cache_misses|foo|bar|m|x|y|a|b|metric_a|metric_b|maintenance|nonexistent_metric|node_filesystem_free|build_info|http_responses)\\b", "events_value")
    val failures = corpus.flatMap { q0 =>
      val q = mapped(q0)
      // full execution, not just plan analysis (see LogQLCorpusSpec)
      try { eng.compile(q).count(); None }
      catch { case e: Throwable =>
        Some(s"$q -> ${e.getClass.getSimpleName}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("malformed PromQL rejected") {
    // (`rate(metric)` without a range PARSES — it fails later at compile
    // time as a type error, matching Prometheus's parse/typecheck split)
    val bad = Seq(
      """sum by (metric{a="1"})""",
      """rate([5m])""",
      """{job=}""",
      """histogram_quantile(0.9)""")
    bad.foreach(q => assert(PromQLParser.parse(q).isLeft, s"should fail: $q"))
  }
}
