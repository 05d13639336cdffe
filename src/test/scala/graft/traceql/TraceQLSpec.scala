package graft.traceql

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables
import TraceQLAst._

class TraceQLSpec extends SparkSpec {

  private def engine = new TraceQLCompiler(spark, sf)

  test("parser: condition structure and duration literals") {
    val Query(Sel(SpanSet(Some(cond))), None, None, None, None, _) =
      TraceQLParser.parseOrThrow("""{ .name="a" && (duration > 10ms || .user="3") }"""): @unchecked
    assert(cond == CondAnd(StrCond("name", "=", "a"),
      CondOr(DurCond(">", 10000000L), StrCond("user", "=", "3"))))
  }

  test("parser: both structural-op dialects map to the same AST") {
    def ex(q: String) = TraceQLParser.parseOrThrow(q).expr
    // reference lexer spellings (&>> <<& !>> <<~) and Tempo's (>> <<)
    assert(ex("""{ .name="a" } &>> { .name="b" }""") ==
      ex("""{ .name="a" } >> { .name="b" }"""))
    assert(ex("""{ .name="a" } <<& { .name="b" }""") ==
      ex("""{ .name="a" } << { .name="b" }"""))
    assert(ex("""{ .name="a" } !>> { .name="b" }""") ==
      StructNotDescendant(Sel(SpanSet(Some(StrCond("name", "=", "a")))),
        Sel(SpanSet(Some(StrCond("name", "=", "b"))))))
    assert(ex("""{ .name="a" } <<~ { .name="b" }""") ==
      StructNotAncestor(Sel(SpanSet(Some(StrCond("name", "=", "a")))),
        Sel(SpanSet(Some(StrCond("name", "=", "b"))))))
  }

  test("negated descendant partitions traces against positive descendant") {
    // every trace with a purchase-span is in exactly one of: purchase
    // descends from a view (positive) / some purchase has no view
    // ancestor (negated) — and the two only overlap on traces with BOTH
    // kinds of purchase span; union must equal all purchase traces
    val pos = engine.matchingTraces(
      TraceQLParser.parseOrThrow("""{ .name="view" } >> { .name="purchase" }""").expr)
      .collect().map(_.getLong(0)).toSet
    val neg = engine.matchingTraces(
      TraceQLParser.parseOrThrow("""{ .name="view" } !>> { .name="purchase" }""").expr)
      .collect().map(_.getLong(0)).toSet
    val all = Tables.spans(spark, sf).filter(col("name") === "purchase")
      .select("trace_id").distinct().collect().map(_.getLong(0)).toSet
    assert(pos.union(neg) == all)
    assert(pos.nonEmpty && neg.nonEmpty)
  }

  test("parser: dotted attr names; service.name normalizes to the intrinsic") {
    def cond(q: String) = TraceQLParser.parseOrThrow(q).expr match {
      case Sel(SpanSet(Some(c))) => c
      case other                 => fail(s"unexpected: $other")
    }
    assert(cond("""{ .service.name="svc1" }""") ==
      cond("""{ .service_name="svc1" }"""))
    assert(cond("""{ resource.service.name="svc1" }""") ==
      cond("""{ .service_name="svc1" }"""))
    assert(cond("""{ .http.status_code = 500 }""") ==
      NumCond("http.status_code", "=", 500.0))
  }

  test("operand aggregator: {a}|count()>N || {b} unions agged with plain set") {
    val q = TraceQLParser.parseOrThrow(
      """{ .service_name="svc1" } | count() > 3 || { .name="error" }""")
    assert(q.agg.isEmpty) // the aggregator belongs to the operand
    val got = engine.matchingTraces(q.expr).collect().map(_.getLong(0)).toSet
    val agged = engine.aggregate(
      TraceQLParser.parseOrThrow("""{ .service_name="svc1" } | count() > 3""").expr,
      TraceQLParser.parseOrThrow("""{ .service_name="svc1" } | count() > 3""").agg.get)
      .collect().map(_.getLong(0)).toSet
    val plain = engine.matchingTraces(
      TraceQLParser.parseOrThrow("""{ .name="error" }""").expr)
      .collect().map(_.getLong(0)).toSet
    assert(got == (agged union plain))
    // a lone aggregated selector still parses at the query level
    assert(TraceQLParser.parseOrThrow(
      """{ .service_name="svc1" } | count() > 3""").agg.isDefined)
  }

  test("parser: intrinsic tail — bool literals, nestedSet, unquoted values") {
    def cond(q: String): Option[AttrCond] =
      TraceQLParser.parseOrThrow(q).expr match {
        case Sel(SpanSet(c)) => c
        case other           => fail(s"unexpected: $other")
      }
    assert(cond("{ true }").contains(BoolCond(true)))
    assert(cond("{ false }").contains(BoolCond(false)))
    assert(cond("{ nestedSetParent < 0 }").contains(RootCond))
    assert(cond("{ nestedSetLeft > 5 }").contains(BoolCond(true)))
    assert(cond("{ kind = server }").contains(StrCond("kind", "=", "server")))
    assert(cond("""{ rootServiceName = "svc1" }""")
      .contains(StrCond("service_name", "=", "svc1")))
    assert(cond("""{ status != error }""")
      .contains(StrCond("status", "!=", "error")))
    val e = intercept[IllegalArgumentException](
      TraceQLParser.parseOrThrow("""{ .attr != nil }"""))
    assert(e.getMessage.contains("nil"))
  }

  test("parser: compare() with explicit baseline window keeps exact ns") {
    val q = TraceQLParser.parseOrThrow(
      """{ .name="a" } | compare({ .name="b" }, 5, 1704067200000000001, 1705363200000000000)""")
    assert(q.compare.contains(CompareStage(
      SpanSet(Some(StrCond("name", "=", "b"))), 5,
      Some(1704067200000000001L), Some(1705363200000000000L))))
  }

  test("parser: aggregator and metrics stages") {
    val q1 = TraceQLParser.parseOrThrow("""{ .name="a" } | count() > 3""")
    assert(q1.agg.contains(SpanAgg("count", None, ">", 3.0)))
    val q2 = TraceQLParser.parseOrThrow("""{ .name="a" } | avg(duration) >= 5ms""")
    assert(q2.agg.contains(SpanAgg("avg", Some("duration"), ">=", 5000000.0)))
    val q3 = TraceQLParser.parseOrThrow("""{} | rate() by (name, service_name)""")
    assert(q3.metrics.contains(Metrics("rate", None, None, Seq("name", "service_name"))))
    val q4 = TraceQLParser.parseOrThrow(
      """{ .name="a" } | quantile_over_time(duration, 0.95) by (name) | topk(3)""")
    assert(q4.metrics.contains(
      Metrics("quantile_over_time", Some("duration"), Some(0.95), Seq("name"))))
    assert(q4.second.contains(SecondStage("topk", 3)))
  }

  test("bitmask AND equals direct two-column filter") {
    val Query(Sel(ss), _, _, _, _, _) =
      TraceQLParser.parseOrThrow("""{ .name="click" && .service_name="svc0" }"""): @unchecked
    val viaMask = engine.spanSetSpans(ss).count()
    val direct = Tables.spans(spark, sf)
      .filter(col("name") === "click" && col("service_name") === "svc0").count()
    assert(viaMask == direct)
  }

  test("bitmask OR equals direct union filter") {
    val Query(Sel(ss), _, _, _, _, _) =
      TraceQLParser.parseOrThrow("""{ .name="click" || .name="view" }"""): @unchecked
    val viaMask = engine.spanSetSpans(ss).count()
    val direct = Tables.spans(spark, sf)
      .filter(col("name") === "click" || col("name") === "view").count()
    assert(viaMask == direct)
  }

  test("structural && narrower than either side; || wider") {
    val and = engine.matchingTraces(TraceQLParser.parseOrThrow(
      """{ .name="view" } && { .name="error" }""").expr).count()
    val or = engine.matchingTraces(TraceQLParser.parseOrThrow(
      """{ .name="view" } || { .name="error" }""").expr).count()
    val viewOnly = engine.matchingTraces(TraceQLParser.parseOrThrow(
      """{ .name="view" }""").expr).count()
    assert(and <= viewOnly && viewOnly <= or)
  }

  test("run dispatches select(): attr columns projected onto matched spans") {
    val df = engine.run(TraceQLParser.parseOrThrow(
      """{ .name="click" } | select(.user, service_name)"""))
    assert(df.columns.toSet == Set("trace_id", "span_id", "timestamp_ns",
      "duration_ns", "user", "service_name"))
    // every span carries all attr keys, so no null pivots
    assert(df.filter(col("user").isNull || col("service_name").isNull).count() == 0)
    assert(df.count() ==
      Tables.spans(spark, sf).filter(col("name") === "click").count())
  }

  test("run dispatches select() after an aggregate: only kept traces projected") {
    val df = engine.run(TraceQLParser.parseOrThrow(
      """{ .name="click" } | count() > 1 | select(.user)"""))
    val kept = engine.aggregate(
      TraceQLParser.parseOrThrow("""{ .name="click" } | count() > 1""").expr,
      SpanAgg("count", None, ">", 1.0))
    assert(df.select("trace_id").distinct().count() == kept.count())
    assert(df.columns.contains("user"))
  }

  test("with(sample=N) keeps a deterministic strict subset of traces") {
    val all = engine.run(TraceQLParser.parseOrThrow("""{ .name="click" }"""))
    val s1 = engine.run(TraceQLParser.parseOrThrow("""{ .name="click" } with(sample=4)"""))
    val n = all.count()
    val k = s1.count()
    assert(k > 0 && k < n, s"sampled $k of $n")
    // determinism: same selection on re-run, and it is a subset
    val s2 = engine.run(TraceQLParser.parseOrThrow("""{ .name="click" } with(sample=4)"""))
    assert(s2.count() == k)
    assert(s1.select("trace_id").exceptAll(all.select("trace_id")).count() == 0)
    // roughly 1/4 (synthetic ids are uniform enough for a loose band)
    assert(k > n / 10 && k < n / 2, s"fraction ${k.toDouble / n}")
  }

  test("unknown with() hint keys are rejected, not silently ignored") {
    val q = TraceQLParser.parseOrThrow("""{ .name="click" } with(shard=3)""")
    intercept[IllegalArgumentException](engine.run(q))
  }

  test("trace meta duration is span-extent, root is earliest span") {
    val meta = engine.traceMeta(TraceQLParser.parseOrThrow("""{}""").expr)
    assert(meta.filter(col("duration_ms") < 0).count() == 0)
    val spans = Tables.spans(spark, sf)
    val m0 = meta.orderBy("trace_id").limit(1).collect()(0)
    val first = spans.filter(col("trace_id") === m0.getLong(0))
      .orderBy("timestamp_ns").limit(1).collect()(0)
    assert(m0.getAs[String]("root_name") == first.getAs[String]("name"))
  }

  test("instant metrics equal the bucket-summed range metrics") {
    import graft.gates.EvalWindow._
    val q = TraceQLParser.parseOrThrow("""{ .name="click" } | rate() by (service_name)""")
    // Σ per-bucket counts == whole-window count, so instant rate must equal
    // Σ(range rate × step) / window for every group
    val range = engine.metrics(q.expr, q.metrics.get, StartNs, EndNs, StepS)
      .groupBy("service_name")
      .agg((sum(col("value")) * StepS / (EndS - StartS)).as("expect"))
    val inst = engine.metricsInstant(q.expr, q.metrics.get, StartNs, EndNs)
    val bad = inst.join(range, "service_name")
      .filter(abs(col("value") - col("expect")) > 1e-9)
    assert(bad.count() == 0)
    assert(inst.count() > 0)
  }

  test("exemplars: one row per (bucket, series), each a real matched span") {
    import graft.gates.EvalWindow._
    val q = TraceQLParser.parseOrThrow("""{ .name="click" } | rate() by (service_name)""")
    val ex = engine.exemplars(q.expr, q.metrics.get, StartNs, EndNs, StepS)
    // key uniqueness: exactly one exemplar per (service_name, ts)
    assert(ex.groupBy("service_name", "ts").count().filter(col("count") > 1).count() == 0)
    // every exemplar's bucket count exists in the metrics frame
    val m = engine.metrics(q.expr, q.metrics.get, StartNs, EndNs, StepS)
    assert(ex.select("service_name", "ts")
      .except(m.select("service_name", "ts")).count() == 0)
    // exemplar spans are matched spans
    val spans = Tables.spans(spark, sf).filter(col("name") === "click")
    assert(ex.join(spans, ex("trace_id") === spans("trace_id") &&
      ex("span_ts") === spans("timestamp_ns"), "left_anti").count() == 0)
  }

  test("plan shapes: tag search scans the attr table once; exemplars add one window") {
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // N tag terms must NOT become N attr-table subquery scans — the terms
    // ride one bitmask scan (sql_index_query.go does one scan per tag;
    // the Spark design folds them into the single masked aggregate)
    val p = planOf(engine.tagSearch("""name=click service_name=svc1 user=3""", limit = 5))
    assert("span_attrs".r.findAllIn(p).size == 1, p.linesIterator.filter(_.contains("span_attrs")).mkString("\n"))
    // exemplars: rank window rides the same key as the metrics aggregate —
    // no extra scan of the span table beyond the metrics frame's two
    import graft.gates.EvalWindow._
    val q = TraceQLParser.parseOrThrow("""{ .name="click" } | rate() by (service_name)""")
    val pm = planOf(engine.metrics(q.expr, q.metrics.get, StartNs, EndNs, StepS))
    val pe = planOf(engine.exemplars(q.expr, q.metrics.get, StartNs, EndNs, StepS))
    def scans(s: String) = "FileScan".r.findAllIn(s).size
    assert(scans(pe) == scans(pm), s"exemplars scans=${scans(pe)} metrics scans=${scans(pm)}")
    assert(pe.contains("Window"))
  }

  test("tag search: terms AND, duration bound, limit, newest first") {
    val res = engine.tagSearch("""name=click service_name=~svc[12]""",
      minDurNs = 1000000L, limit = 7).collect()
    assert(res.length <= 7)
    assert(res.nonEmpty)
    // newest first
    val ts = res.map(_.getAs[Long]("start_time_unix_nano"))
    assert(ts.sameElements(ts.sortBy(-_)))
    // malformed tags string is a parse error, not a crash
    intercept[IllegalArgumentException] {
      engine.tagSearch("""=broken=""")
    }
  }
}
