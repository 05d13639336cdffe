package graft.logql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{MapType, StringType}

import graft.model.Tables
import LogQLAst._

/** Evaluation window: LogQL range queries evaluate at each step over a
  * lookback of `range`; timestamps are ns since epoch.
  */
final case class EvalParams(startNs: Long, endNs: Long, stepS: Long)

/** LogQL → DataFrame compiler.
  *
  * Where the reference splits execution between generated ClickHouse SQL
  * (`reader/logql/logql_transpiler/clickhouse_planner/`) and a Go channel
  * pipeline (`internal/planner/`), everything here compiles into ONE
  * declarative Spark plan: Catalyst gets the whole query, so predicate
  * pushdown / column pruning / partial aggregation reach the parquet scan
  * with no hand-scheduling, and there is a single implementation per
  * operator instead of the reference's SQL+Go pair.
  *
  * Canonical intermediate schemas:
  *   log stream  — (timestamp_ns L, fingerprint L, labels M, line S, value D)
  *   metric      — (ts L [epoch sec], fingerprint L, labels M, value D)
  */
class LogQLCompiler(spark: SparkSession, dir: String, params: EvalParams) {

  private val stepNs = params.stepS * 1000000000L

  def compile(q: String): DataFrame = compileExpr(LogQLParser.parseOrThrow(q))

  def compileExpr(e: Expr): DataFrame = e match {
    case LogExpr(sel, stages) =>
      compileLog(sel, stages)
        .select(col("timestamp_ns"), col("labels"), col("line"))
    case other => compileMetric(other)
  }

  /** Final projection for the driver gate: label keys → flat columns. */
  def metricResult(q: String, labelCols: Seq[String]): DataFrame = {
    val df = compileMetric(LogQLParser.parseOrThrow(q))
    val cols = labelCols.map(k => element_at(col("labels"), k).as(k)) ++
      Seq(col("ts"), col("value"))
    df.select(cols: _*).orderBy(labelCols.map(col) :+ col("ts"): _*)
  }

  // --- log pipeline ------------------------------------------------------

  /** Selector matcher → predicate over the labels map.
    * Reference does this via the GIN inverted index + groupBitOr bitmask
    * (`planner_stream_select.go:21-142`) because labels are a JSON string
    * in ClickHouse; with a native map column a direct filter is both
    * simpler and pushdown-friendly. At 100 TB the same predicate runs
    * against the (small) series dictionary and semi-joins the fact table
    * on fingerprint — see [[compileLog]].
    */
  private def matcherCond(m: LabelMatcher): Column = {
    val v = element_at(col("labels"), m.label)
    m.op match {
      case "="  => if (m.value.isEmpty) v.isNull || v === "" else v === m.value
      case "!=" => !(v <=> lit(m.value))
      case "=~" => v.rlike("^(?:" + m.value + ")$")
      case "!~" => v.isNull || !v.rlike("^(?:" + m.value + ")$")
    }
  }

  private def predCond(p: LabelPred): Column = p match {
    case StrPred(l, op, v) =>
      val c = element_at(col("labels"), l)
      op match {
        case "=" | "==" => c === v
        case "!="       => !(c <=> lit(v))
        case "=~"       => c.rlike("^(?:" + v + ")$")
        case "!~"       => c.isNull || !c.rlike("^(?:" + v + ")$")
      }
    case NumPred(l, op, n) =>
      val c = element_at(col("labels"), l).cast("double")
      op match {
        case "==" | "=" => c === n
        case "!=" => c =!= n
        case ">"  => c > n
        case ">=" => c >= n
        case "<"  => c < n
        case "<=" => c <= n
      }
    case AndPred(a, b) => predCond(a) && predCond(b)
    case OrPred(a, b)  => predCond(a) || predCond(b)
  }

  /** `<_>`-wildcard line pattern (`|>`) → SQL LIKE, as the reference demotes
    * it (`planner_line_filter.go`, patternMatch).
    */
  private def patternToLike(p: String): String =
    p.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_").replace("<\\_>", "%")

  private def lineFilterCond(f: LineFilter): Column = f.op match {
    case "|=" => col("line").contains(f.needle)
    case "!=" => !col("line").contains(f.needle)
    case "|~" => col("line").rlike(f.needle)
    case "!~" => !col("line").rlike(f.needle)
    case "|>" => col("line").like(patternToLike(f.needle))
  }

  /** Compile the Go-template subset the reference pushes to SQL
    * (`planner_line_format.go:21-200`): literal text + `{{.label}}` refs.
    */
  private def templateCol(tpl: String): Column = {
    val re = "\\{\\{\\s*\\.([a-zA-Z_][a-zA-Z0-9_]*)\\s*\\}\\}".r
    var last = 0
    val parts = scala.collection.mutable.ArrayBuffer[Column]()
    for (m <- re.findAllMatchIn(tpl)) {
      if (m.start > last) parts += lit(tpl.substring(last, m.start))
      parts += coalesce(element_at(col("labels"), m.group(1)), lit(""))
      last = m.end
    }
    if (last < tpl.length) parts += lit(tpl.substring(last))
    if (parts.isEmpty) lit("") else concat(parts.toSeq: _*)
  }

  /** Java regex named-group extraction: `(?P<x>..)` → per-group
    * regexp_extract (reference: `planner_parser_regexp.go`).
    */
  private def regexpGroups(re: String): Seq[(String, Int)] = {
    // scan capture groups left to right; named Go groups use (?P<name>
    val out = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    var idx = 0; var i = 0
    while (i < re.length) {
      if (re.charAt(i) == '\\') i += 2
      else if (re.charAt(i) == '(') {
        if (i + 1 < re.length && re.charAt(i + 1) == '?') {
          if (re.startsWith("(?P<", i) || re.startsWith("(?<", i)) {
            idx += 1
            val nameStart = re.indexOf('<', i) + 1
            val nameEnd = re.indexOf('>', nameStart)
            out += ((re.substring(nameStart, nameEnd), idx))
            i = nameEnd
          } // (?: …) non-capturing: no idx bump
        } else idx += 1
        i += 1
      } else i += 1
    }
    out.toSeq
  }

  private def applyStage(df: DataFrame, s: Stage): DataFrame = s match {
    case f: LineFilter => df.filter(lineFilterCond(f))
    case LabelFilterStage(p) => df.filter(predCond(p))

    case JsonStage(Nil) =>
      // full extract: every top-level JSON field becomes a label
      // (reference Go-side parser.go:25-90; here a single from_json).
      df.withColumn("labels",
          map_concat(col("labels"),
            coalesce(from_json(col("line"), MapType(StringType, StringType)),
              map())))
        .withColumn("fingerprint", Tables.fingerprintOf(col("labels")))

    case JsonStage(params) =>
      val extracted = params.flatMap { case (l, path) =>
        Seq(lit(l), coalesce(get_json_object(col("line"), "$." + path), lit("")))
      }
      df.withColumn("labels", map_concat(col("labels"), map(extracted: _*)))
        .withColumn("fingerprint", Tables.fingerprintOf(col("labels")))

    case LogfmtStage =>
      // k=v and k="quoted v" pairs → map; quoted values unescaped.
      val pair = "([a-zA-Z_][a-zA-Z0-9_]*)=(\"(?:[^\"\\\\]|\\\\.)*\"|[^\\s\"]*)"
      val keys = regexp_extract_all(col("line"), lit(pair), lit(1))
      val vals = transform(
        regexp_extract_all(col("line"), lit(pair), lit(2)),
        v => when(v.startsWith("\""),
            regexp_replace(v.substr(lit(2), length(v) - 2), "\\\\(.)", "$1"))
          .otherwise(v))
      df.withColumn("labels",
          map_concat(col("labels"),
            map_from_arrays(keys, vals)))
        .withColumn("fingerprint", Tables.fingerprintOf(col("labels")))

    case RegexpStage(re) =>
      val jre = re.replace("(?P<", "(?<")
      val groups = regexpGroups(re)
      val extracted = groups.flatMap { case (name, idx) =>
        Seq(lit(name), regexp_extract(col("line"), jre, idx))
      }
      df.withColumn("labels", map_concat(col("labels"), map(extracted: _*)))
        .withColumn("fingerprint", Tables.fingerprintOf(col("labels")))

    case LineFormatStage(tpl) =>
      df.withColumn("line", templateCol(tpl))

    case LabelFormatStage(ops) =>
      val entries = ops.flatMap {
        case (dst, Left(src))  => Seq(lit(dst), coalesce(element_at(col("labels"), src), lit("")))
        case (dst, Right(tpl)) => Seq(lit(dst), templateCol(tpl))
      }
      df.withColumn("labels", map_concat(col("labels"), map(entries: _*)))
        .withColumn("fingerprint", Tables.fingerprintOf(col("labels")))

    case DropStage(keys) =>
      df.withColumn("labels",
          map_filter(col("labels"), (k, _) => !k.isInCollection(keys)))
        .withColumn("fingerprint", Tables.fingerprintOf(col("labels")))

    case KeepStage(keys) =>
      df.withColumn("labels",
          map_filter(col("labels"), (k, _) => k.isInCollection(keys)))
        .withColumn("fingerprint", Tables.fingerprintOf(col("labels")))

    case UnwrapStage(l, conv) =>
      val raw = element_at(col("labels"), l)
      val v = conv match {
        case Some("bytes") => raw.cast("double") // TODO: KB/MiB suffix parse
        case Some(_)       => raw.cast("double") // duration_seconds
        case None          => raw.cast("double")
      }
      df.withColumn("value", v).filter(col("value").isNotNull)
  }

  /** Selector + pipeline → log-stream DataFrame.
    *
    * Plan shape at scale: matchers that only touch ingest-time labels are
    * evaluated on the series dictionary (`time_series`) and the fact table
    * is semi-joined on fingerprint (broadcast — the dictionary is ~1e6 rows
    * when samples are 1e12). Here both live in one derived view, so the
    * filter applies directly and Catalyst pushes it into the scan.
    */
  def compileLog(sel: Selector, stages: Seq[Stage]): DataFrame = {
    var df = Tables.logs(spark, dir)
      .filter(col("timestamp_ns") >= params.startNs &&
              col("timestamp_ns") < params.endNs)
    for (m <- sel.matchers) df = df.filter(matcherCond(m))
    stages.foldLeft(df)(applyStage)
  }

  // --- metric expressions ------------------------------------------------

  def compileMetric(e: Expr): DataFrame = e match {
    case ra: RangeAgg     => compileRangeAgg(ra)
    case va: VectorAgg    => compileVectorAgg(va)
    case BinOp(op, l, r)  => compileBinOp(op, l, r)
    case Cmp(l, op, rhs)  => compileMetric(l).filter(cmpCond(col("value"), op, rhs))
    case ScalarLit(v)     => // degenerate: a scalar as a 1-row frame
      spark.range(1).select(lit(0L).as("ts"), lit(0L).as("fingerprint"),
        map().cast(MapType(StringType, StringType)).as("labels"), lit(v).as("value"))
    case LogExpr(_, _)    => throw new IllegalArgumentException("log expr has no metric value")
  }

  private def cmpCond(c: Column, op: String, n: Double): Column = op match {
    case ">"  => c > n
    case ">=" => c >= n
    case "<"  => c < n
    case "<=" => c <= n
    case "==" => c === n
    case "!=" => c =!= n
  }

  /** Time-bucket a sample to the step grid. `offset` shifts the window
    * back, which is equivalent to shifting sample timestamps forward.
    * When range == step the buckets tumble (one bucket per sample — a plain
    * groupBy, map-side partial aggregated). When range > step a sample
    * contributes to every step whose lookback covers it: explode over the
    * covering eval points (`sequence`) — the same shape the reference uses
    * for window densification (`fill_gaps.go:80-124`), and shuffle volume
    * grows only by the range/step ratio.
    */
  /** Exact long floor-to-multiple (ns timestamps exceed double's 2^53 exact
    * range, so `floor(ts/step)*step` via double FP would misbucket samples
    * that land within a few hundred ns of a boundary).
    */
  private def floorTo(c: Column, step: Long): Column = c - pmod(c, lit(step))

  private def bucketed(df0: DataFrame, rangeS: Long, offsetS: Long): DataFrame = {
    val rangeNs = rangeS * 1000000000L
    val tsEff = col("timestamp_ns") + lit(offsetS * 1000000000L)
    if (rangeNs == stepNs)
      df0.withColumn("bucket_ns", floorTo(tsEff, stepNs))
    else {
      // eval points t (bucket starts): t <= ts_eff < t + range
      val firstT = floorTo(tsEff - rangeNs, stepNs) + stepNs
      val lastT = floorTo(tsEff, stepNs)
      df0.withColumn("bucket_ns",
        explode(sequence(greatest(firstT, lit((params.startNs / stepNs) * stepNs)),
          lastT, lit(stepNs))))
    }
  }

  private def compileRangeAgg(ra: RangeAgg): DataFrame = {
    val base = compileLog(ra.range.selector, ra.range.stages)
    if (ra.fn == "absent_over_time") return compileAbsent(ra, base)

    val b = bucketed(base, ra.range.rangeS, ra.range.offsetS)
    val rangeS = ra.range.rangeS.toDouble

    // optional by/without re-keying at the range level
    val (keyed, keyCols) =
      if (ra.by.nonEmpty) {
        val nl = map_filter(col("labels"), (k, _) => k.isInCollection(ra.by))
        (b.withColumn("labels", nl)
          .withColumn("fingerprint", Tables.fingerprintOf(col("labels"))),
          Seq(col("fingerprint")))
      } else if (ra.without.nonEmpty) {
        val nl = map_filter(col("labels"), (k, _) => !k.isInCollection(ra.without))
        (b.withColumn("labels", nl)
          .withColumn("fingerprint", Tables.fingerprintOf(col("labels"))),
          Seq(col("fingerprint")))
      } else (b, Seq(col("fingerprint")))

    val agg: Column = ra.fn match {
      case "rate"              => count(lit(1)) / rangeS
      case "count_over_time"   => count(lit(1)).cast("double")
      case "bytes_over_time"   => sum(length(col("line"))).cast("double")
      case "bytes_rate"        => sum(length(col("line"))) / rangeS
      case "sum_over_time"     => sum(col("value"))
      case "avg_over_time"     => avg(col("value"))
      case "max_over_time"     => max(col("value"))
      case "min_over_time"     => min(col("value"))
      case "first_over_time"   => min_by(col("value"), col("timestamp_ns"))
      case "last_over_time"    => max_by(col("value"), col("timestamp_ns"))
      case "stddev_over_time"  => stddev_pop(col("value"))
      case "stdvar_over_time"  => var_pop(col("value"))
      case "quantile_over_time" =>
        // exact interpolated percentile == DuckDB quantile_cont; swap to
        // percentile_approx for sketch-sized state at 100 TB.
        percentile(col("value"), lit(ra.param.get))
      case other => throw new IllegalArgumentException(s"range fn $other")
    }

    keyed
      .groupBy(keyCols :+ col("bucket_ns"): _*)
      .agg(first(col("labels")).as("labels"), agg.as("value"))
      .select(col("fingerprint"), col("labels"),
        expr("bucket_ns div 1000000000").as("ts"), col("value"))
  }

  /** absent_over_time: 1 for every step bucket with NO samples for the
    * selector (reference: Go-side `absent_over_time.go:11-29` over a dense
    * step array). Step grid anti-joined with observed buckets.
    */
  private def compileAbsent(ra: RangeAgg, base: DataFrame): DataFrame = {
    val grid = spark.range(params.startNs / stepNs, params.endNs / stepNs)
      .select((col("id") * stepNs).cast("long").as("bucket_ns"))
    val present = bucketed(base, ra.range.rangeS, ra.range.offsetS)
      .select(col("bucket_ns")).distinct()
    grid.join(present, Seq("bucket_ns"), "left_anti")
      .select(lit(0L).as("fingerprint"),
        map().cast(MapType(StringType, StringType)).as("labels"),
        expr("bucket_ns div 1000000000").as("ts"),
        lit(1.0).as("value"))
  }

  private def compileVectorAgg(va: VectorAgg): DataFrame = {
    val inner = compileMetric(va.inner)
    va.fn match {
      case "topk" | "bottomk" =>
        // Reference: groupArray + arraySort + arraySlice per timestamp
        // (`planner_topk.go:16-70`) — here a rank window per eval point.
        // Tiebreak on the canonical label JSON (not the fingerprint hash)
        // so results are reproducible by any engine.
        val k = va.param.get.toInt
        val tie = to_json(map_from_entries(array_sort(map_entries(col("labels")))))
        val ord = if (va.fn == "topk")
          Seq(col("value").desc, tie.asc)
        else Seq(col("value").asc, tie.asc)
        val w = Window.partitionBy(col("ts")).orderBy(ord: _*)
        inner.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= k).drop("__rn")
      case fn =>
        val rekeyed =
          if (va.by.nonEmpty)
            inner.withColumn("labels",
              map_filter(col("labels"), (key, _) => key.isInCollection(va.by)))
          else if (va.without.nonEmpty)
            inner.withColumn("labels",
              map_filter(col("labels"), (key, _) => !key.isInCollection(va.without)))
          else inner.withColumn("labels",
            map().cast(MapType(StringType, StringType)))
        val agg: Column = fn match {
          case "sum"    => sum(col("value"))
          case "min"    => min(col("value"))
          case "max"    => max(col("value"))
          case "avg"    => avg(col("value"))
          case "count"  => count(lit(1)).cast("double")
          case "stddev" => stddev_pop(col("value"))
          case "stdvar" => var_pop(col("value"))
        }
        rekeyed
          .withColumn("fingerprint", Tables.fingerprintOf(col("labels")))
          .groupBy(col("fingerprint"), col("ts"))
          .agg(first(col("labels")).as("labels"), agg.as("value"))
          .select(col("fingerprint"), col("labels"), col("ts"), col("value"))
    }
  }

  /** Binary arithmetic: inner join on (fingerprint, ts) — the reference
    * needs either a UNION ALL + re-aggregation SQL trick
    * (`planner_binary_expr.go`) or a RAM hash merge
    * (`planner_binary_ram.go:28-221`); in Spark it is a plain equi-join,
    * broadcast by AQE when one side is small.
    */
  private def compileBinOp(op: String, l: Expr, r: Expr): DataFrame = {
    def arith(a: Column, b: Column): Column = op match {
      case "+" => a + b
      case "-" => a - b
      case "*" => a * b
      case "/" => a / b
      case "%" => a % b
    }
    (l, r) match {
      case (ScalarLit(v), rhs) =>
        compileMetric(rhs).withColumn("value", arith(lit(v), col("value")))
      case (lhs, ScalarLit(v)) =>
        compileMetric(lhs).withColumn("value", arith(col("value"), lit(v)))
      case (lhs, rhs) =>
        val lf = compileMetric(lhs).withColumnRenamed("value", "__l")
        val rf = compileMetric(rhs).select(col("fingerprint"), col("ts"),
          col("value").as("__r"))
        lf.join(rf, Seq("fingerprint", "ts"))
          .withColumn("value", arith(col("__l"), col("__r")))
          .select(col("fingerprint"), col("labels"), col("ts"), col("value"))
    }
  }
}
