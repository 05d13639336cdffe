package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for the traceql store path (not part of the
  * driver contract; run via `sbt "runMain graft.DevProf"`).
  */
object DevProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("entry")) {
      println(s"ENTRY_ROWS=${graft.SparkEntry.entry(spark).count()}")
      spark.stop(); return
    }
    // `plans <outDir> <suffix> <name>...`: write explain("formatted") of
    // each named gate query to <outDir>/<name>_<suffix>.txt (the plan
    // evidence files under plans/r21/)
    if (args.headOption.contains("plans")) {
      val outDir = java.nio.file.Paths.get(args(1))
      java.nio.file.Files.createDirectories(outDir)
      val suffix = args(2)
      graft.store.Store.ensure(spark, dir)
      graft.store.Store.warm(spark, dir)
      val qs = graft.SparkEntry.queries
      for (name <- args.drop(3); fn <- qs.get(name)) {
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"wrote $name")
        } catch { case e: Throwable =>
          println(s"FAILED $name: ${e.getMessage}") }
      }
      spark.stop(); return
    }
    // `gate <name>...`: run named gates with a job-count listener — the
    // dev loop for spotting orchestration-bound entries (many tiny jobs)
    if (args.headOption.contains("gate")) {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val taskNs = new java.util.concurrent.atomic.AtomicLong(0L)
      val sites = new java.util.concurrent.ConcurrentHashMap[String,
        java.util.concurrent.atomic.AtomicInteger]()
      val siteMs = new java.util.concurrent.ConcurrentHashMap[String,
        java.util.concurrent.atomic.AtomicLong]()
      val jobSite = new java.util.concurrent.ConcurrentHashMap[Int,
        (String, Long)]()
      val sqlStart = new java.util.concurrent.ConcurrentHashMap[Long,
        (String, Long)]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val site = Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short")))
              .getOrElse(j.stageInfos.lastOption.map(_.name).getOrElse("?"))
            jobSite.put(j.jobId, (site, j.time)): Unit
            sites.computeIfAbsent(site,
              _ => new java.util.concurrent.atomic.AtomicInteger(0))
              .incrementAndGet(): Unit
            jobs.incrementAndGet(): Unit
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            Option(jobSite.remove(j.jobId)).foreach { case (site, t0) =>
              siteMs.computeIfAbsent(site,
                _ => new java.util.concurrent.atomic.AtomicLong(0L))
                .addAndGet(j.time - t0): Unit
            }
          override def onOtherEvent(
              e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
            e match {
              case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
                sqlStart.put(s.executionId, (s.description, s.time)): Unit
              case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
                Option(sqlStart.remove(s.executionId)).foreach {
                  case (desc, t0) =>
                    val key = desc.linesIterator.nextOption().getOrElse("?")
                      .take(100)
                    siteMs.computeIfAbsent("SQL: " + key,
                      _ => new java.util.concurrent.atomic.AtomicLong(0L))
                      .addAndGet(s.time - t0): Unit
                    sites.computeIfAbsent("SQL: " + key,
                      _ => new java.util.concurrent.atomic.AtomicInteger(0))
                      .incrementAndGet(): Unit
                }
              case _ => ()
            }
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (t.taskMetrics != null)
              taskNs.addAndGet(t.taskMetrics.executorRunTime * 1000000L): Unit
        })
      graft.store.Store.ensure(spark, dir)
      graft.store.Store.warm(spark, dir)
      val qs = graft.SparkEntry.queries
      for (name <- args.drop(1); fn <- qs.get(name); r <- 1 to 2) {
        jobs.set(0); taskNs.set(0L); sites.clear()
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"$name%-32s r$r wall=$wall%7.2f s jobs=${jobs.get()}%4d " +
          f"taskTime=${taskNs.get() / 1e9}%7.2f s rows=$n")
        if (r == 2) {
          import scala.jdk.CollectionConverters._
          sites.asScala.toSeq
            .sortBy { case (s, _) =>
              -siteMs.getOrDefault(s,
                new java.util.concurrent.atomic.AtomicLong(0L)).get() }
            .take(20).foreach { case (s, c) =>
              val ms = siteMs.getOrDefault(s,
                new java.util.concurrent.atomic.AtomicLong(0L)).get()
              println(f"    ${c.get()}%4d jobs ${ms / 1000.0}%7.2f s  $s")
            }
        }
        sites.clear(); siteMs.clear()
      }
      spark.stop(); return
    }
    if (args.contains("aot")) {
      import graft.gates.EvalWindow._
      val c = new graft.promql.PromQLCompiler(spark, dir,
        graft.promql.PromParams(StartNs, EndNs, StepS))
      def t(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n rows)")
      }
      for (i <- 1 to 2) {
        t(s"plain 30m count r$i") {
          c.result("""count_over_time(events_value{event_type="purchase"}[30m])""", Seq("event_type")).count()
        }
        t(s"absent r$i") {
          c.result("""absent(events_value{event_type="nosuch"})""", Nil).count()
        }
        t(s"absent_over_time r$i") {
          c.result("""absent_over_time(events_value{event_type="purchase"}[30m])""", Nil).count()
        }
      }
      spark.stop(); return
    }
    if (args.contains("http")) {
      // stage timing for the HTTP e2e gate's moving parts
      import graft.gates.EvalWindow._
      import graft.http.{Frontend, Params}
      import graft.model.Tables
      def t(name: String)(f: => Any): Unit = {
        val t0 = System.nanoTime()
        val r = f
        println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($r)")
      }
      val tmp = java.nio.file.Files.createTempDirectory("devprof-http").toFile
      tmp.deleteOnExit()
      t("fixture write") {
        Tables.rawEvents(spark, dir)
          .filter(pmod(col("user_id"), lit(17L)) === 0)
          .coalesce(1)
          .write.parquet(tmp.getAbsolutePath + "/events.parquet")
      }
      val tdir = tmp.getAbsolutePath
      t("store ensure") { graft.store.Store.ensure(spark, tdir) }
      val fe = new Frontend(spark, tdir, nowNs = () => StartNs)
      val logs = Tables.logs(spark, tdir)
      for (i <- 1 to 2) {
        val run = s"r$i"
        var body = ""
        t(s"loki body build $run") {
          body = logs
            .groupBy(element_at(col("labels"), "level").as("level"))
            .agg(collect_list(array(col("timestamp_ns").cast("string"),
              col("line"))).as("values"))
            .select(struct(
              map(lit("event_type"), lit("e2e"), lit("level"), col("level"),
                lit("run"), lit(run)).as("stream"),
              col("values").as("values")).as("st"))
            .agg(to_json(struct(collect_list(col("st")).as("streams"))))
            .head.getString(0)
          body.length
        }
        t(s"loki push $run") {
          fe.route("/loki/api/v1/push", Params(), "POST", body).status
        }
        t(s"query_range over http $run") {
          fe.route("/loki/api/v1/query_range", Params(
            "query" -> ("""sum by (event_type, level) (count_over_time(""" +
              s"""{event_type="e2e", run="$run"}[6h]))"""),
            "start" -> StartS.toString, "end" -> EndS.toString,
            "step" -> "6h")).status
        }
        t(s"rules post $run") {
          fe.route(s"/loki/api/v1/rules/e2e-$run", Params(), "POST",
            s"""name: g1
               |interval: 1m
               |rules:
               |  - alert: E2EFlow
               |    expr: "sum by (level) (count_over_time({event_type=\\"e2e\\", run=\\"$run\\"}[6h])) > 0"
               |    for: 12h
               |""".stripMargin).status
        }
        t(s"alert states $run") {
          val rule = graft.streaming.Rules
            .groups(spark, tdir, "loki", s"e2e-$run").head.rules.head
          graft.streaming.Ruler.alertStates(spark, tdir, "E2EFlow",
            rule.expr, graft.streaming.Rules.parseIntervalS(rule.forDur),
            graft.logql.EvalParams(StartNs, EndNs, StepS)).count()
        }
      }
      spark.stop(); return
    }
    if (args.contains("gate")) {
      // repeat-time a named SparkEntry gate in ONE warmed session: run k
      // splits first-run (codegen compile + fresh-plan) cost from the
      // steady-state execution a resident query service sees
      val name = args(args.indexOf("gate") + 1)
      val n = args.lift(args.indexOf("gate") + 2).map(_.toInt).getOrElse(5)
      graft.store.Store.ensure(spark, dir)
      graft.store.Store.warm(spark, dir)
      val fn = graft.SparkEntry.queries(name)
      for (i <- 1 to n) {
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).count()
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%7.3f s ($rows rows)")
      }
      spark.stop(); return
    }
    if (args.contains("plan")) {
      // pruning/pushdown audit for the events scan post ts-normalization:
      // the timestampdiff projection must not widen ReadSchema, and the
      // plan should stay one codegen span scan-to-project
      def scanLines(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("ReadSchema") || l.contains("PushedFilters"))
          .map(_.trim).mkString("\n")
      val oneCol = graft.model.Tables.logs(spark, dir).select(col("timestamp_ns"))
      println("logs->timestamp_ns only:\n" + scanLines(oneCol))
      val filtered = graft.model.Tables.events(spark, dir)
        .filter(col("event_type") === "error").select(col("event_id"))
      println("events filter on stored col:\n" + scanLines(filtered))
      // the plain plan string marks codegen stages with "*(n)"; count
      // distinct stage ids — the 1-col path should be a single span
      val wscg = "\\*\\((\\d+)\\)".r
        .findAllMatchIn(oneCol.queryExecution.executedPlan.toString)
        .map(_.group(1)).toSet.size
      println(s"WSCG spans (logs 1-col): $wscg")
      spark.stop(); return
    }
    if (args.contains("ddm")) {
      import org.apache.spark.sql.functions._
      val g = graft.model.Tables.gaugeSamples(spark, dir)
      def t(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n rows)")
      }
      def bodies = g
        .groupBy(element_at(col("labels"), "event_type").as("et"),
          element_at(col("labels"), "level").as("lv"),
          expr("timestamp_ns div 86400000000000").as("__day"))
        .agg(collect_list(array(col("timestamp_ns") / 1e9,
          col("value"))).as("pts"))
        .select(to_json(struct(array(struct(
          lit("events_value").as("metric"),
          col("pts").as("points"),
          array(concat(lit("event_type:"), col("et")),
            concat(lit("level:"), col("lv"))).as("tags"),
          lit("gauge").as("type"))).as("series"))).as("body"))
      val mat = graft.model.Materialize(bodies)
      if (args.contains("explain")) {
        graft.ingest.WireFormats.decodeDatadogMetrics(mat)
          .groupBy(element_at(col("labels"), "event_type"))
          .agg(count(lit(1)), sum(col("value")))
          .explain("formatted")
        spark.stop(); return
      }
      for (i <- 1 to 2) {
        t(s"encode only r$i")(bodies.count())
        t(s"decode only r$i")(
          graft.ingest.WireFormats.decodeDatadogMetrics(mat).count())
        val dec = graft.ingest.WireFormats.decodeDatadogMetrics(mat)
        t(s"decode+agg r$i")(dec.groupBy(
            element_at(col("labels"), "event_type"))
          .agg(count(lit(1)), sum(col("value"))).count())
      }
      spark.stop(); return
    }
    if (args.contains("curation")) {
      // plan audit for the curation operators: broadcast sides must be
      // broadcast, scans pruned, and the narrow ops single-span
      val docs = graft.model.Tables.documents(spark, dir)
      val emb = graft.model.Tables.embeddings(spark, dir)
      def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val p = df.queryExecution.executedPlan.toString
        val bhj = "BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(p).size
        val smj = "SortMergeJoin".r.findAllIn(p).size
        val ex = "Exchange hashpartitioning|Exchange rangepartitioning".r.findAllIn(p).size
        val scans = p.linesIterator.filter(_.contains("ReadSchema")).map(_.trim).toList
        println(s"== $name: broadcastJoins=$bhj sortMergeJoins=$smj shuffles=$ex")
        scans.foreach(s => println(s"   $s"))
      }
      audit("packSequences", graft.llm.Curation.packSequences(docs, 256))
      audit("domainMix", graft.llm.Curation.domainMix(docs,
        graft.gates.LlmGates.MixRates))
      audit("unigramSurprisal", graft.llm.Curation.unigramSurprisal(docs))
      audit("tfidfTopTerms", graft.llm.Curation.tfidfTopTerms(docs, 5))
      audit("c4Filters", graft.llm.Curation.c4Filters(docs))
      audit("semanticDedup", graft.llm.Curation.semanticDedup(emb, 0.35))
      spark.stop(); return
    }
    if (args.contains("otlpm")) {
      import org.apache.spark.sql.functions._
      val g = graft.model.Tables.gaugeSamples(spark, dir)
      def t(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n rows)")
      }
      val attrs = transform(
        filter(map_entries(col("labels")), e => e.getField("key") =!= "__name__"),
        e => struct(e.getField("key").as("key"),
          struct(e.getField("value").as("stringValue")).as("value")))
      def bodies = g
        .groupBy(col("labels"),
          expr("timestamp_ns div 86400000000000").as("__day"))
        .agg(collect_list(struct(col("timestamp_ns").as("ts"),
          col("value").as("v"))).as("dps"))
        .select(to_json(struct(array(struct(array(struct(array(struct(
          lit("events_value").as("name"),
          struct(transform(col("dps"), d => struct(
            d.getField("ts").cast("string").as("timeUnixNano"),
            d.getField("v").as("asDouble"),
            attrs.as("attributes"))).as("dataPoints")).as("gauge")))
          .as("metrics"))).as("scopeMetrics"))).as("resourceMetrics")))
          .as("body"))
      val mat = graft.model.Materialize(bodies)
      for (i <- 1 to 3) {
        t(s"encode only r$i")(bodies.count())
        t(s"decode only r$i")(
          graft.ingest.WireFormats.decodeOtlpMetrics(mat).count())
        t(s"encode+decode r$i")(
          graft.ingest.WireFormats.decodeOtlpMetrics(bodies).count())
      }
      spark.stop(); return
    }
    if (args.contains("lshprof")) {
      import graft.llm.Dedup
      val docs = graft.model.Tables.documents(spark, dir)
      def t(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n rows)")
      }
      t("docs scan")(docs.count())
      t("shingles")(Dedup.docShingles(docs).count())
      t("minhashSignatures")(Dedup.minhashSignatures(docs).count())
      t("lshBands")(Dedup.lshBands(Dedup.minhashSignatures(docs)).count())
      t("lshCandidates")(Dedup.lshCandidates(docs).count())
      val cand = graft.model.Materialize(Dedup.lshCandidates(docs))
      t("jaccardOf(cand)")(Dedup.jaccardOf(cand, docs).count())
      t("full minhashNearDups")(Dedup.minhashNearDups(docs, 0.5).count())
      spark.stop(); return
    }
    if (args.contains("lshstats")) {
      val docs = graft.model.Tables.documents(spark, dir)
      println(s"docs: ${docs.count()}")
      val sh = graft.llm.Dedup.docShingles(docs)
      println(s"shingle rows: ${sh.count()}")
      val c44 = graft.llm.Dedup.lshCandidates(docs)
      println(s"cand 4x4: ${c44.count()}")
      val c82 = graft.llm.Dedup.lshCandidates(docs, 8, 2)
      println(s"cand 8x2: ${c82.count()}")
      spark.stop(); return
    }
    if (args.contains("lshcheck")) {
      val docs = graft.model.Tables.documents(spark, dir)
      val lsh = graft.llm.Dedup.nearDupPairs(docs, 0.8).select("i", "j")
      val exact = graft.llm.Dedup.ngramJaccardPairs(docs, 0.8).select("i", "j")
      println(s"lsh-only: ${lsh.join(exact, Seq("i", "j"), "left_anti").count()}")
      println(s"exact-only: ${exact.join(lsh, Seq("i", "j"), "left_anti").count()}")
      spark.stop(); return
    }
    graft.store.Store.ensure(spark, dir)
    import graft.gates.EvalWindow._

    def time(name: String)(f: => Long): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-30s run$i: ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
      }

    time("attrs scan count") {
      graft.store.Store.spanAttrs(spark, dir, StartNs, EndNs).count()
    }
    time("spans scan count") {
      graft.store.Store.spans(spark, dir, StartNs, EndNs).count()
    }
    val c = new graft.traceql.TraceQLCompiler(spark, dir, StartNs, EndNs)
    import graft.traceql.TraceQLAst._
    val lCond = SpanSet(Some(StrCond("service_name", "=", "svc1")))
    val rCond = SpanSet(Some(StrCond("name", "=", "click")))
    time("one spanSetSpans agg") { c.spanSetSpans(lCond).count() }
    time("struct_child full") {
      c.matchingTraces(StructChild(Sel(lCond), Sel(rCond))).count()
    }
    time("trace_meta full") { c.traceMeta(Sel(lCond)).count() }
    if (args.contains("explain"))
      c.matchingTraces(StructChild(Sel(lCond), Sel(rCond))).explain("formatted")
    spark.stop()
  }
}
