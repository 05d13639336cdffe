package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.gates.EvalWindow._
import graft.logql.EvalParams

class StreamingSpec extends SparkSpec {

  test("live tail filters a structured stream with compiled predicates") {
    implicit val sqlCtx = spark.sqlContext
    import graft.TestSpark.spark.implicits._
    val mem = MemoryStream[(Long, String, String)]
    val stream = mem.toDF()
      .select(col("_1").as("timestamp_ns"),
        map(lit("level"), col("_2")).as("labels"), col("_3").as("line"))
    val tailed = LiveTail(stream, """{level="error"} |= "boom"""")
    val q = tailed.writeStream.format("memory").queryName("tail_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, "error", "it went boom"), (2L, "info", "boom too"),
        (3L, "error", "quiet"), (4L, "error", "boom again"))
      q.processAllAvailable()
      val got = spark.table("tail_out").select("timestamp_ns")
        .collect().map(_.getLong(0)).sorted
      assert(got.sameElements(Array(1L, 4L)))
    } finally q.stop()
  }

  test("live tail applies parser stages (json extract + label filter)") {
    import graft.TestSpark.spark.implicits._
    val df = Seq(
      (1L, "error", """{"k":"7","msg":"keep"}"""),
      (2L, "error", """{"k":"3","msg":"drop"}"""),
      (3L, "info", """{"k":"9","msg":"wrong level"}"""))
      .toDF("timestamp_ns", "l", "line")
      .select(col("timestamp_ns"), map(lit("level"), col("l")).as("labels"), col("line"))
    val out = LiveTail(df, """{level="error"} | json | k >= 5""").collect()
    assert(out.length == 1)
    assert(out(0).getAs[Map[String, String]]("labels")("k") == "7")
  }

  test("live tail still rejects metric queries") {
    import graft.TestSpark.spark.implicits._
    val df = Seq((1L, "error", "x")).toDF("timestamp_ns", "l", "line")
      .select(col("timestamp_ns"), map(lit("level"), col("l")).as("labels"), col("line"))
    intercept[IllegalArgumentException] {
      LiveTail(df, """count_over_time({level="error"}[5m])""")
    }
  }

  test("ruler records a metric query and appends on re-eval") {
    val path = new java.io.File(Ruler.recordedPath(sf))
    if (path.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(path)
    }
    val params = EvalParams(StartNs, EndNs, StepS)
    val rule = """sum by (event_type) (count_over_time({level="info"}[6h]))"""
    val n1 = Ruler.record(spark, sf, "info_events_6h", rule, params)
    assert(n1 > 0)
    val stored = Ruler.recorded(spark, sf)
    assert(stored.count() == n1)
    val names = stored.select(element_at(col("labels"), "__name__")).distinct()
      .collect().map(_.getString(0))
    assert(names.sameElements(Array("info_events_6h")))
    val n2 = Ruler.record(spark, sf, "info_events_6h", rule, params)
    assert(Ruler.recorded(spark, sf).count() == n1 + n2)
  }

  test("pruneHealth evicts health of removed rules, keeps live ones") {
    import graft.streaming.Rules
    import graft.streaming.Rules.{Rule, RuleGroup}
    val params = EvalParams(StartNs, EndNs, StepS)
    val g = RuleGroup("ph_g", 30, Seq(
      Rule(record = "ph_live", expr = "vector(1)"),
      Rule(record = "ph_stale", expr = "vector(2)")))
    Rules.setGroup(spark, sf, "prom", "ph_ns", g)
    Rules.recordGroup(spark, sf, "prom", "ph_ns", "ph_g", params)
    def healthRules() = Rules.listRules(spark, sf, "prom")
      .filter(col("file") === "ph_ns")
      .select(col("rule_name"), col("health"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(healthRules() == Map("ph_live" -> "ok", "ph_stale" -> "ok"))
    // drop ph_stale from the group; the next evaluation pass prunes its
    // health row (manager_test.go:132-152 semantics)
    Rules.setGroup(spark, sf, "prom", "ph_ns",
      RuleGroup("ph_g", 30, Seq(Rule(record = "ph_live", expr = "vector(1)"))))
    Rules.recordGroup(spark, sf, "prom", "ph_ns", "ph_g", params)
    assert(healthRules() == Map("ph_live" -> "ok"))
    Rules.deleteNamespace(spark, sf, "prom", "ph_ns")
  }

  test("watermark drops late rows in append mode; batch accepts them") {
    implicit val sqlCtx = spark.sqlContext
    import graft.TestSpark.spark.implicits._
    val base = 1704067200L
    val mem = MemoryStream[(Long, String)]
    val agg = mem.toDF()
      .select(timestamp_seconds(col("_1")).as("ts"), col("_2").as("k"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k")).count()
    val q = agg.writeStream.format("memory").queryName("late_sink")
      .outputMode("append").start()
    try {
      mem.addData((base, "a"), (base + 3600, "a"))
      q.processAllAvailable() // watermark advances to base+3000
      mem.addData((base + 100, "a"), (base + 7200, "a")) // +100 is LATE
      q.processAllAvailable()
      val first = spark.table("late_sink")
        .filter(col("window.start").cast("long") === base)
        .select("count").collect()
      assert(first.map(_.getLong(0)).toSeq == Seq(1L)) // late row dropped
      // the batch path counts the same rows without a watermark: 2
      val batch = Seq(base, base + 3600, base + 100, base + 7200)
        .toDF("s").select(timestamp_seconds(col("s")).as("ts"))
        .groupBy(window(col("ts"), "10 minutes")).count()
        .filter(col("window.start").cast("long") === base)
        .select("count").collect()
      assert(batch.map(_.getLong(0)).toSeq == Seq(2L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps per-key state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.TestSpark.spark.implicits._
    import StatefulOps._
    val mem = MemoryStream[KV]
    val out = breaches(mem.toDS())
    val q = out.writeStream.format("memory").queryName("breach_sink")
      .outputMode("append").start()
    try {
      mem.addData(KV("a", 1, 1.0), KV("a", 2, 3.0), KV("a", 3, 2.0),
        KV("b", 1, 5.0))
      q.processAllAvailable()
      // batch 2: a=2.5 is BELOW a's historical max 3.0 — only 4.0 breaches
      mem.addData(KV("a", 4, 2.5), KV("a", 5, 4.0), KV("b", 2, 5.0))
      q.processAllAvailable()
      val got = spark.table("breach_sink").as[Breach].collect()
        .sortBy(b => (b.k, b.ts))
      assert(got.map(b => (b.k, b.ts, b.v)).toSeq ==
        Seq(("a", 1L, 1.0), ("a", 2L, 3.0), ("a", 5L, 4.0), ("b", 1L, 5.0)))
      // the cross-batch breach carries the batch-1 max as its prevMax
      assert(got.find(b => b.k == "a" && b.ts == 5L).get.prevMax == 3.0)
    } finally q.stop()
  }

  test("foreachBatch pattern state fold equals one-shot mining") {
    implicit val sqlCtx = spark.sqlContext
    import graft.TestSpark.spark.implicits._
    import graft.patterns.Patterns
    val b1 = Seq(("s", "req 1 ok"), ("s", "req 2 ok"), ("t", "a b"))
    val b2 = Seq(("s", "req 3 failed"), ("s", "warm up"), ("t", "a c"))
    val statePath = "/root/repo/target/test-pattern-state"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(statePath))
    // done-markers live NEXT to the state dir — stale ones would skip folds
    Option(new java.io.File(statePath).getParentFile.listFiles())
      .foreach(_.filter(_.getName.startsWith("test-pattern-state.done"))
        .foreach(f => f.delete(): Unit))
    val mem = MemoryStream[(String, String)]
    val stream = mem.toDF()
      .select(col("_1").as("stream"), col("_2").as("line"))
    val q = stream.writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        PatternsStream.foldBatch(b, statePath, id))
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // replaying an already-folded batch is a no-op (exactly-once)
    PatternsStream.foldBatch(
      b2.toDF("stream", "line"), statePath, 1L)
    val state = PatternsStream.readState(spark, statePath).get
      .orderBy("stream", "pattern").collect()
    val oneShot = Patterns.mineLines((b1 ++ b2).toDF("stream", "line"))
      .orderBy("stream", "pattern").collect()
    assert(state.length == oneShot.length && state.nonEmpty)
    state.zip(oneShot).foreach { case (s, o) =>
      assert(s.getAs[String]("pattern") == o.getAs[String]("pattern"))
      assert(s.getAs[Long]("samples_count") == o.getAs[Long]("samples_count"))
    }
  }

  test("streaming exact dedup: first-ARRIVED copy stays canonical across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.TestSpark.spark.implicits._
    import StatefulOps._
    val mem = MemoryStream[DocHash]
    val out = streamingExactDedup(mem.toDS())
    val q = out.writeStream.format("memory").queryName("sed_sink")
      .outputMode("append").start()
    try {
      // batch 1: doc 10 introduces hash hA; within-batch tie 7 vs 9 on hB
      mem.addData(DocHash(10L, "hA"), DocHash(9L, "hB"), DocHash(7L, "hB"))
      q.processAllAvailable()
      // batch 2: doc 3 repeats hA — SMALLER id, but 10 arrived first and
      // stays canonical (the already-ingested copy is the one kept)
      mem.addData(DocHash(3L, "hA"), DocHash(11L, "hB"))
      q.processAllAvailable()
      val got = spark.table("sed_sink").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got(10L) == (10L, 0L))
      assert(got(3L) == (10L, 1L)) // first-arrival beats smaller id
      assert(got(7L) == (7L, 0L) && got(9L) == (7L, 1L)) // in-batch: min id
      assert(got(11L) == (7L, 1L)) // state persisted across batches
    } finally q.stop()
  }

  test("streaming exact dedup survives the RocksDB state-store provider") {
    implicit val sqlCtx = spark.sqlContext
    import graft.TestSpark.spark.implicits._
    import StatefulOps._
    val got = withStateProvider(spark, RocksDbProvider) {
      val mem = MemoryStream[DocHash]
      val out = streamingExactDedup(mem.toDS())
      val q = out.writeStream.format("memory").queryName("sed_rocks_sink")
        .outputMode("append").start()
      try {
        mem.addData(DocHash(10L, "hA"), DocHash(9L, "hB"), DocHash(7L, "hB"))
        q.processAllAvailable()
        mem.addData(DocHash(3L, "hA"), DocHash(11L, "hB"))
        q.processAllAvailable()
        spark.table("sed_rocks_sink").collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      } finally q.stop()
    }
    // identical decisions to the default-provider run above: cross-batch
    // first-arrival state survives the provider choice
    assert(got(10L) == (10L, 0L))
    assert(got(3L) == (10L, 1L))
    assert(got(7L) == (7L, 0L) && got(9L) == (7L, 1L))
    assert(got(11L) == (7L, 1L))
    // and the provider conf is restored for subsequent queries
    assert(!spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
      .contains(RocksDbProvider))
  }

  test("streaming alert states: episodes survive a mid-episode batch split") {
    implicit val sqlCtx = spark.sqlContext
    import graft.TestSpark.spark.implicits._
    import StatefulOps._
    val step = 60L
    val t0 = 1704067200L
    // one series, actives at t0, t0+60, t0+120 (episode of 3), a gap,
    // then t0+300 (fresh episode). for = 2 steps -> firing at t0+120.
    val evals = Seq(0L, 60L, 120L, 300L).map(d =>
      AlertEval("s1", t0 + d, 42.0))
    def run(batches: Seq[Seq[AlertEval]]): Seq[AlertRow] = {
      val mem = MemoryStream[AlertEval]
      val q = streamingAlertStates(mem.toDS(), step, 2 * step)
        .writeStream.format("memory").queryName("alert_sink")
        .outputMode("append").start()
      try {
        for (b <- batches) { mem.addData(b: _*); q.processAllAvailable() }
        spark.table("alert_sink").as[AlertRow].collect().toSeq.sortBy(_.ts)
      } finally { q.stop(); spark.catalog.dropTempView("alert_sink"): Unit }
    }
    val want = Seq(
      AlertRow("s1", t0, 42.0, t0, "pending"),
      AlertRow("s1", t0 + 60, 42.0, t0, "pending"),
      AlertRow("s1", t0 + 120, 42.0, t0, "firing"), // held 2 steps
      AlertRow("s1", t0 + 300, 42.0, t0 + 300, "pending")) // gap reset
    // one batch, a MID-EPISODE split (the firing tick arrives in batch 2
    // and must inherit batch 1's active_since), and a per-tick replay
    assert(run(Seq(evals)) == want)
    assert(run(Seq(evals.take(2), evals.drop(2))) == want)
    assert(run(evals.map(Seq(_))) == want)
  }

  test("incremental near-dup replay is split-invariant: 3-way == one-shot") {
    import graft.llm.Dedup
    import graft.model.Tables
    val d = Tables.documents(spark, sf)
    val parts = (0 to 2).map(r => d.filter(col("doc_id") % 3 === r))
    // replay: each batch checks within itself and against all earlier ones
    val replayed = parts.zipWithIndex.flatMap { case (b, i) =>
      Dedup.nearDupPairs(b, 0.8).select(col("i"), col("j")) +:
        parts.take(i).map(prev =>
          Dedup.incrementalNearDups(b, prev, 0.8).select(col("i"), col("j")))
    }.reduce(_ unionByName _)
      .select(least(col("i"), col("j")).as("i"),
        greatest(col("i"), col("j")).as("j"))
    val oneShot = Dedup.nearDupPairs(d, 0.8).select(col("i"), col("j"))
    assert(replayed.exceptAll(oneShot).count() == 0)
    assert(oneShot.exceptAll(replayed).count() == 0)
  }
}
