package graft.store

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.gates.EvalWindow._
import graft.logql.{EvalParams, LogQLCompiler, LogQLParser}

class StoreSpec extends SparkSpec {

  private def engine =
    new LogQLCompiler(spark, sf, EvalParams(StartNs, EndNs, StepS))

  private def scanPaths(q: String): Seq[String] =
    engine.compileMetric(LogQLParser.parseOrThrow(q))
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.mkString(",")
      }

  test("eligible range agg routes to the metrics_15s downsample") {
    val paths = scanPaths("""sum by (event_type) (rate({level="info"}[6h]))""")
    assert(paths.exists(_.contains("metrics_15s")), paths.mkString("; "))
  }

  test("pipeline stages disqualify the downsample route") {
    val paths = scanPaths("""sum by (user) (count_over_time({level="info"} |= "7" [6h]))""")
    assert(!paths.exists(_.contains("metrics_15s")), paths.mkString("; "))
    assert(paths.exists(_.contains("samples")), paths.mkString("; "))
  }

  test("non-15s-aligned range disqualifies the downsample route") {
    val paths = scanPaths("""sum by (event_type) (count_over_time({level="info"}[6h7s]))""")
    assert(!paths.exists(_.contains("metrics_15s")), paths.mkString("; "))
  }

  test("PromQL exact over_time fns route to the 15s gauge downsample") {
    val prom = new graft.promql.PromQLCompiler(spark, sf,
      graft.promql.PromParams(StartNs, EndNs, StepS))
    def paths(q: String) = prom.compile(q).queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.mkString(",")
    }
    assert(paths("""last_over_time(events_value[6h])""")
      .exists(_.contains("prom_gauge_15s")))
    assert(paths("""count_over_time(events_value{event_type="click"}[12h])""")
      .exists(_.contains("prom_gauge_15s")))
    // FP-order-sensitive aggs stay on raw samples
    assert(!paths("""avg_over_time(events_value[12h])""")
      .exists(_.contains("prom_gauge_15s")))
    // unaligned range stays raw
    assert(!paths("""last_over_time(events_value[6h7s])""")
      .exists(_.contains("prom_gauge_15s")))
  }

  test("TraceQL attr scan routes to the materialized span store, date-pruned") {
    import graft.traceql.{TraceQLCompiler, TraceQLParser}
    import graft.traceql.TraceQLAst._
    // one-day window inside the 31-day dataset: partition pruning must
    // both appear in the plan and actually drop partitions
    val dayNs = 86400L * 1000000000L
    val eng = new TraceQLCompiler(spark, sf, StartNs, StartNs + dayNs)
    val Query(Sel(ss), _, _, _, _, _) =
      TraceQLParser.parseOrThrow("""{ .name="error" }"""): @unchecked
    val scans = eng.spanSetSpans(ss).queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val attrScan = scans.find(
      _.relation.location.rootPaths.mkString(",").contains("span_attrs"))
    assert(attrScan.isDefined, scans.map(_.relation.location.rootPaths.mkString).mkString("; "))
    assert(attrScan.get.partitionFilters.exists(_.toString.contains("date")))
    assert(attrScan.get.relation.location.listFiles(
      attrScan.get.partitionFilters, Nil).size <= 4) // ≤2 of 31 days × 2 oids
  }

  test("GIN hit-prefilter pushes the OR-of-leaves predicate into the scan") {
    import graft.traceql.{TraceQLCompiler, TraceQLParser}
    import graft.traceql.TraceQLAst._
    val eng = new TraceQLCompiler(spark, sf, StartNs, EndNs)
    val Query(Sel(ss), _, _, _, _, _) =
      TraceQLParser.parseOrThrow("""{ .name="error" && .service_name="svc1" }"""): @unchecked
    val scans = eng.spanSetSpans(ss).queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val attrScan = scans.find(
      _.relation.location.rootPaths.mkString(",").contains("span_attrs")).get
    // the leaf predicates must reach the parquet reader as pushed data
    // filters (row-group skipping on the (key, val) sort), not live only
    // in a post-scan Filter
    val pushed = attrScan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("key") && pushed.contains("val"), pushed)
  }

  test("profiles scan routes to the materialized store") {
    val paths = graft.prof.Profiles.profiles(spark, sf)
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.mkString(",")
      }
    assert(paths.exists(p => p.contains("graft-store") && p.contains("/profiles")),
      paths.mkString("; "))
  }

  test("dictionary broadcast is guarded by the size threshold") {
    // disable stats-driven auto-broadcast so the plan shows only the
    // effect of the guard's explicit hint
    def hasBroadcast(q: String): Boolean =
      engine.compileMetric(LogQLParser.parseOrThrow(q))
        .queryExecution.executedPlan.toString.contains("BroadcastHashJoin")
    val q = """sum by (user) (count_over_time({level="info"} |= "7" [6h7s]))"""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(hasBroadcast(q)) // guard's hint broadcasts the small dict
      spark.conf.set("spark.graft.broadcast.maxDictRows", "0")
      try assert(!hasBroadcast(q)) // huge dict: no hint → shuffle join
      finally spark.conf.unset("spark.graft.broadcast.maxDictRows")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("store path and derive path agree on a stage-bearing query") {
    val q = """sum by (user) (sum_over_time({event_type="click"} | json | unwrap k [6h]))"""
    val viaStore = engine.compileMetric(LogQLParser.parseOrThrow(q))
      .select(element_at(col("labels"), "user").as("u"), col("ts"), col("value"))
      .orderBy("u", "ts").collect()
    spark.conf.set("spark.graft.store.disabled", "true")
    try {
      val derived = engine.compileMetric(LogQLParser.parseOrThrow(q))
        .select(element_at(col("labels"), "user").as("u"), col("ts"), col("value"))
        .orderBy("u", "ts").collect()
      assert(viaStore.length == derived.length && viaStore.length > 0)
      viaStore.zip(derived).foreach { case (a, b) =>
        assert(a.getString(0) == b.getString(0) && a.getLong(1) == b.getLong(1))
        assert(math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-9)
      }
    } finally spark.conf.set("spark.graft.store.disabled", "false")
  }

  test("descendant closure table agrees with the iterative-walk fallback") {
    import graft.traceql.{TraceQLCompiler, TraceQLParser}
    val eng = new TraceQLCompiler(spark, sf, StartNs, EndNs)
    val q = TraceQLParser.parseOrThrow("""{ .name="view" } >> { .name="purchase" }""")
    val viaClosure = eng.matchingTraces(q.expr).orderBy("trace_id")
      .collect().map(_.getLong(0))
    spark.conf.set("spark.graft.store.disabled", "true")
    try {
      val viaWalk = eng.matchingTraces(q.expr).orderBy("trace_id")
        .collect().map(_.getLong(0))
      assert(viaClosure.nonEmpty && viaClosure.sameElements(viaWalk))
    } finally spark.conf.set("spark.graft.store.disabled", "false")
  }

  test("tenant conf prunes to the tenant's oid partitions") {
    import graft.traceql.{TraceQLCompiler, TraceQLParser}
    import graft.traceql.TraceQLAst._
    val Query(Sel(ss), _, _, _, _, _) =
      TraceQLParser.parseOrThrow("""{ .name="click" }"""): @unchecked
    def build() = new TraceQLCompiler(spark, sf, StartNs, EndNs).spanSetSpans(ss)
    val total = build().count()
    spark.conf.set("spark.graft.tenant", "1")
    try {
      val df = build()
      val scans = df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val attrScan = scans.find(
        _.relation.location.rootPaths.mkString(",").contains("span_attrs")).get
      assert(attrScan.partitionFilters.exists(_.toString.contains("oid")))
      val t1 = df.count()
      assert(t1 > 0 && t1 < total, s"$t1 of $total")
    } finally spark.conf.unset("spark.graft.tenant")
  }

  test("tenant conf scopes LogQL samples+dictionary consistently") {
    val q = """sum by (event_type) (count_over_time({level="info"}[6h]))"""
    def total() = engine.compileMetric(LogQLParser.parseOrThrow(q))
      .agg(sum("value")).collect()(0).getDouble(0)
    val all = total()
    var perTenant = 0.0
    for (t <- Seq("0", "1")) {
      spark.conf.set("spark.graft.tenant", t)
      try perTenant += total()
      finally spark.conf.unset("spark.graft.tenant")
    }
    // the two tenants' series partition the stream set exactly
    assert(math.abs(perTenant - all) < 1e-6, s"$perTenant vs $all")
    spark.conf.set("spark.graft.tenant", "0")
    try assert(total() < all)
    finally spark.conf.unset("spark.graft.tenant")
  }

  test("expire drops partitions before the cutoff, later queries unaffected") {
    // scratch root so the shared store is untouched
    val root = "/root/repo/target/test-expire"
    val s = spark
    import s.implicits._
    Store.expireRoot(spark, root, "9999-12-31") // clean slate
    Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"))
      .toDF("v", "date")
      .write.mode("overwrite").partitionBy("date")
      .parquet(s"$root/samples")
    Store.expireRoot(spark, root, "2024-01-03")
    val left = spark.read.parquet(s"$root/samples")
    assert(left.select("v").collect().map(_.getLong(0)).sorted.toSeq == Seq(3L))
    assert(!new java.io.File(s"$root/samples/date=2024-01-01").exists())
    assert(new java.io.File(s"$root/samples/date=2024-01-03").exists())
    // the REAL store layout nests date= under oid= (tenant-first
    // partition key) — expire must reach one level down
    Seq((1L, "0", "2024-01-01"), (2L, "1", "2024-01-02"),
      (3L, "0", "2024-01-03"))
      .toDF("v", "oid", "date")
      .write.mode("overwrite").partitionBy("oid", "date")
      .parquet(s"$root/spans")
    Store.expireRoot(spark, root, "2024-01-03")
    assert(spark.read.parquet(s"$root/spans")
      .select("v").collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(!new java.io.File(s"$root/spans/oid=0/date=2024-01-01").exists())
    assert(!new java.io.File(s"$root/spans/oid=1/date=2024-01-02").exists())
    assert(new java.io.File(s"$root/spans/oid=0/date=2024-01-03").exists())
  }

  test("compact merges small-file partitions without changing results") {
    val root = "/root/repo/target/test-compact"
    val s = spark
    import s.implicits._
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(root))
    // 5 micro-batch appends → ≥5 part files in the one partition
    for (i <- 1 to 5)
      Seq((i.toLong, s"2024-01-0$i", "2024-01-01")).toDF("v", "tag", "date")
        .write.mode("append").partitionBy("date").parquet(s"$root/samples")
    def files() = new java.io.File(s"$root/samples/date=2024-01-01")
      .listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(files() >= 5)
    val before = spark.read.parquet(s"$root/samples")
      .orderBy("v").collect().map(_.getLong(0)).toSeq
    val n = Store.compactRoot(spark, root, "samples", Seq("v"), maxFiles = 2)
    assert(n == 1)
    assert(files() == 1)
    val after = spark.read.parquet(s"$root/samples")
      .orderBy("v").collect().map(_.getLong(0)).toSeq
    assert(after == before)
  }

  test("compaction swap is crash-safe: a fault between the two renames " +
      "leaves both copies on disk, and the next maintain pass recovers " +
      "the table byte-identically") {
    val root = "/root/repo/target/test-crash"
    val s = spark
    import s.implicits._
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(root))
    for (i <- 1 to 5)
      Seq((i.toLong, "2024-01-01")).toDF("v", "date")
        .write.mode("append").partitionBy("date").parquet(s"$root/samples")
    val before = spark.read.parquet(s"$root/samples")
      .orderBy("v").collect().map(_.getLong(0)).toSeq
    val leaf = new java.io.File(s"$root/samples/date=2024-01-01")
    // crash in the WORST window: live leaf renamed away, new data not yet
    // promoted — both `.old` (original) and `.compact` (new) on disk
    Store.compactFaultHook = _ => throw new RuntimeException("injected crash")
    try intercept[RuntimeException] {
      Store.compactRoot(spark, root, "samples", Seq("v"), maxFiles = 2)
    } finally Store.compactFaultHook = _ => ()
    assert(!leaf.exists(), "live leaf should be absent in the crash window")
    assert(new java.io.File(leaf.getPath + ".old").exists())
    assert(new java.io.File(leaf.getPath + ".compact").exists())
    // the next maintenance pass recovers BEFORE selecting leaves: the
    // complete new copy is promoted, scratch dirs are gone, contents match
    val n = Store.compactRoot(spark, root, "samples", Seq("v"), maxFiles = 2)
    assert(leaf.exists() && !new java.io.File(leaf.getPath + ".old").exists()
      && !new java.io.File(leaf.getPath + ".compact").exists(), s"n=$n")
    val after = spark.read.parquet(s"$root/samples")
      .orderBy("v").collect().map(_.getLong(0)).toSeq
    assert(after == before)
    // an orphaned `.compact` NEXT TO a live leaf (crash before any
    // rename) is garbage: the sweep deletes it and keeps the live data
    val stray = new java.io.File(leaf.getPath + ".compact")
    Seq((99L, "x")).toDF("v", "junk").write.parquet(stray.getPath)
    Store.compactRoot(spark, root, "samples", Seq("v"), maxFiles = 2)
    assert(leaf.exists() && !stray.exists())
    assert(spark.read.parquet(s"$root/samples")
      .orderBy("v").collect().map(_.getLong(0)).toSeq == before)
  }

  test("maintenance walks run through the Hadoop FileSystem API: a " +
      "scheme-qualified file: root compacts and expires like a bare path") {
    val root = "file:/root/repo/target/test-fsuri"
    val local = "/root/repo/target/test-fsuri"
    val s = spark
    import s.implicits._
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(local))
    for (i <- 1 to 4)
      Seq((i.toLong, "2024-01-01"), (i.toLong + 10, "2023-12-31"))
        .toDF("v", "date")
        .write.mode("append").partitionBy("date").parquet(s"$root/samples")
    assert(Store.compactRoot(spark, root, "samples", Seq("v"), maxFiles = 2) == 2)
    assert(new java.io.File(s"$local/samples/date=2024-01-01")
      .listFiles().count(_.getName.endsWith(".parquet")) == 1)
    Store.expireRoot(spark, root, "2024-01-01")
    assert(!new java.io.File(s"$local/samples/date=2023-12-31").exists())
    assert(spark.read.parquet(s"$root/samples")
      .select("v").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("writer lock: a second live writer is refused; crashed holders " +
      "(dead pid or stale heartbeat) are detected and broken") {
    val root = "/root/repo/target/test-wlock"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(root))
    new java.io.File(root).mkdirs()
    val mine = new WriterLock(root)
    mine.ensureHeld()
    assert(new java.io.File(root, "_writer.lock").exists())
    assert(mine.isHeld)
    mine.ensureHeld() // re-entrant
    // a second "process" (live foreign owner simulated by another lock
    // instance; OUR pid is alive, so no takeover) gets a clean refusal
    val other = new WriterLock(root, owner = "foreign@elsewhere")
    val e = intercept[IllegalStateException](other.ensureHeld())
    assert(e.getMessage.contains("owned by live writer"), e.getMessage)
    // crashed same-host holder: dead pid ⇒ broken and taken over
    mine.release()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_writer.lock"),
      s"999999999@${WriterLock.host}".getBytes("UTF-8"))
    val taker = new WriterLock(root, owner = "taker@elsewhere")
    taker.ensureHeld()
    assert(taker.isHeld)
    taker.release()
    // stale heartbeat from an unknown host: broken after staleMs
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_writer.lock"),
      "1@unknownhost".getBytes("UTF-8"))
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 3600L * 1000)
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(root, "_writer.lock"), old)
    val taker2 = new WriterLock(root, owner = "taker2@elsewhere",
      staleMs = 60 * 1000)
    taker2.ensureHeld()
    assert(taker2.isHeld)
    // but a FRESH foreign heartbeat within staleMs still refuses
    val taker3 = new WriterLock(root, owner = "taker3@elsewhere",
      staleMs = 60 * 1000)
    intercept[IllegalStateException](taker3.ensureHeld())
    taker2.release()
  }

  test("writer lock fencing: a holder whose lock was broken and retaken " +
      "is fenced out on its next heartbeat instead of reclaiming; the " +
      "background heartbeat keeps an IDLE live holder unbreakable") {
    val root = "/root/repo/target/test-wlock-fence"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(root))
    new java.io.File(root).mkdirs()
    val hfs = Store.fsFor(root)._1
    val lockPath = new org.apache.hadoop.fs.Path(root, "_writer.lock")
    // the taker writes through the same FileSystem API a real writer
    // process would (LocalFileSystem keeps checksum sidecars in sync)
    def takeoverAs(owner: String): Unit = {
      val o = hfs.create(lockPath, true)
      o.write(owner.getBytes("UTF-8")); o.close()
    }

    // takeover (another process broke a stale-looking lock and re-acquired
    // it): the old holder's next fenced heartbeat must read back the owner
    // and FAIL, not re-overwrite — two live writers on one root is the
    // split-brain the lock prevents
    val mine = new WriterLock(root) // default staleMs: no background race
    mine.ensureHeld()
    takeoverAs("taker@elsewhere")
    val e = intercept[IllegalStateException](mine.beatNow())
    assert(e.getMessage.contains("fenced"), e.getMessage)
    assert(!mine.isHeld && mine.fencedOutBy.contains("taker@elsewhere"))
    // fenced-out is terminal: every subsequent mutation attempt refuses
    val e2 = intercept[IllegalStateException](mine.ensureHeld())
    assert(e2.getMessage.contains("fenced"), e2.getMessage)
    hfs.delete(lockPath, false)

    // a lock BROKEN but not yet retaken (file gone): the fenced heartbeat
    // may reclaim it — but only through the exclusive create
    val again = new WriterLock(root, owner = "again@elsewhere")
    again.ensureHeld()
    hfs.delete(lockPath, false)
    again.beatNow() // reclaims via create-exclusive
    assert(again.isHeld && hfs.exists(lockPath))
    again.release()

    // idle-but-live holder: the daemon heartbeat refreshes the mtime even
    // with no appends, so a second process using the same staleMs never
    // sees a stale heartbeat and is refused for as long as we live
    val idle = new WriterLock(root, owner = "idle@elsewhere", staleMs = 400)
    idle.ensureHeld()
    Thread.sleep(900) // > staleMs: without beats this would look crashed
    val taker = new WriterLock(root, owner = "taker2@elsewhere",
      staleMs = 2000) // wide margin: only a dead heartbeat lets it in
    intercept[IllegalStateException](taker.ensureHeld())
    idle.release()
  }

  test("negative dir probes expire: a family first pushed by ANOTHER " +
      "process becomes visible to a read-only replica without a restart") {
    val base = s"/root/repo/target/test-probe/${System.nanoTime()}"
    val p = s"$base/prom_pushed"
    assert(!Store.haveDir(p)) // probed absent, cached
    new java.io.File(p).mkdirs() // the WRITER process creates it
    assert(!Store.haveDir(p)) // inside the TTL: still served from cache
    val old = Store.probeNegativeTtlMs
    Store.probeNegativeTtlMs = 0
    try {
      assert(Store.haveDir(p)) // TTL elapsed: re-probed, now present
      Store.probeNegativeTtlMs = old
      assert(Store.haveDir(p)) // present is cached forever
    } finally Store.probeNegativeTtlMs = old
  }

  test("reader cache expires for non-writer processes: files appended by " +
      "ANOTHER process appear after the refresh bound") {
    val s = spark
    import s.implicits._
    val p = s"/root/repo/target/test-readers/${System.nanoTime()}/t"
    Seq(1L, 2L).toDF("v").write.parquet(p)
    assert(Store.readTable(spark, p).count() == 2)
    // the "writer process" appends behind our back
    Seq(3L).toDF("v").write.mode("append").parquet(p)
    assert(Store.readTable(spark, p).count() == 2) // cached file index
    val old = Store.replicaRefreshMs
    Store.replicaRefreshMs = 0
    try assert(Store.readTable(spark, p).count() == 3) // re-resolved
    finally Store.replicaRefreshMs = old
  }

  test("downsample partial merge is exact and idempotent: split partials " +
      "fold to the single-pass row, and re-merging is a no-op") {
    val s = spark
    import s.implicits._
    // two partial rows per bucket (two independent pushes) + one lone row
    val partials = Seq(
      // (family, fingerprint, bucket, last, last_ts, min, max, sum, cnt)
      ("m", 1L, 0L, 5.0, 100L, 2.0, 5.0, 7.0, 2L),
      ("m", 1L, 0L, 9.0, 200L, 1.0, 9.0, 10.0, 2L),
      ("m", 2L, 0L, 4.0, 50L, 4.0, 4.0, 4.0, 1L))
      .toDF("family", "fingerprint", "timestamp_ns", "last", "last_ts",
        "min", "max", "sum", "cnt")
    val merged = Store.mergePartials(partials)
      .orderBy("fingerprint").collect()
      .map(r => (r.getLong(1), r.getDouble(3), r.getLong(4), r.getDouble(5),
        r.getDouble(6), r.getDouble(7), r.getLong(8))).toSeq
    assert(merged == Seq(
      (1L, 9.0, 200L, 1.0, 9.0, 17.0, 4L), // argmax-by-last_ts, fold, sums
      (2L, 4.0, 50L, 4.0, 4.0, 4.0, 1L)))
    // idempotent: merging an already-merged frame changes nothing
    val twice = Store.mergePartials(Store.mergePartials(partials))
      .orderBy("fingerprint").collect()
      .map(r => (r.getLong(1), r.getDouble(3), r.getLong(4), r.getDouble(5),
        r.getDouble(6), r.getDouble(7), r.getLong(8))).toSeq
    assert(twice == merged)
  }

  test("maxRecordsPerFile bounds store output batches") {
    val root = "/root/repo/target/test-maxrec"
    val s = spark
    import s.implicits._
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(root))
    spark.conf.set("spark.graft.store.maxRecordsPerFile", "100")
    try {
      // one partition's 1000 rows must split into ≥10 bounded files
      val df = (0L until 1000L).toDF("fingerprint")
        .withColumn("timestamp_ns", lit(1704067200L) * 1000000000L)
        .coalesce(1)
      Store.writePartitioned(df, s"$root/samples",
        Seq("fingerprint", "timestamp_ns"))
      val parts = new java.io.File(root)
        .listFiles().filter(_.getName == "samples").flatMap(_.listFiles())
        .filter(_.getName.startsWith("oid=")).flatMap(_.listFiles())
        .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
      assert(parts >= 10, s"expected >=10 bounded part files, got $parts")
      assert(spark.read.parquet(s"$root/samples").count() == 1000L)
    } finally spark.conf.unset("spark.graft.store.maxRecordsPerFile")
  }

  test("ensure is single-build-safe under concurrent first callers") {
    // a scratch data dir (events.parquet only) gets its own store root;
    // four threads race the first build — exactly one must win, and the
    // store must be fully readable afterwards
    val scratch = new java.io.File("/root/repo/target/test-concurrent-dir")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(scratch); rm(new java.io.File(Store.rootFor(scratch.getPath)))
    scratch.mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf, "events.parquet"),
      java.nio.file.Paths.get(scratch.getPath, "events.parquet"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val roots = Await.result(
      Future.sequence((1 to 4).map(_ => Future(Store.ensure(spark, scratch.getPath)))),
      5.minutes)
    assert(roots.distinct.size == 1)
    val n = spark.read.parquet(roots.head + "/samples").count()
    assert(n == spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("store reads are identical across session timezones") {
    // date partitions are epoch-day derived (Store.withDate), so a store
    // written under one session timezone and read under another must
    // prune identically — to_date(timestamp_seconds(...)) would not
    val q = """sum by (event_type) (count_over_time({level="info"}[6h]))"""
    def run() = engine.compileMetric(LogQLParser.parseOrThrow(q))
      .select(element_at(col("labels"), "event_type").as("e"),
        col("ts"), col("value"))
      .orderBy("e", "ts").collect()
    val utc = run()
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati") // UTC+14
    try {
      val shifted = run()
      assert(utc.length == shifted.length && utc.length > 0)
      utc.zip(shifted).foreach { case (a, b) => assert(a == b) }
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("reliable-checkpoint mode gives identical iterative results") {
    import graft.traceql.{TraceQLCompiler, TraceQLParser}
    val q = TraceQLParser.parseOrThrow("""{ .name="view" } >> { .name="purchase" }""")
    // the >> fallback walk is the deepest Materialize() user
    spark.conf.set("spark.graft.store.disabled", "true")
    try {
      val eng = new TraceQLCompiler(spark, sf, StartNs, EndNs)
      val local = eng.matchingTraces(q.expr).orderBy("trace_id")
        .collect().map(_.getLong(0))
      spark.conf.set("spark.graft.checkpoint.reliable", "true")
      try {
        val reliable = eng.matchingTraces(q.expr).orderBy("trace_id")
          .collect().map(_.getLong(0))
        assert(local.nonEmpty && local.sameElements(reliable))
      } finally spark.conf.unset("spark.graft.checkpoint.reliable")
    } finally spark.conf.set("spark.graft.store.disabled", "false")
  }

  test("appendSpans/appendMetrics/appendProfiles land in the queryable " +
      "store: attrs GIN, ancestor closure, pushed-family PromQL, profiles") {
    // tmp copy: appends mutate the dir's store, and the shared sf0.001
    // store's contents are load-bearing for other suites
    val tmp = java.nio.file.Files.createTempDirectory("graft-append").toFile
    tmp.deleteOnExit()
    for (f <- new java.io.File(sf).listFiles(); if f.getName.endsWith(".parquet"))
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(tmp, f.getName).toPath)
    val dir = tmp.getAbsolutePath
    val s = spark
    import s.implicits._
    val ts = 1704100000000000000L // inside the 2024-01 window

    // --- spans: parent+child in one trace, attrs exploded, closure row --
    val spansBatch = Seq(
      (900001L, 1L, Option.empty[Long], "push-root", "pushsvc", ts, 5000L,
        Map("name" -> "push-root", "service_name" -> "pushsvc", "zone" -> "eu")),
      (900001L, 2L, Option(1L), "push-leaf", "pushsvc", ts + 1000, 2000L,
        Map("name" -> "push-leaf", "service_name" -> "pushsvc", "zone" -> "eu")))
      .toDF("trace_id", "span_id", "parent_id", "name", "service_name",
        "timestamp_ns", "duration_ns", "attrs")
    assert(Store.appendSpans(spark, dir, spansBatch) == 2)
    val got = Store.spans(spark, dir, ts - 1, ts + 10000)
      .filter(col("trace_id") === 900001L)
    assert(got.count() == 2)
    // stored schema stayed the build-time one (null-filled extras)
    assert(got.columns.contains("user_id"))
    val attrs = Store.spanAttrs(spark, dir, ts - 1, ts + 10000)
      .filter(col("trace_id") === 900001L && col("key") === "zone")
    assert(attrs.count() == 2)
    val anc = Store.ancestors(spark, dir, ts - 1, ts + 10000)
      .filter(col("trace_id") === 900001L)
      .select("span_id", "anc_id").as[(Long, Long)].collect().toSet
    assert(anc == Set((2L, 1L)))
    // TraceQL end-to-end over the pushed trace
    import graft.traceql.{TraceQLCompiler, TraceQLParser}
    val tql = new TraceQLCompiler(spark, dir, ts - 1, ts + 10000)
    val metas = tql.traceMeta(
      TraceQLParser.parseOrThrow("""{ .zone="eu" }""").expr).collect()
    assert(metas.map(_.getLong(0)).contains(900001L))

    // --- metrics: a NEW family becomes PromQL-queryable + API-visible --
    val mBatch = Seq(
      (ts, Map("__name__" -> "http_requests_total", "job" -> "push"), 1.0),
      (ts + 15000000000L, Map("__name__" -> "http_requests_total", "job" -> "push"), 3.0))
      .toDF("timestamp_ns", "labels", "value")
      .withColumn("fingerprint",
        graft.model.Tables.fingerprintOf(col("labels")))
    assert(Store.appendMetrics(spark, dir, mBatch) == 2)
    val fact = Store.promMetric(spark, dir, "http_requests_total",
      ts - 1, ts + 20000000000L)
    assert(fact.isDefined && fact.get.count() == 2)
    // built families are unaffected by the fallback
    assert(Store.promMetric(spark, dir, "events_value", ts - 1, ts + 1).isDefined)
    assert(Store.promMetric(spark, dir, "no_such_metric", 0, 1).exists(_.count() == 0))
    val fams = graft.promql.PromQLApi.labelValues(spark, dir, "__name__")
      .collect().map(_.getString(0)).toSet
    assert(fams.contains("http_requests_total"), fams)
    val meta = graft.promql.PromQLApi.metadata(spark, dir)
      .filter(col("metric_name") === "http_requests_total").collect()
    assert(meta.length == 1 && meta(0).getString(1) == "unknown")
    // dictionary append is idempotent: same series pushed again, 1 row
    assert(Store.appendMetrics(spark, dir, mBatch) == 2)
    assert(Store.promSeriesPushed(spark, dir)
      .filter(col("family") === "http_requests_total").count() == 1)
    // PromQL compiler evaluates the pushed family end-to-end
    import graft.promql.{PromParams, PromQLCompiler}
    val tSec = (ts + 15000000000L) / 1000000000L
    val v = new PromQLCompiler(spark, dir,
        PromParams(tSec * 1000000000L, tSec * 1000000000L, 15L))
      .compile("""http_requests_total{job="push"}""")
      .collect()
    assert(v.length == 1 && v(0).getAs[Double]("value") == 3.0)

    // --- profiles: pushed rows merge into the service's flame tree -----
    val pBatch = Seq((990001L, "pushprof", ts, "process_cpu:cpu:nanoseconds",
      Seq(("cpu", "nanoseconds")),
      Seq(("service_name", "pushprof")),
      Seq((0L, 1L, "main", 0L, 70L), (1L, 2L, "work", 70L, 70L))))
      .toDF("profile_id", "service_name", "timestamp_ns", "type_id",
        "sample_types_units", "tags", "tree")
      .withColumn("sample_types_units",
        expr("transform(sample_types_units, x -> struct(x._1 as stype, x._2 as unit))"))
      .withColumn("tags",
        expr("transform(tags, x -> struct(x._1 as key, x._2 as val))"))
      .withColumn("tree",
        expr("transform(tree, x -> struct(x._1 as parent, x._2 as node, " +
          "x._3 as fn, x._4 as self, x._5 as total))"))
    assert(Store.appendProfiles(spark, dir, pBatch) == 1)
    val tree = graft.prof.Profiles.mergeTree(spark, dir, "pushprof")
      .orderBy("node").collect()
    assert(tree.length == 2 && tree.map(_.getAs[String]("fn")).toSeq ==
      Seq("main", "work"))

    // null timestamps reject the whole batch, nothing written
    val bad = Seq((900002L, 9L, Option.empty[Long], "x", "y",
      Option.empty[Long], 1L, Map.empty[String, String]))
      .toDF("trace_id", "span_id", "parent_id", "name", "service_name",
        "timestamp_ns", "duration_ns", "attrs")
    intercept[IllegalArgumentException](Store.appendSpans(spark, dir, bad))
    assert(Store.spans(spark, dir, 0, Long.MaxValue)
      .filter(col("trace_id") === 900002L).count() == 0)
  }

  test("append closure driver fast path agrees with the distributed " +
      "fallback on split-trace pushes (children first)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-closure").toFile
    tmp.deleteOnExit()
    for (f <- new java.io.File(sf).listFiles(); if f.getName.endsWith(".parquet"))
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(tmp, f.getName).toPath)
    val dir = tmp.getAbsolutePath
    val s = spark
    import s.implicits._
    val ts = 1704100000000000000L
    // root(1) → b(2) → c(3) → d(4), pushed CHILDREN-FIRST across two
    // requests — the cross-batch repair case
    def push(trace: Long, rows: Seq[(Long, Option[Long])]): Unit = {
      val df = rows.map { case (id, p) =>
        (trace, id, p, s"n$id", "closvc", ts + id, 10L,
          Map("name" -> s"n$id")) }
        .toDF("trace_id", "span_id", "parent_id", "name", "service_name",
          "timestamp_ns", "duration_ns", "attrs")
      assert(Store.appendSpans(spark, dir, df) == rows.size)
    }
    def closure(trace: Long): Set[(Long, Long)] =
      Store.ancestors(spark, dir, ts - 1, ts + 100)
        .filter(col("trace_id") === trace)
        .select("span_id", "anc_id").as[(Long, Long)].collect().toSet
    val expected = Set((2L, 1L), (3L, 2L), (3L, 1L), (4L, 3L), (4L, 2L),
      (4L, 1L))
    // driver fast path (default cap)
    push(910001L, Seq(3L -> Some(2L), 4L -> Some(3L)))
    push(910001L, Seq(1L -> None, 2L -> Some(1L)))
    assert(closure(910001L) == expected)
    // distributed fallback (cap 0) on an identical trace shape
    spark.conf.set("spark.graft.closure.driverMax", "0")
    try {
      push(910002L, Seq(3L -> Some(2L), 4L -> Some(3L)))
      push(910002L, Seq(1L -> None, 2L -> Some(1L)))
    } finally spark.conf.unset("spark.graft.closure.driverMax")
    assert(closure(910002L) == expected)

    // CYCLIC parent pointers (self-parent, a→b→a — hostile or buggy
    // clients): both paths emit each closure row exactly ONCE instead of
    // walking the cycle up to the depth cap and landing duplicates that
    // double-count >>/<< structural matches
    def closureRows(trace: Long): Seq[(Long, Long)] =
      Store.ancestors(spark, dir, ts - 1, ts + 100)
        .filter(col("trace_id") === trace)
        .select("span_id", "anc_id").as[(Long, Long)].collect().toSeq
    val cyc = Set((5L, 5L), (6L, 7L), (6L, 6L), (7L, 6L), (7L, 7L))
    push(910003L, Seq(5L -> Some(5L), 6L -> Some(7L), 7L -> Some(6L)))
    val gotDriver = closureRows(910003L)
    assert(gotDriver.size == cyc.size && gotDriver.toSet == cyc,
      gotDriver.sorted.mkString("; "))
    spark.conf.set("spark.graft.closure.driverMax", "0")
    try push(910004L, Seq(5L -> Some(5L), 6L -> Some(7L), 7L -> Some(6L)))
    finally spark.conf.unset("spark.graft.closure.driverMax")
    val gotDist = closureRows(910004L)
    assert(gotDist.size == cyc.size && gotDist.toSet == cyc,
      gotDist.sorted.mkString("; "))
  }

  test("downsample and raw paths agree on rate values") {
    val q = """sum by (event_type) (rate({level="info"}[12h]))"""
    val ds = engine.compileMetric(LogQLParser.parseOrThrow(q))
      .agg(sum("value")).collect()(0).getDouble(0)
    spark.conf.set("spark.graft.store.disabled", "true")
    try {
      val raw = engine.compileMetric(LogQLParser.parseOrThrow(q))
        .agg(sum("value")).collect()(0).getDouble(0)
      assert(math.abs(ds - raw) < 1e-6, s"$ds vs $raw")
    } finally spark.conf.set("spark.graft.store.disabled", "false")
  }
}
