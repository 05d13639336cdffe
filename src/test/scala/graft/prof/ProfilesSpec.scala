package graft.prof

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ProfilesSpec extends SparkSpec {

  private def tree(rows: (Long, Long, String, Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("parent", "node", "fn", "self", "total")
  }

  test("flamegraph diff zero-fills the side missing a subtree") {
    // left has an extra subtree under node 2 (node 4) that right lacks;
    // right has node 3 with different totals
    val l = tree((0L, 1L, "main", 0L, 100L), (1L, 2L, "a", 10L, 100L),
      (2L, 4L, "left_only", 90L, 90L))
    val r = tree((0L, 1L, "main", 0L, 50L), (1L, 2L, "a", 20L, 50L),
      (2L, 3L, "right_only", 30L, 30L))
    val d = Profiles.flamegraphDiffTrees(l, r).collect()
      .map(x => (x.getAs[String]("fn"), (x.getLong(0), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    assert(d("main") == ((0L, 0L, 100L, 0L, 50L)))
    assert(d("a") == ((1L, 10L, 100L, 20L, 50L)))
    assert(d("left_only") == ((2L, 90L, 90L, 0L, 0L)))
    assert(d("right_only") == ((2L, 0L, 0L, 30L, 30L)))
  }

  test("DOT render: nodes, heat, edges, and top-N pruning") {
    val t = tree((0L, 1L, "main", 0L, 100L), (1L, 2L, "hot", 90L, 90L),
      (1L, 3L, "cold", 10L, 10L))
    val dot = Profiles.toDot(t, title = "t", unit = "ns")
    assert(dot.startsWith("digraph \"t\" {"))
    assert(dot.contains("""N0 [label="total\n100 ns (100%)"""))
    assert(dot.contains("hot\\ntotal: 90 ns (90.0%) self: 90 ns (90.0%)"))
    assert(dot.contains("weight=90"))
    // hot self=90% → font near max; cold self=10% → near min
    assert(dot.contains("fontsize=22") && dot.contains("fontsize=9"))
    val pruned = Profiles.toDot(t, maxNodes = 2)
    assert(pruned.contains("hot") && !pruned.contains("cold"))
    assert(pruned.endsWith("}\n"))
  }

  test("profile types / label APIs / stats over the derived series metadata") {
    val types = Profiles.profileTypes(spark, sf).collect()
    assert(types.map(_.getAs[String]("id")).toSet == Set(
      "process_cpu:cpu:nanoseconds:cpu:nanoseconds",
      "process_cpu:samples:count:cpu:nanoseconds",
      "memory:alloc_space:bytes:space:bytes",
      "memory:alloc_objects:count:space:bytes"))
    assert(Profiles.labelNames(spark, sf).collect().map(_.getString(0))
      .toSeq == Seq("event_type", "host", "service_name"))
    val hosts = Profiles.labelValues(spark, sf, "host", Some("svc1"))
      .collect().map(_.getString(0))
    assert(hosts.forall(_.startsWith("host")) && hosts.length <= 7)
    val svcs = Profiles.labelValues(spark, sf, "service_name")
      .collect().map(_.getString(0)).toSet
    assert(svcs.subsetOf(Set("svc0", "svc1", "svc2", "svc3", "svc4")))
    val st = Profiles.profileStats(spark, sf).head
    assert(st.getAs[Int]("non_empty") == 1)
    assert(st.getAs[Long]("oldest_ms") <= st.getAs[Long]("newest_ms"))
  }

  test("flamegraph diff over real services matches per-side merges") {
    val d = Profiles.flamegraphDiff(spark, sf, "svc1", "svc2")
    val l = Profiles.flamegraphLevels(Profiles.mergeTree(spark, sf, "svc1"))
    assert(d.agg(sum("self_left")).head.getLong(0) ==
      l.agg(sum("self")).head.getLong(0))
    assert(d.filter(col("level") === 0 && col("fn") =!= "main").count() == 0)
  }
}
