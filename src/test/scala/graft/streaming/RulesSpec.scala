package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.gates.EvalWindow._
import graft.logql.EvalParams

/** Rule-group CRUD + evaluation semantics (`ruler/model.go`,
  * `ruler/manager.go`, `ruler/writeback.go`).
  */
class RulesSpec extends SparkSpec {

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmrf))
    f.delete(): Unit
  }

  private def fresh(): Unit = {
    rmrf(new java.io.File(Rules.rulesPath(sf)))
    rmrf(new java.io.File(Rules.rulesPath(sf) + "_marks"))
    rmrf(new java.io.File(Rules.rulesPath(sf) + "_health"))
    rmrf(new java.io.File(Ruler.recordedPath(sf)))
  }

  test("rule group CRUD: set/replace/list/delete across namespaces") {
    fresh()
    val g1 = Rules.RuleGroup("g1", 60, Seq(
      Rules.Rule(record = "r1", expr = "vector(1)")))
    val g2 = Rules.RuleGroup("g2", 300, Seq(
      Rules.Rule(alert = "a1", expr = "vector(2)", forDur = "5m")))
    Rules.setGroup(spark, sf, "prom", "ns1", g1)
    Rules.setGroup(spark, sf, "prom", "ns1", g2)
    Rules.setGroup(spark, sf, "loki", "ns1", g1) // same names, other engine
    Rules.setGroup(spark, sf, "prom", "ns2", g1)

    assert(Rules.groups(spark, sf, "prom", "ns1").map(_.name) == Seq("g1", "g2"))
    assert(Rules.allGroups(spark, sf, "prom").keySet == Set("ns1", "ns2"))

    // replace: same (kind, ns, name) upserts, not duplicates
    Rules.setGroup(spark, sf, "prom", "ns1",
      g1.copy(intervalS = 120))
    val replaced = Rules.groups(spark, sf, "prom", "ns1")
    assert(replaced.map(_.name) == Seq("g1", "g2"))
    assert(replaced.find(_.name == "g1").get.intervalS == 120)

    Rules.deleteGroup(spark, sf, "prom", "ns1", "g2")
    assert(Rules.groups(spark, sf, "prom", "ns1").map(_.name) == Seq("g1"))
    Rules.deleteNamespace(spark, sf, "prom", "ns1")
    assert(Rules.groups(spark, sf, "prom", "ns1").isEmpty)
    // other kind and namespace untouched
    assert(Rules.groups(spark, sf, "loki", "ns1").map(_.name) == Seq("g1"))
    assert(Rules.groups(spark, sf, "prom", "ns2").map(_.name) == Seq("g1"))

    // prune drops the scheduler watermarks of deleted groups (the marks
    // table tracks the live rule set) but keeps live ones and the
    // synthetic _sweep outcome row
    Rules.saveMarks(spark, sf, Seq(
      Rules.MarkRow("prom", "ns1", "g1", 111L), // deleted above
      Rules.MarkRow("prom", "ns2", "g1", 222L))) // live
    Rules.saveHealth(spark, sf, Seq(Rules.HealthRow("prom",
      "_sweep", "_sweep", "_sweep", "err", "boom", 1L, 0.0)))
    Rules.pruneHealth(spark, sf)
    assert(Rules.loadMarks(spark, sf) ==
      Map(("prom", "ns2", "g1") -> 222L))
    assert(Rules.loadHealth(spark, sf)
      .exists(h => h.namespace == "_sweep" && h.health == "err"))
  }

  test("listRules emits the Prometheus rules shape, typed per rule") {
    fresh()
    Rules.setGroup(spark, sf, "prom", "ns1", Rules.RuleGroup("g1", 60, Seq(
      Rules.Rule(record = "rec_rule", expr = "vector(1)"),
      Rules.Rule(alert = "alert_rule", expr = "vector(0)"))))
    val rows = Rules.listRules(spark, sf, "prom")
      .select("file", "group_name", "rule_name", "rule_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(rows.toSet == Set(
      ("ns1", "g1", "alert_rule", "alerting"),
      ("ns1", "g1", "rec_rule", "recording")))
  }

  test("rule health: err rule does not block siblings; listing reports outcomes") {
    fresh()
    Rules.setGroup(spark, sf, "loki", "ns1", Rules.RuleGroup("g1", 60, Seq(
      Rules.Rule(record = "good_rule", expr = "vector(1)"),
      Rules.Rule(record = "bad_rule", expr = "sum(("),
      Rules.Rule(alert = "never_run", expr = "vector(2)"))))
    val n = Rules.recordGroup(spark, sf, "loki", "ns1", "g1",
      EvalParams(StartNs, StartNs + StepS * 1000000000L, StepS))
    assert(n == 2) // good_rule's two grid points landed despite bad_rule
    val rows = Rules.listRules(spark, sf, "loki")
      .select("rule_name", "health", "last_error")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows("good_rule")._1 == "ok" && rows("good_rule")._2 == "")
    assert(rows("bad_rule")._1 == "err" && rows("bad_rule")._2.nonEmpty)
    assert(rows("never_run")._1 == "unknown") // stored, never evaluated
  }

  test("vector(N) shortcut yields one unlabelled sample per eval point") {
    val params = EvalParams(StartNs, StartNs + 4 * StepS * 1000000000L, StepS)
    val rows = Rules.evalVector(spark, sf, "loki", " Vector( 2.5 ) ", params)
      .orderBy("ts").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Map[String, String]]("labels").isEmpty))
    assert(rows.forall(_.getDouble(2) == 2.5))
    assert(rows.map(_.getLong(1)).toSeq ==
      (0 until 5).map(i => StartNs / 1000000000L + i * StepS))
  }

  test("recordGroup evaluates recording rules only; labels merge with precedence") {
    fresh()
    Rules.setGroup(spark, sf, "loki", "ns1", Rules.RuleGroup("g1", 60, Seq(
      Rules.Rule(record = "const_series", expr = "vector(7)",
        labels = Map("team" -> "sre", "__name__" -> "ignored_by_record")),
      Rules.Rule(alert = "NeverRuns", expr = "vector(9)"))))
    val n = Rules.recordGroup(spark, sf, "loki", "ns1", "g1",
      EvalParams(StartNs, StartNs + 2 * StepS * 1000000000L, StepS))
    assert(n == 3)
    val rec = Ruler.recorded(spark, sf)
      .select(element_at(col("labels"), "__name__").as("name"),
        element_at(col("labels"), "team").as("team"), col("value"))
      .collect()
    assert(rec.length == 3)
    // __name__ = record wins over the rule's own __name__ label; static
    // labels attach; the alerting rule contributed nothing
    assert(rec.forall(r => r.getString(0) == "const_series" &&
      r.getString(1) == "sre" && r.getDouble(2) == 7.0))
  }
}
