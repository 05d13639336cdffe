package graft.llm

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.model.Materialize

/** Link-graph operators for crawl curation. A 100 TB web corpus carries a
  * host-level link graph (~10^8 nodes, ~10^10 edges) whose structure ranks
  * domains for crawl prioritization and spam demotion (Page et al. 1999) —
  * the graph-derived signal RefinedWeb/C4-style URL filters sit on top of.
  *
  * Everything is plain DataFrame joins — no GraphX/RDD: each PageRank
  * iteration is ONE keyed shuffle (edges ⋈ ranks on src, re-aggregated on
  * dst) plus two scalar broadcasts (dangling mass, node count). The edge
  * table is deduped and [[Materialize]]d once, so iterations re-read one
  * physical artifact; at cluster scale, pre-partitioning edges by src lets
  * AQE reuse the edge exchange across all iterations and only the (small,
  * node-sized) rank table reshuffles per round.
  */
object Graph {

  /** PageRank with the unnormalized (total-mass = N) convention:
    *
    *   r_0(v)     = 1
    *   r_{t+1}(v) = (1−d) + d·( Σ_{u→v} r_t(u)/outdeg(u) + D_t/N )
    *
    * where D_t = Σ_{dangling u} r_t(u) redistributes sink mass uniformly
    * (the standard dangling-node fix). Edges are deduplicated first
    * (uniform edge weights); self-links participate like any edge.
    *
    * Engine parity: ranks round to 6 dp per iteration BEFORE the next
    * round (the repo's iterative-float rule, as in kmeansRefine), so any
    * engine replaying the same schedule assigns identical ranks; the
    * teleport term is written `1 − d` on both sides so both compute the
    * identical IEEE double.
    *
    * Input: (src, dst) string edge list. Output: (node, rank).
    */
  def pageRank(edges0: DataFrame, iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    val e = Materialize(edges0.select(col("src"), col("dst")).distinct())
    val nodes = Materialize(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val od = Materialize(e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("deg")))
    val nn = nodes.agg(count(lit(1)).cast("double").as("n"))
    val r0 = nodes.withColumn("r", lit(1.0))
    val rFin = (1 to iters).foldLeft(r0) { (r, _) =>
      val dang = r.join(od, r("node") === od("src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0.0)).as("dm"))
      val contrib = e.join(od, "src")
        .join(r.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("r") / col("deg")).as("c"))
      Materialize(nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .crossJoin(broadcast(nn))
        .select(col("node"),
          round(lit(1.0) - lit(damping) + lit(damping) *
            (coalesce(col("c"), lit(0.0)) + col("dm") / col("n")), 6)
            .as("r")))
    }
    rFin.select(col("node"), col("r").as("rank"))
  }

  /** DuckDB twin of [[pageRank]]: `edgesSql` must yield (src, dst); the
    * iteration unrolls structurally — dangling mass, contribution join,
    * per-round 6 dp rounding — one CTE trio per round.
    */
  def pageRankOracleSql(edgesSql: String, iters: Int = 5,
      damping: Double = 0.85): String = {
    def round(k: Int): String = {
      val prev = if (k == 1) "r0" else s"r${k - 1}"
      s"""d$k AS (SELECT coalesce(sum(r), 0)::DOUBLE AS dm
         |  FROM $prev LEFT JOIN od ON $prev.node = od.src WHERE od.deg IS NULL),
         |c$k AS (SELECT e.dst AS node, sum(p.r / od.deg) AS c
         |  FROM e JOIN $prev p ON p.node = e.src JOIN od ON od.src = e.src
         |  GROUP BY 1),
         |r$k AS MATERIALIZED (SELECT n.node,
         |    round(1 - $damping + $damping *
         |      (coalesce(c$k.c, 0) + (SELECT dm FROM d$k) / (SELECT n FROM nn)),
         |      6) AS r
         |  FROM nodes n LEFT JOIN c$k USING (node))""".stripMargin
    }
    s"""WITH e AS (SELECT DISTINCT src, dst FROM ($edgesSql)),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
       |od AS (SELECT src, count(*)::DOUBLE AS deg FROM e GROUP BY 1),
       |r0 AS (SELECT node, 1.0::DOUBLE AS r FROM nodes),
       |${(1 to iters).map(round).mkString(",\n")}
       |SELECT node, r AS rank FROM r$iters ORDER BY node""".stripMargin
  }

  /** Deterministic host-graph fixture shared by the gate and its oracle:
    * each doc links its home host `src<doc_id%20>` to `src<(7·doc_id+3)%20>`
    * (7 coprime to 20 ⇒ every host both links and is linked), and every
    * 50th doc links to a pure sink host with no outlinks — exercising the
    * dangling-mass path.
    */
  def hostEdgesFixture(docs: DataFrame): DataFrame = {
    def host(n: Column): Column =
      concat(lit("src"), n.cast("string"), lit(".example.com"))
    docs.select(host(col("doc_id") % 20).as("src"),
      host((col("doc_id") * 7 + 3) % 20).as("dst"))
      .unionAll(docs.filter(col("doc_id") % 50 === 0)
        .select(host(col("doc_id") % 20).as("src"),
          lit("sink.example.com").as("dst")))
  }

  val HostEdgesFixtureSql: String =
    """SELECT 'src' || (doc_id % 20) || '.example.com' AS src,
      |       'src' || ((doc_id * 7 + 3) % 20) || '.example.com' AS dst
      |  FROM documents
      |UNION ALL
      |SELECT 'src' || (doc_id % 20) || '.example.com', 'sink.example.com'
      |  FROM documents WHERE doc_id % 50 = 0""".stripMargin
}
