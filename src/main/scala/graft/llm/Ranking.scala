package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword-relevance ranking for corpus curation: BM25 (Robertson/Spärck
  * Jones, the Lucene `k1`/`b` formulation) over the whitespace-tokenized
  * document text. A training-data pipeline uses this to pull the
  * most-relevant slice of a web-scale corpus for a topic seed list without
  * building an inverted index first.
  *
  * Shape (the 100 TB plan): for a FIXED small term list the whole score is
  * a narrow per-row expression — token split + one `filter(...)` count per
  * term — so the scan stays in one whole-stage-codegen span with full
  * column pruning. The only wide operations are (a) one tiny global
  * aggregate (corpus size, avg doc length, per-term document frequencies:
  * ONE row) that is broadcast back, and (b) the final top-k, which Spark
  * executes as per-partition partial top-k + a driver merge of k-row
  * heads (TakeOrderedAndProject), never a full sort shuffle.
  */
object Ranking {

  val K1 = 1.2
  val B = 0.75

  /** BM25 top-k: (doc_id, bm25 rounded to 6dp), score descending,
    * doc_id ascending on equal rounded scores (deterministic under the
    * DuckDB twin — ties compare on the rounded value both sides).
    * Zero-score docs (no query term present) are excluded.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val base = TextOps.rebalanced(docs)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val withTf = terms.indices.foldLeft(base) { (df, i) =>
      df.withColumn(s"tf_$i",
        size(filter(col("toks"), t => t === terms(i))).cast("double"))
    }.drop("toks")
    val corpusStats = withTf.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum((col(s"tf_$i") > 0).cast("double")).as(s"df_$i"))): _*)
    val score: Column = terms.indices.map { i =>
      val tf = col(s"tf_$i")
      val idf = log((col("n_docs") - col(s"df_$i") + 0.5) /
        (col(s"df_$i") + 0.5) + 1.0)
      idf * tf * (K1 + 1.0) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(corpusStats))
      .select(col("doc_id"), round(score, 6).as("bm25"))
      .where(col("bm25") > 0d)
      .orderBy(desc("bm25"), col("doc_id"))
      .limit(k)
  }

  /** Shared DuckDB CTE block computing `round(bm25, 6)` per doc — the twin
    * of the [[bm25TopK]] score pipeline, reused by the plain BM25 oracle
    * and the hybrid-RRF oracle so the two can never drift.
    */
  private def bm25Ctes(terms: Seq[String]): String = {
    val tfDefs = terms.indices.map(i =>
      s"len(list_filter(ws, x -> x = '${terms(i)}'))::DOUBLE AS tf_$i").mkString(",\n  ")
    val dfDefs = terms.indices.map(i =>
      s"sum((tf_$i > 0)::INT)::DOUBLE AS df_$i").mkString(", ")
    val score = terms.indices.map { i =>
      s"(ln((n_docs - df_$i + 0.5) / (df_$i + 0.5) + 1.0) * tf_$i * ${K1 + 1.0} / " +
        s"(tf_$i + $K1 * (${1.0 - B} + $B * dl / avgdl)))"
    }.mkString(" + ")
    s"""toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
       |base AS (SELECT doc_id, len(ws)::DOUBLE AS dl,
       |  $tfDefs
       |  FROM toks),
       |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl, $dfDefs FROM base),
       |scored AS (SELECT doc_id, round($score, 6) AS bm25 FROM base, st)""".stripMargin
  }

  /** The DuckDB twin of [[bm25TopK]] (kept adjacent so the two stay in
    * lock-step — same tokenization, same stats, same rounding).
    */
  def bm25OracleSql(terms: Seq[String], k: Int): String =
    s"""WITH ${bm25Ctes(terms)}
       |SELECT doc_id, bm25 FROM scored
       |WHERE bm25 > 0
       |ORDER BY 2 DESC, 1 LIMIT $k""".stripMargin

  val RrfK = 60 // the standard reciprocal-rank-fusion constant

  /** Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009) of the
    * keyword ranking ([[bm25TopK]]) and the dense ranking
    * ([[Similarity.bruteForceTopK]] from query vector `qid`) over the same
    * corpus: rrf(d) = Σ_lists 1/(60 + rank_list(d)), lists that miss `d`
    * contribute nothing. The first-stage pools are `pool` deep; the fused
    * top-`k` is returned with both source ranks (null = not in that pool).
    *
    * Scale shape: each source list is already a bounded top-`pool`
    * (partial top-k per partition + driver head-merge on the BM25 side,
    * per-query window on the dense side), so the fusion join touches at
    * most 2·pool rows — driver-trivial regardless of corpus size. The
    * expensive parts ARE the source rankings, which keep their own
    * 100 TB shapes.
    */
  def hybridRrfTopK(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      qid: Long, pool: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bmW = Window.orderBy(desc("bm25"), col("doc_id"))
    val bm = bm25TopK(docs, terms, pool)
      .withColumn("r_bm25", row_number().over(bmW).cast("long"))
      .select(col("doc_id"), col("r_bm25"))
    val cos = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") === qid), emb, pool)
      .select(col("nid").as("doc_id"), col("rank").cast("long").as("r_cos"))
    val rrf = coalesce(lit(1.0) / (lit(RrfK) + col("r_bm25")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(RrfK) + col("r_cos")), lit(0.0))
    bm.join(cos, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(rrf, 6))
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("rrf"), col("doc_id")))
          .cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("r_bm25"), col("r_cos"), col("rrf"),
        col("rank"))
  }

  /** DuckDB twin of [[hybridRrfTopK]] — reuses [[bm25Ctes]] verbatim and
    * re-derives the dense ranking with the same cosine the llm_ann_cosine
    * oracle uses.
    */
  def hybridRrfOracleSql(terms: Seq[String], qid: Long, pool: Int,
      k: Int): String =
    s"""WITH ${bm25Ctes(terms)},
       |bm AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_bm25
       |  FROM scored WHERE bm25 > 0
       |  ORDER BY bm25 DESC, doc_id LIMIT $pool),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = $qid),
       |s AS (SELECT e.vec_id AS doc_id,
       |    list_sum([qv[i]*v[i] for i in generate_series(1,64)]) /
       |    (sqrt(list_sum([qv[i]*qv[i] for i in generate_series(1,64)])) *
       |     sqrt(list_sum([v[i]*v[i] for i in generate_series(1,64)]))) AS sim
       |  FROM e CROSS JOIN q WHERE e.vec_id <> $qid),
       |cos AS (SELECT doc_id, r_cos FROM (SELECT doc_id, sim,
       |    row_number() OVER (ORDER BY sim DESC, doc_id) AS r_cos FROM s)
       |  WHERE r_cos <= $pool),
       |fused AS (SELECT coalesce(bm.doc_id, cos.doc_id) AS doc_id,
       |    r_bm25, r_cos,
       |    round(coalesce(1.0/($RrfK + r_bm25)::DOUBLE, 0) +
       |          coalesce(1.0/($RrfK + r_cos)::DOUBLE, 0), 6) AS rrf
       |  FROM bm FULL OUTER JOIN cos ON bm.doc_id = cos.doc_id)
       |SELECT doc_id, r_bm25, r_cos, rrf,
       |  row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
       |FROM fused QUALIFY rank <= $k ORDER BY rank""".stripMargin
}
