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

  /** The DuckDB twin of [[bm25TopK]] (kept adjacent so the two stay in
    * lock-step — same tokenization, same stats, same rounding).
    */
  def bm25OracleSql(terms: Seq[String], k: Int): String = {
    val tfDefs = terms.indices.map(i =>
      s"len(list_filter(ws, x -> x = '${terms(i)}'))::DOUBLE AS tf_$i").mkString(",\n  ")
    val dfDefs = terms.indices.map(i =>
      s"sum((tf_$i > 0)::INT)::DOUBLE AS df_$i").mkString(", ")
    val score = terms.indices.map { i =>
      s"(ln((n_docs - df_$i + 0.5) / (df_$i + 0.5) + 1.0) * tf_$i * ${K1 + 1.0} / " +
        s"(tf_$i + $K1 * (${1.0 - B} + $B * dl / avgdl)))"
    }.mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
       |base AS (SELECT doc_id, len(ws)::DOUBLE AS dl,
       |  $tfDefs
       |  FROM toks),
       |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl, $dfDefs FROM base)
       |SELECT doc_id, round($score, 6) AS bm25
       |FROM base, st
       |WHERE round($score, 6) > 0
       |ORDER BY 2 DESC, 1 LIMIT $k""".stripMargin
  }
}
