package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextOps.mdhash64
import graft.model.Materialize

/** Corpus-curation operators a pretraining data pipeline runs between raw
  * crawl and tokenizer: sequence packing, domain mixing, unigram-LM
  * scoring, TF-IDF keyword extraction, C4-style heuristic filters, and
  * SemDeDup-style semantic dedup. Everything is codegen'd Spark
  * expressions + keyed aggregations — no UDFs — and each operator has an
  * exact DuckDB twin in LlmGates so the driver differential-tests it.
  */
object Curation {

  // --- sequence packing ----------------------------------------------------

  /** Greedy contiguous sequence packing (the GPT-style "concatenate the
    * corpus, cut every `budget` tokens" shape, at document granularity):
    * within each `source`, documents ordered by doc_id fill sequences of
    * `budget` tokens; a document belongs to the sequence its FIRST token
    * lands in (seq_id = floor(tokens-before / budget)).
    *
    * Scale shape: a naive `Window.partitionBy(source).orderBy(doc_id)`
    * running sum puts an entire source in ONE task — the classic prefix-sum
    * skew trap at 100 TB (a single web crawl source is most of the corpus).
    * This is the standard two-level distributed prefix sum instead:
    *   1. shard = floor(doc_id / shardSpan): contiguous, order-preserving
    *      shards of ≤ shardSpan docs;
    *   2. per-(source, shard) token totals — a tiny aggregate (rows =
    *      docs/shardSpan) — get their own running sum, a window over the
    *      AGGREGATE, cheap at any scale;
    *   3. the intra-shard running sum is a window bounded by shardSpan rows.
    * Every wide stage is keyed by (source, shard); no task ever sees more
    * than shardSpan documents.
    */
  def packSequences(docs: DataFrame, budget: Int,
      shardSpan: Int = 4096): DataFrame = {
    val nTokens = size(TextOps.tokens(col("text"))).cast("long")
    val base = docs.select(col("doc_id"), col("source"),
      nTokens.as("n_tokens"),
      floor(col("doc_id") / shardSpan).cast("long").as("__shard"))
    // level 1: running total of whole shards before this one (per source)
    val shardW = Window.partitionBy(col("source")).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val shardOffsets = base.groupBy(col("source"), col("__shard"))
      .agg(sum(col("n_tokens")).as("__shard_toks"))
      .withColumn("__shard_off",
        coalesce(sum(col("__shard_toks")).over(shardW), lit(0L)))
      .drop("__shard_toks")
    // level 2: intra-shard running sum, bounded by shardSpan rows per task
    val intraW = Window.partitionBy(col("source"), col("__shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(shardOffsets, Seq("source", "__shard"))
      .withColumn("__before",
        col("__shard_off") + coalesce(sum(col("n_tokens")).over(intraW), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor(col("__before") / budget).cast("long").as("seq_id"),
        pmod(col("__before"), lit(budget.toLong)).cast("long").as("seq_offset"))
  }

  /** DuckDB twin of [[packSequences]]: the two-level prefix sum collapses
    * to one plain running-sum window (the outputs are identical — the
    * sharding only changes the execution shape, not the math).
    */
  /** Shared CTE chain `t → c(doc_id, source, n_tokens, before)` of the
    * packing oracles.
    */
  def packCtes: String =
    """t AS (SELECT doc_id, source,
      |    len(string_split(lower(text), ' '))::BIGINT AS n_tokens
      |  FROM documents),
      |c AS (SELECT doc_id, source, n_tokens,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      |  FROM t)""".stripMargin

  def packOracleSql(budget: Int): String =
    s"""WITH $packCtes
       |SELECT doc_id, source, n_tokens,
       |  (before // $budget)::BIGINT AS seq_id,
       |  (before % $budget)::BIGINT AS seq_offset
       |FROM c ORDER BY doc_id""".stripMargin

  /** Packing-efficiency report over [[packSequences]] — the per-source
    * training-batch utilization dashboard: sequence count, mean fill
    * rate against the token budget, and how many sequences a document
    * overflows into its neighbor (`spill_seqs`, fill > budget — the
    * cross-boundary carry GPT-style contiguous packing accepts).
    *
    * Scale shape: rides the packing assignment (two-level prefix sums),
    * then two keyed aggregates — (source, seq) then source; output is
    * source-bounded.
    */
  def packReport(docs: DataFrame, budget: Int,
      shardSpan: Int = 64): DataFrame = {
    val p = packSequences(docs, budget, shardSpan)
    val perSeq = p.groupBy(col("source"), col("seq_id"))
      .agg(sum(col("n_tokens")).as("fill"), count(lit(1)).as("ndocs"))
    perSeq.groupBy(col("source"))
      .agg(sum(col("ndocs")).as("n_docs"),
        count(lit(1)).as("n_seqs"),
        sum(col("fill")).as("total_tokens"),
        round(sum(col("fill")).cast("double") /
          (count(lit(1)) * budget), 6).as("fill_rate"),
        sum(when(col("fill") > budget, 1L).otherwise(0L)).as("spill_seqs"))
  }

  /** DuckDB twin of [[packReport]]. */
  def packReportOracleSql(budget: Int): String =
    s"""WITH $packCtes,
       |p AS (SELECT source, before // $budget AS seq_id, n_tokens FROM c),
       |s AS (SELECT source, seq_id, sum(n_tokens) AS fill,
       |    count(*) AS ndocs FROM p GROUP BY 1, 2)
       |SELECT source, sum(ndocs)::BIGINT AS n_docs, count(*)::BIGINT AS n_seqs,
       |  sum(fill)::BIGINT AS total_tokens,
       |  round(sum(fill)::DOUBLE / (count(*) * $budget), 6) AS fill_rate,
       |  sum(CASE WHEN fill > $budget THEN 1 ELSE 0 END)::BIGINT AS spill_seqs
       |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  // --- domain mixing -------------------------------------------------------

  /** Deterministic domain-weight sampling (the data-mixing step: each
    * source kept at its own rate, e.g. up-weight books / down-weight web).
    * Selection is pure per-row hash-thresholding — `h(doc_id) < rate` with
    * the shared md5-derived 60-bit hash — so the sample is reproducible by
    * any engine and stable under corpus growth (a doc's fate never depends
    * on other rows). The weight table is a broadcast join; the whole
    * operator is one narrow codegen'd pass over the scan.
    */
  val MixScale = 1000000L

  def domainMix(docs: DataFrame, rates: Map[String, Double]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = rates.toSeq.toDF("source", "__rate")
    docs.join(broadcast(wdf), Seq("source"))
      .filter(pmod(mdhash64(concat(lit("mix:"), col("doc_id"))), lit(MixScale))
        < col("__rate") * MixScale)
      .select(col("doc_id"), col("source"))
  }

  def domainMixOracleSql(rates: Map[String, Double]): String = {
    val cases = rates.toSeq.sortBy(_._1)
      .map { case (s, r) => s"WHEN source = '$s' THEN $r" }
      .mkString(" ")
    s"""SELECT doc_id, source FROM documents
       |WHERE ('0x'||substr(md5('mix:'||doc_id), 1, 15))::BIGINT % $MixScale
       |  < (CASE $cases ELSE -1 END) * $MixScale
       |ORDER BY doc_id""".stripMargin
  }

  // --- unigram-LM scoring --------------------------------------------------

  /** Per-document mean token surprisal under the corpus's own unigram LM
    * (the CCNet/KenLM quality-scoring shape with the simplest possible LM):
    * score(d) = mean over tokens t of -ln( count(t) / total_tokens ).
    * Low = stereotyped/boilerplate, high = rare-token soup; pipelines keep
    * the middle band.
    *
    * Scale shape: token frequencies are one vocabulary-bounded groupBy
    * (map-side partial agg does the heavy lifting — shuffle rows = vocab,
    * not corpus tokens); the frequency table is broadcast back (a natural
    *-language vocab is small relative to any 100 TB corpus), so the
    * per-doc rescore is a map-side join + one doc-keyed aggregate.
    */
  def unigramSurprisal(docs: DataFrame): DataFrame = {
    // no rebalance: the explode+groupBy pipeline redistributes anyway, and
    // an up-front full-text repartition measured slower at sf1
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    val total = freq.agg(sum(col("tf")).cast("double").as("total"))
    toks.join(broadcast(freq), Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        round(avg(-log(col("tf") / col("total"))), 6).as("surprisal"))
  }

  val UnigramSurprisalOracleSql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |  FROM documents),
      |freq AS (SELECT tok, count(*) AS tf FROM toks GROUP BY 1),
      |tot AS (SELECT sum(tf)::DOUBLE AS total FROM freq)
      |SELECT doc_id, count(*)::BIGINT AS n_tokens,
      |  round(avg(-ln(tf / total)), 6) AS surprisal
      |FROM toks JOIN freq USING (tok) CROSS JOIN tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): hashed unigram+bigram
    * features, a B-bucket target distribution estimated from the docs
    * matching `isTarget` and a raw distribution from the whole corpus,
    * per-document log importance weight `Σ_f ln(p_t[h(f)]/p_r[h(f)])`
    * with add-1 smoothing. `keep` flags documents whose (rounded) weight
    * is positive — more target-like than corpus-average; a sampler would
    * draw ∝ exp(weight).
    *
    * Scale shape: feature explode → one B-bounded groupBy for both
    * distributions (B = `buckets`, constant) → the tiny log-ratio table
    * broadcasts back onto the feature stream → one per-doc sum. Nothing
    * grows beyond the exploded feature stream; 100 TB-safe.
    */
  def dsirWeights(docs: DataFrame, isTarget: Column,
      buckets: Int = 256): DataFrame = {
    // rebalanced: the unigram+bigram explode + per-feature md5 is the
    // heavy narrow stage; a small-file scan would serialize it on one task
    val toks = TextOps.rebalanced(docs)
      .select(col("doc_id"), isTarget.as("is_t"),
        TextOps.tokens(col("text")).as("ws"))
    val m = greatest(size(col("ws")) - 1, lit(0))
    val bigrams = zip_with(slice(col("ws"), lit(1), m),
      slice(col("ws"), lit(2), m), (a, b) => concat(a, lit(" "), b))
    val fb = toks.select(col("doc_id"), col("is_t"),
        explode(concat(col("ws"), bigrams)).as("f"))
      .select(col("doc_id"), col("is_t"),
        pmod(mdhash64(col("f")), lit(buckets.toLong)).as("b"))
    val bc = fb.groupBy(col("b")).agg(count(lit(1)).as("n_r"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("n_t"))
    val tot = bc.agg(sum(col("n_r")).as("t_r"), sum(col("n_t")).as("t_t"))
    val lr = bc.crossJoin(broadcast(tot))
      .select(col("b"),
        (log((col("n_t") + 1).cast("double") / (col("t_t") + buckets)) -
          log((col("n_r") + 1).cast("double") / (col("t_r") + buckets))).as("lw"))
    fb.join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("lw")), 6).as("weight"))
      .select(col("doc_id"), col("weight"), (col("weight") > 0).as("keep"))
  }

  /** DSIR importance RESAMPLING — the selection step the weights exist
    * for (Xie et al. 2023 §3 sample ∝ importance weight): draw n docs
    * without replacement via the Gumbel-top-k trick (Kool et al. 2019)
    * with hash-derived uniforms, so the "random" draw is deterministic
    * and both engines replay it bit-for-bit: u = (h+0.5)/M ∈ (0,1),
    * key = log-weight − ln(−ln u), take the global top-n keys.
    *
    * Scale shape: the weights chain plus ONE narrow pass and a
    * distributed top-n (`orderBy().limit()` → TakeOrderedAndProject:
    * per-partition partial top-n, driver merges n·partitions rows — no
    * global sort). For corpus-sized budgets use [[budgetSelect]]'s
    * two-level prefix sum instead; this is the n ≪ N sampler.
    */
  def dsirResample(docs: DataFrame, isTarget: Column, n: Int): DataFrame = {
    val M = 1000000L
    val u = (pmod(TextOps.mdhash64(concat(lit("dsir:"),
      col("doc_id").cast("string"))), lit(M)).cast("double") + 0.5) / M
    dsirWeights(docs, isTarget)
      // The cut is taken on the 6 dp-ROUNDED key (doc_id tie-break), not
      // the raw one: ln(-ln(u)) is libm-dependent in its last ulp, so a
      // raw-key boundary could select different doc sets per engine. The
      // rounding grid makes the selection boundary engine-invariant —
      // the repo's standard rule for ordering-sensitive float comparisons.
      .withColumn("gumbel_key", round(col("weight") - log(-log(u)), 6))
      .orderBy(col("gumbel_key").desc, col("doc_id"))
      .limit(n)
      .select(col("doc_id"), col("weight"), col("gumbel_key"))
  }

  /** DuckDB twin of [[dsirResample]] with target = `source = 'src0'`. */
  def dsirResampleOracleSql(n: Int, buckets: Int = 256): String = {
    val uExpr = "((('0x'||substr(md5('dsir:'||doc_id::VARCHAR),1,15))::BIGINT" +
      " % 1000000 + 0.5) / 1000000)"
    s"""WITH ${dsirCtes(buckets)},
       |g AS (SELECT doc_id, weight,
       |    round(weight - ln(-ln($uExpr)), 6) AS gumbel_key
       |  FROM w)
       |SELECT * FROM (
       |  SELECT doc_id, weight, gumbel_key
       |  FROM g ORDER BY gumbel_key DESC, doc_id LIMIT $n)
       |ORDER BY gumbel_key DESC, doc_id""".stripMargin
  }

  /** DuckDB twin of [[dsirWeights]] with target = `source = 'src0'`. */
  /** The DSIR oracle's CTE chain ending in `w(doc_id, weight)`, shared by
    * llm_dsir_weights and llm_dsir_resample. Target = `source = 'src0'`.
    */
  def dsirCtes(buckets: Int = 256): String =
    s"""toks AS (SELECT doc_id, source = 'src0' AS is_t,
       |    string_split(lower(text), ' ') AS ws FROM documents),
       |fb AS (SELECT doc_id, is_t,
       |    ('0x'||substr(md5(f),1,15))::BIGINT % $buckets AS b
       |  FROM (SELECT doc_id, is_t,
       |      unnest(list_concat(ws,
       |        [ws[i]||' '||ws[i+1] for i in generate_series(1, len(ws)-1)])) AS f
       |    FROM toks)),
       |bc AS (SELECT b, count(*) AS n_r,
       |    sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS n_t FROM fb GROUP BY 1),
       |tot AS (SELECT sum(n_r) AS t_r, sum(n_t) AS t_t FROM bc),
       |lr AS (SELECT b, ln((n_t+1)::DOUBLE/(t_t+$buckets)) -
       |         ln((n_r+1)::DOUBLE/(t_r+$buckets)) AS lw
       |  FROM bc CROSS JOIN tot),
       |w AS (SELECT doc_id, round(sum(lw), 6) AS weight
       |  FROM fb JOIN lr USING (b) GROUP BY 1)""".stripMargin

  def dsirOracleSql(buckets: Int = 256): String =
    s"""WITH ${dsirCtes(buckets)}
       |SELECT doc_id, weight, weight > 0 AS keep
       |FROM w ORDER BY doc_id""".stripMargin

  /** Per-document mean bigram surprisal under an add-k-smoothed bigram LM
    * trained on the corpus itself (the CCNet/KenLM perplexity-filter shape
    * one order up from [[unigramSurprisal]]):
    * `-ln((c(w1,w2) + k) / (ch(w1) + k·V))`, where `ch(w1)` is the
    * bigram-table marginal (count of w1 as history) and V the corpus
    * vocabulary — deriving the history count from the bigram table itself
    * avoids any last-token off-by-one between engines.
    *
    * Scale shape: the bigram count table is keyed by (w1, w2) — a
    * map-side-combined aggregate whose size is bounded by DISTINCT
    * bigrams, not rows — and rejoins the per-doc bigram stream on the
    * same key (an equi-shuffle at 100 TB; deliberately NOT broadcast,
    * distinct bigrams grow with corpus size). The history marginal and
    * vocabulary scalar are vocabulary-bounded and broadcast. Documents
    * with fewer than two tokens contribute no bigrams and drop (mirrored
    * by the oracle's inner join).
    */
  def bigramSurprisal(docs: DataFrame, k: Double = 0.5): DataFrame = {
    val ws = TextOps.tokens(col("text"))
    val bigrams = docs.select(col("doc_id"),
        explode(zip_with(
          slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bgc = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cbg"))
    val hist = bgc.groupBy(col("w1"))
      .agg(sum(col("cbg")).cast("double").as("ch"))
    val vocab = docs.select(explode(ws).as("tok"))
      .agg(countDistinct(col("tok")).cast("double").as("vv"))
    bigrams.join(bgc, Seq("w1", "w2"))
      .join(broadcast(hist), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(avg(-log((col("cbg") + k) / (col("ch") + col("vv") * k))), 6)
          .as("surprisal"))
  }

  def bigramSurprisalOracleSql(k: Double = 0.5): String =
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
       |bg AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
       |  FROM t, unnest([x for x in generate_series(1, len(ws)-1)]) u(i)),
       |bgc AS (SELECT w1, w2, count(*) AS cbg FROM bg GROUP BY 1, 2),
       |hist AS (SELECT w1, sum(cbg)::DOUBLE AS ch FROM bgc GROUP BY 1),
       |voc AS (SELECT count(DISTINCT tok)::DOUBLE AS vv FROM
       |  (SELECT unnest(ws) AS tok FROM t))
       |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       |  round(avg(-ln((cbg + $k) / (ch + $k * vv))), 6) AS surprisal
       |FROM bg JOIN bgc USING (w1, w2) JOIN hist USING (w1) CROSS JOIN voc
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** CCNet-style LM quality filter with a stupid-backoff trigram model
    * (Brants et al. 2007 "Large Language Models in Machine Translation";
    * CCNet trains its filter LM on a trusted corpus and scores the crawl —
    * here the trusted split is the rows matching `isTrain`). Each document
    * scores as the mean negative log stupid-backoff score of its trigram
    * positions:
    *
    *   S(w3|w1,w2) = c3(w1,w2,w3) / c2(w1,w2)                if trigram seen
    *               = 0.4 · c2(w2,w3) / c1(w2)                 else if bigram seen
    *               = 0.4² · (c1(w3)+1) / (N+V)                otherwise (add-1 floor)
    *
    * where counts come from the training split, N its token count, V its
    * vocabulary. Documents with fewer than three tokens produce no trigram
    * positions and drop (mirrored by the oracle's inner join).
    *
    * Scale shape: counting is keyed map-side-combined aggregation; the
    * backoff CASE is evaluated once per DISTINCT corpus trigram — the
    * count tables (distinct-trigram/-bigram-bounded, growing with the
    * corpus) join that distinct table by key, never broadcast; only the
    * vocabulary-bounded unigram table and the (N,V) scalar broadcast. The
    * per-document stream then rejoins the scored-trigram table on one
    * 3-column key — a single equi-shuffle at 100 TB.
    */
  def lmScore(docs: DataFrame, isTrain: Column): DataFrame = {
    val ws = TextOps.tokens(col("text"))
    def grams(n: Int): Column = {
      val m = greatest(size(ws) - (n - 1), lit(0))
      val pair = zip_with(slice(ws, lit(1), m), slice(ws, lit(2), m),
        (a, b) => struct(a.as("w1"), b.as("w2")))
      if (n == 2) pair
      else zip_with(pair, slice(ws, lit(3), m), (p, c) =>
        struct(p.getField("w1").as("w1"), p.getField("w2").as("w2"), c.as("w3")))
    }
    val tg = docs.select(col("doc_id"), isTrain.as("is_tr"), explode(grams(3)).as("g"))
      .select(col("doc_id"), col("is_tr"),
        col("g.w1").as("w1"), col("g.w2").as("w2"), col("g.w3").as("w3"))
    val tri = tg.filter(col("is_tr"))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    val big = docs.filter(isTrain).select(explode(grams(2)).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val uni = docs.filter(isTrain).select(explode(ws).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val tot = uni.agg(sum(col("c1")).as("n"), count(lit(1)).as("v"))
    val scored = tg.select("w1", "w2", "w3").distinct()
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(big.withColumnRenamed("c2", "h12"), Seq("w1", "w2"), "left")
      .join(big.select(col("w1").as("w2"), col("w2").as("w3"), col("c2").as("c23")),
        Seq("w2", "w3"), "left")
      .join(broadcast(uni.select(col("w").as("w2"), col("c1").as("u2"))), Seq("w2"), "left")
      .join(broadcast(uni.select(col("w").as("w3"), col("c1").as("u3"))), Seq("w3"), "left")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("w3"),
        when(col("c3").isNotNull, col("c3").cast("double") / col("h12"))
          .when(col("c23").isNotNull, lit(0.4) * col("c23").cast("double") / col("u2"))
          .otherwise(lit(0.16) * (coalesce(col("u3"), lit(0L)) + lit(1L)).cast("double")
            / (col("n") + col("v"))).as("s"))
    tg.join(scored, Seq("w1", "w2", "w3"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_trigrams"),
        round(avg(-log(col("s"))), 6).as("lm_score"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §3): per
    * LANGUAGE, split the corpus into head / middle / tail at the 1/3 and
    * 2/3 quantiles of the [[lmScore]] LM score (lower = more fluent).
    * CCNet keeps head+middle and drops or down-weights tail — the
    * standard quality gradation a multilingual crawl applies after
    * language ID and before dedup.
    *
    * Scale shape: rides the lmScore chain (one equi-shuffle), then ONE
    * tiny per-language quantile aggregate (exact `percentile`, matching
    * DuckDB quantile_cont's linear interpolation — the lengthTrim parity
    * precedent) broadcast back over a narrow pass. Cutoffs and scores are
    * 6 dp-rounded before comparison so both engines bucket identical
    * doubles. Docs with <3 tokens have no trigrams and drop out of the
    * scored stream on both sides.
    */
  def ccnetBuckets(docs: DataFrame, isTrain: Column): DataFrame = {
    // dl is consumed twice (quantile aggregate + bucket join) and relies
    // on exchange reuse to evaluate the lmScore chain once. Deliberately
    // NOT Materialize'd: unlike shardAssign there is no sampling
    // nondeterminism — a reuse miss re-computes the identical result, a
    // perf-only risk — and the A/B at sf1 showed localCheckpoint costing
    // more than reuse saves (24.6-55 s vs 16.4-26.5 s).
    val dl = docs.select(col("doc_id"), col("lang"))
      .join(lmScore(docs, isTrain).select(col("doc_id"), col("lm_score")),
        "doc_id")
    val cuts = dl.groupBy("lang").agg(
      round(percentile(col("lm_score"), lit(1.0 / 3)), 6).as("q33"),
      round(percentile(col("lm_score"), lit(2.0 / 3)), 6).as("q67"))
    dl.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"), col("lm_score"),
        when(col("lm_score") <= col("q33"), lit("head"))
          .when(col("lm_score") <= col("q67"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** DuckDB twin of [[ccnetBuckets]] (training split `source = 'src0'`).
    * lazy: [[LmScoreCtes]] is defined later in the object body.
    */
  lazy val CcnetBucketsOracleSql: String =
    s"""WITH $LmScoreCtes,
       |dl AS (SELECT d.doc_id, d.lang, ds.lm_score
       |  FROM documents d JOIN ds USING (doc_id)),
       |cuts AS (SELECT lang,
       |    round(quantile_cont(lm_score, ${1.0 / 3}), 6) AS q33,
       |    round(quantile_cont(lm_score, ${2.0 / 3}), 6) AS q67
       |  FROM dl GROUP BY 1)
       |SELECT doc_id, dl.lang, lm_score,
       |  CASE WHEN lm_score <= q33 THEN 'head'
       |       WHEN lm_score <= q67 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM dl JOIN cuts ON cuts.lang = dl.lang
       |ORDER BY doc_id""".stripMargin

  /** The [[lmScore]] oracle's CTE chain (through `sc` = scored distinct
    * trigrams and `tg` = the per-doc trigram stream), shared by the
    * llm_lm_score and llm_ccnet_buckets oracles. Training split
    * `source = 'src0'`.
    */
  val LmScoreCtes: String =
    """t AS (SELECT doc_id, source = 'src0' AS is_tr,
      |    string_split(lower(text), ' ') AS ws FROM documents),
      |tg AS (SELECT doc_id, is_tr, ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3
      |  FROM t, unnest([x for x in generate_series(1, len(ws)-2)]) u(i)),
      |tri AS (SELECT w1, w2, w3, count(*) AS c3 FROM tg WHERE is_tr GROUP BY 1,2,3),
      |big AS (SELECT ws[i] AS w1, ws[i+1] AS w2
      |    FROM t, unnest([x for x in generate_series(1, len(ws)-1)]) u(i)
      |    WHERE is_tr),
      |bgc AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
      |uni AS (SELECT w, count(*) AS c1 FROM
      |  (SELECT unnest(ws) AS w FROM t WHERE is_tr) GROUP BY 1),
      |tot AS (SELECT sum(c1) AS n, count(*) AS v FROM uni),
      |dt AS (SELECT DISTINCT w1, w2, w3 FROM tg),
      |sc AS (SELECT dt.w1, dt.w2, dt.w3,
      |    CASE WHEN tr.c3 IS NOT NULL THEN tr.c3::DOUBLE / b12.c2
      |         WHEN b23.c2 IS NOT NULL THEN 0.4 * b23.c2::DOUBLE / u2.c1
      |         ELSE 0.16 * (coalesce(u3.c1, 0) + 1)::DOUBLE / (tot.n + tot.v)
      |    END AS s
      |  FROM dt
      |  LEFT JOIN tri tr ON tr.w1 = dt.w1 AND tr.w2 = dt.w2 AND tr.w3 = dt.w3
      |  LEFT JOIN bgc b12 ON b12.w1 = dt.w1 AND b12.w2 = dt.w2
      |  LEFT JOIN bgc b23 ON b23.w1 = dt.w2 AND b23.w2 = dt.w3
      |  LEFT JOIN uni u2 ON u2.w = dt.w2
      |  LEFT JOIN uni u3 ON u3.w = dt.w3
      |  CROSS JOIN tot),
      |ds AS (SELECT tg.doc_id, count(*)::BIGINT AS n_trigrams,
      |    round(avg(-ln(sc.s)), 6) AS lm_score
      |  FROM tg JOIN sc ON sc.w1 = tg.w1 AND sc.w2 = tg.w2 AND sc.w3 = tg.w3
      |  GROUP BY 1)""".stripMargin

  /** DuckDB twin of [[lmScore]] with training split `source = 'src0'`. */
  val LmScoreOracleSql: String =
    s"""WITH $LmScoreCtes
       |SELECT doc_id, n_trigrams, lm_score FROM ds ORDER BY 1""".stripMargin

  /** fastText-style hashed linear text classifier (Joulin et al. 2016,
    * "Bag of Tricks for Efficient Text Classification") applied at corpus
    * scale — the quality-classifier stage of the LLaMA/RefinedWeb data
    * recipes: features are unigrams + bigrams hashed into `dim` buckets,
    * a document scores `sigmoid(bias + mean bucket weight)` and keeps when
    * the (rounded) score clears 0.5. `weights` is the trained model as a
    * `(b, w)` table with `dim` rows.
    *
    * Scale shape: one feature explode (the [[dsirWeights]] shape), the
    * dim-bounded model broadcast onto it, one per-document aggregate —
    * no corpus-sized state; classification is a single narrow pass plus
    * one doc-keyed shuffle at 100 TB.
    */
  def hashClassifierScore(docs: DataFrame, weights: DataFrame, dim: Int,
      bias: Double = 0.0): DataFrame = {
    // rebalanced: md5 per feature dominates (same as trainHashClassifier);
    // the plain token-explode ops stay un-rebalanced per the sf1 note in
    // unigramSurprisal
    val toks = TextOps.rebalanced(docs)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
    val m = greatest(size(col("ws")) - 1, lit(0))
    val bigrams = zip_with(slice(col("ws"), lit(1), m),
      slice(col("ws"), lit(2), m), (a, b) => concat(a, lit(" "), b))
    val fb = toks.select(col("doc_id"),
        explode(concat(col("ws"), bigrams)).as("f"))
      .select(col("doc_id"), pmod(mdhash64(col("f")), lit(dim.toLong)).as("b"))
    fb.join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_features"),
        round(lit(1.0) / (lit(1.0) + exp(-(lit(bias) + avg(col("w"))))), 6)
          .as("score"))
      .select(col("doc_id"), col("n_features"), col("score"),
        (col("score") >= 0.5).as("keep"))
  }

  /** Deterministic stand-in model for gates/specs: `dim` buckets with
    * w(b) = (h("w:"+b) mod 2001)/1000 − 1 ∈ [−1, 1] — both engines derive
    * the identical table from the shared md5 hash, so the gate certifies
    * the classifier plumbing bit-for-bit without shipping trained floats.
    */
  def demoClassifierWeights(spark: org.apache.spark.sql.SparkSession,
      dim: Int): DataFrame =
    spark.range(dim).select(col("id").as("b"),
      (pmod(mdhash64(concat(lit("w:"), col("id"))), lit(2001L)) / lit(1000.0)
        - lit(1.0)).as("w"))

  /** ROC AUC of a quality classifier's scores against binary labels —
    * the metric a pipeline checks before trusting a classifier gate
    * (fastText-style filters are accepted/rejected on exactly this
    * number). Mann-Whitney formulation with exact tie handling:
    * AUC = Σ_s n_pos(s)·(cumneg_below(s) + n_neg(s)/2) / (N_pos·N_neg).
    *
    * Scale shape: scores are 6 dp-rounded sigmoids, so DISTINCT scores
    * are bounded by the rounding grid (≤ ~10^6) no matter the corpus
    * size — one map-side-combined groupBy(score) collapses N docs to the
    * bounded histogram, and the cumulative window runs over THAT, never
    * over rows. This is why the formulation beats the textbook
    * rank-statistic: a global rank over docs is an unpartitioned window
    * at corpus scale; a cumulative over the score grid is not.
    *
    * Returns one row: (n_pos, n_neg, auc 6dp).
    */
  def classifierAuc(scored: DataFrame, label: Column): DataFrame = {
    val h = scored
      .groupBy(col("score"))
      .agg(sum(when(label, 1L).otherwise(0L)).as("np"),
        sum(when(label, 0L).otherwise(1L)).as("nn"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("cumneg", coalesce(sum(col("nn")).over(w), lit(0L)))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (col("cumneg") + col("nn") / lit(2.0))).as("u"))
      .select(col("n_pos"), col("n_neg"),
        round(col("u") / (col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Calibration (reliability) curve of classifier scores: `bins` equal
    * score buckets, each with count, mean score, and observed positive
    * fraction — a well-calibrated classifier has mean_score ≈ frac_pos
    * per bin. One doc-keyed pass + a bins-bounded aggregate.
    */
  def classifierCalibration(scored: DataFrame, label: Column,
      bins: Int = 10): DataFrame =
    scored
      .withColumn("bin", least(floor(col("score") * bins), lit(bins - 1L))
        .cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("score")), 6).as("mean_score"),
        round(avg(when(label, 1.0).otherwise(0.0)), 6).as("frac_pos"))

  /** DuckDB twins of [[classifierAuc]] / [[classifierCalibration]] over
    * [[hashClassifierScore]] with the demo weights and label
    * `source = 'src0'`. Host query must start `WITH <scoreCtes(dim)>`
    * (ending in `sc(doc_id, y, score)`).
    */
  def classifierScoreCtes(dim: Int): String =
    s"""toks AS (SELECT doc_id, source = 'src0' AS y,
       |    string_split(lower(text), ' ') AS ws FROM documents),
       |fb AS (SELECT doc_id, y,
       |    ('0x'||substr(md5(f),1,15))::BIGINT % $dim AS b
       |  FROM (SELECT doc_id, y,
       |      unnest(list_concat(ws,
       |        [ws[i]||' '||ws[i+1] for i in generate_series(1, len(ws)-1)])) AS f
       |    FROM toks)),
       |wt AS (SELECT b,
       |    ('0x'||substr(md5('w:'||b),1,15))::BIGINT % 2001 / 1000.0 - 1.0 AS w
       |  FROM (SELECT unnest(generate_series(0, ${dim - 1})) AS b)),
       |sc AS (SELECT doc_id, any_value(y) AS y,
       |    round(1.0 / (1.0 + exp(-avg(w))), 6) AS score
       |  FROM fb JOIN wt USING (b) GROUP BY doc_id)""".stripMargin

  def classifierAucOracleSql(dim: Int): String =
    s"""WITH ${classifierScoreCtes(dim)},
       |h AS (SELECT score,
       |    sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS np,
       |    sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS nn
       |  FROM sc GROUP BY 1),
       |c AS (SELECT *, coalesce(sum(nn) OVER (ORDER BY score
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
       |  FROM h)
       |SELECT sum(np)::BIGINT AS n_pos, sum(nn)::BIGINT AS n_neg,
       |  round(sum(np * (cumneg + nn / 2.0)) /
       |    (sum(np) * sum(nn)), 6) AS auc
       |FROM c""".stripMargin

  def classifierCalibrationOracleSql(dim: Int, bins: Int = 10): String =
    s"""WITH ${classifierScoreCtes(dim)}
       |SELECT least(floor(score * $bins), ${bins - 1})::BIGINT AS bin,
       |  count(*)::BIGINT AS n,
       |  round(avg(score), 6) AS mean_score,
       |  round(avg(CASE WHEN y THEN 1.0 ELSE 0.0 END), 6) AS frac_pos
       |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin

  /** Language-ID confusion matrix — declared `lang` column vs
    * [[TextOps.langId]]'s detection, with the per-cell match flag: the QA
    * grid a multilingual pipeline reads to decide whether its detector is
    * trustworthy per language before any lang-conditioned filtering. One
    * narrow detection pass + a |langs|²-bounded aggregate.
    */
  def langConfusion(docs: DataFrame): DataFrame =
    docs.select(col("lang"), TextOps.langId(col("text")).as("detected"))
      .groupBy(col("lang"), col("detected"))
      .agg(count(lit(1)).as("n"))
      .withColumn("is_match", col("lang") === col("detected"))

  // --- snapshot diff ---------------------------------------------------------

  /** Corpus snapshot diff — the release-to-release audit every recurring
    * curation run prints (what did this crawl add, drop, or rewrite?):
    * full outer join of two snapshots on doc_id, content compared by the
    * exact-dedup normalization hash, rolled up per source. One
    * doc_id-keyed equi-join of two scans plus a source-bounded aggregate;
    * at 100 TB both sides are the already-stored corpora, nothing is
    * recomputed beyond the per-row hash.
    *
    * Returns (source, n_added, n_removed, n_changed, n_unchanged).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    def keyed(df: DataFrame, side: String) = df.select(col("doc_id"),
      col("source").as(s"source_$side"),
      md5(Dedup.normalized(col("text"))).as(s"h_$side"))
    keyed(oldSnap, "old").join(keyed(newSnap, "new"), Seq("doc_id"), "full_outer")
      .select(coalesce(col("source_new"), col("source_old")).as("source"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
  }

  /** DuckDB twin of [[snapshotDiff]]; `oldSql`/`newSql` must yield
    * (doc_id, source, text).
    */
  def snapshotDiffOracleSql(oldSql: String, newSql: String): String =
    s"""WITH o AS (SELECT doc_id, source,
       |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
       |  FROM ($oldSql)),
       |n AS (SELECT doc_id, source,
       |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
       |  FROM ($newSql)),
       |j AS (SELECT coalesce(n.source, o.source) AS source,
       |    CASE WHEN o.h IS NULL THEN 'added'
       |         WHEN n.h IS NULL THEN 'removed'
       |         WHEN o.h <> n.h THEN 'changed'
       |         ELSE 'unchanged' END AS status
       |  FROM o FULL OUTER JOIN n USING (doc_id))
       |SELECT source,
       |  sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)::BIGINT AS n_added,
       |  sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)::BIGINT AS n_removed,
       |  sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)::BIGINT AS n_changed,
       |  sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)::BIGINT AS n_unchanged
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  /** TRAIN the [[hashClassifierScore]] model: full-batch logistic
    * regression by gradient descent on the hashed unigram+bigram features
    * (the fastText training objective restricted to one output class,
    * which is exactly the quality-classifier shape — label = "is this
    * doc from the trusted source"). Model: p_d = σ(Σ_b share_{d,b}·w_b)
    * with share = per-doc feature mass per bucket (so scoring matches
    * [[hashClassifierScore]]'s mean-of-bucket-weights form);
    * update: w ← round(w − lr·Σ_d (p_d − y_d)·share_{d,b}, 6) — weights
    * round to 6 dp after EVERY step on both engines (the repo's
    * iterative-float parity rule, as in kmeansRefine).
    *
    * Scale shape: the feature-share table is built once (two keyed
    * aggregates) and materialized; per iteration the dim-bounded weight
    * vector broadcasts onto it (one per-doc aggregate → residuals), the
    * residual table rejoins the feature stream by doc_id (an equi-shuffle
    * at 100 TB — corpus-sized, deliberately not broadcast) and one
    * dim-bounded aggregate forms the gradient. Iterations are the
    * standard GD sequential dependency; nothing corpus-sized ever sits
    * on the driver.
    */
  def trainHashClassifier(docs: DataFrame, label: Column, dim: Int,
      iters: Int = 3, lr: Double = 1.0): DataFrame = {
    val spark = docs.sparkSession
    // rebalanced for the same reason as dsirWeights: the feature explode
    // + hashing dominates, and fbs (its checkpoint) feeds every GD round
    val toks = TextOps.rebalanced(docs)
      .select(col("doc_id"), label.as("y"),
        TextOps.tokens(col("text")).as("ws"))
    val m = greatest(size(col("ws")) - 1, lit(0))
    val bigrams = zip_with(slice(col("ws"), lit(1), m),
      slice(col("ws"), lit(2), m), (a, b) => concat(a, lit(" "), b))
    val fb = toks.select(col("doc_id"), col("y"),
        explode(concat(col("ws"), bigrams)).as("f"))
      .select(col("doc_id"), col("y"),
        pmod(mdhash64(col("f")), lit(dim.toLong)).as("b"))
      .groupBy("doc_id", "y", "b").agg(count(lit(1)).as("c"))
    val nd = fb.groupBy("doc_id").agg(sum(col("c")).as("n"))
    val fbs = graft.model.Materialize(fb.join(nd, "doc_id")
      .select(col("doc_id"), col("y"), col("b"),
        (col("c").cast("double") / col("n")).as("share")))
    var w = spark.range(dim).select(col("id").as("b"), lit(0.0).as("w"))
    for (_ <- 0 until iters) {
      val resid = fbs.join(broadcast(w), "b")
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(col("share") * col("w")).as("z"))
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) + exp(-col("z"))) -
            when(col("y"), lit(1.0)).otherwise(lit(0.0))).as("resid"))
      val grad = fbs.join(resid, "doc_id")
        .groupBy("b").agg(sum(col("share") * col("resid")).as("g"))
      w = graft.model.Materialize(w.join(grad, Seq("b"), "left")
        .select(col("b"),
          round(col("w") - lit(lr) * coalesce(col("g"), lit(0.0)), 6).as("w")))
    }
    w
  }

  /** DuckDB twin of [[trainHashClassifier]] with label `source = 'src0'`:
    * all `iters` GD stages unrolled structurally — the ITERATION is
    * gated, since step k's gradient depends on step k−1's weights.
    */
  def classifierTrainOracleSql(dim: Int, iters: Int = 3,
      lr: Double = 1.0): String = {
    def stage(k: Int): String =
      s"""z$k AS (SELECT doc_id, y, sum(share * w) AS z
         |  FROM fbs JOIN w$k USING (b) GROUP BY 1, 2),
         |r$k AS (SELECT doc_id,
         |    1.0/(1.0+exp(-z)) - (CASE WHEN y THEN 1.0 ELSE 0.0 END) AS resid
         |  FROM z$k),
         |g$k AS (SELECT b, sum(share * resid) AS g
         |  FROM fbs JOIN r$k USING (doc_id) GROUP BY 1),
         |w${k + 1} AS MATERIALIZED (SELECT w$k.b,
         |    round(w$k.w - $lr * coalesce(g$k.g, 0), 6) AS w
         |  FROM w$k LEFT JOIN g$k USING (b))""".stripMargin
    s"""WITH toks AS (SELECT doc_id, source = 'src0' AS y,
       |    string_split(lower(text), ' ') AS ws FROM documents),
       |fb AS (SELECT doc_id, y,
       |    ('0x'||substr(md5(f),1,15))::BIGINT % $dim AS b, count(*) AS c
       |  FROM (SELECT doc_id, y, unnest(list_concat(ws,
       |      [ws[i]||' '||ws[i+1] for i in generate_series(1, len(ws)-1)])) AS f
       |    FROM toks) GROUP BY 1, 2, 3),
       |nd AS (SELECT doc_id, sum(c) AS n FROM fb GROUP BY 1),
       |fbs AS MATERIALIZED (SELECT doc_id, y, b, c::DOUBLE / n AS share
       |  FROM fb JOIN nd USING (doc_id)),
       |w0 AS (SELECT b, 0.0 AS w FROM generate_series(0, ${dim - 1}) g(b)),
       |${(0 until iters).map(stage).mkString(",\n")}
       |SELECT b, w FROM w$iters ORDER BY b""".stripMargin
  }

  /** DuckDB twin of [[hashClassifierScore]] over [[demoClassifierWeights]]. */
  def hashClassifierOracleSql(dim: Int, bias: Double = 0.0): String =
    s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
       |    FROM documents),
       |fb AS (SELECT doc_id, ('0x'||substr(md5(f),1,15))::BIGINT % $dim AS b
       |  FROM (SELECT doc_id, unnest(list_concat(ws,
       |      [ws[i]||' '||ws[i+1] for i in generate_series(1, len(ws)-1)])) AS f
       |    FROM toks)),
       |wt AS (SELECT b,
       |    ('0x'||substr(md5('w:'||b),1,15))::BIGINT % 2001 / 1000.0 - 1.0 AS w
       |  FROM generate_series(0, ${dim - 1}) g(b)),
       |sc AS (SELECT doc_id, count(*)::BIGINT AS n_features,
       |    round(1.0 / (1.0 + exp(-($bias + avg(w)))), 6) AS score
       |  FROM fb JOIN wt USING (b) GROUP BY 1)
       |SELECT doc_id, n_features, score, score >= 0.5 AS keep
       |FROM sc ORDER BY doc_id""".stripMargin

  // --- TF-IDF keyword extraction -------------------------------------------

  /** Top-k characteristic terms per document by TF-IDF
    * (tf(t,d) · ln(N / df(t)), raw counts, natural log). Ranking compares
    * the ROUNDED score (6 dp) with ascending-term tie-break so the DuckDB
    * twin reproduces the exact ranking — an unrounded float rank could
    * flip on a last-ulp libm difference between engines.
    *
    * Scale shape: tf is a (doc, term)-keyed aggregate (explode + groupBy,
    * map-side partials); df is a vocabulary-bounded aggregate OVER the tf
    * table (already deduped per doc), broadcast back; the final top-k is a
    * doc-keyed window — bounded by per-doc vocabulary.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    val tf = docs.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tfidf"))
  }

  def tfidfOracleSql(k: Int): String =
    s"""WITH tf AS (
       |  SELECT doc_id, tok AS term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
       |        FROM documents)
       |  GROUP BY 1, 2),
       |df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
       |sc AS (SELECT doc_id, term,
       |    round(tf * ln(n_docs / df), 6) AS tfidf
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |rk AS (SELECT doc_id, term, tfidf,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY tfidf DESC, term) AS rank
       |  FROM sc)
       |SELECT doc_id, rank::BIGINT AS rank, term, tfidf
       |FROM rk WHERE rank <= $k ORDER BY doc_id, rank""".stripMargin

  /** Declarative data-quality constraint validation (the Deequ/
    * great-expectations shape, Schelter et al. 2018): evaluate a fixed
    * rule set over the corpus in ONE aggregate pass and return one row
    * per rule — (check, violations, pass). A pipeline gates promotion of
    * a new snapshot on `pass` being all-true; at 100 TB this is a single
    * map-side-combined aggregate (every rule is a SUM of per-row
    * indicators, plus one count-distinct for the key-uniqueness rule),
    * not N table scans.
    *
    * The rule set certified here: primary key present + unique, payload
    * present, derived length consistent, language in the allowed domain,
    * source id well-formed, payload at least `minChars` chars.
    */
  def dataChecks(docs: DataFrame, allowedLangs: Seq[String],
      minChars: Int = 100): DataFrame = {
    val agg = docs.agg(
      sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("doc_id_not_null"),
      (count(lit(1)) - countDistinct(col("doc_id"))).as("doc_id_unique"),
      sum(when(col("text").isNull || col("text") === "", 1L).otherwise(0L))
        .as("text_not_empty"),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
        .as("n_chars_consistent"),
      sum(when(!col("lang").isInCollection(allowedLangs), 1L).otherwise(0L))
        .as("lang_in_domain"),
      sum(when(!col("source").rlike("^src[0-9]+$"), 1L).otherwise(0L))
        .as("source_well_formed"),
      sum(when(length(col("text")) < minChars, 1L).otherwise(0L))
        .as("min_length"))
    val checks = Seq("doc_id_not_null", "doc_id_unique", "text_not_empty",
      "n_chars_consistent", "lang_in_domain", "source_well_formed",
      "min_length")
    agg.select(explode(array(checks.map(c =>
        struct(lit(c).as("check"), col(c).cast("long").as("violations"))): _*))
        .as("r"))
      .select(col("r.check"), col("r.violations"),
        (col("r.violations") === 0).as("pass"))
  }

  /** DuckDB twin of [[dataChecks]]. */
  def dataChecksOracleSql(allowedLangs: Seq[String],
      minChars: Int = 100): String = {
    val langs = allowedLangs.map(l => s"'$l'").mkString("[", ", ", "]")
    s"""WITH a AS (SELECT
       |    sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS doc_id_not_null,
       |    count(*) - count(DISTINCT doc_id) AS doc_id_unique,
       |    sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
       |      AS text_not_empty,
       |    sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
       |      AS n_chars_consistent,
       |    sum(CASE WHEN NOT list_contains($langs, lang) THEN 1 ELSE 0 END)
       |      AS lang_in_domain,
       |    sum(CASE WHEN NOT regexp_matches(source, '^src[0-9]+$$')
       |      THEN 1 ELSE 0 END) AS source_well_formed,
       |    sum(CASE WHEN length(text) < $minChars THEN 1 ELSE 0 END)
       |      AS min_length
       |  FROM documents),
       |u AS (
       |  SELECT 'doc_id_not_null' AS "check", doc_id_not_null AS v FROM a
       |  UNION ALL SELECT 'doc_id_unique', doc_id_unique FROM a
       |  UNION ALL SELECT 'text_not_empty', text_not_empty FROM a
       |  UNION ALL SELECT 'n_chars_consistent', n_chars_consistent FROM a
       |  UNION ALL SELECT 'lang_in_domain', lang_in_domain FROM a
       |  UNION ALL SELECT 'source_well_formed', source_well_formed FROM a
       |  UNION ALL SELECT 'min_length', min_length FROM a)
       |SELECT "check", v::BIGINT AS violations, v = 0 AS pass
       |FROM u ORDER BY "check"""".stripMargin
  }

  /** Per-source boilerplate n-gram report: the top-k most document-
    * frequent shingles of each source (df ≥ 2 — a shingle in one doc is
    * content, in many docs boilerplate). This is the ANALYSIS pass that
    * feeds a site-specific boilerplate strip list (the C4 appendix shape:
    * inspect what repeats, then filter it) — dedupParagraphs removes
    * verbatim repeats mechanically; this report shows a curator WHAT
    * repeats per source.
    *
    * Scale shape: one keyed count (source, shingle) then the salted
    * two-stage top-k (the logql_topk pattern): rank inside (source, salt)
    * buckets first, keep ≤k per bucket, then rank the ≤k·salts survivors
    * per source — no per-source partition ever ranks more than its salt
    * bucket, so a source with billions of distinct shingles never lands
    * in one task. Returns (source, shingle, df, rank).
    */
  def boilerplateNgrams(docs: DataFrame, k: Int = 5,
      salts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs.select(col("doc_id"), col("source"))
      .join(Dedup.docShingles(docs), "doc_id")
      .groupBy(col("source"), col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
    val w1 = Window
      .partitionBy(col("source"), pmod(TextOps.mdhash64(col("s")), lit(salts.toLong)))
      .orderBy(col("df").desc, col("s").asc)
    val w2 = Window.partitionBy(col("source"))
      .orderBy(col("df").desc, col("s").asc)
    counts.withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= k)
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
      .select(col("source"), col("s").as("shingle"), col("df"), col("rank"))
  }

  /** DuckDB twin of [[boilerplateNgrams]] (the salted first stage only
    * changes the execution shape, never the result — a per-source top-k
    * survives its salt bucket's top-k by construction).
    */
  def boilerplateNgramsOracleSql(k: Int = 5): String =
    s"""WITH t AS (SELECT doc_id, source, string_split(lower(text), ' ') AS ws
       |    FROM documents),
       |sh AS (SELECT DISTINCT doc_id, source,
       |    unnest([ws[i]||' '||ws[i+1]||' '||ws[i+2]
       |            for i in generate_series(1, len(ws)-2)]) AS s
       |  FROM t),
       |c AS (SELECT source, s, count(*) AS df FROM sh GROUP BY 1, 2
       |      HAVING count(*) >= 2),
       |r AS (SELECT source, s, df,
       |    row_number() OVER (PARTITION BY source ORDER BY df DESC, s) AS rank
       |  FROM c)
       |SELECT source, s AS shingle, df::BIGINT AS df, rank::BIGINT AS rank
       |FROM r WHERE rank <= $k ORDER BY source, rank""".stripMargin

  /** ANALYZE-style column statistics for the corpus catalog — the stats a
    * cost-based planner (or a dataset card) reads per column: null count,
    * distinct count, min/max rendered as strings so one report covers
    * mixed types. One pass per column batched into a single aggregate
    * (count-distincts expand to one Expand + aggregate, still map-side
    * partial); at 100 TB swap the exact distinct for [[TextOps.hllReport]]
    * — same report schema, sketch-powered.
    *
    * Returns (column, n_null, n_distinct, min_val, max_val) per column.
    */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    }
    val agg = df.agg(aggs.head, aggs.tail: _*)
    agg.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"),
          col(s"${c}__nn").cast("long").as("n_null"),
          col(s"${c}__nd").cast("long").as("n_distinct"),
          col(s"${c}__mn").as("min_val"),
          col(s"${c}__mx").as("max_val"))): _*)).as("r"))
      .select(col("r.*"))
  }

  /** DuckDB twin of [[columnStats]] over the documents table. */
  def columnStatsOracleSql(cols: Seq[String]): String = {
    val rows = cols.map { c =>
      s"""SELECT '$c' AS "column",
         |    sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
         |    count(DISTINCT $c)::BIGINT AS n_distinct,
         |    min($c)::VARCHAR AS min_val, max($c)::VARCHAR AS max_val
         |  FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (\n$rows\n) ORDER BY "column""""
  }

  /** Temperature-scaled language-mixture weights (the multilingual
    * rebalance of XLM-R, Conneau et al. 2020 §3.1: sample languages
    * ∝ p_l^α with α < 1 to lift low-resource languages): from the
    * corpus's own per-language token mass, compute the natural share
    * p_raw, the α-smoothed target share p_alpha, and the per-language
    * keep fraction (upsampling ratio normalized so the most-boosted
    * language keeps 100% — never past one epoch). This PRODUCES the
    * rates table [[domainMix]] consumes.
    *
    * Scale shape: one map-side-combined aggregate to |langs| rows, then
    * scalar math over that tiny table (the un-partitioned windows run
    * over ≤|langs| rows — the sanctioned tiny-aggregate pattern). All
    * doubles round to 6 dp; `pow` drift between libms sits ~10 orders
    * below the rounding grid.
    */
  def temperatureMix(docs: DataFrame, alpha: Double = 0.3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    val t = docs
      .select(col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("nt"))
      .groupBy("lang").agg(sum(col("nt")).as("n_tokens"))
    t.withColumn("p_raw", col("n_tokens").cast("double")
        / sum(col("n_tokens")).over(all))
      .withColumn("w", pow(col("p_raw"), lit(alpha)))
      .withColumn("p_alpha", col("w") / sum(col("w")).over(all))
      .withColumn("ratio", col("p_alpha") / col("p_raw"))
      .select(col("lang"), col("n_tokens"),
        round(col("p_raw"), 6).as("p_raw"),
        round(col("p_alpha"), 6).as("p_alpha"),
        round(col("ratio") / max(col("ratio")).over(all), 6)
          .as("sample_frac"))
  }

  /** DuckDB twin of [[temperatureMix]]. */
  def temperatureMixOracleSql(alpha: Double = 0.3): String =
    s"""WITH t AS (SELECT lang,
       |    sum(len(string_split(lower(text), ' ')))::BIGINT AS n_tokens
       |  FROM documents GROUP BY 1),
       |s AS (SELECT lang, n_tokens,
       |    n_tokens::DOUBLE / (SELECT sum(n_tokens) FROM t) AS p_raw FROM t),
       |w AS (SELECT *, pow(p_raw, $alpha) AS w FROM s),
       |z AS (SELECT *, w / (SELECT sum(w) FROM w) AS p_alpha FROM w),
       |r AS (SELECT *, p_alpha / p_raw AS ratio FROM z)
       |SELECT lang, n_tokens, round(p_raw, 6) AS p_raw,
       |  round(p_alpha, 6) AS p_alpha,
       |  round(ratio / (SELECT max(ratio) FROM r), 6) AS sample_frac
       |FROM r ORDER BY lang""".stripMargin

  // --- corpus interchange (JSONL) ------------------------------------------

  /** Export a corpus as JSON-lines (the de-facto LLM-corpus interchange
    * format — one self-describing JSON object per document): (doc_id,
    * line). Fields serialize in sorted-name order so the byte output is
    * schema-order independent. Narrow codegen'd pass, no shuffle; at
    * 100 TB this is `df.write.text` fronted by exactly this projection.
    */
  def toJsonl(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      to_json(struct(docs.columns.sorted.map(col).toIndexedSeq: _*)).as("line"))

  /** Parse JSON-lines back into typed columns. `schema` drives the typed
    * extraction (a permissive parse: missing fields null, as a crawl
    * ingest must tolerate). Narrow pass; the Jackson parse is the cost.
    */
  def fromJsonl(lines: DataFrame,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    lines.select(from_json(col("line"), schema).as("d")).select(col("d.*"))

  /** JSONL roundtrip certification: export then re-parse, returning the
    * parsed fields — equal to the source table iff the writer's escaping
    * and the parser's extraction are both faithful (the gate's oracle is
    * simply the original rows).
    */
  def jsonlRoundtrip(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    fromJsonl(toJsonl(docs).select(col("line")), schema)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("source"),
        col("text"))
  }

  // --- C4-style heuristic filters ------------------------------------------

  /** C4/RefinedWeb-family heuristic quality flags (Raffel et al. 2020 §2.2
    * shape), all integer/boolean so no output sits on a float rounding
    * boundary. mean-word-length bounds use integer cross-multiplication
    * (3·n ≤ Σlen ≤ 10·n ⇔ 3 ≤ mean ≤ 10). One narrow codegen'd pass.
    *
    *   n_words       — whitespace token count
    *   sum_word_len  — Σ token length (chars)
    *   n_symbol      — tokens containing a non-alphanumeric char
    *   has_brace     — contains "{" (code/boilerplate marker)
    *   has_lorem     — contains "lorem ipsum"
    *   keep          — word count ≥ MinWords, mean word length in [3,10],
    *                   symbol tokens ≤ 10%, no brace, no lorem
    */
  val MinWords = 50

  def c4Filters(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs.withColumn("__toks", toks)
      .select(
        col("doc_id"),
        size(col("__toks")).cast("long").as("n_words"),
        aggregate(transform(col("__toks"), t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).as("sum_word_len"),
        size(filter(col("__toks"),
          t => t.rlike("[^a-z0-9]"))).cast("long").as("n_symbol"),
        col("text").contains("{").cast("long").as("has_brace"),
        lower(col("text")).contains("lorem ipsum").cast("long").as("has_lorem"))
      .withColumn("keep",
        (col("n_words") >= MinWords &&
          col("sum_word_len") >= col("n_words") * 3 &&
          col("sum_word_len") <= col("n_words") * 10 &&
          col("n_symbol") * 10 <= col("n_words") &&
          col("has_brace") === 0 && col("has_lorem") === 0).cast("long"))
  }

  val C4FiltersOracleSql: String =
    s"""WITH t AS (SELECT doc_id, text,
       |    string_split(lower(text), ' ') AS ws FROM documents),
       |f AS (SELECT doc_id,
       |    len(ws)::BIGINT AS n_words,
       |    list_sum(list_transform(ws, x -> len(x)))::BIGINT AS sum_word_len,
       |    len(list_filter(ws, x -> regexp_matches(x, '[^a-z0-9]')))::BIGINT
       |      AS n_symbol,
       |    (text LIKE '%{%')::BIGINT AS has_brace,
       |    (lower(text) LIKE '%lorem ipsum%')::BIGINT AS has_lorem
       |  FROM t)
       |SELECT doc_id, n_words, sum_word_len, n_symbol, has_brace, has_lorem,
       |  (n_words >= $MinWords
       |    AND sum_word_len >= n_words * 3 AND sum_word_len <= n_words * 10
       |    AND n_symbol * 10 <= n_words
       |    AND has_brace = 0 AND has_lorem = 0)::BIGINT AS keep
       |FROM f ORDER BY doc_id""".stripMargin

  // --- chunk-level (paragraph) near-dup ------------------------------------

  /** Multiplier folding (doc_id, chunk_id) into one synthetic chunk id —
    * large enough for million-chunk documents. */
  val ChunkIdBase = 1000000L

  /** Cross-document chunk-level near-duplicate pairs (paragraph dedup, the
    * RefinedWeb-style fine-grained pass): chunk every document into
    * `chunkTokens`-token windows, then run the standard LSH-then-verify
    * near-dup pipeline over the CHUNKS, keeping only pairs from different
    * documents — boilerplate paragraphs shared across otherwise-distinct
    * pages, which document-level dedup never sees.
    *
    * Scale shape: identical to document near-dup (banded candidates,
    * exact-Jaccard verify), just on ~(len/stride)× more, smaller units —
    * every stage stays keyed by chunk/bucket.
    */
  def chunkNearDups(docs: DataFrame, threshold: Double,
      chunkTokens: Int = 40, overlap: Int = 10): DataFrame = {
    val chunks = TextOps.chunk(docs, chunkTokens, overlap)
      .select((col("doc_id") * ChunkIdBase + col("chunk_id")).as("doc_id"),
        col("chunk_text").as("text"))
    Dedup.nearDupPairs(chunks, threshold)
      .filter(floor(col("i") / ChunkIdBase) =!= floor(col("j") / ChunkIdBase))
      .select(col("i"), col("j"), col("jaccard"))
  }

  def chunkNearDupOracleSql(threshold: Double): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |ch AS (SELECT doc_id*$ChunkIdBase+k AS cid,
       |    array_to_string(ws[(k*30+1):(k*30+40)], ' ') AS ctext,
       |    len(ws[(k*30+1):(k*30+40)]) AS n_tokens
       |  FROM t, unnest([x for x in generate_series(0, greatest((len(ws)-1)//30, 0))]) AS g(k)),
       |nc AS (SELECT cid, lower(ctext) AS t FROM ch WHERE n_tokens > 0),
       |ctoks AS (SELECT cid, string_split(t, ' ') AS ws FROM nc),
       |csh AS (SELECT DISTINCT cid,
       |    unnest([ws[i]||' '||ws[i+1]||' '||ws[i+2]
       |            for i in generate_series(1, len(ws)-2)]) AS s
       |  FROM ctoks),
       |csizes AS (SELECT cid, count(*) AS n FROM csh GROUP BY 1),
       |rare AS (SELECT s FROM csh GROUP BY s HAVING count(*) <= ${Dedup.MaxShingleDf}),
       |shc AS (SELECT csh.cid, csh.s FROM csh JOIN rare USING (s)),
       |cand AS (SELECT DISTINCT a.cid AS i, b.cid AS j
       |  FROM shc a JOIN shc b ON a.s = b.s AND a.cid < b.cid
       |  WHERE a.cid // $ChunkIdBase <> b.cid // $ChunkIdBase),
       |inter AS (SELECT c.i, c.j, count(*) AS inter
       |  FROM cand c
       |  JOIN csh sa ON sa.cid = c.i
       |  JOIN csh sb ON sb.cid = c.j AND sb.s = sa.s
       |  GROUP BY 1, 2),
       |jac AS (SELECT i, j, inter * 1.0 / (si.n + sj.n - inter) AS jaccard
       |  FROM inter
       |  JOIN csizes si ON si.cid = i
       |  JOIN csizes sj ON sj.cid = j)
       |SELECT i, j, round(jaccard, 6) AS jaccard
       |FROM jac WHERE jaccard >= $threshold ORDER BY 1, 2""".stripMargin

  // --- token-budget corpus selection ---------------------------------------

  /** Greedy token-budget selection per source (data selection under a
    * training budget): rank documents by an integer lexical-diversity
    * score (distinct-token percentage) and keep, per source, the best
    * documents whose running token total stays within `budgetTokens` —
    * the quality-first greedy every budgeted pretraining mix runs.
    *
    * Scale shape: the running sum uses the same two-level trick as
    * [[packSequences]], but banded by the SCORE (101 possible values):
    * per-(source, score) token totals get the cross-band running sum (a
    * window over a tiny aggregate), and the intra-band cumsum is keyed by
    * (source, score) — 101× more parallel than a per-source window; no
    * task ever sorts a whole source.
    */
  def budgetSelect(docs: DataFrame, budgetTokens: Long): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val base = docs.select(col("doc_id"), col("source"),
      size(toks).cast("long").as("n_tokens"),
      floor(size(array_distinct(toks)).cast("long") * 100 / size(toks))
        .cast("long").as("score"))
    val bandW = Window.partitionBy(col("source"))
      .orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bandOffsets = base.groupBy(col("source"), col("score"))
      .agg(sum(col("n_tokens")).as("__band_toks"))
      .withColumn("__band_off",
        coalesce(sum(col("__band_toks")).over(bandW), lit(0L)))
      .drop("__band_toks")
    val intraW = Window.partitionBy(col("source"), col("score"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(bandOffsets, Seq("source", "score"))
      .withColumn("cum_tokens",
        col("__band_off") + sum(col("n_tokens")).over(intraW))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col("doc_id"), col("source"), col("score"),
        col("n_tokens"), col("cum_tokens"))
  }

  /** DuckDB twin of [[budgetSelect]] — the banding collapses to one plain
    * running-sum window ordered by (score desc, doc_id).
    */
  def budgetSelectOracleSql(budgetTokens: Long): String =
    s"""WITH t AS (SELECT doc_id, source,
       |    string_split(lower(text), ' ') AS ws FROM documents),
       |q AS (SELECT doc_id, source, len(ws)::BIGINT AS n_tokens,
       |    ((len(list_distinct(ws)) * 100) // len(ws))::BIGINT AS score
       |  FROM t),
       |c AS (SELECT *, sum(n_tokens) OVER (
       |    PARTITION BY source ORDER BY score DESC, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
       |  FROM q)
       |SELECT doc_id, source, score, n_tokens, cum_tokens::BIGINT AS cum_tokens
       |FROM c WHERE cum_tokens <= $budgetTokens ORDER BY doc_id""".stripMargin

  // --- SemDeDup-style semantic dedup ---------------------------------------

  /** Semantic dedup over embeddings (Abbas et al. 2023 SemDeDup shape):
    * cluster with the IVF coarse quantizer (deterministic sqrt-N sampled
    * centroids, max-cosine assignment — the exact cell structure
    * llm_ann_ivf_* already gates), then within each cell mark a vector a
    * duplicate iff a LOWER-id cell-mate has cosine ≥ threshold; the lowest
    * such mate is the canonical representative.
    *
    * Scale shape: the pairing is per-cell (≈ sqrt(N) members with sqrt-N
    * centroids → Σ cell² ≈ N^1.5 candidate pairs TOTAL, never all-pairs),
    * each cell's self-join a bounded shuffle key. Exactly the SemDeDup
    * argument: the quadratic is confined to clusters.
    */
  def semanticDedup(emb: DataFrame, threshold: Double): DataFrame = {
    val mod = Similarity.centroidModFor(emb.count())
    val cents = emb.filter(pmod(col("vec_id"), lit(mod)) === 0)
      .select(col("vec_id").as("cid"), col("embedding").cast("array<double>").as("ce"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("__cs").desc, col("cid").asc)
    val assigned = graft.model.Materialize(
      emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .crossJoin(broadcast(cents))
        .select(col("vec_id"), col("e"), col("cid"),
          Similarity.cosine(col("e"), col("ce")).as("__cs"))
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") === 1)
        .select(col("vec_id"), col("e"), col("cid").as("cell")))
    val dups = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(Similarity.cosine(col("a.e"), col("b.e")) >= threshold)
      .groupBy(col("b.vec_id").as("vec_id"))
      .agg(min(col("a.vec_id")).as("__canon"))
    assigned.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("__canon"), col("vec_id")).as("canonical_id"),
        col("__canon").isNotNull.cast("long").as("is_dup"))
  }

  // --- hashed-feature linear quality scorer --------------------------------

  /** Feature-hash dimensionality of the quality scorer. */
  val QualityDim = 256

  /** Deterministic md5-derived weights in [-1, 1) with 3 decimal digits —
    * the same constant-embedding trick as the LSH hyperplanes, so the
    * DuckDB oracle carries the identical literals. In production these
    * would be trained offline (fastText-style) and shipped as a constant;
    * the Spark plumbing is identical either way.
    */
  lazy val qualityWeights: Seq[Double] = (0 until QualityDim).map { j =>
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"qw:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(md.substring(0, 15), 16) % 2000L - 1000L) / 1000.0
  }

  /** Model-based quality filtering, fastText linear-classifier shape:
    * score = σ(mean over tokens of w[h(token) mod D]) with a fixed hashed
    * unigram weight table. Returns (doc_id, quality, kept) where `kept`
    * compares the ROUNDED score to 0.5 so the keep decision is made on
    * the exact same value both engines emit.
    *
    * Scale shape: entirely narrow — one md5 + one array lookup per token,
    * no shuffle, no UDF; the weight table constant-folds into the plan.
    * (A trained D≈2M table would ship as a broadcast instead of a
    * literal; the per-row compute is unchanged.)
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val wArr = array(qualityWeights.map(lit): _*)
    val toks = TextOps.tokens(col("text"))
    val raw = aggregate(toks, lit(0.0), (acc, t) =>
      acc + element_at(wArr,
        (pmod(TextOps.mdhash64(t), lit(QualityDim.toLong)) + 1L).cast("int"))
    ) / size(toks)
    val score = round(lit(1.0) / (lit(1.0) + exp(-raw)), 6)
    docs.select(col("doc_id"), score.as("quality"),
      (score >= 0.5).cast("long").as("kept"))
  }

  /** The (doc_id, quality) CTE chain of the quality-score oracle, shared
    * by [[qualityScoreOracleSql]] and the cluster-retention oracle (CTE
    * names prefixed `q` so they can't collide with a host query's).
    */
  def qualityCteSql: String = {
    val wLit = qualityWeights.mkString("[", ", ", "]")
    // the comprehension binding is deliberately NOT named `qt`: it would
    // shadow the CTE alias below (works in DuckDB today, but a scoping
    // change would silently hash the wrong value instead of erroring)
    val idx = s"((('0x'||substr(md5(tok),1,15))::BIGINT) % $QualityDim) + 1"
    s"""qw AS (SELECT $wLit::DOUBLE[] AS wt),
       |qt AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
       |qs AS (SELECT doc_id,
       |    round(1.0/(1.0 + exp(-(list_sum([wt[$idx] for tok in ws]) / len(ws)))), 6)
       |      AS quality
       |  FROM qt, qw)""".stripMargin
  }

  /** DuckDB twin of [[qualityScore]] — same md5 bucket, same literal
    * weight table (3-decimal literals parse to identical doubles).
    */
  def qualityScoreOracleSql: String =
    s"""WITH $qualityCteSql
       |SELECT doc_id, quality, (quality >= 0.5)::BIGINT AS kept
       |FROM qs ORDER BY doc_id""".stripMargin

  /** Quality-aware duplicate retention: within each near-dup cluster
    * (connected components over the banded-LSH pair graph,
    * [[Dedup.dupClusters]]), keep the HIGHEST-quality member instead of
    * the lowest id — the retention policy production dedup pipelines
    * actually run (dropping the best-written copy of a template because
    * its id is larger wastes the best training signal). Ties break on the
    * ROUNDED 6-dp quality then ascending doc_id, so the oracle reproduces
    * the exact choice.
    *
    * Scale shape: clusters and scores are both per-doc tables; the
    * retention pass is one join plus a window partitioned by cluster —
    * bounded by cluster size, no pairwise work beyond what the cluster
    * build already did.
    */
  def keepBestPerCluster(docs: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = graft.llm.Dedup.dupClusters(docs, threshold)
    val quality = qualityScore(docs).select(col("doc_id"), col("quality"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    clusters.join(quality, Seq("doc_id"))
      .withColumn("kept", (row_number().over(w) === 1).cast("long"))
      .select(col("doc_id"), col("cluster_id"), col("quality"), col("kept"))
  }

  /** Leakage-free train/eval split: assign every member of a near-dup
    * cluster to the SAME split, by hashing the cluster id — a per-doc
    * random split leaks eval content into training whenever a near-dup
    * pair straddles the boundary (the contamination mechanism Lee et al.
    * 2021 measure). Deterministic md5-threshold hash, same family as
    * [[Sampling]], so reruns and the oracle reproduce the split exactly.
    *
    * Scale shape: one join of two per-doc tables; the hash is per-row
    * arithmetic on the already-computed cluster id — nothing beyond the
    * cluster build itself.
    */
  def leakageFreeSplit(docs: DataFrame, threshold: Double,
      trainPct: Int = 90): DataFrame = {
    val clusters = graft.llm.Dedup.dupClusters(docs, threshold)
    val bucket = pmod(TextOps.mdhash64(
      concat(lit("split:"), col("cluster_id").cast("string"))), lit(100L))
    clusters.select(col("doc_id"), col("cluster_id"),
      when(bucket < trainPct, "train").otherwise("eval").as("split"))
  }

  /** DuckDB twin of [[leakageFreeSplit]]'s hash bucket. */
  def splitBucketSql(idExpr: String): String =
    s"(('0x' || substr(md5('split:' || CAST($idExpr AS VARCHAR)), 1, 15))::BIGINT) % 100"

  /** Balanced shard assignment for distributed training: spread documents
    * over `n` shards so per-shard token totals stay close — sort by token
    * count descending (ties: doc_id) and deal round-robin, the
    * longest-processing-time greedy heuristic's distributed-friendly
    * cousin (true LPT is inherently sequential; round-robin-after-sort
    * keeps every shard within one max-document of even).
    *
    * Scale shape: the global rank is a two-level distributed prefix sum,
    * NOT an un-partitioned window (which Spark would execute in a single
    * task): range-partition on the sort key (Spark samples balanced
    * boundaries deterministically), rank locally within each range
    * partition, and add the partition's running row-count offset — a
    * window over a ≤#partitions-row aggregate, broadcast back. No task
    * ever sorts more than one range partition; the result is identical to
    * the single global sort because (n_tokens desc, doc_id) is a total
    * order. Returns (doc_id, n_tokens, shard).
    */
  def shardAssign(docs: DataFrame, n: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    // materialized: both consumers below (the offset aggregate and the
    // join probe side) must read ONE physical range shuffle — if each
    // re-evaluated the plan, RangePartitioner resampling under a
    // different RDD id could draw different boundaries and the two sides'
    // __pid values would silently disagree. Same discipline as
    // Similarity.ivfPqTopK's rsubs.
    val parts = Materialize(toks
      .repartitionByRange(col("n_tokens").desc, col("doc_id").asc)
      .withColumn("__pid", spark_partition_id().cast("long")))
    // rows in range partitions strictly before mine: a window over the
    // tiny per-partition-count aggregate (≤ shuffle-partitions rows)
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .drop("__cnt")
    val localW = Window.partitionBy(col("__pid"))
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
    parts.join(broadcast(offsets), Seq("__pid"))
      .withColumn("__rk", col("__off") + row_number().over(localW) - 1)
      .select(col("doc_id"), col("n_tokens"),
        pmod(col("__rk"), lit(n.toLong)).cast("long").as("shard"))
  }

  def shardAssignOracleSql(n: Int): String =
    s"""WITH t AS (SELECT doc_id,
       |    len(string_split(lower(text), ' '))::BIGINT AS n_tokens
       |  FROM documents),
       |r AS (SELECT doc_id, n_tokens,
       |    row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS rk
       |  FROM t)
       |SELECT doc_id, n_tokens, (rk % $n)::BIGINT AS shard
       |FROM r ORDER BY doc_id""".stripMargin

  /** Vocabulary coverage curve — the tokenizer-eval staple: what fraction
    * of the corpus token MASS do the top-K most frequent words cover, for
    * each K in `ks`? (Drives vocab-size choices and OOV-rate estimates.)
    * Returns one row per requested K: (k, n_vocab = min(K, |V|),
    * covered = token mass of the top-n_vocab words, coverage rounded 6dp).
    *
    * Scale shape: word counts are a map-side-combined keyed aggregate;
    * the global frequency rank + running mass use [[shardAssign]]'s
    * two-level distributed prefix sum (range-partition on the total order
    * (cnt desc, w), local rank/cumsum per range, per-partition count AND
    * mass offsets from one ≤#partitions-row aggregate broadcast back) —
    * no task ever sorts or scans the whole vocabulary. The K probe rows
    * broadcast onto the ranked table.
    */
  def vocabCoverage(docs: DataFrame, ks: Seq[Long]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wc = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // materialized for the same exchange-reuse reason as shardAssign
    val parts = Materialize(wc
      .repartitionByRange(col("cnt").desc, col("w").asc)
      .withColumn("__pid", spark_partition_id().cast("long")))
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c"), sum(col("cnt")).as("__m"))
      .select(col("__pid"),
        coalesce(sum(col("__c")).over(offW), lit(0L)).as("__off"),
        coalesce(sum(col("__m")).over(offW), lit(0L)).as("__moff"))
    val localW = Window.partitionBy(col("__pid"))
      .orderBy(col("cnt").desc, col("w").asc)
    val ranked = parts.join(broadcast(offsets), Seq("__pid"))
      .select(col("cnt"),
        (col("__off") + row_number().over(localW)).as("rk"),
        (col("__moff") + sum(col("cnt"))
          .over(localW.rowsBetween(Window.unboundedPreceding, 0))).as("cum"))
    val tot = wc.agg(sum(col("cnt")).cast("double").as("total"),
      count(lit(1)).as("v"))
    ks.toDF("k").crossJoin(broadcast(tot))
      .join(ranked, col("rk") === least(col("k"), col("v")))
      .select(col("k"), least(col("k"), col("v")).as("n_vocab"),
        col("cum").as("covered"), round(col("cum") / col("total"), 6).as("coverage"))
  }

  /** DuckDB twin of [[vocabCoverage]]. */
  def vocabCoverageOracleSql(ks: Seq[Long]): String =
    s"""WITH wc AS (SELECT w, count(*) AS cnt FROM
       |  (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
       |  GROUP BY 1),
       |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rk,
       |    sum(cnt) OVER (ORDER BY cnt DESC, w ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM wc),
       |tot AS (SELECT sum(cnt)::DOUBLE AS total, count(*) AS v FROM wc)
       |SELECT ks.k::BIGINT AS k, least(ks.k, tot.v)::BIGINT AS n_vocab,
       |  r.cum::BIGINT AS covered, round(r.cum / tot.total, 6) AS coverage
       |FROM (SELECT unnest([${ks.mkString(", ")}]) AS k) ks
       |CROSS JOIN tot JOIN r ON r.rk = least(ks.k, tot.v)
       |ORDER BY k""".stripMargin

  /** Blocklist term filter (the C4 §2.2 "dirty word" drop, generalized to
    * any broadcastable term list): per document, the count of DISTINCT
    * blocklisted terms present and the drop flag. The blocklist constant-
    * folds into the plan (a production list of a few thousand terms ships
    * the same way); matching is exact-token, the C4 rule.
    *
    * Scale shape: one narrow array pass per row (distinct tokens ∩
    * literal list), no shuffle, no UDF.
    */
  def blocklistFilter(docs: DataFrame, terms: Seq[String]): DataFrame =
    docs.select(col("doc_id"),
        size(array_intersect(array_distinct(TextOps.tokens(col("text"))),
          typedLit(terms))).cast("long").as("n_blocked"))
      .withColumn("drop", col("n_blocked") > 0)

  /** DuckDB twin of [[blocklistFilter]]. */
  def blocklistOracleSql(terms: Seq[String]): String = {
    val list = terms.map(t => "'" + t.replace("'", "''") + "'")
      .mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
       |    FROM documents)
       |SELECT doc_id,
       |  len(list_intersect(list_distinct(ws), $list))::BIGINT AS n_blocked,
       |  len(list_intersect(list_distinct(ws), $list)) > 0 AS drop
       |FROM t ORDER BY doc_id""".stripMargin
  }

  /** Substring blocklist scan over [[graft.functions.AcFindAll]] — the
    * FlashText/Aho–Corasick pass a pipeline runs when the blocklist has
    * PHRASES and subword fragments an exact-token filter can't see
    * ("hash join" across a space, "slo" inside "slow"). One automaton
    * walk per row finds every pattern regardless of list size; emits the
    * hit count and the comma-joined hit names in pattern-id order.
    *
    * Scale shape: the automaton ships once as a plan reference object;
    * per row one byte-walk of the text — no shuffle, no UDF, cost
    * independent of pattern count.
    */
  def substringBlocklist(docs: DataFrame, patterns: Seq[String]): DataFrame = {
    val names = typedLit(patterns)
    docs.select(col("doc_id"),
        graft.functions.AcFindAll(lower(col("text")), patterns).as("__ids"))
      .select(col("doc_id"),
        size(col("__ids")).cast("long").as("n_found"),
        array_join(transform(col("__ids"),
          i => element_at(names, i + 1)), ",").as("found"))
      .withColumn("drop", col("n_found") > 0)
  }

  /** DuckDB twin of [[substringBlocklist]]: per-pattern strpos over the
    * SAME list — the comprehension keeps literal order = pattern-id
    * order, so the joined names match the automaton's sorted ids.
    */
  def substringBlocklistOracleSql(patterns: Seq[String]): String = {
    val list = patterns.map(p => "'" + p.replace("'", "''") + "'")
      .mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, lower(text) AS tl FROM documents),
       |f AS (SELECT doc_id,
       |    [p for p in $list if strpos(tl, p) > 0] AS hits FROM t)
       |SELECT doc_id, len(hits)::BIGINT AS n_found,
       |  coalesce(array_to_string(hits, ','), '') AS found,
       |  len(hits) > 0 AS drop
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Per-source document-length trimming: keep documents whose token
    * count sits inside the source's [lo, hi] percentile band — the
    * outlier filter (truncated boilerplate at one end, concatenation
    * accidents at the other) a pipeline applies per source because
    * length distributions differ wildly between a news site and a code
    * dump. Bounds are EXACT linear-interpolation percentiles rounded to
    * 6 dp (both engines implement the same 1 + p·(n−1) rank rule), and
    * the keep test compares an integer to the rounded bound, so no float
    * ever sits on a decision boundary that the oracle could flip.
    *
    * Scale shape: Spark's exact percentile aggregate buffers
    * (value → count) pairs, so per-source state is bounded by DISTINCT
    * document lengths, not rows; the source-bounded bounds table
    * broadcasts back onto the corpus stream.
    */
  def lengthTrim(docs: DataFrame, lo: Double = 0.05,
      hi: Double = 0.95): DataFrame = {
    val t = docs.select(col("doc_id"), col("source"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val b = t.groupBy("source").agg(
      round(percentile(col("n_tokens"), lit(lo)), 6).as("lo_bound"),
      round(percentile(col("n_tokens"), lit(hi)), 6).as("hi_bound"))
    t.join(broadcast(b), "source")
      .select(col("doc_id"), col("n_tokens"), col("lo_bound"), col("hi_bound"),
        (col("n_tokens") >= col("lo_bound") &&
          col("n_tokens") <= col("hi_bound")).as("keep"))
  }

  /** DuckDB twin of [[lengthTrim]] (quantile_cont = the same
    * linear-interpolation percentile).
    */
  def lengthTrimOracleSql(lo: Double = 0.05, hi: Double = 0.95): String =
    s"""WITH t AS (SELECT doc_id, source,
       |    len(string_split(lower(text), ' '))::BIGINT AS n_tokens
       |  FROM documents),
       |b AS (SELECT source,
       |    round(quantile_cont(n_tokens, $lo), 6) AS lo_bound,
       |    round(quantile_cont(n_tokens, $hi), 6) AS hi_bound
       |  FROM t GROUP BY 1)
       |SELECT doc_id, n_tokens, lo_bound, hi_bound,
       |  n_tokens >= lo_bound AND n_tokens <= hi_bound AS keep
       |FROM t JOIN b USING (source) ORDER BY doc_id""".stripMargin

  /** Stateless curation front door — ONE plan that runs identically in
    * batch and Structured Streaming (no state, no watermark): per-doc
    * blocklist hit count + the [[TextOps.qualityOf]] trainability flag,
    * keep = clean on both. This is the filter a continuous crawl applies
    * in the live path before anything stateful (dedup) sees the doc;
    * the streaming gate certifies plan parity against the batch oracle.
    */
  def curationFilter(d: DataFrame, terms: Seq[String]): DataFrame =
    d.withColumn("__toks", TextOps.tokens(col("text")))
      .select(col("doc_id"),
        size(array_intersect(array_distinct(col("__toks")),
          typedLit(terms))).cast("long").as("n_blocked"),
        TextOps.qualityOf(size(col("__toks")).cast("long"),
          size(array_distinct(col("__toks"))).cast("long"),
          size(filter(col("__toks"),
            t => t.isInCollection(TextOps.Stopwords))).cast("long"))
          .as("quality"))
      .withColumn("keep", col("quality") === 1 && col("n_blocked") === 0)

  /** DuckDB twin of [[curationFilter]]. */
  def curationFilterOracleSql(terms: Seq[String]): String = {
    val list = terms.map(t => "'" + t.replace("'", "''") + "'")
      .mkString("[", ", ", "]")
    val stops = TextOps.Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
       |    FROM documents),
       |f AS (SELECT doc_id,
       |    len(list_intersect(list_distinct(ws), $list))::BIGINT AS n_blocked,
       |    CAST(len(ws) >= 10 AND len(ws) <= 100000
       |      AND len(list_filter(ws, w -> list_contains($stops, w))) * 20 >= len(ws)
       |      AND len(list_distinct(ws)) * 3 >= len(ws) AS BIGINT) AS quality
       |  FROM t)
       |SELECT doc_id, n_blocked, quality,
       |  quality = 1 AND n_blocked = 0 AS keep
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Tokenizer fertility report per detected language — THE tokenizer-eval
    * number (subword tokens per whitespace word) a multilingual corpus
    * compares across languages to spot under-served scripts: pretokenizer
    * ([[TextOps.bpeTokenCount]]) tokens over word counts, grouped by
    * [[TextOps.langId]]. One narrow pass + a language-bounded aggregate.
    */
  def fertilityReport(docs: DataFrame): DataFrame =
    docs.select(TextOps.langId(col("text")).as("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("nw"),
        TextOps.bpeTokenCount(col("text")).cast("long").as("nb"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_words"),
        sum(col("nb")).as("n_bpe"),
        round(sum(col("nb")).cast("double") / sum(col("nw")), 6)
          .as("fertility"))

  /** Dataset-card summary: the per-source statistics block every corpus
    * release ships (docs, token totals/means, vocabulary, exact-dup rate,
    * mean quality, kept fraction) in ONE pass over the corpus plus the
    * vocabulary/dup aggregates — the sanity dashboard a 100 TB curation
    * run prints per snapshot.
    *
    * Scale shape: two source-keyed aggregates (token stats fold map-side;
    * distinct-token and distinct-hash counts are (source, key)-keyed
    * pre-aggregates so the shuffle carries distincts, not rows) joined on
    * the handful of source keys.
    */
  def datasetStats(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_toks"))
    val base = toks.groupBy(col("source")).agg(
      count(lit(1)).as("docs"),
      sum(col("n_toks")).as("tokens"),
      round(avg(col("n_toks")), 6).as("mean_tokens"))
    val vocab = docs.select(col("source"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("__c"))
      .groupBy(col("source")).agg(count(lit(1)).as("vocabulary"))
    val dups = docs.select(col("source"),
        md5(graft.llm.Dedup.normalized(col("text"))).as("h"))
      .groupBy(col("source"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("source")).agg(
        round((sum(col("c")) - count(lit(1))) /
          sum(col("c")).cast("double"), 6).as("exact_dup_rate"))
    val quality = qualityScore(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source")).agg(
        round(avg(col("quality")), 6).as("mean_quality"),
        round(avg(col("kept").cast("double")), 6).as("kept_frac"))
    base.join(vocab, Seq("source")).join(dups, Seq("source"))
      .join(quality, Seq("source"))
  }

  def datasetStatsOracleSql: String =
    s"""WITH $qualityCteSql,
       |tk AS (SELECT source, len(string_split(lower(text), ' '))::BIGINT AS n_toks,
       |    doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
       |  FROM documents),
       |base AS (SELECT source, count(*) AS docs, sum(n_toks)::BIGINT AS tokens,
       |    round(avg(n_toks), 6) AS mean_tokens
       |  FROM tk GROUP BY 1),
       |vc AS (SELECT source, count(*) AS vocabulary FROM (
       |    SELECT DISTINCT source, unnest(string_split(lower(text), ' ')) AS tok
       |    FROM documents) GROUP BY 1),
       |dp AS (SELECT source,
       |    round((sum(c) - count(*)) / sum(c)::DOUBLE, 6) AS exact_dup_rate
       |  FROM (SELECT source, h, count(*) AS c FROM tk GROUP BY 1, 2)
       |  GROUP BY 1),
       |ql AS (SELECT d.source, round(avg(q.quality), 6) AS mean_quality,
       |    round(avg((q.quality >= 0.5)::INT::DOUBLE), 6) AS kept_frac
       |  FROM qs q JOIN documents d USING (doc_id) GROUP BY 1)
       |SELECT source, docs, tokens, mean_tokens, vocabulary,
       |  exact_dup_rate, mean_quality, kept_frac
       |FROM base JOIN vc USING (source) JOIN dp USING (source)
       |  JOIN ql USING (source)
       |ORDER BY source""".stripMargin

  // --- end-to-end curation pipeline ----------------------------------------

  /** Paragraph-boundary sentinel the e2e pipeline's extraction stage
    * emits: [[graft.llm.Web.extractText]] collapses all whitespace (block
    * structure is gone by design), so crawl fixtures that need paragraph
    * semantics downstream mark boundaries with an explicit token — the
    * same role trafilatura's double-newline markers play in a real crawl
    * stack.
    */
  val ParaSep = " pbreak "

  /** Hash salt + scale of the temperature-sampling stage's deterministic
    * per-doc draw (same rule as [[domainMix]]: keep iff
    * h(doc) / M < sample_frac — reproducible, row-independent).
    */
  val TmixSalt = "tmix:"

  /** The composed curation DAG — every stage is an operator this file (or
    * [[Web]] / [[Dedup]]) already certifies individually; THIS operator
    * certifies their composition: schema handoffs, filter ordering, and
    * no double-normalization between stages. Input `raw` is the crawl
    * front door `(doc_id, source, lang, url, html)`; output is the final
    * packed training assignment `(doc_id, source, lang, n_tokens, seq_id,
    * seq_offset)` for every document that survives the whole chain:
    *
    *   1. markup → text ([[Web.extractText]]; paragraph boundaries as
    *      [[ParaSep]] tokens)
    *   2. URL canonicalization ([[Web.canonicalizeUrl]])
    *   3. robots/opt-out filter ([[Web.robotsFilter]] — compliance first)
    *   4. URL-level dedup (keep the smallest doc_id per canonical URL —
    *      the cheapest dedup pass, before any content work)
    *   5. paragraph-level exact dedup with reassembly
    *      ([[Dedup.dedupParagraphs]] — strips shared boilerplate)
    *   6. C4 quality heuristics ([[c4Filters]] keep flag)
    *   7. MinHash near-dup dedup ([[Dedup.nearDupPairs]] ≥ `threshold`;
    *      the larger doc_id of every pair drops)
    *   8. temperature mixing ([[temperatureMix]] per-lang sample_frac,
    *      applied as a deterministic per-doc hash draw)
    *   9. greedy sequence packing ([[packSequences]])
    *
    * Scale shape: inherited stage by stage from the certified operators —
    * the composition adds only doc_id-keyed equi-joins between stages (and
    * one broadcast of the lang-bounded mix table); nothing here widens a
    * shuffle beyond what the stages already do.
    */
  def curationPipeline(raw: DataFrame, robotsRules: DataFrame,
      threshold: Double = 0.8, budget: Int = 256): DataFrame = {
    // 1-2: extract + canonicalize (narrow, one pass)
    val ext = raw
      .withColumn("clean", Web.extractText(col("html")))
      .withColumn("canon_url", Web.canonicalizeUrl(col("url")))
      .drop("html")
    // 3: robots compliance
    val rob = Web.robotsFilter(ext.select(col("doc_id"), col("url")),
      robotsRules)
    val allowed = ext
      .join(rob.select(col("doc_id"), col("blocked")), Seq("doc_id"))
      .filter(!col("blocked"))
    // 4: URL dedup — min doc_id per canonical URL (keyed agg + equi-join,
    // the exactDedup shape; no global window)
    val urlCanon = allowed.groupBy(col("canon_url"))
      .agg(min(col("doc_id")).as("doc_id"))
    val urlKept = allowed.join(urlCanon, Seq("canon_url", "doc_id"))
    // 5: paragraph dedup with reassembly over the SURVIVING doc set
    val pd = Dedup.dedupParagraphs(
      urlKept.select(col("doc_id"), col("clean").as("text")), ParaSep)
    val cleaned = urlKept.select(col("doc_id"), col("source"), col("lang"))
      .join(pd.select(col("doc_id"), col("clean_text").as("text")),
        Seq("doc_id"))
    // 6: C4 quality gate. Materialized: the near-dup stage alone evaluates
    // its input three times (signature build, shingle sets, anti-join), so
    // without a pipeline break the whole extract→robots→paragraph chain
    // re-runs per consumer (measured 29 s → 9 s at sf0.1).
    val quality = Materialize(cleaned.join(
      c4Filters(cleaned.select(col("doc_id"), col("text")))
        .filter(col("keep") === 1).select(col("doc_id")), Seq("doc_id")))
    // 7: near-dup dedup — drop the larger id of every verified pair
    val dupJ = Dedup.nearDupPairs(quality, threshold)
      .select(col("j").as("doc_id")).distinct()
    val deduped = quality.join(dupJ, Seq("doc_id"), "left_anti")
    // 8: temperature sampling — lang-bounded mix table broadcasts back
    val mix = temperatureMix(deduped)
      .select(col("lang"), col("sample_frac"))
    // Materialized: packSequences reads its input twice (shard offsets +
    // intra-shard sums) and the lang join-back makes a third consumer.
    val sampled = Materialize(deduped.join(broadcast(mix), Seq("lang"))
      .filter(pmod(mdhash64(concat(lit(TmixSalt), col("doc_id"))),
        lit(MixScale)) < col("sample_frac") * MixScale))
    // 9: pack the final corpus
    packSequences(sampled.select(col("doc_id"), col("source"), col("text")),
      budget)
      .join(sampled.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("lang"), col("n_tokens"),
        col("seq_id"), col("seq_offset"))
  }

  def semanticDedupOracleSql(threshold: Double): String = {
    val dot64 = (a: String, b: String) =>
      s"list_sum([$a[i]*$b[i] for i in generate_series(1,64)])"
    val cos = (a: String, b: String) =>
      s"${dot64(a, b)} / (sqrt(${dot64(a, a)}) * sqrt(${dot64(b, b)}))"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cmod AS (SELECT ${graft.llm.Similarity.CentroidModSql} AS m FROM e),
       |cents AS (SELECT vec_id AS cid, v AS cv FROM e
       |  WHERE vec_id % (SELECT m FROM cmod) = 0),
       |ac AS (SELECT e.vec_id, c.cid, ${cos("e.v", "c.cv")} AS cs
       |  FROM e CROSS JOIN cents c),
       |asg AS (SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
       |    FROM ac) WHERE rn = 1),
       |pairs AS (SELECT a.vec_id AS i, b.vec_id AS j
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN e ea ON ea.vec_id = a.vec_id
       |  JOIN e eb ON eb.vec_id = b.vec_id
       |  WHERE ${cos("ea.v", "eb.v")} >= $threshold),
       |dups AS (SELECT j AS vec_id, min(i) AS canon FROM pairs GROUP BY 1)
       |SELECT asg.vec_id, asg.cell,
       |  coalesce(d.canon, asg.vec_id) AS canonical_id,
       |  (d.canon IS NOT NULL)::BIGINT AS is_dup
       |FROM asg LEFT JOIN dups d USING (vec_id)
       |ORDER BY vec_id""".stripMargin
  }
}
