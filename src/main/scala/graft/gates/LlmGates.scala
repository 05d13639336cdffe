package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Curation, Dedup, Multimodal, Ranking, Similarity, TextOps, Web}
import graft.model.Tables

/** Driver gates for the LLM training-data pipeline operators (north-star
  * extension set): exact + MinHash-LSH + SimHash dedup, n-gram Jaccard,
  * cosine top-k similarity, text stats, multimodal feature plumbing. Every
  * gate's oracle replays the SAME deterministic pipeline in DuckDB —
  * including the md5-derived MinHash/SimHash signatures, bit for bit.
  */
object LlmGates extends GateSet {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  // ---- shared DuckDB CTE fragments (twins of TextOps/Dedup) --------------

  private val shViews =
    """ndocs AS (SELECT doc_id, lower(text) AS t FROM documents),
      |toks AS (SELECT doc_id, string_split(t, ' ') AS ws FROM ndocs),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest([ws[i]||' '||ws[i+1]||' '||ws[i+2]
      |                 for i in generate_series(1, len(ws)-2)]) AS s
      |       FROM toks),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)""".stripMargin

  private val sigList = Dedup.HashSeeds
    .map(seed => s"min(xor(h, $seed))").mkString("list_value(", ", ", ")")
  private val bandConcat = (1 to Dedup.Rows).map(r => s"sig[4*b+$r]::VARCHAR").mkString("||','||")

  private val minhashViews =
    s"""hs AS (SELECT doc_id,
       |        ('0x'||substr(md5(s),1,15))::BIGINT AS h
       |      FROM sh),
       |sigs AS (SELECT doc_id, $sigList AS sig FROM hs GROUP BY doc_id),
       |bands AS (SELECT doc_id, g.b AS b, md5($bandConcat) AS bh
       |          FROM sigs CROSS JOIN generate_series(0, ${Dedup.Bands - 1}) g(b))""".stripMargin

  /** The near-dup cluster CTE chain (banded candidates → exact Jaccard →
    * connected components via RECURSIVE reach), ending in
    * `clus(doc_id, cluster_id)` — shared by llm_dup_clusters and
    * llm_keep_best. Host query must start `WITH RECURSIVE shViews, …`.
    */
  /** Shared CTE chain of the IVF-PQ gates (through `fr` = exact-reranked
    * shortlist): mirrors [[graft.llm.Similarity.ivfPqTopK]] at m=16
    * subspaces of 4 dims, nprobe=4, shortlist 4·k=40, queries =
    * vec_id % 25 == 0. Coarse assignment runs on RAW arrays (identical
    * cells to the plain-IVF gates); residuals live in the NORMALIZED
    * space so ADC's L2 tracks 2−2·cos. Residual codebook = the
    * `% md == 1` OFFSET sample (the centroids' own residuals are ≈0 and
    * would collapse the codebook).
    */
  /** Shared CTE chain of the image-dedup gates (through `hashes(id,
    * dhash)`): recomputes the [[Multimodal.imageFixture]] BMP pixels
    * arithmetically, then the box-averaged (gridW+1)×gridH thumbnail and
    * the 60-bit dHash — every constant interpolated from the Multimodal
    * object the Spark side runs, never a parallel literal.
    */
  private val ImgMaxHamming = Multimodal.ImageMaxHamming
  private val ImgBits = Multimodal.ImageHashGridW * Multimodal.ImageHashGridH

  private val imageCtes: String = {
    import Multimodal.{FixtureW, FixtureH, ImageHashGridW, ImageHashGridH,
      PlantOffset, PlantEvery, PerturbDelta, PerturbX, PerturbY}
    val cellW = FixtureW / (ImageHashGridW + 1)
    val cellH = FixtureH / ImageHashGridH
    s"""ids AS (SELECT doc_id AS id, doc_id AS basis, 0 AS pert FROM documents
       |  UNION ALL
       |  SELECT doc_id + $PlantOffset, doc_id, 1 FROM documents
       |  WHERE doc_id % $PlantEvery = 0),
       |pm AS (SELECT id, gx.x AS x, gy.y AS y, pert,
       |    basis*2654435761 + gx.x*40503 + gy.y*10859 AS m
       |  FROM ids, generate_series(0, ${FixtureW - 1}) gx(x),
       |       generate_series(0, ${FixtureH - 1}) gy(y)),
       |pix AS (SELECT id, x, y,
       |    CASE WHEN pert = 1 AND x < $PerturbX AND y < $PerturbY
       |         THEN (xor(xor(m, m >> 7), m >> 15) % 256 + $PerturbDelta) % 256
       |         ELSE xor(xor(m, m >> 7), m >> 15) % 256 END AS v
       |  FROM pm),
       |cells AS (SELECT id, x // $cellW AS cx, y // $cellH AS cy,
       |    SUM(v) // ${cellW * cellH} AS g
       |  FROM pix GROUP BY 1, 2, 3),
       |bits AS (SELECT l.id, (l.cy * $ImageHashGridW + l.cx) AS b
       |  FROM cells l JOIN cells r
       |  ON r.id = l.id AND r.cy = l.cy AND r.cx = l.cx + 1
       |  WHERE l.g > r.g),
       |hashes AS (SELECT ids.id,
       |    COALESCE(SUM(1::BIGINT << b), 0)::BIGINT AS dhash
       |  FROM ids LEFT JOIN bits ON bits.id = ids.id GROUP BY 1)""".stripMargin
  }

  /** Shared CTE chain of the audio-fingerprint gates (through
    * `ahashes(id, afp)`): recomputes the [[Multimodal.audioFixture]] WAV
    * samples arithmetically, then per-frame energies and the 60-bit
    * sign-of-energy-delta fingerprint — constants interpolated from the
    * Multimodal object.
    */
  private val audioCtes: String = {
    import Multimodal.{AudioFpBits, AudioFrameSamples, PlantOffset, PlantEvery}
    val nSamples = (AudioFpBits + 1) * AudioFrameSamples
    s"""aids AS (SELECT doc_id AS id, doc_id AS basis, 0 AS pert FROM documents
       |  UNION ALL
       |  SELECT doc_id + $PlantOffset, doc_id, 1 FROM documents
       |  WHERE doc_id % $PlantEvery = 0),
       |am AS (SELECT id, g.t AS t, pert,
       |    basis*2654435761 + g.t*97003 AS m
       |  FROM aids, generate_series(0, ${nSamples - 1}) g(t)),
       |asamp AS (SELECT id, t,
       |    xor(xor(m, m >> 6), m >> 13) % 60001 - 30000 +
       |      CASE WHEN pert = 1 AND t < ${2 * AudioFrameSamples}
       |           THEN 500 ELSE 0 END AS s
       |  FROM am),
       |aen AS (SELECT id, t // $AudioFrameSamples AS f, SUM(s*s) AS e
       |  FROM asamp GROUP BY 1, 2),
       |afbits AS (SELECT l.id, l.f AS b FROM aen l
       |  JOIN aen r ON r.id = l.id AND r.f = l.f + 1 WHERE r.e > l.e),
       |ahashes AS (SELECT aids.id,
       |    COALESCE(SUM(1::BIGINT << b), 0)::BIGINT AS afp
       |  FROM aids LEFT JOIN afbits ON afbits.id = aids.id GROUP BY 1)""".stripMargin
  }

  /** Shared CTE chain of the video-fingerprint gates (through
    * `vhashes(id, f, vfp)`): recomputes the [[Multimodal.videoFixture]]
    * GVID frame pixels arithmetically, then each frame's 60-bit dHash —
    * constants interpolated from the Multimodal object.
    */
  private val videoCtes: String = {
    import Multimodal.{VideoFrameW, VideoFrameH, VideoFrames, PlantOffset,
      PlantEvery, PerturbDelta, PerturbX, VideoPerturbY}
    val gw = VideoFrameW - 1
    s"""vids AS (SELECT doc_id AS id, doc_id AS basis, 0 AS pert FROM documents
       |  UNION ALL
       |  SELECT doc_id + $PlantOffset, doc_id, 1 FROM documents
       |  WHERE doc_id % $PlantEvery = 0),
       |vm AS (SELECT id, gf.f AS f, gx.x AS x, gy.y AS y, pert,
       |    basis*2654435761 + gf.f*131071 + gx.x*40503 + gy.y*10859 AS m
       |  FROM vids, generate_series(0, ${VideoFrames - 1}) gf(f),
       |       generate_series(0, ${VideoFrameW - 1}) gx(x),
       |       generate_series(0, ${VideoFrameH - 1}) gy(y)),
       |vpix AS (SELECT id, f, x, y,
       |    CASE WHEN pert = 1 AND f < 2 AND x < $PerturbX AND y < $VideoPerturbY
       |         THEN (xor(xor(m, m >> 7), m >> 15) % 256 + $PerturbDelta) % 256
       |         ELSE xor(xor(m, m >> 7), m >> 15) % 256 END AS v
       |  FROM vm),
       |vbits AS (SELECT l.id, l.f, (l.y * $gw + l.x) AS b
       |  FROM vpix l JOIN vpix r
       |  ON r.id = l.id AND r.f = l.f AND r.y = l.y AND r.x = l.x + 1
       |  WHERE l.v > r.v),
       |vframes AS (SELECT id, g.f AS f
       |  FROM vids, generate_series(0, ${VideoFrames - 1}) g(f)),
       |vhashes AS (SELECT vframes.id, vframes.f,
       |    COALESCE(SUM(1::BIGINT << b), 0)::BIGINT AS vfp
       |  FROM vframes LEFT JOIN vbits
       |  ON vbits.id = vframes.id AND vbits.f = vframes.f
       |  GROUP BY 1, 2)""".stripMargin
  }

  // every tunable below is interpolated into the CTE from the SAME
  // constants the Scala gate calls pass to ivfPqTopK — the two sides can
  // only diverge by changing one of these, never by a stale literal
  private val IvfPqK = 10
  private val IvfPqNprobe = 4
  private val IvfPqM = 16
  private val IvfPqRerank = 4
  private val IvfPqQueryMod = 25

  private val ivfpqCtes: String = {
    val subD = Similarity.Dims / IvfPqM
    val dot64 = (a: String, b: String) =>
      s"list_sum([$a[i]*$b[i] for i in generate_series(1,${Similarity.Dims})])"
    val cos = (a: String, b: String) =>
      s"${dot64(a, b)} / (sqrt(${dot64(a, a)}) * sqrt(${dot64(b, b)}))"
    val l2sub = (a: String, b: String) =>
      s"list_sum([($a[i]-$b[i])*($a[i]-$b[i]) for i in generate_series(1,$subD)])"
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |nv AS (SELECT vec_id,
       |    [v[i]/sqrt(${dot64("v", "v")}) for i in generate_series(1,${Similarity.Dims})] AS v
       |  FROM e),
       |cmod AS (SELECT ${Similarity.CentroidModSql} AS md FROM e),
       |cents AS (SELECT vec_id AS cid, v AS cv FROM e
       |  WHERE vec_id % (SELECT md FROM cmod) = 0),
       |ncents AS (SELECT vec_id AS cid, v AS cv FROM nv
       |  WHERE vec_id % (SELECT md FROM cmod) = 0),
       |ac AS (SELECT e.vec_id, c.cid, ${cos("e.v", "c.cv")} AS cs
       |  FROM e CROSS JOIN cents c),
       |asg AS (SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
       |    FROM ac) WHERE rn = 1),
       |resid AS (SELECT a.vec_id, a.cell,
       |    [x.v[i] - c.cv[i] for i in generate_series(1,${Similarity.Dims})] AS rv
       |  FROM asg a JOIN nv x ON x.vec_id = a.vec_id
       |  JOIN ncents c ON c.cid = a.cell),
       |rsubs AS (SELECT vec_id, cell, s, rv[s*$subD+1 : s*$subD+$subD] AS sub
       |  FROM resid, generate_series(0,${IvfPqM - 1}) ss(s)),
       |cb AS (SELECT vec_id AS cid2, s, sub AS csub FROM rsubs
       |  WHERE vec_id % (SELECT md FROM cmod) = 1),
       |codes AS (SELECT vec_id AS nid, cell, s, cid2 FROM (
       |    SELECT r.vec_id, r.cell, r.s, c.cid2,
       |      row_number() OVER (PARTITION BY r.vec_id, r.s
       |        ORDER BY ${l2sub("r.sub", "c.csub")}, c.cid2) AS rn
       |    FROM rsubs r JOIN cb c ON c.s = r.s) WHERE rn = 1),
       |qp AS (SELECT vec_id AS qid, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
       |    FROM ac WHERE vec_id % $IvfPqQueryMod = 0) WHERE rn <= $IvfPqNprobe),
       |qresid AS (SELECT qp.qid, qp.cell,
       |    [x.v[i] - c.cv[i] for i in generate_series(1,${Similarity.Dims})] AS qr
       |  FROM qp JOIN nv x ON x.vec_id = qp.qid
       |  JOIN ncents c ON c.cid = qp.cell),
       |qsubs AS (SELECT qid, cell, s, qr[s*$subD+1 : s*$subD+$subD] AS sub
       |  FROM qresid, generate_series(0,${IvfPqM - 1}) ss(s)),
       |adc AS (SELECT q.qid, q.cell, q.s, c.cid2, ${l2sub("q.sub", "c.csub")} AS qd
       |  FROM qsubs q JOIN cb c ON c.s = q.s),
       |pcand AS (SELECT adc.qid, codes.nid, adc.s, adc.qd
       |  FROM codes JOIN adc ON adc.cell = codes.cell AND adc.s = codes.s
       |    AND adc.cid2 = codes.cid2
       |  WHERE adc.qid <> codes.nid),
       |sc AS (SELECT qid, nid, sqrt(list_sum(list(qd ORDER BY s))) AS adist
       |  FROM pcand GROUP BY 1, 2),
       |short AS (SELECT qid, nid, adist FROM (
       |    SELECT qid, nid, adist,
       |      row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS sr
       |    FROM sc) WHERE sr <= ${IvfPqRerank * IvfPqK}),
       |fr AS (SELECT s.qid, s.nid, s.adist, ${cos("qe.v", "ce.v")} AS sim
       |  FROM short s JOIN e qe ON qe.vec_id = s.qid
       |  JOIN e ce ON ce.vec_id = s.nid)""".stripMargin
  }

  private def clusterCtes(threshold: Double): String =
    s"""rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= ${Dedup.MaxShingleDf}),
       |shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)),
       |cand AS (
       |  SELECT DISTINCT sa.doc_id AS i, sb.doc_id AS j
       |  FROM shc sa JOIN shc sb ON sa.s = sb.s AND sa.doc_id < sb.doc_id),
       |inter AS (
       |  SELECT c.i, c.j, count(*) AS inter
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.i
       |  JOIN sh sb ON sb.doc_id = c.j AND sb.s = sa.s
       |  GROUP BY 1, 2),
       |jac AS (
       |  SELECT i, j, inter * 1.0 / (si.n + sj.n - inter) AS jaccard
       |  FROM inter
       |  JOIN sizes si ON si.doc_id = i
       |  JOIN sizes sj ON sj.doc_id = j),
       |pairs AS (
       |  SELECT i, j FROM jac WHERE jaccard >= $threshold
       |  UNION ALL
       |  SELECT j AS i, i AS j FROM jac WHERE jaccard >= $threshold),
       |reach(src, dst) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.src, p.j FROM reach r JOIN pairs p ON p.i = r.dst),
       |clus AS (SELECT src AS doc_id, min(dst) AS cluster_id
       |  FROM reach GROUP BY 1)""".stripMargin

  private def jaccardSql(candCte: String, threshold: Double): String =
    s"""$candCte,
       |inter AS (
       |  SELECT c.i, c.j, count(*) AS inter
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.i
       |  JOIN sh sb ON sb.doc_id = c.j AND sb.s = sa.s
       |  GROUP BY 1, 2),
       |jac AS (
       |  SELECT i, j, inter * 1.0 / (si.n + sj.n - inter) AS jaccard
       |  FROM inter
       |  JOIN sizes si ON si.doc_id = i
       |  JOIN sizes sj ON sj.doc_id = j)
       |SELECT i, j, round(jaccard, 6) AS jaccard
       |FROM jac WHERE jaccard >= $threshold ORDER BY 1, 2""".stripMargin

  /** Topic seed terms for the BM25 gate — present in the generator vocab. */
  val Bm25Terms: Seq[String] = Seq("spark", "merge", "window")

  /** The llm_exact_dedup oracle, shared with the streaming_exact_dedup
    * gate (a single-batch stream replay must reproduce the batch result).
    */
  private[gates] val exactDedupOracleSql: String =
    """WITH h AS (SELECT doc_id,
      |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS hh
      |  FROM documents),
      |c AS (SELECT hh, min(doc_id) AS canonical_id FROM h GROUP BY 1)
      |SELECT h.doc_id, c.canonical_id,
      |  CAST(h.doc_id <> c.canonical_id AS BIGINT) AS is_dup
      |FROM h JOIN c USING (hh) ORDER BY 1""".stripMargin

  /** The llm_ngram_jaccard oracle (exact ≥0.8 pair set), shared with the
    * streaming_incremental_dedup gate: a batched replay must emit exactly
    * the one-shot pair set regardless of how the corpus is split.
    */
  private[gates] def ngramJaccardOracleSql: String =
    "WITH " + shViews + ",\n" + jaccardSql(
      s"""rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= ${Dedup.MaxShingleDf}),
         |shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)),
         |cand AS (
         |  SELECT DISTINCT sa.doc_id AS i, sb.doc_id AS j
         |  FROM shc sa JOIN shc sb ON sa.s = sb.s AND sa.doc_id < sb.doc_id)""".stripMargin,
      0.8)

  /** Domain-mix gate rates: src<i> kept at (i mod 5) × 0.25. */
  val MixRates: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (i % 5) * 0.25).toMap

  override lazy val gates: Seq[Gate] = Seq(

    // --- exact dedup: normalized-text hash groupBy ------------------------
    Gate("llm_exact_dedup",
      (spark: SparkSession, dir: String) =>
        Dedup.exactDedup(docs(spark, dir))
          .select(col("doc_id"), col("canonical_id"), col("is_dup").cast("long"))
          .orderBy("doc_id"),
      Some(exactDedupOracleSql)),

    // --- MinHash-LSH near-dup: banded buckets → candidates → exact verify -
    Gate("llm_minhash_lsh",
      (spark: SparkSession, dir: String) =>
        Dedup.minhashNearDups(docs(spark, dir), 0.5)
          .select(col("i"), col("j"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("i", "j"),
      Some("WITH " + shViews + ",\n" + minhashViews + ",\n" + jaccardSql(
        """cand AS (
          |  SELECT DISTINCT x.doc_id AS i, y.doc_id AS j
          |  FROM bands x JOIN bands y
          |    ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id)""".stripMargin,
        0.5))),

    // --- n-gram Jaccard ≥0.8 pairs. ENGINE: high-recall LSH (8 bands × 2
    // rows) then exact-Jaccard verify — the scale path, never Σdf² pair
    // blowup. ORACLE: the exact shingle-share formulation — the gate passes
    // because the banding's candidate recall at J ≥ 0.8 is 1 on this data
    // (LlmSpec cross-checks the two formulations at sf0.001). -------------
    Gate("llm_ngram_jaccard",
      (spark: SparkSession, dir: String) =>
        Dedup.nearDupPairs(docs(spark, dir), 0.8)
          .select(col("i"), col("j"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("i", "j"),
      Some(ngramJaccardOracleSql)),

    // --- edit-similarity near-dup verification (code-dedup metric) --------
    // Threshold 0.4: the corpus has no exact near-dup prose pairs, so a
    // high cut would gate an empty set; 0.4 keeps genuinely split rows
    // (shared-template docs) while still exercising the filter.
    Gate("llm_edit_similarity",
      (spark: SparkSession, dir: String) =>
        Dedup.editSimilarityPairs(docs(spark, dir), threshold = 0.4)
          .orderBy("i", "j"),
      Some("WITH " + shViews + ",\n" +
        Dedup.editSimilarityOracleSql(threshold = 0.4))),

    // --- winnowing document fingerprints (MOSS scheme): k-gram hashes →
    // min per w-window → distinct; the rolling-hash serial recurrence is
    // re-expressed as direct k-gram hashing (same output set) -------------
    Gate("llm_fingerprints",
      (spark: SparkSession, dir: String) =>
        TextOps.winnowFingerprints(docs(spark, dir))
          .select(col("doc_id"), explode(col("fingerprints")).as("fp"))
          .orderBy("doc_id", "fp"),
      Some(
        """WITH n AS (SELECT doc_id,
          |    regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
          |  FROM documents),
          |kh AS (SELECT doc_id,
          |    [('0x'||substr(md5(substr(t, i, 8)),1,15))::BIGINT
          |     for i in generate_series(1, length(t)-7)] AS kh
          |  FROM n),
          |fps AS (SELECT doc_id,
          |    list_distinct([list_aggregate(kh[j:j+3], 'min')
          |                   for j in generate_series(1, len(kh)-3)]) AS fps
          |  FROM kh)
          |SELECT doc_id, fp FROM (SELECT doc_id, unnest(fps) AS fp FROM fps)
          |ORDER BY 1, 2""".stripMargin)),

    // --- MOSS match step: fingerprint-overlap pairs ------------------------
    Gate("llm_winnow_pairs",
      (spark: SparkSession, dir: String) =>
        TextOps.winnowOverlapPairs(docs(spark, dir)).orderBy("i", "j"),
      Some(TextOps.winnowOverlapOracleSql())),

    // --- PII scrub: typed placeholder redaction (regexp_replace chain) ----
    Gate("llm_pii_scrub",
      (spark: SparkSession, dir: String) =>
        docs(spark, dir)
          .select(col("doc_id"),
            TextOps.scrubPii(concat(col("text"),
              lit(" reach me at u" ), col("doc_id"),
              lit("@example.com or 10.0."), (col("doc_id") % 256).cast("string"),
              lit(".1 or +1 (555) 010-"), (col("doc_id") % 10000).cast("string")))
              .as("clean"))
          .orderBy("doc_id"),
      Some(
        s"""SELECT doc_id,
           |  regexp_replace(
           |    regexp_replace(
           |      regexp_replace(
           |        text || ' reach me at u' || CAST(doc_id AS VARCHAR)
           |             || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
           |             || '.1 or +1 (555) 010-' || CAST(doc_id % 10000 AS VARCHAR),
           |        '${TextOps.EmailRe}', '<EMAIL>', 'g'),
           |      '${TextOps.Ipv4Re}', '<IP>', 'g'),
           |    '${TextOps.PhoneRe}', '<PHONE>', 'g') AS clean
           |FROM documents ORDER BY doc_id""".stripMargin)),

    // --- chunking: fixed-size training windows with overlap ---------------
    Gate("llm_chunk",
      (spark: SparkSession, dir: String) =>
        TextOps.chunk(docs(spark, dir), chunkTokens = 40, overlap = 10)
          .orderBy("doc_id", "chunk_id"),
      Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          |c AS (SELECT doc_id, k AS chunk_id,
          |    array_to_string(ws[(k*30+1):(k*30+40)], ' ') AS chunk_text,
          |    len(ws[(k*30+1):(k*30+40)]) AS n_tokens
          |  FROM t, unnest([x for x in generate_series(0, greatest((len(ws)-1)//30, 0))]) AS g(k))
          |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, chunk_text,
          |  CAST(n_tokens AS BIGINT) AS n_tokens
          |FROM c WHERE n_tokens > 0 ORDER BY doc_id, chunk_id""".stripMargin)),

    // --- incremental dedup: new batch (odd ids) vs corpus (even ids) ------
    Gate("llm_incremental_dedup",
      (spark: SparkSession, dir: String) => {
        val d = docs(spark, dir)
        Dedup.incrementalNearDups(
          d.filter(col("doc_id") % 2 === 1),
          d.filter(col("doc_id") % 2 === 0), 0.8)
          .select(col("i"), col("j"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("i", "j")
      },
      Some("WITH " + shViews + ",\n" + jaccardSql(
        s"""rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= ${Dedup.MaxShingleDf}),
           |shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)),
           |cand AS (
           |  SELECT DISTINCT sa.doc_id AS i, sb.doc_id AS j
           |  FROM shc sa JOIN shc sb ON sa.s = sb.s
           |  WHERE sa.doc_id % 2 = 1 AND sb.doc_id % 2 = 0)""".stripMargin,
        0.8))),

    // --- duplicate clusters: connected components over near-dup pairs -----
    Gate("llm_dup_clusters",
      (spark: SparkSession, dir: String) =>
        Dedup.dupClusters(docs(spark, dir), 0.8).orderBy("doc_id"),
      Some("WITH RECURSIVE " + shViews + ",\n" + clusterCtes(0.8) + "\n" +
        "SELECT doc_id, cluster_id FROM clus ORDER BY 1")),

    // --- cross-source near-dup overlap matrix (release contamination
    // report); rides the same cluster build + oracle CTE chain ------------
    Gate("llm_source_overlap",
      (spark: SparkSession, dir: String) =>
        Dedup.sourceOverlap(docs(spark, dir), 0.8)
          .orderBy("src_a", "src_b"),
      Some("WITH RECURSIVE " + shViews + ",\n" + clusterCtes(0.8) + ",\n" +
        """cs AS (SELECT DISTINCT c.cluster_id, d.source
          |  FROM clus c JOIN documents d USING (doc_id))
          |SELECT a.source AS src_a, b.source AS src_b,
          |  count(*) AS n_clusters
          |FROM cs a JOIN cs b
          |  ON a.cluster_id = b.cluster_id AND a.source < b.source
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- quality-aware duplicate retention: keep the HIGHEST-quality
    // member of each near-dup cluster (the production retention policy;
    // min-id canonicals discard the best-written copy of a template) -----
    Gate("llm_keep_best",
      (spark: SparkSession, dir: String) =>
        graft.llm.Curation.keepBestPerCluster(docs(spark, dir), 0.8)
          .orderBy("doc_id"),
      Some("WITH RECURSIVE " + shViews + ",\n" + clusterCtes(0.8) + ",\n" +
        graft.llm.Curation.qualityCteSql + "\n" +
        """SELECT c.doc_id, c.cluster_id, q.quality,
          |  (row_number() OVER (PARTITION BY c.cluster_id
          |     ORDER BY q.quality DESC, c.doc_id) = 1)::BIGINT AS kept
          |FROM clus c JOIN qs q USING (doc_id)
          |ORDER BY c.doc_id""".stripMargin)),

    // --- deterministic stratified sampling (hash-based, rerun-stable) -----
    Gate("llm_stratified_sample",
      (spark: SparkSession, dir: String) =>
        graft.llm.Sampling.stratifiedSample(
          docs(spark, dir),
          col("lang"), Map("en" -> 0.5, "fr" -> 0.25), default = 0.1,
          key = col("doc_id"))
          .select(col("doc_id"), col("lang")).orderBy("doc_id"),
      Some(
        """SELECT doc_id, lang FROM documents
          |WHERE ('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          |      % 1000000 <
          |  CASE lang WHEN 'en' THEN 500000 WHEN 'fr' THEN 250000 ELSE 100000 END
          |ORDER BY doc_id""".stripMargin)),

    // --- exactly-N-per-stratum deterministic reservoir ---------------------
    Gate("llm_topn_per_stratum",
      (spark: SparkSession, dir: String) =>
        graft.llm.Sampling.topNPerStratum(
          docs(spark, dir), col("lang"), 5, key = col("doc_id"))
          .select(col("doc_id"), col("lang")).orderBy("doc_id"),
      Some(
        """WITH h AS (SELECT doc_id, lang,
          |    ('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          |      % 1000000 AS hb
          |  FROM documents),
          |r AS (SELECT doc_id, lang,
          |    row_number() OVER (PARTITION BY lang ORDER BY hb, doc_id) AS rk
          |  FROM h)
          |SELECT doc_id, lang FROM r WHERE rk <= 5 ORDER BY doc_id""".stripMargin)),

    // --- SimHash signatures (per-bit majority over token hashes) ----------
    Gate("llm_simhash",
      (spark: SparkSession, dir: String) =>
        Dedup.simhash(docs(spark, dir)).orderBy("doc_id"),
      Some(
        s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
           |dt AS (SELECT DISTINCT doc_id, unnest(ws) AS t FROM toks),
           |th AS (SELECT doc_id, ('0x'||substr(md5(t),1,15))::BIGINT AS h FROM dt),
           |bits AS (
           |  SELECT doc_id, g.b AS b,
           |    sum(CASE WHEN (h >> g.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
           |  FROM th CROSS JOIN generate_series(0, ${Dedup.SimHashBits - 1}) g(b)
           |  GROUP BY 1, 2)
           |SELECT doc_id,
           |  CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
           |FROM bits GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- brute-force cosine top-k (ANN exactness baseline) ----------------
    Gate("llm_ann_cosine",
      (spark: SparkSession, dir: String) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.bruteForceTopK(emb.filter(col("vec_id") % 25 === 0), emb, 5)
          .select(col("qid"), col("nid"), col("rank").cast("long"),
            round(col("sim"), 6).as("sim"))
          .orderBy("qid", "rank")
      },
      Some(
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 25 = 0),
          |s AS (SELECT qid, e.vec_id AS nid,
          |    list_sum([qv[i]*v[i] for i in generate_series(1,64)]) /
          |    (sqrt(list_sum([qv[i]*qv[i] for i in generate_series(1,64)])) *
          |     sqrt(list_sum([v[i]*v[i] for i in generate_series(1,64)]))) AS sim
          |  FROM e CROSS JOIN q WHERE e.vec_id <> qid),
          |r AS (SELECT qid, nid, sim,
          |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
          |  FROM s)
          |SELECT qid, nid, rank, round(sim, 6) AS sim
          |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin)),

    // --- multi-table sign-LSH ANN vs brute force: per-query hit count of
    // the brute top-10 found by the LSH top-10. The oracle re-derives the
    // ENTIRE sign-bucket construction (md5-derived hyperplane weights,
    // per-table buckets, bucket-join candidates) bit for bit, so the gate
    // checks the LSH structure itself, not just high recall. --------------
    Gate("llm_ann_lsh_recall",
      (spark: SparkSession, dir: String) => {
        val emb = Tables.embeddings(spark, dir)
        val q = emb.filter(col("vec_id") % 25 === 0)
        val brute = Similarity.bruteForceTopK(q, emb, 10)
          .select(col("qid"), col("nid"))
        val lsh = Similarity.lshTopK(q, emb, 10)
          .select(col("qid"), col("nid"), lit(1L).as("__hit"))
        brute.join(lsh, Seq("qid", "nid"), "left")
          .groupBy(col("qid"))
          .agg(sum(coalesce(col("__hit"), lit(0L))).cast("long").as("hits"))
          .orderBy("qid")
      },
      Some {
        val dot64 = (a: String, b: String) =>
          s"list_sum([$a[i]*$b[i] for i in generate_series(1,64)])"
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |pn AS (SELECT GREATEST(8, length(bin(GREATEST(count(*), 2) - 1))) AS pl FROM e),
           |w AS (SELECT t, p, d,
           |    ((('0x'||substr(md5(t::VARCHAR||'|'||p::VARCHAR||'|'||d::VARCHAR),1,15))::BIGINT % 2000) - 1000)/1000.0 AS wt
           |  FROM generate_series(0,3) tt(t), generate_series(0,63) pp(p),
           |       generate_series(0,63) dd(d)
           |  WHERE p < (SELECT pl FROM pn)),
           |wl AS (SELECT t, p, list(wt ORDER BY d) AS wv FROM w GROUP BY 1, 2),
           |dots AS (SELECT e.vec_id, wl.t, wl.p,
           |    ${dot64("e.v", "wl.wv")} AS dot
           |  FROM e CROSS JOIN wl),
           |bkt AS (SELECT vec_id, t,
           |    sum(CASE WHEN dot >= 0 THEN 1::BIGINT << p ELSE 0 END) AS bkt
           |  FROM dots GROUP BY 1, 2),
           |cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
           |  FROM bkt q JOIN bkt c ON q.t = c.t AND q.bkt = c.bkt
           |  WHERE q.vec_id % 25 = 0 AND c.vec_id <> q.vec_id),
           |sims AS (SELECT cand.qid, cand.nid,
           |    ${dot64("qe.v", "ce.v")} /
           |    (sqrt(${dot64("qe.v", "qe.v")}) * sqrt(${dot64("ce.v", "ce.v")})) AS sim
           |  FROM cand JOIN e qe ON qe.vec_id = cand.qid
           |            JOIN e ce ON ce.vec_id = cand.nid),
           |ltop AS (SELECT qid, nid FROM (
           |    SELECT qid, nid,
           |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
           |    FROM sims) WHERE rk <= 10),
           |q2 AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 25 = 0),
           |bsim AS (SELECT qid, e.vec_id AS nid,
           |    ${dot64("qv", "e.v")} /
           |    (sqrt(${dot64("qv", "qv")}) * sqrt(${dot64("e.v", "e.v")})) AS sim
           |  FROM e CROSS JOIN q2 WHERE e.vec_id <> qid),
           |btop AS (SELECT qid, nid FROM (
           |    SELECT qid, nid,
           |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
           |    FROM bsim) WHERE rk <= 10)
           |SELECT b.qid, CAST(count(l.nid) AS BIGINT) AS hits
           |FROM btop b LEFT JOIN ltop l ON l.qid = b.qid AND l.nid = b.nid
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // --- IVF coarse-quantizer ANN vs brute force: per-query hit count of
    // the brute top-10 found by the IVF top-10 (nprobe=4). Centroids are
    // the deterministic vec_id % max(23, floor(sqrt(n))) sample — the
    // oracle computes the SAME adaptive spacing, so it re-derives the
    // ENTIRE cell structure (assignment argmax, probe ranking, in-cell
    // rerank) at any scale factor — the IVF index itself is gated, not
    // just high recall. --------------------------------------------------
    Gate("llm_ann_ivf_recall",
      (spark: SparkSession, dir: String) => {
        val emb = Tables.embeddings(spark, dir)
        val q = emb.filter(col("vec_id") % 25 === 0)
        val brute = Similarity.bruteForceTopK(q, emb, 10)
          .select(col("qid"), col("nid"))
        val ivf = Similarity.ivfTopK(q, emb, 10)
          .select(col("qid"), col("nid"), lit(1L).as("__hit"))
        brute.join(ivf, Seq("qid", "nid"), "left")
          .groupBy(col("qid"))
          .agg(sum(coalesce(col("__hit"), lit(0L))).cast("long").as("hits"))
          .orderBy("qid")
      },
      Some {
        val dot64 = (a: String, b: String) =>
          s"list_sum([$a[i]*$b[i] for i in generate_series(1,64)])"
        val cos = (a: String, b: String) =>
          s"${dot64(a, b)} / (sqrt(${dot64(a, a)}) * sqrt(${dot64(b, b)}))"
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |cmod AS (SELECT ${Similarity.CentroidModSql} AS m FROM e),
           |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % (SELECT m FROM cmod) = 0),
           |ac AS (SELECT e.vec_id, c.cid, ${cos("e.v", "c.cv")} AS cs
           |  FROM e CROSS JOIN cents c),
           |asg AS (SELECT vec_id AS nid, cid AS cell FROM (
           |    SELECT vec_id, cid,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
           |    FROM ac) WHERE rn = 1),
           |qp AS (SELECT vec_id AS qid, cid AS cell FROM (
           |    SELECT vec_id, cid,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
           |    FROM ac WHERE vec_id % 25 = 0) WHERE rn <= 4),
           |cand AS (SELECT qp.qid, asg.nid FROM qp
           |  JOIN asg ON asg.cell = qp.cell WHERE asg.nid <> qp.qid),
           |sims AS (SELECT cand.qid, cand.nid, ${cos("qe.v", "ce.v")} AS sim
           |  FROM cand JOIN e qe ON qe.vec_id = cand.qid
           |            JOIN e ce ON ce.vec_id = cand.nid),
           |itop AS (SELECT qid, nid FROM (
           |    SELECT qid, nid,
           |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
           |    FROM sims) WHERE rk <= 10),
           |q2 AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 25 = 0),
           |bsim AS (SELECT qid, e.vec_id AS nid, ${cos("qv", "e.v")} AS sim
           |  FROM e CROSS JOIN q2 WHERE e.vec_id <> qid),
           |btop AS (SELECT qid, nid FROM (
           |    SELECT qid, nid,
           |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
           |    FROM bsim) WHERE rk <= 10)
           |SELECT b.qid, CAST(count(i.nid) AS BIGINT) AS hits
           |FROM btop b LEFT JOIN itop i ON i.qid = b.qid AND i.nid = b.nid
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // --- IVF query path ALONE (no brute-force harness): this is the entry
    // whose bench timing tracks the 100 TB scale path — the recall gate
    // above is quadratic by construction (its ground truth is brute
    // force), so its timing measures the harness, not the index. ----------
    Gate("llm_ann_ivf_query",
      (spark: SparkSession, dir: String) => {
        val emb = Tables.embeddings(spark, dir)
        val q = emb.filter(col("vec_id") % 25 === 0)
        Similarity.ivfTopK(q, emb, 10)
          .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"))
          .orderBy("qid", "rank")
      },
      Some {
        val dot64 = (a: String, b: String) =>
          s"list_sum([$a[i]*$b[i] for i in generate_series(1,64)])"
        val cos = (a: String, b: String) =>
          s"${dot64(a, b)} / (sqrt(${dot64(a, a)}) * sqrt(${dot64(b, b)}))"
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |cmod AS (SELECT ${Similarity.CentroidModSql} AS m FROM e),
           |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % (SELECT m FROM cmod) = 0),
           |ac AS (SELECT e.vec_id, c.cid, ${cos("e.v", "c.cv")} AS cs
           |  FROM e CROSS JOIN cents c),
           |asg AS (SELECT vec_id AS nid, cid AS cell FROM (
           |    SELECT vec_id, cid,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
           |    FROM ac) WHERE rn = 1),
           |qp AS (SELECT vec_id AS qid, cid AS cell FROM (
           |    SELECT vec_id, cid,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
           |    FROM ac WHERE vec_id % 25 = 0) WHERE rn <= 4),
           |cand AS (SELECT qp.qid, asg.nid FROM qp
           |  JOIN asg ON asg.cell = qp.cell WHERE asg.nid <> qp.qid),
           |sims AS (SELECT cand.qid, cand.nid, ${cos("qe.v", "ce.v")} AS sim
           |  FROM cand JOIN e qe ON qe.vec_id = cand.qid
           |            JOIN e ce ON ce.vec_id = cand.nid)
           |SELECT qid, nid, rk AS rank FROM (
           |    SELECT qid, nid,
           |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
           |    FROM sims) WHERE rk <= 10
           |ORDER BY qid, rank""".stripMargin
      }),

    // --- metadata-filtered ANN (pre-filtered IVF top-k) --------------------
    // pred = even label; the oracle replays the IVF chain with the same
    // pre-filter on the assigned index rows, so the k-among-matching
    // guarantee is certified, not just recall.
    Gate("llm_ann_filtered",
      (spark: SparkSession, dir: String) => {
        val emb = Tables.embeddings(spark, dir)
        val q = emb.filter(col("vec_id") % 25 === 0)
        Similarity.ivfFilteredTopK(q, emb, 10, col("label") % 2 === 0)
          .orderBy("qid", "rank")
      },
      Some {
        val dot64 = (a: String, b: String) =>
          s"list_sum([$a[i]*$b[i] for i in generate_series(1,64)])"
        val cos = (a: String, b: String) =>
          s"${dot64(a, b)} / (sqrt(${dot64(a, a)}) * sqrt(${dot64(b, b)}))"
        s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
           |cmod AS (SELECT ${Similarity.CentroidModSql} AS m FROM e),
           |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % (SELECT m FROM cmod) = 0),
           |ac AS (SELECT e.vec_id, c.cid, ${cos("e.v", "c.cv")} AS cs
           |  FROM e CROSS JOIN cents c),
           |asg AS (SELECT vec_id AS nid, cid AS cell FROM (
           |    SELECT vec_id, cid,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
           |    FROM ac) WHERE rn = 1),
           |asgf AS (SELECT asg.nid, asg.cell FROM asg
           |  JOIN e ON e.vec_id = asg.nid WHERE e.label % 2 = 0),
           |qp AS (SELECT vec_id AS qid, cid AS cell FROM (
           |    SELECT vec_id, cid,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
           |    FROM ac WHERE vec_id % 25 = 0) WHERE rn <= 4),
           |cand AS (SELECT qp.qid, asgf.nid FROM qp
           |  JOIN asgf ON asgf.cell = qp.cell WHERE asgf.nid <> qp.qid),
           |sims AS (SELECT cand.qid, cand.nid, ${cos("qe.v", "ce.v")} AS sim
           |  FROM cand JOIN e qe ON qe.vec_id = cand.qid
           |            JOIN e ce ON ce.vec_id = cand.nid)
           |SELECT qid, nid, rk AS rank, round(sim, 6) AS sim FROM (
           |    SELECT qid, nid, sim,
           |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
           |    FROM sims) WHERE rk <= 10
           |ORDER BY qid, rank""".stripMargin
      }),

    // --- IVF-PQ (IVFADC, Jégou 2011 §IV): coarse cell + PQ-coded
    // residual, asymmetric-distance ranking. The oracle re-derives the
    // whole composed index (adaptive centroid spacing, offset-sample
    // residual codebook, per-subspace code assignment, per-query ADC
    // table) bit for bit — the INDEX is gated, not just recall. ----------
    Gate("llm_ann_ivfpq_query",
      (spark: SparkSession, dir: String) => {
        val emb = Tables.embeddings(spark, dir)
        val q = emb.filter(col("vec_id") % IvfPqQueryMod === 0)
        Similarity.ivfPqTopK(q, emb, IvfPqK, IvfPqNprobe, IvfPqM, IvfPqRerank)
          .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"),
            round(col("sim"), 6).as("sim"), round(col("adist"), 6).as("adist"))
          .orderBy("qid", "rank")
      },
      Some(
        s"""WITH $ivfpqCtes
           |SELECT qid, nid, rank, round(sim, 6) AS sim,
           |  round(adist, 6) AS adist FROM (
           |    SELECT qid, nid, adist, sim,
           |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
           |    FROM fr) WHERE rank <= $IvfPqK
           |ORDER BY qid, rank""".stripMargin)),

    // --- IVF-PQ vs brute force: per-query hit count of the brute top-10
    // found by the ADC top-10 (same probe budget as llm_ann_ivf_recall,
    // so the two recall gates compare the exact and PQ-coded rerank over
    // the identical candidate cells). ------------------------------------
    Gate("llm_ann_ivfpq_recall",
      (spark: SparkSession, dir: String) => {
        val emb = Tables.embeddings(spark, dir)
        val q = emb.filter(col("vec_id") % IvfPqQueryMod === 0)
        val brute = Similarity.bruteForceTopK(q, emb, IvfPqK)
          .select(col("qid"), col("nid"))
        val pq = Similarity.ivfPqTopK(q, emb, IvfPqK, IvfPqNprobe, IvfPqM, IvfPqRerank)
          .select(col("qid"), col("nid"), lit(1L).as("__hit"))
        brute.join(pq, Seq("qid", "nid"), "left")
          .groupBy(col("qid"))
          .agg(sum(coalesce(col("__hit"), lit(0L))).cast("long").as("hits"))
          .orderBy("qid")
      },
      Some {
        val dot64 = (a: String, b: String) =>
          s"list_sum([$a[i]*$b[i] for i in generate_series(1,${Similarity.Dims})])"
        val cos = (a: String, b: String) =>
          s"${dot64(a, b)} / (sqrt(${dot64(a, a)}) * sqrt(${dot64(b, b)}))"
        s"""WITH $ivfpqCtes,
           |ptop AS (SELECT qid, nid FROM (
           |    SELECT qid, nid,
           |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
           |    FROM fr) WHERE rk <= $IvfPqK),
           |q2 AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % $IvfPqQueryMod = 0),
           |bsim AS (SELECT qid, e.vec_id AS nid, ${cos("qv", "e.v")} AS sim
           |  FROM e CROSS JOIN q2 WHERE e.vec_id <> qid),
           |btop AS (SELECT qid, nid FROM (
           |    SELECT qid, nid,
           |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
           |    FROM bsim) WHERE rk <= $IvfPqK)
           |SELECT b.qid, CAST(count(p.nid) AS BIGINT) AS hits
           |FROM btop b LEFT JOIN ptop p ON p.qid = b.qid AND p.nid = b.nid
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // --- embedding-cosine near-dup pairs: sign-LSH bucket candidates →
    // exact-cosine verify. The base embeddings are random (max pairwise
    // cosine ≈0.51), so each side PLANTS near-dups deterministically —
    // every 50th vector re-appears with its first coordinate scaled 1.1×
    // (double math on both sides) — and the oracle mirrors buckets +
    // cosine exactly, so partial LSH recall cannot diverge the compare. --
    Gate("llm_embed_neardup",
      (spark: SparkSession, dir: String) => {
        val emb = Tables.embeddings(spark, dir)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        val planted = emb.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"),
              (v, i) => when(i === 0, v * 1.1).otherwise(v)).as("embedding"))
        Similarity.embeddingNearDups(emb.unionByName(planted), 0.9)
          .select(col("i"), col("j"), round(col("sim"), 6).as("sim"))
          .orderBy("i", "j")
      },
      Some {
        val dot64 = (a: String, b: String) =>
          s"list_sum([$a[i]*$b[i] for i in generate_series(1,64)])"
        s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |ep AS (SELECT vec_id + 1000000 AS vec_id,
           |    [CASE WHEN i = 1 THEN v[i]*1.1 ELSE v[i] END
           |     for i in generate_series(1,64)] AS v
           |  FROM e0 WHERE vec_id % 50 = 0),
           |e AS (SELECT * FROM e0 UNION ALL SELECT * FROM ep),
           |pn AS (SELECT GREATEST(8, length(bin(GREATEST(count(*), 2) - 1))) AS pl FROM e),
           |w AS (SELECT t, p, d,
           |    ((('0x'||substr(md5(t::VARCHAR||'|'||p::VARCHAR||'|'||d::VARCHAR),1,15))::BIGINT % 2000) - 1000)/1000.0 AS wt
           |  FROM generate_series(0,3) tt(t), generate_series(0,63) pp(p),
           |       generate_series(0,63) dd(d)
           |  WHERE p < (SELECT pl FROM pn)),
           |wl AS (SELECT t, p, list(wt ORDER BY d) AS wv FROM w GROUP BY 1, 2),
           |dots AS (SELECT e.vec_id, wl.t, wl.p,
           |    ${dot64("e.v", "wl.wv")} AS dot
           |  FROM e CROSS JOIN wl),
           |bkt AS (SELECT vec_id, t,
           |    sum(CASE WHEN dot >= 0 THEN 1::BIGINT << p ELSE 0 END) AS bkt
           |  FROM dots GROUP BY 1, 2),
           |cand AS (SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
           |  FROM bkt a JOIN bkt b ON a.t = b.t AND a.bkt = b.bkt
           |    AND a.vec_id < b.vec_id),
           |sims AS (SELECT cand.i, cand.j,
           |    ${dot64("ei.v", "ej.v")} /
           |    (sqrt(${dot64("ei.v", "ei.v")}) * sqrt(${dot64("ej.v", "ej.v")})) AS sim
           |  FROM cand JOIN e ei ON ei.vec_id = cand.i
           |            JOIN e ej ON ej.vec_id = cand.j)
           |SELECT i, j, round(sim, 6) AS sim FROM sims
           |WHERE sim >= 0.9 ORDER BY i, j""".stripMargin
      }),

    // --- language ID: marker-profile scoring, argmax with deterministic
    // tie-break (array_max struct ordering ≡ the CASE chain below) ---------
    Gate("llm_lang_id",
      (spark: SparkSession, dir: String) =>
        docs(spark, dir)
          .select(col("doc_id"), TextOps.langId(col("text")).as("lang"))
          .orderBy("doc_id"),
      Some(s"""WITH $langCtes
          |SELECT doc_id, lang FROM lng ORDER BY doc_id""".stripMargin)),

    // --- tokenizer fertility report per detected language -----------------
    // fertility = pretokenizer (BPE-ish regex) tokens per whitespace word,
    // THE tokenizer-eval number compared across languages; rides the
    // lang-ID chain + the text_stats n_bpe mirror
    Gate("llm_fertility",
      (spark: SparkSession, dir: String) =>
        Curation.fertilityReport(docs(spark, dir)).orderBy("lang"),
      Some {
        s"""WITH $langCtes,
           |f AS (SELECT lng.lang,
           |    len(t.ws)::BIGINT AS nw,
           |    len(regexp_extract_all(t.text,
           |      '${TextOps.BpeTokenRe.replace("'", "''")}'))::BIGINT AS nb
           |  FROM lng JOIN t USING (doc_id))
           |SELECT lang, count(*)::BIGINT AS n_docs, sum(nw)::BIGINT AS n_words,
           |  sum(nb)::BIGINT AS n_bpe,
           |  round(sum(nb)::DOUBLE / sum(nw), 6) AS fertility
           |FROM f GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // --- per-doc text stats / quality filter (all-integer outputs) --------
    Gate("llm_text_stats",
      (spark: SparkSession, dir: String) =>
        TextOps.stats(docs(spark, dir)).orderBy("doc_id"),
      Some {
        val stops = TextOps.Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
        s"""WITH t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws FROM documents),
           |s AS (SELECT doc_id,
           |    CAST(len(ws) AS BIGINT) AS n_tokens,
           |    CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq,
           |    CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_token_len,
           |    CAST(len(list_filter(ws, w -> list_contains($stops, w))) AS BIGINT) AS stop_cnt,
           |    CAST(len(regexp_extract_all(text, '${TextOps.BpeTokenRe.replace("'", "''")}')) AS BIGINT) AS n_bpe
           |  FROM t)
           |SELECT *, CAST(n_tokens >= 10 AND n_tokens <= 100000
           |    AND stop_cnt * 20 >= n_tokens
           |    AND n_uniq * 3 >= n_tokens AS BIGINT) AS quality
           |FROM s ORDER BY doc_id""".stripMargin
      }),

    // --- multimodal plumbing: binary payload → batch featurizer (stubbed
    // decode) → exploded histogram features -------------------------------
    Gate("llm_multimodal_hist",
      (spark: SparkSession, dir: String) =>
        Multimodal.featureHistogram(spark, dir).orderBy("doc_id", "bin"),
      Some(
        s"""WITH chars AS (SELECT doc_id,
           |    unnest([ord(text[i]) % ${Multimodal.FeatureBins}
           |            for i in generate_series(1, len(text))]) AS bin
           |  FROM documents),
           |cnts AS (SELECT doc_id, bin, count(*) AS c FROM chars GROUP BY 1, 2),
           |grid AS (SELECT d.doc_id, g.b AS bin
           |  FROM documents d CROSS JOIN generate_series(0, ${Multimodal.FeatureBins - 1}) g(b))
           |SELECT g.doc_id, g.bin, CAST(coalesce(c.c, 0) AS DOUBLE) AS cnt
           |FROM grid g LEFT JOIN cnts c ON c.doc_id = g.doc_id AND c.bin = g.bin
           |ORDER BY 1, 2""".stripMargin)),

    // --- BM25 keyword relevance: corpus curation by topic seed terms ------
    Gate("llm_bm25_topk",
      (spark: SparkSession, dir: String) =>
        Ranking.bm25TopK(docs(spark, dir), Bm25Terms, 50),
      Some(Ranking.bm25OracleSql(Bm25Terms, 50))),

    // --- benchmark decontamination: eval-set 3-gram overlap ---------------
    Gate("llm_decontaminate",
      (spark: SparkSession, dir: String) => {
        val d = docs(spark, dir)
        Dedup.decontaminate(
          d.where(col("source") =!= "src0"),
          d.where(col("source") === "src0"), 3)
          .orderBy("doc_id")
      },
      Some(
        s"""WITH $shViews,
           |bsh0 AS (SELECT sh.doc_id AS bench_id, sh.s FROM sh
           |  JOIN documents d ON d.doc_id = sh.doc_id WHERE d.source = 'src0'),
           |rare AS (SELECT s FROM bsh0 GROUP BY s HAVING count(*) <= ${Dedup.MaxShingleDf}),
           |bsh AS (SELECT bench_id, b.s FROM bsh0 b JOIN rare USING (s)),
           |csh AS (SELECT sh.doc_id, sh.s FROM sh
           |  JOIN documents d ON d.doc_id = sh.doc_id WHERE d.source <> 'src0'),
           |ov AS (SELECT c.doc_id, b.bench_id, count(*) AS shared
           |  FROM csh c JOIN bsh b USING (s) GROUP BY 1, 2),
           |r AS (SELECT doc_id, bench_id, shared,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY shared DESC, bench_id) AS rn
           |  FROM ov)
           |SELECT doc_id, bench_id, shared FROM r
           |WHERE rn = 1 AND shared >= 3 ORDER BY doc_id""".stripMargin)),

    // --- Gopher repetition quality: dup-word + top-bigram mass ------------
    Gate("llm_repetition",
      (spark: SparkSession, dir: String) =>
        TextOps.repetitionStats(docs(spark, dir)).orderBy("doc_id"),
      Some(
        """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
          |base AS (SELECT doc_id,
          |    CAST(len(ws) AS BIGINT) AS n_tokens,
          |    CAST(len(ws) - len(list_distinct(ws)) AS BIGINT) AS dup_tokens,
          |    [ws[i]||' '||ws[i+1] for i in generate_series(1, len(ws)-1)] AS grams
          |  FROM toks),
          |g AS (SELECT doc_id, unnest(grams) AS g FROM base),
          |cnt AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
          |top AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
          |    CAST(max(c) AS BIGINT) AS top_bigram FROM cnt GROUP BY 1)
          |SELECT b.doc_id, b.n_tokens, b.dup_tokens,
          |  coalesce(t.n_bigrams, 0) AS n_bigrams,
          |  coalesce(t.top_bigram, 0) AS top_bigram,
          |  CAST(b.dup_tokens * 10 > b.n_tokens * 3
          |    OR coalesce(t.top_bigram, 0) * 100 > coalesce(t.n_bigrams, 0) * 18
          |    AS BIGINT) AS "drop"
          |FROM base b LEFT JOIN top t USING (doc_id) ORDER BY 1""".stripMargin)),

    // --- sequence packing: two-level distributed prefix sum ---------------
    // shardSpan=64 so sf0.01 (500 docs) actually exercises BOTH levels of
    // the prefix sum (the default 4096 would collapse to one shard here)
    Gate("llm_seq_pack",
      (spark: SparkSession, dir: String) =>
        Curation.packSequences(docs(spark, dir), 256, shardSpan = 64)
          .orderBy("doc_id"),
      Some(Curation.packOracleSql(256))),

    // --- packing-efficiency report (training-batch utilization) -----------
    Gate("llm_pack_report",
      (spark: SparkSession, dir: String) =>
        Curation.packReport(docs(spark, dir), 256, shardSpan = 64)
          .orderBy("source"),
      Some(Curation.packReportOracleSql(256))),

    // --- domain mixing: deterministic per-source hash-rate sampling -------
    // rates cycle {0, .25, .5, .75, 1.0} across src0..src19 — covers the
    // drop-all and keep-all edges plus three interior rates
    Gate("llm_domain_mix",
      (spark: SparkSession, dir: String) =>
        Curation.domainMix(docs(spark, dir), MixRates).orderBy("doc_id"),
      Some(Curation.domainMixOracleSql(MixRates))),

    // --- unigram-LM surprisal scoring (CCNet-style quality signal) --------
    Gate("llm_unigram_surprisal",
      (spark: SparkSession, dir: String) =>
        Curation.unigramSurprisal(docs(spark, dir)).orderBy("doc_id"),
      Some(Curation.UnigramSurprisalOracleSql)),

    // --- TF-IDF top-k characteristic terms per document -------------------
    Gate("llm_tfidf_topk",
      (spark: SparkSession, dir: String) =>
        Curation.tfidfTopTerms(docs(spark, dir), 5).orderBy("doc_id", "rank"),
      Some(Curation.tfidfOracleSql(5))),

    // --- C4-style heuristic quality flags ---------------------------------
    Gate("llm_c4_filters",
      (spark: SparkSession, dir: String) =>
        Curation.c4Filters(docs(spark, dir)).orderBy("doc_id"),
      Some(Curation.C4FiltersOracleSql)),

    // --- chunk-level (paragraph) near-dup: cross-doc pairs ----------------
    // threshold 0.85 sits >=0.007 from the nearest distinct chunk-pair
    // jaccard on the testdata (no pair on the float boundary); ENGINE runs
    // LSH-then-verify over chunks, ORACLE the exact shingle-share
    // formulation — recall 1 at 0.85 (cross-checked in CurationSpec)
    Gate("llm_chunk_neardup",
      (spark: SparkSession, dir: String) =>
        Curation.chunkNearDups(docs(spark, dir), 0.85)
          .select(col("i"), col("j"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("i", "j"),
      Some(Curation.chunkNearDupOracleSql(0.85))),

    // --- token-budget selection: quality-greedy per source ----------------
    Gate("llm_budget_select",
      (spark: SparkSession, dir: String) =>
        Curation.budgetSelect(docs(spark, dir), 600).orderBy("doc_id"),
      Some(Curation.budgetSelectOracleSql(600))),

    // --- SemDeDup: IVF-cell clustering + within-cell cosine dedup ---------
    // threshold 0.35 sits ≥3.5e-4 from the nearest within-cell cosine on
    // the testdata — no pair near the float boundary
    Gate("llm_semantic_dedup",
      (spark: SparkSession, dir: String) =>
        Curation.semanticDedup(Tables.embeddings(spark, dir), 0.35)
          .orderBy("vec_id"),
      Some(Curation.semanticDedupOracleSql(0.35))),

    // --- exact-substring duplication profile (Lee et al. 2021 shape) ------
    Gate("llm_substring_dedup",
      (spark: SparkSession, dir: String) =>
        Dedup.substringDups(docs(spark, dir), 12).orderBy("doc_id"),
      Some(Dedup.substringDupsOracleSql(12))),

    // --- hybrid retrieval: RRF fusion of BM25 and dense cosine ------------
    // query vector 0 pairs with the fixed BM25 term list; pools 100 deep,
    // fused top-25
    Gate("llm_hybrid_rrf",
      (spark: SparkSession, dir: String) =>
        Ranking.hybridRrfTopK(docs(spark, dir), Tables.embeddings(spark, dir),
          Bm25Terms, 0L, 100, 25).orderBy("rank"),
      Some(Ranking.hybridRrfOracleSql(Bm25Terms, 0L, 100, 25))),

    // --- int8 scalar quantization of the embedding column -----------------
    Gate("llm_int8_quant",
      (spark: SparkSession, dir: String) =>
        Similarity.scalarQuantize(Tables.embeddings(spark, dir))
          .orderBy("vec_id"),
      Some(Similarity.scalarQuantizeOracleSql())),

    // --- product quantization (Jégou et al. 2011): per-subspace sampled
    // codebook, code-id checksum + total reconstruction error — the
    // 8-byte-per-vector compression of billion-scale ANN ----------------
    Gate("llm_pq_quant",
      (spark: SparkSession, dir: String) =>
        Similarity.productQuantize(Tables.embeddings(spark, dir))
          .orderBy("vec_id"),
      Some(Similarity.productQuantizeOracleSql())),

    // --- bigram-LM surprisal (CCNet/KenLM perplexity-filter shape, one
    // order above llm_unigram_surprisal; bigram table rejoined by key,
    // deliberately not broadcast) ----------------------------------------
    Gate("llm_bigram_surprisal",
      (spark: SparkSession, dir: String) =>
        Curation.bigramSurprisal(docs(spark, dir)).orderBy("doc_id"),
      Some(Curation.bigramSurprisalOracleSql())),

    // --- dataset-card summary: the per-source statistics block a corpus
    // release ships (docs/tokens/vocab/dup-rate/quality) -----------------
    Gate("llm_dataset_stats",
      (spark: SparkSession, dir: String) =>
        Curation.datasetStats(docs(spark, dir)).orderBy("source"),
      Some(Curation.datasetStatsOracleSql)),

    // --- media header probe: format + dimensions parsed from the binary
    // container header (PNG IHDR / GIF LSD / BMP info / JPEG SOF scan) —
    // the pre-decode resolution/format filter of a multimodal pipeline.
    // Headers are CONSTRUCTED from doc_id-derived dims, so the oracle
    // recomputes the expected dims arithmetically and any parser bug
    // (endianness, offset, marker walk) mismatches. ----------------------
    Gate("llm_media_probe",
      (spark: SparkSession, dir: String) => {
        val d = docs(spark, dir)
        val w = (col("doc_id") % 1913 + 16).cast("int")
        val h = (col("doc_id") % 1061 + 9).cast("int")
        def hex8(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
        def hex4(c: org.apache.spark.sql.Column) = lpad(hex(c), 4, "0")
        def le16(c: org.apache.spark.sql.Column) = {
          val x = hex4(c); concat(substring(x, 3, 2), substring(x, 1, 2))
        }
        def le32(c: org.apache.spark.sql.Column) = {
          val x = hex8(c)
          concat(substring(x, 7, 2), substring(x, 5, 2),
            substring(x, 3, 2), substring(x, 1, 2))
        }
        def le24(c: org.apache.spark.sql.Column) = {
          val x = lpad(hex(c), 6, "0")
          concat(substring(x, 5, 2), substring(x, 3, 2), substring(x, 1, 2))
        }
        val png = concat(lit("89504E470D0A1A0A0000000D49484452"),
          hex8(w), hex8(h), lit("0806000000"))
        val gif = concat(lit("474946383961"), le16(w), le16(h), lit("F70000"))
        val bmp = concat(lit("424D00000000000000003600000028000000"),
          le32(w), le32(h))
        // APP0, a standalone TEM marker (FF01), and a 0xFF fill byte
        // before SOF0 exercise the full marker-segment walk
        val jpg = concat(
          lit("FFD8FFE000104A46494600010100000100010000FF01FFFFC0001108"),
          hex4(h), hex4(w), lit("03011100021101031101"))
        // RIFF/WEBP with a VP8X extended header: 24-bit LE minus-one dims
        val webp = concat(lit("524946462400000057454250565038580A000000"),
          lit("02000000"), le24(w - 1), le24(h - 1))
        // ISO-BMFF: ftyp(isom) + moov > trak > tkhd v0, 16.16 fixed dims
        val mp4 = concat(
          lit("000000106674797069736F6D00000000"),
          lit("0000006C6D6F6F76000000647472616B0000005C746B686400000007"),
          lit("0" * 144), hex4(w), lit("0000"), hex4(h), lit("0000"))
        val hexStr = when(col("doc_id") % 6 === 0, png)
          .when(col("doc_id") % 6 === 1, gif)
          .when(col("doc_id") % 6 === 2, bmp)
          .when(col("doc_id") % 6 === 3, webp)
          .when(col("doc_id") % 6 === 4, mp4)
          .otherwise(jpg)
        val probe = graft.functions.MediaProbeFn.probe(unhex(hexStr))
        d.select(col("doc_id"),
            probe.getField("format").as("format"),
            probe.getField("width").as("width"),
            probe.getField("height").as("height"))
          .orderBy("doc_id")
      },
      Some(
        """SELECT doc_id,
          |  CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
          |       WHEN 2 THEN 'bmp' WHEN 3 THEN 'webp'
          |       WHEN 4 THEN 'mp4' ELSE 'jpeg' END AS format,
          |  (doc_id % 1913 + 16)::INT AS width,
          |  (doc_id % 1061 + 9)::INT AS height
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // --- image perceptual near-dup: dHash over DECODED pixels. The
    // fixture BMPs carry arithmetically-defined pixels (gray(x,y) =
    // (id·31+x·7+y·13) mod 256), so the oracle recomputes the decoded
    // image, the box-averaged thumbnail, the 60-bit dHash, the Hamming
    // bands, and the verified pairs — the whole index, no codec needed.
    // Any decode bug (BMP row order, stride, channel order) or hash bug
    // (bit index, tie direction, floor average) mismatches. -------------
    Gate("llm_image_dhash",
      (spark: SparkSession, dir: String) =>
        Multimodal.imageDHash(Multimodal.imageFixture(docs(spark, dir)))
          .orderBy("doc_id"),
      Some(s"""WITH $imageCtes
              |SELECT id AS doc_id, dhash FROM hashes ORDER BY 1""".stripMargin)),

    Gate("llm_image_neardup",
      (spark: SparkSession, dir: String) =>
        Multimodal.imageNearDups(
            Multimodal.imageDHash(Multimodal.imageFixture(docs(spark, dir))))
          .orderBy("i", "j"),
      Some {
        val bands = ImgMaxHamming + 1
        val bandBits = (ImgBits + bands - 1) / bands
        val mask = (1L << bandBits) - 1
        s"""WITH $imageCtes,
           |bnd AS (SELECT id, g.b AS bi, (dhash >> (g.b * $bandBits)) & $mask AS key
           |  FROM hashes, generate_series(0, ${bands - 1}) g(b)),
           |cand AS (SELECT DISTINCT x.id AS i, y.id AS j
           |  FROM bnd x JOIN bnd y
           |  ON x.bi = y.bi AND x.key = y.key AND x.id < y.id)
           |SELECT i, j, CAST(bit_count(xor(hi.dhash, hj.dhash)) AS BIGINT) AS hamming
           |FROM cand JOIN hashes hi ON hi.id = cand.i
           |          JOIN hashes hj ON hj.id = cand.j
           |WHERE bit_count(xor(hi.dhash, hj.dhash)) <= $ImgMaxHamming
           |ORDER BY 1, 2""".stripMargin
      }),

    // --- audio perceptual fingerprint: sign-of-energy-delta over DECODED
    // PCM frames (Haitsma-Kalker envelope primitive). Fixture WAVs carry
    // arithmetically-defined samples, so the oracle replays decode →
    // frame energies → fingerprint → banded near-dup pairs exactly. -----
    Gate("llm_audio_fp",
      (spark: SparkSession, dir: String) =>
        Multimodal.audioFingerprint(Multimodal.audioFixture(docs(spark, dir)))
          .orderBy("doc_id"),
      Some(s"""WITH $audioCtes
              |SELECT id AS doc_id, afp FROM ahashes ORDER BY 1""".stripMargin)),

    Gate("llm_audio_neardup",
      (spark: SparkSession, dir: String) =>
        Multimodal.audioNearDups(
            Multimodal.audioFingerprint(
              Multimodal.audioFixture(docs(spark, dir))))
          .orderBy("i", "j"),
      Some {
        val bands = Multimodal.AudioMaxHamming + 1
        val bandBits = (Multimodal.AudioFpBits + bands - 1) / bands
        val mask = (1L << bandBits) - 1
        s"""WITH $audioCtes,
           |abnd AS (SELECT id, g.b AS bi, (afp >> (g.b * $bandBits)) & $mask AS key
           |  FROM ahashes, generate_series(0, ${bands - 1}) g(b)),
           |acand AS (SELECT DISTINCT x.id AS i, y.id AS j
           |  FROM abnd x JOIN abnd y
           |  ON x.bi = y.bi AND x.key = y.key AND x.id < y.id)
           |SELECT i, j, CAST(bit_count(xor(hi.afp, hj.afp)) AS BIGINT) AS hamming
           |FROM acand JOIN ahashes hi ON hi.id = acand.i
           |           JOIN ahashes hj ON hj.id = acand.j
           |WHERE bit_count(xor(hi.afp, hj.afp)) <= ${Multimodal.AudioMaxHamming}
           |ORDER BY 1, 2""".stripMargin
      }),

    // --- video perceptual fingerprint: per-keyframe dHash sequence, and
    // near-dup = TOTAL Hamming over aligned frames with per-frame
    // pigeonhole banding (exact recall, never all-pairs). ----------------
    Gate("llm_video_fp",
      (spark: SparkSession, dir: String) =>
        Multimodal.videoFingerprint(Multimodal.videoFixture(docs(spark, dir)))
          .orderBy("doc_id", "frame"),
      Some(s"""WITH $videoCtes
              |SELECT id AS doc_id, f AS frame, vfp FROM vhashes
              |ORDER BY 1, 2""".stripMargin)),

    Gate("llm_video_neardup",
      (spark: SparkSession, dir: String) =>
        Multimodal.videoNearDups(
            Multimodal.videoFingerprint(
              Multimodal.videoFixture(docs(spark, dir))))
          .orderBy("i", "j"),
      Some {
        val perFrame = Multimodal.VideoMaxHamming / Multimodal.VideoFrames
        val bands = perFrame + 1
        val bandBits = (Multimodal.VideoFpBits + bands - 1) / bands
        val mask = (1L << bandBits) - 1
        s"""WITH $videoCtes,
           |vbnd AS (SELECT id, f, g.b AS bi,
           |    (vfp >> (g.b * $bandBits)) & $mask AS key
           |  FROM vhashes, generate_series(0, ${bands - 1}) g(b)),
           |vcand AS (SELECT DISTINCT x.id AS i, y.id AS j
           |  FROM vbnd x JOIN vbnd y
           |  ON x.f = y.f AND x.bi = y.bi AND x.key = y.key AND x.id < y.id)
           |SELECT i, j,
           |  CAST(SUM(bit_count(xor(hi.vfp, hj.vfp))) AS BIGINT) AS hamming
           |FROM vcand JOIN vhashes hi ON hi.id = vcand.i
           |           JOIN vhashes hj ON hj.id = vcand.j AND hj.f = hi.f
           |GROUP BY 1, 2
           |HAVING SUM(bit_count(xor(hi.vfp, hj.vfp))) <= ${Multimodal.VideoMaxHamming}
           |ORDER BY 1, 2""".stripMargin
      }),

    // --- leakage-free train/eval split: near-dup clusters stay atomic
    // across the boundary (the Lee et al. contamination mechanism) -------
    Gate("llm_leakage_split",
      (spark: SparkSession, dir: String) =>
        Curation.leakageFreeSplit(docs(spark, dir), 0.8, trainPct = 90)
          .orderBy("doc_id"),
      Some("WITH RECURSIVE " + shViews + ",\n" + clusterCtes(0.8) + "\n" +
        s"""SELECT doc_id, cluster_id,
           |  CASE WHEN ${Curation.splitBucketSql("cluster_id")} < 90
           |       THEN 'train' ELSE 'eval' END AS split
           |FROM clus ORDER BY doc_id""".stripMargin)),

    // --- balanced token shards for N dataloader workers: sort-desc +
    // round-robin (distributed LPT cousin; one global sort, no driver
    // state) --------------------------------------------------------------
    Gate("llm_shard_assign",
      (spark: SparkSession, dir: String) =>
        Curation.shardAssign(docs(spark, dir), 8).orderBy("doc_id"),
      Some(Curation.shardAssignOracleSql(8))),

    // --- hashed-feature linear quality scorer (fastText shape) ------------
    Gate("llm_quality_score",
      (spark: SparkSession, dir: String) =>
        Curation.qualityScore(docs(spark, dir)).orderBy("doc_id"),
      Some(Curation.qualityScoreOracleSql)),

    // --- content-defined chunking: rolling-hash cut points -----------------
    Gate("llm_cdc_chunk",
      (spark: SparkSession, dir: String) =>
        TextOps.cdcChunks(docs(spark, dir)).orderBy("doc_id", "chunk_id"),
      Some(TextOps.cdcChunksOracleSql())),

    // --- crawl front door 1: markup -> text + text-density ratio ----------
    // Fixture wraps each document in a deterministic page template (nav,
    // style, script, comment, entities) so the strip/decode chain is
    // exercised on every row; the oracle rebuilds the SAME template from
    // the shared token list and replays the SAME regex chain.
    Gate("llm_html_extract",
      (spark: SparkSession, dir: String) =>
        docs(spark, dir)
          .select(col("doc_id"), htmlFixtureCol.as("html"))
          .select(col("doc_id"),
            Web.extractText(col("html")).as("clean"),
            Web.textRatio(col("html")).as("text_ratio"))
          .orderBy("doc_id"),
      Some(htmlExtractOracleSql)),

    // --- hard-negative mining: top-k different-label neighbors (IVF) ------
    Gate("llm_hard_negatives",
      (spark: SparkSession, dir: String) => {
        val emb = Tables.embeddings(spark, dir)
        val q = emb.filter(col("vec_id") % 25 === 0)
        Similarity.ivfHardNegatives(q, emb, 10).orderBy("qid", "rank")
      },
      Some {
        val dot64 = (a: String, b: String) =>
          s"list_sum([$a[i]*$b[i] for i in generate_series(1,64)])"
        val cos = (a: String, b: String) =>
          s"${dot64(a, b)} / (sqrt(${dot64(a, a)}) * sqrt(${dot64(b, b)}))"
        s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
           |cmod AS (SELECT ${Similarity.CentroidModSql} AS m FROM e),
           |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % (SELECT m FROM cmod) = 0),
           |ac AS (SELECT e.vec_id, c.cid, ${cos("e.v", "c.cv")} AS cs
           |  FROM e CROSS JOIN cents c),
           |asg AS (SELECT vec_id AS nid, cid AS cell FROM (
           |    SELECT vec_id, cid,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
           |    FROM ac) WHERE rn = 1),
           |qp AS (SELECT vec_id AS qid, cid AS cell FROM (
           |    SELECT vec_id, cid,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
           |    FROM ac WHERE vec_id % 25 = 0) WHERE rn <= 4),
           |cand AS (SELECT qp.qid, asg.nid FROM qp
           |  JOIN asg ON asg.cell = qp.cell
           |  JOIN e ql ON ql.vec_id = qp.qid
           |  JOIN e nl ON nl.vec_id = asg.nid
           |  WHERE asg.nid <> qp.qid AND ql.label <> nl.label),
           |sims AS (SELECT cand.qid, cand.nid, ${cos("qe.v", "ce.v")} AS sim
           |  FROM cand JOIN e qe ON qe.vec_id = cand.qid
           |            JOIN e ce ON ce.vec_id = cand.nid)
           |SELECT qid, nid, rk AS rank, round(sim, 6) AS sim FROM (
           |    SELECT qid, nid, sim,
           |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
           |    FROM sims) WHERE rk <= 10
           |ORDER BY qid, rank""".stripMargin
      }),

    // --- DSIR importance weighting (hashed-n-gram target vs raw ratio) ----
    Gate("llm_dsir_weights",
      (spark: SparkSession, dir: String) =>
        Curation.dsirWeights(docs(spark, dir), col("source") === "src0")
          .orderBy("doc_id"),
      Some(Curation.dsirOracleSql())),

    // --- DSIR importance resampling (Gumbel top-k, hash uniforms) ---------
    // Completes the DSIR loop: weights -> an actual deterministic draw.
    // The plan canary in CurationSpec pins the top-n as
    // TakeOrderedAndProject, never a global sort.
    Gate("llm_dsir_resample",
      (spark: SparkSession, dir: String) =>
        Curation.dsirResample(docs(spark, dir),
          col("source") === "src0", n = 100)
          .orderBy(col("gumbel_key").desc, col("doc_id")),
      Some(Curation.dsirResampleOracleSql(n = 100))),

    // --- BPE tokenizer apply (vocabulary-pass + dictionary rejoin) --------
    // The oracle replays the leftmost-best-pair merge loop as a recursive
    // CTE from the SAME ranked merge list — the tokenizer itself is
    // differential-tested, not just counts of a fixed regex.
    Gate("llm_bpe_tokens",
      (spark: SparkSession, dir: String) =>
        TextOps.bpeTokenCounts(docs(spark, dir), BpeMerges)
          .orderBy("doc_id"),
      Some(bpeTokensOracleSql)),

    // --- distributed spherical k-means (Lloyd) refinement -----------------
    // The oracle unrolls both Lloyd rounds structurally (assignment
    // window, per-dim rounded means, empty-cell carry) — the ITERATION is
    // gated, not just the final labels. Means round to 6 dp before the
    // next assignment on BOTH sides (the repo's avg-chain parity rule).
    Gate("llm_kmeans",
      (spark: SparkSession, dir: String) =>
        Similarity.kmeansRefine(Tables.embeddings(spark, dir), iters = 2)
          .orderBy("vec_id"),
      Some(kmeansOracleSql)),

    // --- embedding-corpus quality report (norms + anisotropy) -------------
    Gate("llm_embed_stats",
      (spark: SparkSession, dir: String) =>
        Similarity.embedStats(Tables.embeddings(spark, dir))
          .orderBy("label"),
      Some(Similarity.EmbedStatsOracleSql)),

    // --- prototypicality pruning (per-cluster easy-core drop) -------------
    // Shares the kmeans CTE chain; the keep rule is integer
    // cross-multiplication so no float boundary exists.
    Gate("llm_proto_prune",
      (spark: SparkSession, dir: String) =>
        Similarity.protoPrune(Tables.embeddings(spark, dir))
          .orderBy("vec_id"),
      Some(protoPruneOracleSql)),

    // --- C4-style paragraph dedup with document reassembly ----------------
    // Fixture gives every doc 4 paragraphs: a global boilerplate (kept
    // only by the smallest doc_id), the first-15-words slice, a per-source
    // boilerplate (kept by each source's first doc), and the full text.
    Gate("llm_paragraph_dedup",
      (spark: SparkSession, dir: String) =>
        Dedup.dedupParagraphs(
          docs(spark, dir).select(col("doc_id"), paraFixtureCol.as("text")))
          .orderBy("doc_id"),
      Some(paragraphDedupOracleSql)),

    // --- crawl front door 2: URL canonicalization + URL-level dedup -------
    // Even/odd docs spell the SAME page two ways (case, :443, trailing
    // slash, utm noise, param order, fragment); pages repeat every
    // UrlPageMod docs (a re-crawl) so canonical keys genuinely collide.
    Gate("llm_url_canon",
      (spark: SparkSession, dir: String) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("canon_url")
        docs(spark, dir)
          .select(col("doc_id"), urlFixtureCol.as("url"))
          .withColumn("canon_url", Web.canonicalizeUrl(col("url")))
          .withColumn("is_dup", col("doc_id") > min("doc_id").over(w))
          .orderBy("doc_id")
      },
      Some(urlCanonOracleSql)),

    // --- stupid-backoff trigram LM scoring (CCNet perplexity filter) ------
    // LM trained on the src0 trusted split, whole corpus scored; backoff
    // genuinely fires (19 of 20 sources contain trigrams the split never
    // saw), so all three CASE arms are oracle-certified.
    Gate("llm_lm_score",
      (spark: SparkSession, dir: String) =>
        Curation.lmScore(docs(spark, dir), col("source") === "src0")
          .orderBy("doc_id"),
      Some(Curation.LmScoreOracleSql)),

    // --- per-source boilerplate n-gram report -------------------------------
    Gate("llm_boilerplate_ngrams",
      (spark: SparkSession, dir: String) =>
        Curation.boilerplateNgrams(docs(spark, dir))
          .orderBy("source", "rank"),
      Some(Curation.boilerplateNgramsOracleSql())),

    // --- ANALYZE-style column statistics (corpus catalog) ------------------
    // text excluded: its min/max would be whole documents; the planner
    // stats that matter are the key/dimension columns.
    Gate("llm_column_stats",
      (spark: SparkSession, dir: String) =>
        Curation.columnStats(docs(spark, dir),
          Seq("doc_id", "lang", "n_chars", "source"))
          .orderBy("column"),
      Some(Curation.columnStatsOracleSql(
        Seq("doc_id", "lang", "n_chars", "source")))),

    // --- declarative data-quality constraint validation --------------------
    // allowed-lang domain deliberately excludes 'zh' and minChars=100
    // catches the short tail, so two rules genuinely fail while the
    // structural five pass — the report's pass column splits.
    Gate("llm_data_checks",
      (spark: SparkSession, dir: String) =>
        Curation.dataChecks(docs(spark, dir), Seq("en", "de", "es", "fr"))
          .orderBy("check"),
      Some(Curation.dataChecksOracleSql(Seq("en", "de", "es", "fr")))),

    // --- per-source corpus-drift report (KL vs the global distribution) ---
    Gate("llm_drift_report",
      (spark: SparkSession, dir: String) =>
        TextOps.driftReport(docs(spark, dir)).orderBy("source"),
      Some(TextOps.DriftReportOracleSql)),

    // --- HyperLogLog per-source distinct-token estimate --------------------
    // Registers are integer-exact on both sides (minimal-binary-string
    // rank); the oracle replays sketch AND estimate, small-range
    // correction included, then certifies rel_err against the exact
    // distinct count.
    Gate("llm_hll_distinct",
      (spark: SparkSession, dir: String) =>
        TextOps.hllReport(docs(spark, dir))
          .withColumnRenamed("scope", "source").orderBy("source"),
      Some(TextOps.hllReportOracleSql)),

    // --- Count-Min sketch token frequency ----------------------------------
    // Query set spans heavy hitters (join/hash/scan), mid/rare corpus
    // terms, and an absent token; the oracle recomputes every cell as the
    // exact-count sum of colliding tokens, so est (collisions included)
    // and the >= 0 overcount are certified cell-for-cell.
    Gate("llm_count_min",
      (spark: SparkSession, dir: String) =>
        TextOps.cmReport(docs(spark, dir), CmQueryTerms).orderBy("term"),
      Some(TextOps.cmReportOracleSql(CmQueryTerms))),

    // --- temperature-scaled language mixture (alpha sampling) -------------
    Gate("llm_temperature_mix",
      (spark: SparkSession, dir: String) =>
        Curation.temperatureMix(docs(spark, dir)).orderBy("lang"),
      Some(Curation.temperatureMixOracleSql())),

    // --- JSONL corpus interchange roundtrip --------------------------------
    // Export + re-parse must reproduce the source rows exactly — the
    // oracle is the original table, so any escaping or extraction
    // infidelity in the JSON codec hash-mismatches.
    Gate("llm_jsonl_roundtrip",
      (spark: SparkSession, dir: String) =>
        Curation.jsonlRoundtrip(docs(spark, dir)).orderBy("doc_id"),
      Some("""SELECT doc_id, lang, n_chars, source, text
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // --- CCNet perplexity buckets (head/middle/tail per language) ---------
    Gate("llm_ccnet_buckets",
      (spark: SparkSession, dir: String) =>
        Curation.ccnetBuckets(docs(spark, dir), col("source") === "src0")
          .orderBy("doc_id"),
      Some(Curation.CcnetBucketsOracleSql)),

    // --- fastText-style hashed linear classifier --------------------------
    // Deterministic md5-derived demo model: both engines build the SAME
    // (bucket, weight) table, so the gate certifies the hashing + broadcast
    // scoring plumbing bit-for-bit.
    Gate("llm_hash_classifier",
      (spark: SparkSession, dir: String) =>
        Curation.hashClassifierScore(docs(spark, dir),
          Curation.demoClassifierWeights(spark, ClassifierDim), ClassifierDim)
          .orderBy("doc_id"),
      Some(Curation.hashClassifierOracleSql(ClassifierDim))),

    // --- BPE vocabulary TRAINING (learn_bpe over the word-freq table) -----
    // The oracle replays every training stage structurally: pair count →
    // (count desc, l, r) argmax → recursive single-merge apply. The
    // ITERATION is gated — rank k's pick depends on all earlier merges.
    Gate("llm_bpe_train",
      (spark: SparkSession, dir: String) =>
        TextOps.bpeTrain(docs(spark, dir), BpeTrainN).orderBy("rank"),
      Some(bpeTrainOracleSql(BpeTrainN))),

    // --- vocabulary coverage curve (top-K token-mass fraction) ------------
    // K grid spans the corpus vocabulary (31 words at every SF) so the
    // min(K, |V|) clamp and interior points are all exercised; the rank
    // is shardAssign's two-level distributed prefix sum.
    Gate("llm_vocab_coverage",
      (spark: SparkSession, dir: String) =>
        Curation.vocabCoverage(docs(spark, dir), VocabKs).orderBy("k"),
      Some(Curation.vocabCoverageOracleSql(VocabKs))),

    // --- blocklist term filter (C4 dirty-word drop) ------------------------
    // 'dup' is rare, 'slow' common, 'xyzzy' absent -> n_blocked spans
    // {0,1,2} and the drop flag genuinely splits the corpus.
    Gate("llm_blocklist_filter",
      (spark: SparkSession, dir: String) =>
        Curation.blocklistFilter(docs(spark, dir), BlockTerms)
          .orderBy("doc_id"),
      Some(Curation.blocklistOracleSql(BlockTerms))),

    // --- per-source length trimming (percentile band) -----------------------
    Gate("llm_length_trim",
      (spark: SparkSession, dir: String) =>
        Curation.lengthTrim(docs(spark, dir)).orderBy("doc_id"),
      Some(Curation.lengthTrimOracleSql())),

    // --- Aho-Corasick substring blocklist ----------------------------------
    // Patterns exercise the automaton's hard cases: a cross-token phrase
    // ("hash join"), a pattern that is a strict prefix of another
    // ("slo" / "slow" - dict-suffix output links), and an absent one.
    Gate("llm_substring_blocklist",
      (spark: SparkSession, dir: String) =>
        Curation.substringBlocklist(docs(spark, dir), AcPatterns)
          .orderBy("doc_id"),
      Some(Curation.substringBlocklistOracleSql(AcPatterns))),

    // --- Bloom-filter cross-snapshot dedup ---------------------------------
    // History = even doc_ids; incoming = odd doc_ids (mostly novel — every
    // sf0.01 text is distinct) plus a re-crawl of doc_id % 10 == 0 under
    // shifted ids (guaranteed true hits), so maybe_dup genuinely splits.
    // The oracle replays build+probe as distinct-position set membership —
    // identical to the bitset, false positives included.
    Gate("llm_bloom_dedup",
      (spark: SparkSession, dir: String) => {
        val d = docs(spark, dir)
        val bits = Dedup.bloomBitset(d.filter(col("doc_id") % 2 === 0))
        val incoming = d.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("text"))
          .unionAll(d.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        Dedup.bloomDedup(incoming, bits)
          .select(col("doc_id"), col("maybe_dup")).orderBy("doc_id")
      },
      Some(Dedup.bloomDedupOracleSql(
        "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0",
        """SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
          |  UNION ALL
          |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0"""
          .stripMargin))),

    // --- SHARDED Bloom dedup (multi-GB filter histories) -------------------
    // Same fixture split as llm_bloom_dedup, but the filter is 8
    // independent hash-prefix blooms built in ONE distributed groupBy pass
    // (BitsetAgg) and probed via an equi-join on the shard — the 100 TB
    // shape where the total bitset exceeds single-broadcast size. The
    // oracle replays per-shard build+probe as (shard, position) set
    // membership, per-shard FPs included; shards=1 ≡ the unsharded
    // operator is spec-asserted (LlmSpec).
    Gate("llm_bloom_dedup_sharded",
      (spark: SparkSession, dir: String) => {
        val d = docs(spark, dir)
        val bitsets = Dedup.bloomBitsetsSharded(
          d.filter(col("doc_id") % 2 === 0), shards = 8)
        val incoming = d.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("text"))
          .unionAll(d.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        Dedup.bloomDedupSharded(incoming, bitsets, shards = 8)
          .select(col("doc_id"), col("maybe_dup")).orderBy("doc_id")
      },
      Some(Dedup.bloomDedupShardedOracleSql(
        "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0",
        """SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
          |  UNION ALL
          |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0"""
          .stripMargin,
        shards = 8))),

    // --- host link-graph PageRank (crawl prioritization signal) -----------
    // The oracle unrolls all 5 power-iteration rounds structurally
    // (dangling mass, contribution join, per-round 6 dp rounding) — the
    // ITERATION is gated, not just the final ranks. Fixture includes a
    // pure sink host so the dangling-redistribution path is exercised.
    Gate("llm_pagerank",
      (spark: SparkSession, dir: String) =>
        graft.llm.Graph.pageRank(
          graft.llm.Graph.hostEdgesFixture(docs(spark, dir)))
          .orderBy("node"),
      Some(graft.llm.Graph.pageRankOracleSql(
        graft.llm.Graph.HostEdgesFixtureSql))),

    // --- robots/opt-out URL filter (longest-prefix disallow) --------------
    // Rules cover: whole-domain block (src0 /a/), partial block with a
    // longer-rule precedence case (src1 /a/1 vs /a/181), a single-page
    // domain (src12), and a rule for a domain absent from the corpus.
    Gate("llm_robots_filter",
      (spark: SparkSession, dir: String) => {
        import spark.implicits._
        Web.robotsFilter(
          docs(spark, dir).select(col("doc_id"), domainUrlFixtureCol.as("url")),
          RobotsRules.toDF("domain", "prefix"))
          .orderBy("doc_id")
      },
      Some(robotsOracleSql)),

    // --- domain reputation roll-up (RefinedWeb URL-filtering stage) -------
    // Fixture: 20 domains (one per source); sources 0-9 publish unique
    // pages, 10-19 re-crawl the same 10 pages (flag_dup separates them);
    // quality counts come from the real per-doc text rule.
    Gate("llm_domain_reputation",
      (spark: SparkSession, dir: String) =>
        Web.domainReputation(docs(spark, dir)
          .select(col("doc_id"), domainUrlFixtureCol.as("url"), col("text")))
          .orderBy("domain"),
      Some(domainReputationOracleSql)),

    // --- semantic benchmark decontamination (embedding cosine) ------------
    // Eval split = vec_id % 25 == 0 (the ANN-gate query fixture), corpus
    // = the rest; threshold 0.35 reuses the semantic-dedup margin
    // measured on this embedding distribution.
    Gate("llm_semantic_decon",
      (spark: SparkSession, dir: String) => {
        val e = Tables.embeddings(spark, dir)
        Similarity.semanticDecontaminate(
          e.filter(col("vec_id") % 25 =!= 0),
          e.filter(col("vec_id") % 25 === 0), 0.35)
          .orderBy("vec_id")
      },
      Some(Similarity.semanticDeconOracleSql(0.35))),

    // --- quality-classifier TRAINING (logistic GD on hashed features) -----
    // 3 unrolled gradient-descent stages; weights round to 6 dp after
    // every step on both engines (iterative-float parity rule).
    Gate("llm_classifier_train",
      (spark: SparkSession, dir: String) =>
        Curation.trainHashClassifier(docs(spark, dir),
          col("source") === "src0", ClassifierDim).orderBy("b"),
      Some(Curation.classifierTrainOracleSql(ClassifierDim))),

    // --- Unicode NFC + whitespace/control cleanup --------------------------
    // Each doc carries a probe exercising every rule: a combining-acute
    // sequence (NFC-composes, so n_after < n_before even without the
    // collapses), tab + NBSP runs, and a C0 control. JDK Normalizer vs
    // DuckDB nfc_normalize certify the same UAX #15 result.
    Gate("llm_unicode_norm",
      (spark: SparkSession, dir: String) =>
        TextOps.cleanText(
          docs(spark, dir).select(col("doc_id"), normFixtureCol.as("text")))
          .orderBy("doc_id"),
      Some(unicodeNormOracleSql)),

    // --- JL signed random projection (64 → 16 dims) ------------------------
    // outDim = 16 makes the 1/√d scale exactly 0.25, so the oracle's
    // interpolated constant is bit-exact; signs come from the shared md5.
    Gate("llm_rand_proj",
      (spark: SparkSession, dir: String) =>
        Similarity.randomProject(Tables.embeddings(spark, dir), RandProjDim)
          .orderBy("vec_id", "j"),
      Some(Similarity.randomProjectOracleSql(RandProjDim))),

    // --- dedup-threshold tuning histogram ----------------------------------
    // Candidate-pair counts per Jaccard decile (the cut-selection plot);
    // engine and oracle both use the EXACT df-capped candidate
    // formulation, so this gate has no LSH-recall dependency. The gate
    // exercises the production lever too: sampleMod=2 halves the docs,
    // quartering the pair volume.
    Gate("llm_jaccard_histogram",
      (spark: SparkSession, dir: String) =>
        Dedup.jaccardHistogram(docs(spark, dir), sampleMod = 2)
          .orderBy("bin"),
      Some(Dedup.jaccardHistogramOracleSql(sampleMod = 2))),

    // --- language-ID confusion matrix --------------------------------------
    // Declared lang vs detected; the fixture's lang column is generator-
    // assigned while the text is English-vocab, so off-diagonal cells are
    // guaranteed non-empty and the matrix genuinely splits.
    Gate("llm_lang_confusion",
      (spark: SparkSession, dir: String) =>
        Curation.langConfusion(docs(spark, dir)).orderBy("lang", "detected"),
      Some(
        s"""WITH $langCtes
           |SELECT d.lang, lng.lang AS detected, count(*)::BIGINT AS n,
           |  d.lang = lng.lang AS is_match
           |FROM documents d JOIN lng USING (doc_id)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- classifier evaluation: ROC AUC + calibration curve ---------------
    // The quality-gate audit pair: AUC over the 6dp-bounded score
    // histogram (never a global doc rank) and the 10-bin reliability
    // curve. Label = src0 membership, the same signal the classifier
    // gates train/score against, so the AUC is a real discriminative
    // number (src0's vocabulary differs by construction).
    Gate("llm_classifier_auc",
      (spark: SparkSession, dir: String) => {
        val d = docs(spark, dir)
        val scored = Curation.hashClassifierScore(d,
            Curation.demoClassifierWeights(spark, ClassifierDim), ClassifierDim)
          .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
        Curation.classifierAuc(scored, col("source") === "src0")
      },
      Some(Curation.classifierAucOracleSql(ClassifierDim))),

    Gate("llm_classifier_calibration",
      (spark: SparkSession, dir: String) => {
        val d = docs(spark, dir)
        val scored = Curation.hashClassifierScore(d,
            Curation.demoClassifierWeights(spark, ClassifierDim), ClassifierDim)
          .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
        Curation.classifierCalibration(scored, col("source") === "src0")
          .orderBy("bin")
      },
      Some(Curation.classifierCalibrationOracleSql(ClassifierDim))),

    // --- corpus snapshot diff (release-to-release audit) -------------------
    // Fixture: old drops doc_id%10==3 (those become 'added' in new), new
    // drops doc_id%10==7 ('removed'), and new rewrites doc_id%5==0 with a
    // marker suffix ('changed') — all four statuses occur in every source.
    Gate("llm_snapshot_diff",
      (spark: SparkSession, dir: String) => {
        val d = docs(spark, dir)
        val oldSnap = d.filter(col("doc_id") % 10 =!= 3)
        val newSnap = d.filter(col("doc_id") % 10 =!= 7)
          .select(col("doc_id"), col("source"),
            when(col("doc_id") % 5 === 0,
              concat(col("text"), lit(" rewritten"))).otherwise(col("text"))
              .as("text"))
        Curation.snapshotDiff(oldSnap, newSnap).orderBy("source")
      },
      Some(Curation.snapshotDiffOracleSql(
        "SELECT doc_id, source, text FROM documents WHERE doc_id % 10 <> 3",
        """SELECT doc_id, source,
          |  CASE WHEN doc_id % 5 = 0 THEN text || ' rewritten' ELSE text END AS text
          |FROM documents WHERE doc_id % 10 <> 7""".stripMargin))),

    // --- END-TO-END curation DAG: html → url → robots → url-dedup →
    // paragraph-dedup → C4 quality → MinHash dedup → temperature mix →
    // seq pack, as ONE gate (Curation.curationPipeline). Every stage is
    // individually gated elsewhere; this certifies their COMPOSITION —
    // schema handoffs, filter ordering, no double-normalization. Fixture:
    // the robots URL fixture (planted URL dups + blocked domains) + an
    // HTML page template with pbreak paragraph sentinels + planted
    // near-dup pairs (doc_id % 7 == 3 re-publishes its predecessor's text
    // with a 3-word tail). The oracle is the composed CTE chain; every
    // stage genuinely splits (sf0.01: 500 → 444 → 228 → 124 → 108 → 77).
    Gate("llm_curation_e2e",
      (spark: SparkSession, dir: String) => {
        import spark.implicits._
        val d = docs(spark, dir)
        val prev = d.select((col("doc_id") + 1).as("doc_id"),
          col("text").as("__prev"))
        val base = d.join(prev, Seq("doc_id"), "left")
          .select(col("doc_id"), col("source"), col("lang"),
            when(col("doc_id") % 7 === 3 && col("__prev").isNotNull,
              concat(col("__prev"), lit(" " + E2eDupTail)))
              .otherwise(col("text")).as("content"))
        val raw = base.select(col("doc_id"), col("source"), col("lang"),
          domainUrlFixtureCol.as("url"), e2eHtmlCol.as("html"))
        Curation.curationPipeline(raw, RobotsRules.toDF("domain", "prefix"),
          threshold = 0.8, budget = E2eBudget)
          .orderBy("doc_id")
      },
      Some(curationE2eOracleSql))
  )

  /** Lang-ID CTE chain `t(doc_id, text, ws) -> s -> lng(doc_id, lang)` —
    * ONE copy of the marker CASE chain serves llm_lang_id and
    * llm_fertility (argmax tie-break identical to TextOps.langId's
    * struct array_max ordering).
    */
  private lazy val langCtes: String =
    """t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws FROM documents),
      |s AS (SELECT doc_id,
      |  len(list_filter(ws, w -> w IN ('the','and','of','is','with'))) AS s_en,
      |  len(list_filter(ws, w -> w IN ('der','die','und','ist','mit'))) AS s_de,
      |  len(list_filter(ws, w -> w IN ('el','la','de','es','con'))) AS s_es,
      |  len(list_filter(ws, w -> w IN ('le','la','et','est','avec'))) AS s_fr
      |  FROM t),
      |lng AS (SELECT doc_id, CASE
      |  WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
      |  WHEN s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es THEN 'fr'
      |  WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
      |  WHEN s_en >= s_de THEN 'en'
      |  ELSE 'de' END AS lang
      |FROM s)""".stripMargin

  private val ClassifierDim = 1024
  private val RandProjDim = 16
  private val BpeTrainN = 10
  private val VocabKs: Seq[Long] = Seq(1L, 3L, 10L, 25L, 100L)
  private[gates] val BlockTerms: Seq[String] = Seq("dup", "slow", "xyzzy")
  private val AcPatterns: Seq[String] =
    Seq("hash join", "slo", "slow", "dup", "zzz")
  private val CmQueryTerms: Seq[String] =
    Seq("join", "hash", "scan", "customer", "dup", "slow", "xyzzy")

  /** Unicode probe for llm_unicode_norm, as CODEPOINTS (never `\ u`
    * source literals — the Scala lexer processes those anywhere): space,
    * "cafe" + combining acute U+0301, TAB, x, NBSP, y, SOH, z.
    */
  private val NormProbeCps: Seq[Int] =
    Seq(0x20, 0x63, 0x61, 0x66, 0x65, 0x301, 0x9, 0x78, 0xA0, 0x79, 0x1, 0x7A)

  private def normFixtureCol: org.apache.spark.sql.Column =
    concat(col("text"),
      lit(NormProbeCps.map(cp => new String(Character.toChars(cp))).mkString))

  private lazy val unicodeNormOracleSql: String = {
    val probe = NormProbeCps.map(cp => s"chr($cp)").mkString("||")
    s"""WITH raw AS (SELECT doc_id, text || $probe AS t FROM documents),
       |c AS (SELECT doc_id, t,
       |    trim(regexp_replace(regexp_replace(nfc_normalize(t),
       |      ${sqlLit(TextOps.WsRunRe)}, ' ', 'g'),
       |      ${sqlLit(TextOps.CtrlRe)}, '', 'g')) AS clean
       |  FROM raw)
       |SELECT doc_id, length(t)::BIGINT AS n_before,
       |  length(clean)::BIGINT AS n_after, clean <> t AS changed, clean
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of [[TextOps.bpeTrain]]: n unrolled training stages.
    * Stage k: `pc_k` counts adjacent pairs of the current segmentation
    * weighted by word frequency, `b_k` is the deterministic argmax,
    * `a_k` applies that merge by replace-leftmost-then-rescan (a
    * recursive CTE; equals the Scala fold — see BpeUtil.mergeOnce),
    * `f_{k+1}` keeps each word's shortest (= final) state.
    */
  private def bpeTrainOracleSql(n: Int): String = {
    def stage(k: Int): String = {
      val prev = if (k == 0) "e0" else s"f$k"
      s"""pc$k AS (SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt)::BIGINT AS c
         |  FROM $prev, unnest([x for x in generate_series(1, len(syms)-1)]) u(i)
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT l, r, c FROM pc$k ORDER BY c DESC, l, r LIMIT 1),
         |a$k AS (
         |  SELECT w, cnt, syms FROM $prev
         |  UNION ALL
         |  SELECT w, cnt,
         |    list_concat(list_concat(syms[1:p-1], [syms[p]||syms[p+1]]),
         |                syms[p+2:len(syms)]) AS syms
         |  FROM (SELECT e.w, e.cnt, e.syms,
         |      list_position([e.syms[i]||' '||e.syms[i+1]
         |          for i in generate_series(1, len(e.syms)-1)],
         |        b.l||' '||b.r) AS p
         |    FROM a$k e CROSS JOIN b$k b) WHERE p > 0),
         |f${k + 1} AS MATERIALIZED (SELECT w, cnt, min_by(syms, len(syms)) AS syms
         |  FROM a$k GROUP BY 1, 2)""".stripMargin
    }
    val finals = (0 until n).map(k =>
      s"SELECT CAST($k AS BIGINT) AS rank, l, r, c AS pair_count FROM b$k")
      .mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE
       |wf AS (SELECT w, count(*) AS cnt FROM
       |  (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
       |  GROUP BY 1),
       |e0 AS MATERIALIZED (SELECT w, cnt,
       |  [w[i] for i in generate_series(1, length(w))] AS syms FROM wf),
       |${(0 until n).map(stage).mkString(",\n")}
       |SELECT * FROM (
       |$finals
       |) ORDER BY rank""".stripMargin
  }

  // ---- crawl-front-door fixtures (shared Spark/DuckDB token lists) -------

  /** HTML page template as literal fragments with `{id}`/`{text}` holes —
    * ONE list renders both the Spark concat and the oracle's `||` chain,
    * so the fixture cannot diverge between engines.
    */
  private val HtmlFixtureTokens: Seq[String] = Seq(
    "<html><head><title>Doc ", "{id}",
    "</title><style type=\"text/css\">body { color: #222; }</style>" +
      "<script>var n = ", "{id}",
    "; if (n < 10) { n += 1; }</script></head>" +
      "<body><nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a></nav>" +
      "<!-- id ", "{id}",
    " --><h1>Title ", "{id}", "</h1><p>", "{text}",
    " &amp; more &lt;tags&gt; &quot;q&quot; &#39;s&#39; non&nbsp;breaking</p>" +
      "<div class=\"footer\">(c) 2026 Example</div></body></html>")

  private def htmlFixtureCol: org.apache.spark.sql.Column =
    concat(HtmlFixtureTokens.map {
      case "{id}" => col("doc_id").cast("string")
      case "{text}" => col("text")
      case s => lit(s)
    }: _*)

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private lazy val htmlFixtureSql: String = HtmlFixtureTokens.map {
    case "{id}" => "doc_id::VARCHAR"
    case "{text}" => "text"
    case s => sqlLit(s)
  }.mkString(" || ")

  /** DuckDB twin of [[Web.extractText]]: same strip patterns, same entity
    * chain (interpolated from Web's constants — no parallel literals).
    */
  private lazy val htmlExtractOracleSql: String = {
    val stripped = Seq(Web.CommentRe, Web.ScriptRe, Web.StyleRe, Web.TagRe)
      .foldLeft("html") { (acc, re) =>
        s"regexp_replace($acc, ${sqlLit(re)}, ' ', 'g')"
      }
    val decoded = Web.Entities.foldLeft(stripped) { case (acc, (e, r)) =>
      s"replace($acc, ${sqlLit(e)}, ${sqlLit(r)})"
    }
    s"""WITH raw AS (SELECT doc_id, $htmlFixtureSql AS html FROM documents),
       |s AS (SELECT doc_id, html,
       |  trim(regexp_replace($decoded, ${sqlLit(Web.WsRe)}, ' ', 'g')) AS clean
       |  FROM raw)
       |SELECT doc_id, clean,
       |  round(length(clean)::DOUBLE / length(html), 6) AS text_ratio
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** BPE merge-table fixture, rank = list index — written over the corpus
    * vocabulary so multi-step merge chains actually fire (scan/table/
    * value/fast collapse to one token; suffixes like -er merge partially).
    */
  private val BpeMerges: Seq[(String, String)] = Seq(
    "s" -> "c", "sc" -> "a", "sca" -> "n",
    "t" -> "a", "ta" -> "b", "tab" -> "l", "tabl" -> "e",
    "r" -> "o", "ro" -> "w",
    "k" -> "e", "ke" -> "y",
    "a" -> "g", "ag" -> "g",
    "v" -> "a", "va" -> "l", "val" -> "u", "valu" -> "e",
    "f" -> "a", "fa" -> "s", "fas" -> "t",
    "e" -> "r", "o" -> "r")

  /** DuckDB twin of [[TextOps.bpeTokenCounts]]: the same merge ranks as a
    * MAP literal, the same leftmost-best merge per recursive step, the
    * same distinct-word vocabulary pass.
    */
  private lazy val bpeTokensOracleSql: String = {
    val m = "map([" +
      BpeMerges.map { case (a, b) => sqlLit(a + " " + b) }.mkString(", ") +
      "], [" + BpeMerges.indices.mkString(", ") + "])"
    s"""WITH RECURSIVE
       |dw AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents),
       |v AS (SELECT DISTINCT w FROM dw),
       |init AS (SELECT w, [w[i] for i in generate_series(1, length(w))] AS syms FROM v),
       |enc AS (
       |  SELECT w, syms FROM init
       |  UNION ALL
       |  SELECT w, list_concat(list_concat(syms[1:bi-1], [syms[bi]||syms[bi+1]]),
       |                        syms[bi+2:len(syms)]) AS syms
       |  FROM (
       |    SELECT w, syms, list_position(rnk, list_min(rnk)) AS bi,
       |           list_min(rnk) AS best
       |    FROM (SELECT w, syms,
       |            [coalesce(map_extract($m, syms[i]||' '||syms[i+1])[1], 1000000)
       |             for i in generate_series(1, len(syms)-1)] AS rnk
       |          FROM enc)
       |  ) WHERE best < 1000000),
       |fin AS (SELECT w, min(len(syms))::INTEGER AS n_tok FROM enc GROUP BY 1)
       |SELECT doc_id, count(*) AS n_words, sum(n_tok)::BIGINT AS n_bpe_tokens
       |FROM dw JOIN fin USING (w) GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of [[Similarity.kmeansRefine]] at iters=2: same √N seed
    * spacing as the IVF oracles, same cosine-argmax tie-break (cid asc),
    * same 6-dp mean rounding, same empty-cell carry.
    */
  /** The kmeans oracle's CTE chain, ending in `fin(vec_id, cluster, sim)`
    * — shared by llm_kmeans and llm_proto_prune. Host query must start
    * `WITH <kmeansCtes>`.
    */
  private lazy val kmeansCtes: String = {
    val dot = (a: String, b: String) =>
      s"list_sum([$a[i]*$b[i] for i in generate_series(1,64)])"
    val cos = (a: String, b: String) =>
      s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    def lloydRound(n: Int, prev: String): String =
      s"a$n AS (SELECT vec_id, cid FROM (\n" +
        s"    SELECT e.vec_id, c.cid,\n" +
        s"      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid) AS rn\n" +
        s"    FROM e CROSS JOIN $prev c) WHERE rn = 1),\n" +
        s"m$n AS (SELECT a$n.cid, g.i, round(avg(e.v[g.i]), 6) AS x\n" +
        s"  FROM a$n JOIN e USING (vec_id) CROSS JOIN generate_series(1, 64) g(i)\n" +
        s"  GROUP BY 1, 2),\n" +
        s"mv$n AS (SELECT cid, list(x ORDER BY i) AS mv FROM m$n GROUP BY 1),\n" +
        s"c$n AS (SELECT p.cid, coalesce(mv$n.mv, p.cv) AS cv\n" +
        s"  FROM $prev p LEFT JOIN mv$n USING (cid))"
    "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),\n" +
      s"cmod AS (SELECT ${Similarity.CentroidModSql} AS m FROM e),\n" +
      "c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % (SELECT m FROM cmod) = 0),\n" +
      lloydRound(1, "c0") + ",\n" + lloydRound(2, "c1") + ",\n" +
      s"fin AS (SELECT vec_id, cluster, round(cs, 6) AS sim FROM (\n" +
      s"    SELECT e.vec_id, c.cid AS cluster, ${cos("e.v", "c.cv")} AS cs,\n" +
      s"      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid) AS rn\n" +
      s"    FROM e CROSS JOIN c2 c) WHERE rn = 1)"
  }

  private lazy val kmeansOracleSql: String =
    s"WITH $kmeansCtes\nSELECT vec_id, cluster, sim FROM fin ORDER BY vec_id"

  private lazy val protoPruneOracleSql: String =
    s"""WITH $kmeansCtes,
       |rk AS (SELECT vec_id, cluster, sim,
       |    row_number() OVER (PARTITION BY cluster ORDER BY sim DESC, vec_id)::BIGINT AS rank,
       |    count(*) OVER (PARTITION BY cluster)::BIGINT AS csize
       |  FROM fin)
       |SELECT vec_id, cluster, sim, rank, csize,
       |  rank * ${Similarity.ProtoPruneDen} > csize * ${Similarity.ProtoPruneNum} AS keep
       |FROM rk ORDER BY vec_id""".stripMargin

  /** Paragraph-dedup fixture pieces (shared Spark/DuckDB): one global
    * boilerplate, one per-source boilerplate, two content paragraphs (the
    * first-15-words slice and the full text — equal for short docs, which
    * also exercises WITHIN-doc dedup).
    */
  private val ParaBoiler = "subscribe to the newsletter and enable notifications"
  private val ParaFollowPre = "follow "
  private val ParaFollowPost = " for updates"
  private val ParaSliceWords = 15

  private def paraFixtureCol: org.apache.spark.sql.Column =
    concat(
      lit(ParaBoiler), lit("\n\n"),
      array_join(slice(split(col("text"), " "), 1, ParaSliceWords), " "),
      lit("\n\n"),
      lit(ParaFollowPre), col("source"), lit(ParaFollowPost), lit("\n\n"),
      col("text"))

  private lazy val paragraphDedupOracleSql: String = {
    val fixture = Seq(
      sqlLit(ParaBoiler),
      s"array_to_string(string_split(text, ' ')[1:$ParaSliceWords], ' ')",
      s"${sqlLit(ParaFollowPre)} || source || ${sqlLit(ParaFollowPost)}",
      "text").mkString(" || e'\\n\\n' || ")
    s"""WITH raw AS (SELECT doc_id, $fixture AS ptext FROM documents),
       |px AS (SELECT doc_id, string_split(ptext, e'\\n\\n') AS ps FROM raw),
       |paras AS (SELECT doc_id,
       |    unnest([i-1 for i in generate_series(1, len(ps))]) AS pos,
       |    unnest([ps[i] for i in generate_series(1, len(ps))]) AS para
       |  FROM px),
       |k AS (SELECT *, row_number()
       |        OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
       |      FROM paras),
       |reb AS (SELECT doc_id, string_agg(para, e'\\n\\n' ORDER BY pos) AS clean_text,
       |        count(*) AS n_kept
       |      FROM k WHERE rn = 1 GROUP BY 1),
       |tot AS (SELECT doc_id, count(*) AS n_paras FROM paras GROUP BY 1)
       |SELECT t.doc_id, coalesce(clean_text, '') AS clean_text,
       |  coalesce(n_kept, 0)::BIGINT AS n_kept,
       |  (n_paras - coalesce(n_kept, 0))::BIGINT AS n_dropped
       |FROM tot t LEFT JOIN reb USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  /** Pages repeat every UrlPageMod docs; even/odd spelling variants of the
    * same canonical URL.
    */
  private val UrlPageMod = 200
  private val UrlHostEven = "https://news.example.com"
  private val UrlHostOdd = "HTTPS://NEWS.Example.COM:443"
  private val UrlQueryEven = "?a=1&b=2&utm_source=rss"
  private val UrlQueryOdd = "?b=2&utm_campaign=x&a=1&ref=tw"

  private[gates] def urlFixtureCol: org.apache.spark.sql.Column = {
    val even = col("doc_id") % 2 === 0
    concat(
      when(even, lit(UrlHostEven)).otherwise(lit(UrlHostOdd)),
      lit("/articles/"), (col("doc_id") % UrlPageMod).cast("string"),
      when(even, lit("")).otherwise(lit("/")),
      when(even, lit(UrlQueryEven)).otherwise(lit(UrlQueryOdd)),
      when(even, lit("")).otherwise(lit("#top")))
  }

  /** DuckDB twin of [[Web.canonicalizeUrl]] over the same fixture (scheme/
    * host/path/query regexes and the tracking-param filter interpolated
    * from Web's constants).
    */
  /** CTE chain `raw → p → c(doc_id, url, canon_url)` shared by the batch
    * llm_url_canon gate and the streaming_url_dedup gate.
    */
  /** Generalized canonicalization CTE chain: `raw(doc_id$extra, url) →
    * p → c(doc_id$extra, url, canon_url)` for any URL fixture expression —
    * ONE copy of the regex chain serves every URL-family gate.
    */
  private[gates] def canonCtesFor(fixture: String, extra: String = ""): String =
    s"""raw AS (SELECT doc_id$extra, $fixture AS url FROM documents),
       |p AS (SELECT doc_id$extra, url,
       |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |  lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
       |  regexp_replace(regexp_extract(url,
       |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/+$$', '') AS rawpath,
       |  regexp_extract(url, '\\?([^#]*)', 1) AS q
       |  FROM raw),
       |c AS (SELECT doc_id$extra, url,
       |  scheme || '://' ||
       |  CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
       |       WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
       |       ELSE hostport END ||
       |  CASE WHEN rawpath = '' THEN '/' ELSE rawpath END ||
       |  CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS canon_url
       |  FROM (SELECT *, coalesce(array_to_string(list_sort(
       |          [x for x in string_split(q, '&')
       |           if x <> '' and not regexp_matches(x, ${sqlLit(Web.TrackingParamRe)})]),
       |        '&'), '') AS cq FROM p))""".stripMargin

  private[gates] lazy val urlCanonCtes: String = {
    // single-line: interpolated into a stripMargin string, so no line here
    // may start with a margin char
    val fixture = Seq(
      s"CASE WHEN doc_id % 2 = 0 THEN ${sqlLit(UrlHostEven)} ELSE ${sqlLit(UrlHostOdd)} END",
      s"'/articles/' || (doc_id % $UrlPageMod)::VARCHAR",
      "CASE WHEN doc_id % 2 = 0 THEN '' ELSE '/' END",
      s"CASE WHEN doc_id % 2 = 0 THEN ${sqlLit(UrlQueryEven)} ELSE ${sqlLit(UrlQueryOdd)} END",
      "CASE WHEN doc_id % 2 = 0 THEN '' ELSE '#top' END").mkString(" || ")
    canonCtesFor(fixture)
  }

  /** Domain fixture for llm_domain_reputation: domain = source (20 at any
    * SF), www-prefix + tracking-param noise on even docs, and a page key
    * that makes sources 0-9 publish unique pages while 10-19 re-crawl the
    * same ten.
    */
  private def domainUrlFixtureCol: org.apache.spark.sql.Column = {
    val even = col("doc_id") % 2 === 0
    val page = when(col("doc_id") % 20 < 10, col("doc_id"))
      .otherwise(col("doc_id") % 20)
    concat(lit("https://"),
      when(even, lit("www.")).otherwise(lit("")),
      col("source"), lit(".example.com/a/"), page.cast("string"),
      when(even, lit("?utm_source=x")).otherwise(lit("")))
  }

  private val RobotsRules: Seq[(String, String)] = Seq(
    "src0.example.com" -> "/a/",
    "src1.example.com" -> "/a/1",
    "src1.example.com" -> "/a/181",
    "src12.example.com" -> "/a/12",
    "missing.example.com" -> "/x")

  private lazy val robotsOracleSql: String = {
    val fixture = "'https://' || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END" +
      " || source || '.example.com/a/'" +
      " || (CASE WHEN doc_id % 20 < 10 THEN doc_id ELSE doc_id % 20 END)::VARCHAR" +
      " || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x' ELSE '' END"
    val vals = RobotsRules.map { case (d, p) => s"(${sqlLit(d)}, ${sqlLit(p)})" }
      .mkString(", ")
    s"""WITH raw AS (SELECT doc_id, $fixture AS url FROM documents),
       |u AS (SELECT doc_id,
       |    regexp_replace(regexp_replace(
       |      lower(regexp_extract(url, ${sqlLit(Web.HostRe)}, 1)),
       |      ${sqlLit(Web.PortSuffixRe)}, ''), ${sqlLit(Web.WwwPrefixRe)}, '')
       |      AS domain,
       |    regexp_extract(url, ${sqlLit(Web.PathRe)}, 1) AS path
       |  FROM raw),
       |r AS (SELECT * FROM (VALUES $vals) t(domain, prefix)),
       |a AS (SELECT u.doc_id, u.domain,
       |    max(CASE WHEN r.prefix IS NOT NULL AND starts_with(u.path, r.prefix)
       |        THEN {'l': length(r.prefix), 'p': r.prefix} END) AS m
       |  FROM u LEFT JOIN r USING (domain) GROUP BY 1, 2)
       |SELECT doc_id, domain, m IS NOT NULL AS blocked, m.p AS matched_prefix
       |FROM a ORDER BY doc_id""".stripMargin
  }

  // --- e2e curation fixture + oracle ---------------------------------------

  /** Tail appended to the predecessor's text for planted near-dup pages
    * (doc_id % 7 == 3): 3 extra words over a ≥50-word base keeps exact
    * Jaccard ≈ n/(n+5) ≥ 0.8, so the pairs survive the quality gate and
    * genuinely exercise the near-dup stage.
    */
  private val E2eDupTail = "tail marker words"
  private val E2eBudget = 256

  /** Crawl-page template for the e2e gate: style + comment + script blocks
    * (extraction must drop them — the style brace would otherwise trip the
    * C4 has_brace filter), a global nav paragraph and newsletter
    * boilerplate (paragraph dedup strips them corpus-wide), a per-source
    * follow line, with [[Curation.ParaSep]] sentinels between paragraphs.
    */
  private val E2eHtmlPre = "<html><head><style>body{color:red}</style>" +
    "</head><body><!-- tracker --><div class=\"nav\">Home nav About</div>" +
    " pbreak subscribe to our newsletter today pbreak "
  private val E2eHtmlMid = " pbreak follow "
  private val E2eHtmlPost = " for updates<script>var x=1;</script></body></html>"

  private def e2eHtmlCol: org.apache.spark.sql.Column =
    concat(lit(E2eHtmlPre), col("content"),
      lit(E2eHtmlMid), col("source"), lit(E2eHtmlPost))

  /** DuckDB twin of the whole [[Curation.curationPipeline]] chain over the
    * e2e fixture — each CTE block replays the matching certified stage's
    * oracle formulation (extract regex chain, canon chain, robots
    * prefix-match, first-occurrence paragraph window, C4 metrics, exact
    * ≥0.8 Jaccard pairs, temperature mix + hash draw, packing prefix sum),
    * all constants interpolated from the Scala definitions.
    */
  private lazy val curationE2eOracleSql: String = {
    val urlFixture = "'https://' || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END" +
      " || source || '.example.com/a/'" +
      " || (CASE WHEN doc_id % 20 < 10 THEN doc_id ELSE doc_id % 20 END)::VARCHAR" +
      " || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x' ELSE '' END"
    val htmlFixture = s"${sqlLit(E2eHtmlPre)} || content || " +
      s"${sqlLit(E2eHtmlMid)} || source || ${sqlLit(E2eHtmlPost)}"
    val stripped = Seq(Web.CommentRe, Web.ScriptRe, Web.StyleRe, Web.TagRe)
      .foldLeft("html") { (acc, re) =>
        s"regexp_replace($acc, ${sqlLit(re)}, ' ', 'g')"
      }
    val decoded = Web.Entities.foldLeft(stripped) { case (acc, (e, r)) =>
      s"replace($acc, ${sqlLit(e)}, ${sqlLit(r)})"
    }
    val extract = s"trim(regexp_replace($decoded, ${sqlLit(Web.WsRe)}, ' ', 'g'))"
    val robotVals = RobotsRules
      .map { case (d, p) => s"(${sqlLit(d)}, ${sqlLit(p)})" }.mkString(", ")
    val sep = sqlLit(Curation.ParaSep)
    s"""WITH base AS (
       |  SELECT d.doc_id, d.source, d.lang,
       |    CASE WHEN d.doc_id % 7 = 3 AND p.text IS NOT NULL
       |         THEN p.text || ' ' || ${sqlLit(E2eDupTail)} ELSE d.text END AS content
       |  FROM documents d LEFT JOIN documents p ON p.doc_id = d.doc_id - 1),
       |raw AS (SELECT doc_id, source, lang, $urlFixture AS url,
       |    $htmlFixture AS html FROM base),
       |ext AS (SELECT doc_id, source, lang, url, $extract AS clean FROM raw),
       |up AS (SELECT *,
       |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |  lower(regexp_extract(url, ${sqlLit(Web.HostRe)}, 1)) AS hostport,
       |  regexp_replace(regexp_extract(url, ${sqlLit(Web.PathRe)}, 1),
       |    '/+$$', '') AS rawpath,
       |  regexp_extract(url, '\\?([^#]*)', 1) AS q
       |  FROM ext),
       |canon AS (SELECT doc_id, source, lang, url, clean,
       |  scheme || '://' ||
       |  CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
       |       WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
       |       ELSE hostport END ||
       |  CASE WHEN rawpath = '' THEN '/' ELSE rawpath END ||
       |  CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS canon_url
       |  FROM (SELECT *, coalesce(array_to_string(list_sort(
       |          [x for x in string_split(q, '&')
       |           if x <> '' and not regexp_matches(x, ${sqlLit(Web.TrackingParamRe)})]),
       |        '&'), '') AS cq FROM up)),
       |uu AS (SELECT doc_id,
       |    regexp_replace(regexp_replace(
       |      lower(regexp_extract(url, ${sqlLit(Web.HostRe)}, 1)),
       |      ${sqlLit(Web.PortSuffixRe)}, ''), ${sqlLit(Web.WwwPrefixRe)}, '')
       |      AS domain,
       |    regexp_extract(url, ${sqlLit(Web.PathRe)}, 1) AS path
       |  FROM canon),
       |rr AS (SELECT * FROM (VALUES $robotVals) t(domain, prefix)),
       |blk AS (SELECT uu.doc_id, bool_or(starts_with(uu.path, rr.prefix)) AS blocked
       |  FROM uu JOIN rr USING (domain) GROUP BY 1),
       |f1 AS (SELECT c.* FROM canon c LEFT JOIN blk b USING (doc_id)
       |  WHERE NOT coalesce(b.blocked, false)),
       |f2 AS (SELECT * FROM (SELECT *, row_number()
       |    OVER (PARTITION BY canon_url ORDER BY doc_id) AS urn FROM f1)
       |  WHERE urn = 1),
       |px AS (SELECT doc_id, string_split(clean, $sep) AS ps FROM f2),
       |paras AS (SELECT doc_id,
       |    unnest([i-1 for i in generate_series(1, len(ps))]) AS pos,
       |    unnest([ps[i] for i in generate_series(1, len(ps))]) AS para
       |  FROM px),
       |fo AS (SELECT *, row_number()
       |    OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn FROM paras),
       |reb AS (SELECT doc_id, string_agg(para, $sep ORDER BY pos) AS clean_text
       |  FROM fo WHERE rn = 1 GROUP BY 1),
       |pd AS (SELECT f2.doc_id, f2.source, f2.lang,
       |    coalesce(reb.clean_text, '') AS text
       |  FROM f2 LEFT JOIN reb USING (doc_id)),
       |qt AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM pd),
       |qf AS (SELECT doc_id,
       |    len(ws)::BIGINT AS n_words,
       |    list_sum(list_transform(ws, x -> len(x)))::BIGINT AS sum_word_len,
       |    len(list_filter(ws, x -> regexp_matches(x, '[^a-z0-9]')))::BIGINT
       |      AS n_symbol
       |  FROM qt),
       |f3 AS (SELECT pd.* FROM pd JOIN qf USING (doc_id)
       |  WHERE qf.n_words >= ${Curation.MinWords}
       |    AND qf.sum_word_len >= qf.n_words * 3
       |    AND qf.sum_word_len <= qf.n_words * 10
       |    AND qf.n_symbol * 10 <= qf.n_words
       |    AND NOT (pd.text LIKE '%{%')
       |    AND NOT (lower(pd.text) LIKE '%lorem ipsum%')),
       |ntoks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM f3),
       |sh AS (SELECT DISTINCT doc_id,
       |    unnest([ws[i]||' '||ws[i+1]||' '||ws[i+2]
       |            for i in generate_series(1, len(ws)-2)]) AS s
       |  FROM ntoks),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |rare AS (SELECT s FROM sh GROUP BY s
       |  HAVING count(*) <= ${Dedup.MaxShingleDf}),
       |shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)),
       |cand AS (SELECT DISTINCT sa.doc_id AS i, sb.doc_id AS j
       |  FROM shc sa JOIN shc sb ON sa.s = sb.s AND sa.doc_id < sb.doc_id),
       |inter AS (SELECT c.i, c.j, count(*) AS inter
       |  FROM cand c JOIN sh sa ON sa.doc_id = c.i
       |  JOIN sh sb ON sb.doc_id = c.j AND sb.s = sa.s GROUP BY 1, 2),
       |jac AS (SELECT i, j, inter * 1.0 / (si.n + sj.n - inter) AS jaccard
       |  FROM inter JOIN sizes si ON si.doc_id = i
       |  JOIN sizes sj ON sj.doc_id = j),
       |dropped AS (SELECT DISTINCT j AS doc_id FROM jac WHERE jaccard >= 0.8),
       |f4 AS (SELECT f3.* FROM f3 LEFT JOIN dropped USING (doc_id)
       |  WHERE dropped.doc_id IS NULL),
       |lt AS (SELECT lang,
       |    sum(len(string_split(lower(text), ' ')))::BIGINT AS n_tokens
       |  FROM f4 GROUP BY 1),
       |ls AS (SELECT lang, n_tokens,
       |    n_tokens::DOUBLE / (SELECT sum(n_tokens) FROM lt) AS p_raw FROM lt),
       |lw AS (SELECT *, pow(p_raw, 0.3) AS w FROM ls),
       |lz AS (SELECT *, w / (SELECT sum(w) FROM lw) AS p_alpha FROM lw),
       |lr AS (SELECT *, p_alpha / p_raw AS ratio FROM lz),
       |tm AS (SELECT lang,
       |    round(ratio / (SELECT max(ratio) FROM lr), 6) AS sample_frac FROM lr),
       |f5 AS (SELECT f4.* FROM f4 JOIN tm USING (lang)
       |  WHERE ('0x'||substr(md5(${sqlLit(Curation.TmixSalt)}||f4.doc_id),
       |      1, 15))::BIGINT % ${Curation.MixScale}
       |    < tm.sample_frac * ${Curation.MixScale}),
       |pk AS (SELECT doc_id, source, lang,
       |    len(string_split(lower(text), ' '))::BIGINT AS n_tokens FROM f5),
       |pc AS (SELECT *, coalesce(sum(n_tokens)
       |    OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
       |  FROM pk)
       |SELECT doc_id, source, lang, n_tokens,
       |  (before // $E2eBudget)::BIGINT AS seq_id,
       |  (before % $E2eBudget)::BIGINT AS seq_offset
       |FROM pc ORDER BY doc_id""".stripMargin
  }

  private lazy val domainReputationOracleSql: String = {
    val fixture = "'https://' || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END" +
      " || source || '.example.com/a/'" +
      " || (CASE WHEN doc_id % 20 < 10 THEN doc_id ELSE doc_id % 20 END)::VARCHAR" +
      " || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x' ELSE '' END"
    val stops = TextOps.Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH ${canonCtesFor(fixture, ", text")},
       |h AS (SELECT regexp_replace(regexp_replace(
       |      lower(regexp_extract(url, ${sqlLit(Web.HostRe)}, 1)),
       |      ${sqlLit(Web.PortSuffixRe)}, ''), ${sqlLit(Web.WwwPrefixRe)}, '')
       |      AS domain,
       |    canon_url, string_split(lower(text), ' ') AS ws
       |  FROM c),
       |d AS (SELECT domain, canon_url,
       |    CAST(len(ws) >= 10 AND len(ws) <= 100000
       |      AND len(list_filter(ws, w -> list_contains($stops, w))) * 20 >= len(ws)
       |      AND len(list_distinct(ws)) * 3 >= len(ws) AS BIGINT) AS quality
       |  FROM h),
       |agg AS (SELECT domain, count(*) AS n_docs,
       |    count(DISTINCT canon_url) AS n_pages,
       |    sum(quality)::BIGINT AS n_quality
       |  FROM d GROUP BY 1)
       |SELECT domain, n_docs, n_pages, n_quality,
       |  (n_docs - n_pages) * 2 > n_docs AS flag_dup,
       |  n_quality * 2 < n_docs AS flag_lowq,
       |  ((n_docs - n_pages) * 2 > n_docs) OR (n_quality * 2 < n_docs) AS blocked
       |FROM agg ORDER BY domain""".stripMargin
  }

  private lazy val urlCanonOracleSql: String =
    s"""WITH $urlCanonCtes
       |SELECT doc_id, url, canon_url,
       |  doc_id > min(doc_id) OVER (PARTITION BY canon_url) AS is_dup
       |FROM c ORDER BY doc_id""".stripMargin

  /** Streaming form: same canon key, exact-dedup decision shape. */
  private[gates] lazy val urlDedupOracleSql: String =
    s"""WITH $urlCanonCtes
       |SELECT doc_id, min(doc_id) OVER (PARTITION BY canon_url) AS canonical_id,
       |  (CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY canon_url)
       |        THEN 0 ELSE 1 END)::BIGINT AS is_dup
       |FROM c ORDER BY doc_id""".stripMargin
}
