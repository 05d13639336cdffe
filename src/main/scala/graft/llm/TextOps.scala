package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline operators
  * (dedup, quality filtering, tokenization). Everything is built from
  * codegen'd Spark expressions — no UDFs — and every primitive has an
  * exact DuckDB twin so the gates can differential-test it.
  *
  * Shared 60-bit hash: both engines lack a common 64-bit hash builtin, so
  * h(s) = int(md5(s)[0:15], 16) — md5 is bit-identical everywhere; 15 hex
  * chars keep it inside a signed 64-bit long. Used for MinHash/SimHash
  * families where Spark and DuckDB must agree bit-for-bit.
  */
object TextOps {

  /** 60-bit md5-derived hash (DuckDB: ('0x'||substr(md5(s),1,15))::BIGINT). */
  def mdhash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens of the lowercased text (DuckDB string_split parity:
    * plain single-space split, not a regex).
    */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct word n-gram shingles (default 3), the MinHash input unit.
    *
    * Formulated as a zip_with fold over SHIFTED SLICES of the token array,
    * not a transform-with-element_at: a lambda that captures `split(...)`
    * re-evaluates the split per ELEMENT (higher-order lambdas don't get
    * subexpression elimination), which made shingling O(tokens²) string
    * work per row. Here the token expression is referenced a constant
    * number of times and each zip step touches materialized arrays.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val m = greatest(size(toks) - (n - 1), lit(0))
    val grams = (1 until n).foldLeft(slice(toks, lit(1), m)) { (acc, o) =>
      zip_with(acc, slice(toks, lit(o + 1), m),
        (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(grams)
  }

  /** Rebalance a small-file scan for CPU-heavy narrow work: a corpus that
    * arrives in fewer input splits than the session parallelism serializes
    * its per-row regex/hash work on those few tasks (observed: BM25 at the
    * replicated sf1 ran on 2 splits of a 15 MB parquet, 12× instead of
    * ~linear at 10× rows). At real scale input splits exceed parallelism
    * and this is a no-op — same guard winnowFingerprints carries.
    */
  def rebalanced(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < parallelism) df.repartition(parallelism)
    else df
  }

  /** GPT2-style pretokenizer regex — counts BPE-ish word/number/punct
    * units. Kept to syntax both Java regex and DuckDB's RE2 agree on.
    */
  val BpeTokenRe: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenRe), lit(0)))

  /** Corpus-level BPE tokenizer APPLY against a ranked merge table
    * ([[graft.functions.BpeEncode]]): per-doc whitespace word count and
    * true BPE token count. The encode loop runs ONCE PER DISTINCT WORD
    * (Heaps'-law vocabulary, ~√corpus), then a broadcast dictionary join
    * rejoins counts to the exploded words — tokenizing 100 TB costs a
    * vocabulary pass plus one map-side join, not a per-row merge loop.
    */
  def bpeTokenCounts(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    val vocab = words.select(col("w")).distinct()
      .select(col("w"),
        size(graft.functions.BpeEncode(col("w"), merges)).as("n_tok"))
    words.join(broadcast(vocab), "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_tok")).as("n_bpe_tokens"))
  }

  /** Whitespace-run class for [[cleanText]]: ASCII whitespace + NBSP.
    * `\x{...}` escapes only — Java regex and DuckDB's RE2 read them
    * identically, and the Scala lexer never sees a `\ u` literal.
    */
  val WsRunRe: String = "[ \\t\\r\\n\\x{00A0}]+"

  /** Residual C0 control characters (whitespace already collapsed). */
  val CtrlRe: String = "[\\x{0001}-\\x{001F}]"

  /** CCNet-style text cleanup — the normalization pass a crawl pipeline
    * runs before any hashing/dedup/tokenization sees the text:
    * Unicode NFC composition ([[graft.functions.NfcNormalize]], so
    * canonically-equivalent spellings hash identically), whitespace-run
    * collapse (incl. NBSP), residual C0 control strip, trim. Emits the
    * cleaned text plus the before/after char counts and a change flag —
    * the audit columns a 100 TB run monitors.
    *
    * Scale shape: one codegen'd narrow pass per row (native expression +
    * two regexp_replace), no shuffle, no UDF.
    */
  def cleanText(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"), col(textCol))
      .withColumn("clean",
        trim(regexp_replace(
          regexp_replace(graft.functions.NfcNormalize(col(textCol)),
            WsRunRe, " "),
          CtrlRe, "")))
      .select(col("doc_id"),
        length(col(textCol)).cast("long").as("n_before"),
        length(col("clean")).cast("long").as("n_after"),
        (col("clean") =!= col(textCol)).as("changed"),
        col("clean"))

  /** BPE vocabulary TRAINING (Sennrich et al. 2016 learn_bpe): learn
    * `nMerges` merges from the corpus. Classic formulation on the word-
    * frequency table: start char-split, then per iteration (1) count
    * adjacent symbol pairs weighted by word frequency, (2) take the
    * argmax with a deterministic (count desc, left, right) tie-break,
    * (3) apply that single merge everywhere ([[graft.functions
    * .BpeMergeOnce]], non-overlapping left-to-right). Returns the learned
    * merge table `(rank, l, r, pair_count)` — the artifact
    * [[bpeTokenCounts]] consumes.
    *
    * Scale shape: training state is the Heaps'-law VOCABULARY table
    * (distinct words ~√corpus, counted once with a map-side-combined
    * aggregate), never the corpus; each iteration is one pair-count
    * aggregate over it (key space = distinct symbol pairs) plus one
    * TakeOrdered(1) — the only driver-side data is the single argmax row
    * per iteration, and the updated segmentation is re-materialized
    * ([[graft.model.Materialize]]) so plan depth stays O(1) per
    * iteration. This iterations×vocab-pass cost is the standard
    * distributed-BPE shape; the gate's oracle replays every stage
    * structurally (count → argmax → recursive merge apply).
    */
  def bpeTrain(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wf = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // char split; drop the "" artifact Java regex split leaves for empty
    // words (DuckDB's comprehension init yields [] there)
    var enc = graft.model.Materialize(wf.select(col("w"), col("cnt"),
      filter(split(col("w"), ""), s => length(s) > 0).as("syms")))
    val learned = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val m = greatest(size(col("syms")) - 1, lit(0))
      val best = enc.select(col("cnt"),
          explode(zip_with(slice(col("syms"), lit(1), m),
            slice(col("syms"), lit(2), m),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((k.toLong, l, r, c))
        enc = graft.model.Materialize(enc.withColumn("syms",
          graft.functions.BpeMergeOnce(col("syms"), l, r)))
        k += 1
      }
    }
    learned.toSeq.toDF("rank", "l", "r", "pair_count")
  }

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "in", "to", "is", "it", "for", "on")

  /** The [[stats]] trainability rule as a standalone Column — token
    * count bounds + stopword density + distinct ratio, all integer
    * arithmetic (no float boundary). Shared by [[stats]] and
    * [[Web.domainReputation]] so the rule cannot fork.
    */
  def qualityOf(nTokens: Column, nUniq: Column, stopCnt: Column): Column =
    (nTokens >= 10 && nTokens <= 100000 &&
      stopCnt * 20 >= nTokens && nUniq * 3 >= nTokens).cast("long")

  /** Per-document integer stats (integers only: ratio outputs would sit on
    * rounding boundaries; callers derive ratios). quality = simple
    * trainability filter on token count and stopword density, all integer
    * arithmetic.
    */
  def stats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("__toks", toks)
      .select(
        col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("__toks"))).cast("long").as("n_uniq"),
        aggregate(transform(col("__toks"), t => length(t).cast("long")), lit(0L),
          (acc, x) => acc + x).as("sum_token_len"),
        size(filter(col("__toks"),
          t => t.isInCollection(Stopwords))).cast("long").as("stop_cnt"),
        bpeTokenCount(col(textCol)).cast("long").as("n_bpe"))
      .withColumn("quality",
        qualityOf(col("n_tokens"), col("n_uniq"), col("stop_cnt")))
  }

  /** Gopher-style repetition quality signals (Rae et al. 2021 §A1.1 shape):
    * duplicate-word mass and most-frequent-bigram mass per document —
    * boilerplate and generated-text detectors a pretraining pipeline runs
    * on every doc. All-integer outputs (counts, not ratios: callers divide;
    * the gate's drop rule uses integer cross-multiplication so no float
    * ever sits on a rounding boundary):
    *   n_tokens      — token count
    *   dup_tokens    — tokens beyond each word's first occurrence
    *   n_bigrams     — total (non-distinct) bigram count
    *   top_bigram    — occurrences of the most frequent bigram
    *   drop          — 1 if dup_tokens/n_tokens > 0.3 or
    *                   top_bigram/n_bigrams > 0.18 (Gopher's thresholds)
    *
    * Shape: bigram counting is explode → count keyed by (doc_id, gram) →
    * max per doc — two shuffles both keyed by doc, no skew beyond document
    * length, partial aggregation map-side. The per-doc token stats ride
    * along as narrow expressions.
    */
  def repetitionStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val m = greatest(size(toks) - 1, lit(0))
    val grams = zip_with(slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => concat(a, lit(" "), b))
    val base = df.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      (size(toks) - size(array_distinct(toks))).cast("long").as("dup_tokens"),
      grams.as("grams"))
    val top = base.select(col("doc_id"), explode(col("grams")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bigram"))
    base.drop("grams").join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("dup_tokens"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram"), lit(0L)).as("top_bigram"))
      .withColumn("drop",
        (col("dup_tokens") * 10 > col("n_tokens") * 3 ||
          col("top_bigram") * 100 > col("n_bigrams") * 18).cast("long"))
  }

  /** Marker-word language-ID heuristic (n-gram-profile style, word-level):
    * score each language by marker hits, argmax wins, ties → "und".
    * The marker lists are tiny by design — the operator shape (profile
    * scoring, argmax over a map) is what scales, the profiles are config.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "die", "und", "ist", "mit"),
    "es" -> Seq("el", "la", "de", "es", "con"),
    "fr" -> Seq("le", "la", "et", "est", "avec"))

  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(size(filter(toks, t => t.isInCollection(markers))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  // --- document fingerprinting (winnowing) --------------------------------

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * scheme): hash every character k-gram of the whitespace-normalized
    * text, then keep the minimum hash of each window of `w` consecutive
    * k-gram positions — any shared substring of length ≥ w+k-1 between two
    * documents is guaranteed to share a fingerprint. The classic
    * Karp-Rabin rolling-hash recurrence is a serial-CPU trick; the
    * declarative twin hashes each k-gram directly (same output set, k is a
    * small constant, everything stays inside whole-stage codegen).
    *
    * Output: (doc_id, fingerprints array<long>), distinct per doc.
    */
  def winnowFingerprints(df: DataFrame, k: Int = 8, w: Int = 4,
      textCol: String = "text"): DataFrame = {
    // Both stages are formulated as zip_with folds over SHIFTED SLICES
    // (the same discipline as `shingles`): a lambda that captures an
    // upstream array/string column can get that column's whole expression
    // inlined into the per-ELEMENT loop (higher-order lambdas are
    // interpreted, no subexpression elimination), which turns the winnow
    // into O(n²) regex+md5 work per row. Shifted slices reference each
    // upstream column a constant (k resp. w) number of times, all outside
    // any lambda.
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    // md5-per-position is CPU-heavy narrow work: rebalance when
    // under-partitioned (no-op at real scale — see [[rebalanced]])
    val src = rebalanced(df)
    // k-gram at position i = zip of k shifted char slices; hash each gram
    val chars = split(col("__norm"), "")
    val m = greatest(length(col("__norm")) - (k - 1), lit(0))
    val grams = (1 until k).foldLeft(slice(chars, lit(1), m)) { (acc, o) =>
      zip_with(acc, slice(chars, lit(o + 1), m), (a, b) => concat(a, b))
    }
    val kh = transform(col("__grams"), g => mdhash64(g))
    // winnow: min of each window of w consecutive hashes = zip-least of w
    // shifted hash slices
    val wm = greatest(size(col("__kh")) - (w - 1), lit(0))
    val fps = array_distinct(
      (1 until w).foldLeft(slice(col("__kh"), lit(1), wm)) { (acc, o) =>
        zip_with(acc, slice(col("__kh"), lit(o + 1), wm), (a, b) => least(a, b))
      })
    // materialize the result: downstream explode/join plans otherwise
    // collapse the projection chain into their Generate node and inline
    // the md5 transform MANY times (observed 17× in the explode plan —
    // a 9× wall-clock blowup); same signature-reuse rationale as the
    // MinHash checkpoint in Dedup
    graft.model.Materialize(
      src.withColumn("__norm", norm)
        .withColumn("__grams", grams)
        .withColumn("__kh", kh)
        .select(col("doc_id"), fps.as("fingerprints")))
  }

  /** Viral-fingerprint document-frequency cap for [[winnowOverlapPairs]]:
    * same rationale as Dedup.MaxShingleDf — pair blowup is Σ df² per
    * fingerprint, so boilerplate fingerprints shared by everyone are
    * excluded from pair FORMATION (they still count in each doc's size,
    * so containment is true).
    */
  val MaxFpDf = 50

  /** MOSS match step (Schleimer et al. §5: report document pairs ranked
    * by shared fingerprints): explode the winnow fingerprints, equi-join
    * on the fingerprint (capped at [[MaxFpDf]] docs — never all-pairs),
    * and score each pair by shared count and containment
    * `shared / min(|fp_i|, |fp_j|)` — the asymmetric measure that
    * catches a small doc embedded in a large one, which Jaccard dilutes.
    *
    * Returns (i, j, n_shared, containment 6dp) for pairs sharing at
    * least `minShared` fingerprints. One keyed shuffle on the
    * fingerprint plus one pair aggregate.
    */
  def winnowOverlapPairs(df: DataFrame, minShared: Int = 2): DataFrame = {
    val fp = winnowFingerprints(df)
      .select(col("doc_id"), explode(col("fingerprints")).as("fp"))
    val sizes = fp.groupBy(col("doc_id")).agg(count(lit(1)).as("nfp"))
    val rare = fp.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= MaxFpDf).select(col("fp"))
    val fpr = fp.join(rare, "fp")
    fpr.as("a").join(fpr.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      // No broadcast hint: `sizes` is per-document (unbounded at corpus
      // scale), while the pair table after the minShared cut is small —
      // a plain shuffled join keys on the small side either way, and AQE
      // may still elect a broadcast when sizes is measured small.
      .join(sizes.select(col("doc_id").as("i"), col("nfp").as("ni")), "i")
      .join(sizes.select(col("doc_id").as("j"), col("nfp").as("nj")), "j")
      .select(col("i"), col("j"), col("n_shared"),
        round(col("n_shared").cast("double") / least(col("ni"), col("nj")), 6)
          .as("containment"))
  }

  /** DuckDB twin of [[winnowOverlapPairs]] (shares the llm_fingerprints
    * oracle's winnow chain).
    */
  def winnowOverlapOracleSql(minShared: Int = 2): String =
    s"""WITH n AS (SELECT doc_id,
       |    regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
       |  FROM documents),
       |kh AS (SELECT doc_id,
       |    [('0x'||substr(md5(substr(t, i, 8)),1,15))::BIGINT
       |     for i in generate_series(1, length(t)-7)] AS kh
       |  FROM n),
       |fps AS (SELECT doc_id,
       |    list_distinct([list_aggregate(kh[j:j+3], 'min')
       |                   for j in generate_series(1, len(kh)-3)]) AS fps
       |  FROM kh),
       |fp AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
       |sizes AS (SELECT doc_id, count(*) AS nfp FROM fp GROUP BY 1),
       |rare AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= $MaxFpDf),
       |fpr AS (SELECT fp.doc_id, fp.fp FROM fp JOIN rare USING (fp)),
       |pc AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS n_shared
       |  FROM fpr a JOIN fpr b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= $minShared)
       |SELECT i, j, n_shared::BIGINT AS n_shared,
       |  round(n_shared::DOUBLE / least(si.nfp, sj.nfp), 6) AS containment
       |FROM pc JOIN sizes si ON si.doc_id = i JOIN sizes sj ON sj.doc_id = j
       |ORDER BY i, j""".stripMargin

  // --- PII scrubbing -------------------------------------------------------

  /** PII patterns, kept to the regex subset Java regex and RE2 agree on:
    * no lookarounds, no backreferences. Order matters — emails first (an
    * address contains dot-runs an IP pattern could nibble), then IPs,
    * then phone-shaped digit runs.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9][0-9()\\-. ]{6,}[0-9]"

  /** Redact emails / IPv4s / phone-shaped digit runs with typed
    * placeholder tokens (the standard pre-training scrub). Pure codegen'd
    * regexp_replace chain — no UDF, narrow, no shuffle.
    */
  def scrubPii(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    regexp_replace(i, PhoneRe, "<PHONE>")
  }

  // --- chunking ------------------------------------------------------------

  /** Split each document into training windows of `chunkTokens` whitespace
    * tokens with `overlap` tokens carried between consecutive chunks.
    * One explode over the chunk index — the fan-out is rows × ceil(n/stride),
    * all narrow arithmetic on the pre-split token array (split once per
    * row, not per chunk).
    *
    * Output: (doc_id, chunk_id, chunk_text, n_tokens).
    */
  def chunk(df: DataFrame, chunkTokens: Int = 100, overlap: Int = 20,
      textCol: String = "text"): DataFrame = {
    require(overlap < chunkTokens, "overlap must be < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = split(col(textCol), " ") // case-preserving: chunks are data
    df.withColumn("__toks", toks)
      .withColumn("__k",
        explode(sequence(lit(0),
          greatest(floor((size(col("__toks")) - 1) / lit(stride)).cast("int"),
            lit(0)))))
      .select(col("doc_id"), col("__k").cast("long").as("chunk_id"),
        array_join(slice(col("__toks"), col("__k") * stride + 1, lit(chunkTokens)),
          " ").as("chunk_text"),
        size(slice(col("__toks"), col("__k") * stride + 1, lit(chunkTokens)))
          .cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
  }

  /** Content-defined chunking: a chunk boundary falls after token `i`
    * whenever the rolling fingerprint of the `g` tokens ENDING at `i`
    * hits the cut condition (hash ≡ 0 mod `mask`; expected chunk length
    * = `mask` tokens), plus a forced final boundary at the document end.
    * Unlike [[chunk]]'s fixed stride, boundaries are functions of LOCAL
    * content, so edits shift only the chunks they touch — inserting a
    * prefix leaves every boundary after the first untouched cut point
    * identical (property-tested in LlmSpec) — which is what makes CDC the
    * standard chunking for storage/transmission dedup of training shards.
    *
    * Scale shape: entirely narrow array arithmetic per row (the gram
    * build is the same shifted-slice zip_with as [[shingles]]; boundary
    * selection is a transform+filter; chunks come from ONE posexplode) —
    * no shuffle, no window, no UDF.
    *
    * Output: (doc_id, chunk_id, start_tok 1-based, n_tokens, chunk_text).
    */
  def cdcChunks(df: DataFrame, mask: Int = 16, g: Int = 3): DataFrame = {
    val base = df.select(col("doc_id"), tokens(col("text")).as("ws"))
    val m = greatest(size(col("ws")) - (g - 1), lit(0))
    val grams = (1 until g).foldLeft(slice(col("ws"), lit(1), m)) { (acc, o) =>
      zip_with(acc, slice(col("ws"), lit(o + 1), m),
        (a, b) => concat(a, lit(" "), b))
    }
    // gram at 0-based index i spans tokens i+1 .. i+g (1-based): a hit
    // puts a boundary after token i+g. The gram array is STAGED as a
    // named column before the transform lambda touches it — a lambda
    // capturing the raw zip_with chain gets the whole gram build inlined
    // into the per-element loop (no subexpression elimination inside
    // HOFs), turning the boundary scan O(n²)
    val cutEnds = filter(
      transform(col("grams"), (gr, i) =>
        when(pmod(mdhash64(gr), lit(mask.toLong)) === 0L, i + g)),
      e => e.isNotNull)
    val ends = array_sort(array_distinct(
      concat(cutEnds, array(size(col("ws"))))))
    base.withColumn("grams", grams)
      .withColumn("ends", ends)
      .drop("grams")
      .select(col("doc_id"), col("ws"), col("ends"),
        posexplode(col("ends")).as(Seq("k", "end")))
      .select(col("doc_id"), col("ws"), col("end"),
        col("k").cast("long").as("chunk_id"),
        when(col("k") === 0, lit(1))
          .otherwise(element_at(col("ends"), col("k")) + 1).as("start_tok"))
      .withColumn("start_tok", col("start_tok").cast("long"))
      .withColumn("n_tokens",
        (col("end") - col("start_tok") + 1).cast("long"))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("ws"), col("start_tok").cast("int"),
          col("n_tokens").cast("int"))))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        col("n_tokens"), col("chunk_text"))
  }

  /** DuckDB twin of [[cdcChunks]] — same gram fingerprint, same cut
    * condition, same forced final boundary.
    */
  def cdcChunksOracleSql(mask: Int = 16, g: Int = 3): String = {
    val gram = (0 until g).map(o => s"ws[i+$o]").mkString("||' '||")
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
       |b AS (SELECT doc_id, ws, list_sort(list_distinct(
       |    [i+${g - 1} for i in generate_series(1, len(ws)-${g - 1})
       |     if ('0x'||substr(md5($gram),1,15))::BIGINT % $mask = 0]
       |    || [len(ws)])) AS ends FROM t),
       |c AS (SELECT doc_id, k-1 AS chunk_id,
       |    CASE WHEN k = 1 THEN 1 ELSE ends[k-1]+1 END AS start_tok,
       |    ends[k] AS end_tok, ws
       |  FROM b, unnest([x for x in generate_series(1, len(ends))]) u(k))
       |SELECT doc_id, chunk_id::BIGINT AS chunk_id, start_tok::BIGINT AS start_tok,
       |  (end_tok - start_tok + 1)::BIGINT AS n_tokens,
       |  array_to_string(ws[start_tok:end_tok], ' ') AS chunk_text
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin
  }

  // --- corpus drift (per-source KL divergence) -------------------------------

  /** Distribution-drift report: KL(p_source ‖ p_corpus) of each source's
    * token distribution against the whole corpus — the monitoring signal a
    * continuous crawl watches to catch a source going off-profile (spam
    * flood, template change, language flip) BEFORE quality filters see it.
    * q is the global distribution, which dominates every source (a
    * source's tokens are a subset of the corpus's), so no smoothing is
    * needed and KL is finite and ≥ 0 by construction.
    *
    * Scale shape: two keyed map-side-combined aggregates (source×token,
    * token) plus one broadcast scalar — the (source, token) table is the
    * only shuffle that grows with the vocabulary. Returns (source,
    * n_tokens, n_distinct, kl), kl rounded 6 dp.
    */
  def driftReport(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("source"), explode(tokens(col("text"))).as("t"))
    val sc = tok.groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
    val st = sc.groupBy(col("source")).agg(
      sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
    val gc = sc.groupBy(col("t")).agg(sum(col("c")).as("gc"))
    val gt = gc.agg(sum(col("gc")).as("gtot"))
    sc.join(broadcast(st), "source")
      .join(gc, "t")
      .crossJoin(broadcast(gt))
      .withColumn("p", col("c").cast("double") / col("n"))
      .withColumn("q", col("gc").cast("double") / col("gtot"))
      .groupBy(col("source"))
      .agg(first(col("n")).as("n_tokens"),
        first(col("n_distinct")).as("n_distinct"),
        round(sum(col("p") * log(col("p") / col("q"))), 6).as("kl"))
  }

  /** DuckDB twin of [[driftReport]]. */
  val DriftReportOracleSql: String =
    """WITH tok AS (SELECT source, unnest(string_split(lower(text), ' ')) AS t
      |    FROM documents),
      |sc AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
      |st AS (SELECT source, sum(c) AS n, count(*)::BIGINT AS n_distinct
      |  FROM sc GROUP BY 1),
      |gc AS (SELECT t, sum(c) AS gc FROM sc GROUP BY 1),
      |gt AS (SELECT sum(gc) AS gtot FROM gc)
      |SELECT sc.source, st.n::BIGINT AS n_tokens, st.n_distinct,
      |  round(sum((sc.c::DOUBLE / st.n) *
      |    ln((sc.c::DOUBLE / st.n) / (gc.gc::DOUBLE / gt.gtot))), 6) AS kl
      |FROM sc JOIN st USING (source) JOIN gc USING (t) CROSS JOIN gt
      |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

  // --- HyperLogLog distinct counting ----------------------------------------

  /** HLL geometry (Flajolet et al. 2007): 2^p registers over the shared
    * 60-bit md5 hash — top p bits pick the register, the remaining
    * 50 bits' leading-zero run (+1) is the rank. Standard error
    * ≈ 1.04/√m ≈ 3.3% at p=10.
    */
  val HllP = 10
  val HllM = 1 << HllP
  private val HllWBits = 60 - HllP
  private val HllWMask = (1L << HllWBits) - 1

  /** Per-`scope` HLL distinct estimate vs the exact count: (scope,
    * n_distinct, est, rel_err). The registers build as ONE map-side-
    * combined groupBy to scope×m rows (max is idempotent — no pre-distinct
    * pass needed); the estimate is scalar math over that tiny table, with
    * the standard small-range correction (linear counting below 2.5m).
    * This is how a 100 TB pipeline sizes vocabularies / cardinalities per
    * slice without a full-vocabulary distinct shuffle; the exact count
    * here exists only to certify the estimate in the gate.
    *
    * Engine parity: rank uses `length(bin(w))` — Spark and DuckDB both
    * render minimal binary strings — so registers are integer-exact; the
    * harmonic sum is composed of exact powers of two and rounds at 6 dp.
    */
  def hllReport(docs: DataFrame, scope: Column = col("source")): DataFrame = {
    val tok = docs.select(scope.as("scope"), explode(tokens(col("text"))).as("t"))
    val h = tok.withColumn("h", mdhash64(col("t")))
    val rr = h.select(col("scope"), col("t"),
      shiftright(col("h"), HllWBits).as("idx"),
      col("h").bitwiseAND(lit(HllWMask)).as("w"))
      .withColumn("rank", when(col("w") === 0, lit(HllWBits + 1))
        .otherwise(lit(HllWBits + 1) - length(bin(col("w")))))
    val regs = rr.groupBy(col("scope"), col("idx"))
      .agg(max(col("rank")).as("r"))
    val alpha = 0.7213 / (1.0 + 1.079 / HllM)
    val est = regs.groupBy(col("scope")).agg(
      sum(pow(lit(2.0), -col("r"))).as("zp"),
      count(lit(1)).as("npres"))
      .withColumn("v", lit(HllM.toLong) - col("npres"))
      .withColumn("e_raw", lit(alpha * HllM.toDouble * HllM) /
        (col("zp") + col("v").cast("double")))
      .withColumn("est", round(
        when(col("e_raw") <= 2.5 * HllM && col("v") > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v")))
          .otherwise(col("e_raw")), 6))
    val exact = tok.groupBy(col("scope"))
      .agg(countDistinct(col("t")).as("n_distinct"))
    exact.join(est.select(col("scope"), col("est")), "scope")
      .select(col("scope"), col("n_distinct"), col("est"),
        round(abs(col("est") - col("n_distinct")) / col("n_distinct"), 6)
          .as("rel_err"))
  }

  /** DuckDB twin of [[hllReport]] over `source`. */
  def hllReportOracleSql: String = {
    val alpha = 0.7213 / (1.0 + 1.079 / HllM)
    s"""WITH tok AS (SELECT source AS scope,
       |    unnest(string_split(lower(text), ' ')) AS t FROM documents),
       |h AS (SELECT scope, t,
       |    ('0x'||substr(md5(t),1,15))::BIGINT AS h FROM tok),
       |rr AS (SELECT scope, h // ${1L << HllWBits} AS idx,
       |    CASE WHEN (h % ${1L << HllWBits}) = 0 THEN ${HllWBits + 1}
       |         ELSE ${HllWBits + 1} - length(bin(h % ${1L << HllWBits}))
       |    END AS rank
       |  FROM h),
       |regs AS (SELECT scope, idx, max(rank) AS r FROM rr GROUP BY 1, 2),
       |z AS (SELECT scope, sum(pow(2.0, -r)) AS zp, count(*) AS npres
       |  FROM regs GROUP BY 1),
       |e AS (SELECT scope, ($HllM - npres) AS v,
       |    ${alpha * HllM.toDouble * HllM} / (zp + ($HllM - npres)) AS e_raw
       |  FROM z),
       |est AS (SELECT scope,
       |    round(CASE WHEN e_raw <= ${2.5 * HllM} AND v > 0
       |          THEN ${HllM.toDouble} * ln(${HllM.toDouble} / v)
       |          ELSE e_raw END, 6) AS est
       |  FROM e),
       |exact AS (SELECT scope, count(DISTINCT t)::BIGINT AS n_distinct
       |  FROM tok GROUP BY 1)
       |SELECT exact.scope AS source, n_distinct, est,
       |  round(abs(est - n_distinct) / n_distinct, 6) AS rel_err
       |FROM exact JOIN est USING (scope) ORDER BY scope""".stripMargin
  }

  // --- Count-Min sketch token frequency ------------------------------------

  /** Count-Min geometry (Cormode & Muthukrishnan 2005): d seeded rows ×
    * w columns. Estimate error ≤ 2N/w with prob ≥ 1 − (1/2)^d; this
    * fixture-sized sketch is 4×16384 cells = 512 KB.
    */
  val CmDepth = 4
  val CmWidth = 1 << 14

  /** Row-r cell of a token: shared md5-derived hash of "cm<r>:<token>"
    * mod the width — non-negative, so DuckDB's `%` mirrors `pmod`.
    */
  def cmPosition(term: Column, r: Int): Column =
    pmod(mdhash64(concat(lit(s"cm$r:"), term)), lit(CmWidth.toLong))

  /** Build the sketch over the corpus token stream: one distributed pass —
    * each partition increments a local d×w long array (one cell per row
    * per token occurrence), arrays element-wise-add up a tree. Addition is
    * commutative, so the sketch is partition-layout invariant; memory is
    * O(d·w) everywhere regardless of corpus size. This is how a 100 TB
    * pipeline estimates token/n-gram frequencies (viral-shingle caps,
    * stop-lists, heavy hitters) WITHOUT the full-vocabulary groupBy
    * shuffle the exact count pays.
    */
  def cmBuild(docs: DataFrame, text: Column = col("text")): Array[Long] = {
    import org.apache.spark.sql.Encoders
    docs.select(explode(tokens(text)).as("t"))
      .select(explode(array((0 until CmDepth).map(r =>
        cmPosition(col("t"), r) + lit(r.toLong * CmWidth)): _*)).as("p"))
      .as[Long](Encoders.scalaLong)
      .rdd
      .treeAggregate(new Array[Long](CmDepth * CmWidth))(
        (b, p) => { b(p.toInt) += 1; b },
        (a, b) => {
          var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
        })
  }

  /** Point-query the sketch: est(term) = min over the d rows' cells —
    * d codegen'd [[graft.functions.LongArrayGet]] reads, no join, never
    * an underestimate. Adds `est` to `terms` (must carry a `term` col).
    */
  def cmEstimate(terms: DataFrame, cms: Array[Long]): DataFrame =
    terms.withColumn("est", (0 until CmDepth).map(r =>
      graft.functions.LongArrayGet(
        cmPosition(col("term"), r) + lit(r.toLong * CmWidth), cms))
      .reduce(least(_, _)))

  /** Gate shape: sketch-estimate vs exact count for a fixed query-term
    * set. `overcount = est − true_count ≥ 0` is the CMS guarantee the
    * oracle certifies cell-for-cell. The exact count here only covers the
    * handful of query terms (the sketch exists so the FULL vocabulary
    * never needs that groupBy).
    */
  def cmReport(docs: DataFrame, queryTerms: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cms = cmBuild(docs)
    val tc = docs.select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("true_count"))
    cmEstimate(queryTerms.toDF("term"), cms)
      .join(tc, Seq("term"), "left")
      .select(col("term"), coalesce(col("true_count"), lit(0L)).as("true_count"),
        col("est"), (col("est") - coalesce(col("true_count"), lit(0L)))
          .as("overcount"))
  }

  /** DuckDB twin of [[cmReport]]: cell values recomputed as the sum of
    * exact counts of all tokens hashing to the cell — identical to the
    * incremented array, collisions (and thus overcounts) included.
    */
  def cmReportOracleSql(queryTerms: Seq[String]): String = {
    val qlist = queryTerms.map(t => "'" + t.replace("'", "''") + "'")
      .mkString("[", ", ", "]")
    s"""WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS w
       |    FROM documents),
       |tc AS (SELECT w, count(*)::BIGINT AS c FROM toks GROUP BY 1),
       |cells AS (SELECT g.r,
       |    ('0x'||substr(md5('cm'||g.r||':'||w),1,15))::BIGINT % $CmWidth AS p,
       |    sum(c)::BIGINT AS v
       |  FROM tc CROSS JOIN generate_series(0, ${CmDepth - 1}) g(r)
       |  GROUP BY 1, 2),
       |q AS (SELECT unnest($qlist) AS term),
       |qp AS (SELECT term, g.r,
       |    ('0x'||substr(md5('cm'||g.r||':'||term),1,15))::BIGINT % $CmWidth AS p
       |  FROM q CROSS JOIN generate_series(0, ${CmDepth - 1}) g(r)),
       |est AS (SELECT term, min(coalesce(cells.v, 0))::BIGINT AS est
       |  FROM qp LEFT JOIN cells ON cells.r = qp.r AND cells.p = qp.p
       |  GROUP BY 1)
       |SELECT q.term, coalesce(tc.c, 0)::BIGINT AS true_count, est.est,
       |  (est.est - coalesce(tc.c, 0))::BIGINT AS overcount
       |FROM q JOIN est USING (term) LEFT JOIN tc ON tc.w = q.term
       |ORDER BY term""".stripMargin
  }
}
