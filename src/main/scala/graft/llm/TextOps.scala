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

  /** GPT2-style pretokenizer regex — counts BPE-ish word/number/punct
    * units. Kept to syntax both Java regex and DuckDB's RE2 agree on.
    */
  val BpeTokenRe: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenRe), lit(0)))

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "in", "to", "is", "it", "for", "on")

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
        (col("n_tokens") >= 10 && col("n_tokens") <= 100000 &&
          col("stop_cnt") * 20 >= col("n_tokens") &&
          col("n_uniq") * 3 >= col("n_tokens")).cast("long"))
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
}
