package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-crawl front-door operators: markup → text extraction and URL
  * canonicalization. These are the first two passes of a crawl-derived
  * training corpus (C4, Raffel et al. 2020 §2.2 strips markup before any
  * quality filter; URL-level dedup is the cheapest dedup pass and runs
  * before any content hash), sitting upstream of the [[Curation]] /
  * [[Dedup]] family.
  *
  * Everything is codegen'd `regexp_replace` / string builtins — no UDFs —
  * and every pattern stays inside the Java-regex ∩ RE2 common subset
  * (non-greedy `.*?` and inline `(?is)` flags: yes; backreferences and
  * lookahead: no) so the DuckDB oracles replay the chain bit-for-bit.
  * Per-row narrow work: at 100 TB both operators scan once with no
  * shuffle; URL dedup adds exactly one keyed shuffle on the canonical URL.
  */
object Web {

  // ---- markup → text ------------------------------------------------------

  /** Entity decode chain shared with the oracle: `&amp;` decodes LAST so
    * double-escaped entities (`&amp;lt;`) single-decode (to `&lt;`), the
    * standard one-pass rule.
    */
  val Entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** Whitespace class written out explicitly: Java `\s` includes \x0B,
    * RE2's does not — the explicit class is identical in both engines.
    */
  val WsRe = "[ \\t\\r\\n\\f]+"

  /** Strip patterns, applied in order (comments first so a commented-out
    * script block is not re-opened; script/style before the generic tag
    * strip so their CONTENT goes too). All in the Java ∩ RE2 subset.
    */
  val CommentRe = "(?s)<!--.*?-->"
  val ScriptRe = "(?is)<script[^>]*>.*?</script>"
  val StyleRe = "(?is)<style[^>]*>.*?</style>"
  val TagRe = "<[^>]*>"

  /** Visible text of an HTML/XML-ish document: drops comments, whole
    * `<script>`/`<style>` elements (their CONTENT is code, not text), then
    * every remaining tag, decodes the common entities, and collapses
    * whitespace. Block-level structure is not preserved — the output is
    * the single-line token stream the downstream shingle/quality operators
    * consume.
    */
  def extractText(html: Column): Column = {
    val noTags = Seq(CommentRe, ScriptRe, StyleRe, TagRe).foldLeft(html) {
      (c, re) => regexp_replace(c, re, " ")
    }
    val decoded = Entities.foldLeft(noTags) { case (c, (e, r)) =>
      replace(c, lit(e), lit(r))   // literal replace — mirrors DuckDB replace()
    }
    trim(regexp_replace(decoded, WsRe, " "))
  }

  /** Text density (clean-length / markup-length), the jusText-style signal
    * a pipeline thresholds to drop nav/boilerplate-dominated pages.
    * Rounded to 6 places for cross-engine float parity.
    */
  def textRatio(html: Column): Column =
    round(length(extractText(html)).cast("double") / length(html), 6)

  // ---- URL canonicalization ----------------------------------------------

  /** Query params dropped during canonicalization (tracking/click IDs —
    * they vary per crawl fetch of the same page). Tested against the full
    * `name=value` token.
    */
  val TrackingParamRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="

  /** Canonical form of an absolute URL: lowercase scheme+host, default
    * port stripped, fragment dropped, tracking params dropped, remaining
    * params sorted (byte order), trailing slashes trimmed (empty path →
    * "/"). Two crawl fetches of one page — differing in case, utm noise,
    * param order, `:443`, or a trailing slash — map to one key.
    */
  /** Host extraction pieces, exposed so the DuckDB oracle interpolates
    * THE SAME literals (no parallel copies).
    */
  val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
  val PortSuffixRe = ":[0-9]+$"
  val WwwPrefixRe = "^www\\."

  /** Host of an absolute URL: lowercased, port stripped, leading `www.`
    * dropped — the aggregation key for domain-level reputation.
    */
  def hostOf(url: Column): Column =
    regexp_replace(regexp_replace(
      lower(regexp_extract(url, HostRe, 1)),
      PortSuffixRe, ""), WwwPrefixRe, "")

  /** Per-domain reputation roll-up — the RefinedWeb-style URL-filtering
    * stage: aggregate each domain's doc count, distinct canonical pages,
    * and quality-pass count ([[TextOps.qualityOf]], the same rule
    * TextOps.stats gates on), then flag domains a pipeline would block —
    * `flag_dup` when over half the fetches are re-crawls of existing
    * pages, `flag_lowq` when under half the docs pass quality. All
    * integer counts and integer cross-multiplied flags (no float ever
    * sits on a rounding boundary).
    *
    * Input: `(doc_id, url, text)`. Scale shape: one narrow pass derives
    * (domain, canon_url, quality), then a domain-keyed aggregate whose
    * count-distinct runs as the standard two-level (domain, canon_url)
    * partial aggregation — skew bounded by pages-per-domain, map-side
    * combined; output is domain-bounded.
    */
  def domainReputation(d: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val staged = d.withColumn("__toks", TextOps.tokens(col("text")))
      .select(
        hostOf(col("url")).as("domain"),
        canonicalizeUrl(col("url")).as("cu"),
        TextOps.qualityOf(size(col("__toks")).cast("long"),
          size(array_distinct(col("__toks"))).cast("long"),
          size(filter(col("__toks"),
            t => t.isInCollection(TextOps.Stopwords))).cast("long"))
          .as("quality"))
    staged.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cu")).as("n_pages"),
        sum(col("quality")).as("n_quality"))
      .select(col("domain"), col("n_docs"), col("n_pages"), col("n_quality"),
        ((col("n_docs") - col("n_pages")) * 2 > col("n_docs")).as("flag_dup"),
        (col("n_quality") * 2 < col("n_docs")).as("flag_lowq"))
      .withColumn("blocked", col("flag_dup") || col("flag_lowq"))
  }

  /** Path component of an absolute URL (same regex the canonicalizer
    * uses, exposed for the robots matcher).
    */
  val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"

  /** Robots/opt-out filter — the compliance front door a crawl-derived
    * corpus applies before anything else: `rules` is a `(domain, prefix)`
    * disallow table (robots.txt Disallow lines, publisher opt-out lists);
    * a document is blocked when ANY rule of its domain prefix-matches its
    * URL path, and the LONGEST matching prefix is reported (the
    * robots.txt precedence rule). Domains without rules pass.
    *
    * Scale shape: the rule table is small by nature — it broadcasts onto
    * the corpus stream; per doc one prefix test per same-domain rule,
    * then a doc-keyed aggregate. Longest-match selection is a struct max
    * (length, prefix) — no window.
    */
  def robotsFilter(d: org.apache.spark.sql.DataFrame,
      rules: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val u = d.select(col("doc_id"), hostOf(col("url")).as("domain"),
      regexp_extract(col("url"), PathRe, 1).as("path"))
    val hit = col("prefix").isNotNull && col("path").startsWith(col("prefix"))
    u.join(broadcast(rules), Seq("domain"), "left")
      .groupBy(col("doc_id"), col("domain"))
      .agg(max(when(hit,
          struct(length(col("prefix")).as("l"), col("prefix").as("p"))))
        .as("m"))
      .select(col("doc_id"), col("domain"),
        col("m").isNotNull.as("blocked"),
        col("m.p").as("matched_prefix"))
  }

  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host = when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(hostport)
    val rawPath = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/+$", "")
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    // tiny per-URL array (a handful of params) — the interpreted lambda is
    // off the corpus-hash hot path
    val kept = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    val canonQ = array_join(array_sort(kept), "&")
    concat(scheme, lit("://"), host, path,
      when(canonQ === "", lit("")).otherwise(concat(lit("?"), canonQ)))
  }
}
