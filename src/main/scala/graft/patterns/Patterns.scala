package graft.patterns

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Log pattern mining (SURVEY §2.G), a Drain-style two-stage clustering
  * (`writer/pattern/clustering/pattern.go:70-501`) re-expressed as
  * relational passes instead of the reference's per-stream in-memory
  * tree:
  *
  *   1. token classing — numeric tokens masked to `<N>` (the tokenizer's
  *      class costs collapse to this for the dominant classes)
  *   2. cluster key = (stream, token count, first token) — Drain's tree
  *      path (length → head token) as a groupBy key
  *   3. generalization — positions whose token differs WITHIN a cluster
  *      become `<_>`; all-equal positions keep the literal
  *
  * Each stage is a narrow shuffle keyed by cluster: at 100 TB this runs as
  * two hash aggregations, no driver state, and the streaming form is the
  * same plan inside a foreachBatch (clusters re-merge by key across
  * batches because the key and generalization are associative).
  */
object Patterns {

  /** Log levels and HTTP methods (`_lexer.go:69-70,125-130`) — "valuable"
    * classes (tokenCosts 30-34, `pattern.go:47-62`): high cost means they
    * resist generalization, which in this relational re-expression means
    * they keep their literal value instead of being pre-masked.
    */
  val LogLevels: Seq[String] = Seq("INFO", "DEBUG", "WARN", "WARNING",
    "ERROR", "CRITICAL", "FATAL", "NOTICE", "EMERGENCY", "ALERT")
  val HttpMethods: Seq[String] = Seq("GET", "POST", "PUT", "DELETE",
    "PATCH", "HEAD", "OPTIONS", "CONNECT", "TRACE")

  /** Token classing, mirroring the reference lexer's classes
    * (`clustering/lexer.go` / `_lexer.go:26-150`, costs
    * `pattern.go:47-62`) in its precedence order. Low-cost classes
    * (UUID, Priority, Timestamp, IP, PID, digit runs) pre-mask to a
    * placeholder — they generalize readily in the reference; valuable
    * classes (LogLevel, ProgramName, HTTPVersion, HTTPMethod, HTTPCode,
    * Word) keep their literal and only generalize through the per-cluster
    * `<_>` pass. HTTPCode keeps the reference's quirk: any 3-char numeric
    * token whose first digit is 0-5 (`isHTTPCode`, `lexer.go:3774`),
    * which admits "0.5". Common-log `[dd/Mon/yyyy:hh:mm:ss +zzzz]`
    * timestamps arrive as two space-split tokens — both class `<TS>`.
    */
  def classTok(rawTok: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // trailing line terminators are stripped before classing (all three
    // forms — native / Column / DuckDB — agree; Java '$' matches before a
    // trailing \n, RE2 '$' does not, so the strip removes the divergence)
    val t = regexp_replace(rawTok, "[\\r\\n]+$", "")
    // cheap structural guards in front of each full-token regex: most
    // tokens are plain words and skip every regex after one length /
    // first-char comparison
    val first = substring(t, 1, 1)
    val digitFirst = first >= "0" && first <= "9"
    when(length(t) === 36 && substring(t, 9, 1) === "-" &&
        t.rlike("^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"),
      "<UUID>")
    .when(first === "<" && t.rlike("^<\\d+>$"), "<PRI>")
    .when(digitFirst && length(t) >= 10 &&
        t.rlike("^\\d{4}-\\d{2}-\\d{2}([T ]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?(Z|[+-]\\d{2}:?\\d{2})?)?$"),
      "<TS>")
    .when(digitFirst && t.rlike("^\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?$"), "<TS>")
    .when(first === "[" &&
        t.rlike("^\\[\\d{2}/[A-Za-z]{3}/\\d{4}:\\d{2}:\\d{2}:\\d{2}$"), "<TS>")
    .when((first === "+" || first === "-") && t.rlike("^[+-]\\d{4}\\]$"), "<TS>")
    .when(t.isin(LogLevels: _*), t)
    .when(t.endsWith("]:") && t.rlike("^[a-zA-Z][a-zA-Z0-9_-]+\\[\\d+\\]:$"),
      regexp_replace(t, "\\[\\d+\\]:$", "[<PID>]:"))
    .when(digitFirst && t.rlike("^\\d{1,3}(\\.\\d{1,3}){3}(:\\d+)?$"), "<IP>")
    .when(length(t) >= 8 && t.rlike("^(0x)?[0-9a-fA-F]{8,}$") && t.rlike("[a-fA-F]"),
      "<HEX>")
    .when(first === "/" && t.rlike("^(/[^/ ]+){2,}/?$"), "<PATH>")
    .when(first === "H" && t.rlike("^HTTP(/[12]\\.[01])?$"), t)
    .when(t.isin(HttpMethods: _*), t)
    .when(digitFirst && first <= "5" && length(t) === 3 &&
        t.rlike("^\\d+(\\.\\d+)?$"), t)
    .otherwise(regexp_replace(t, "[0-9]+", "<N>"))
  }

  /** The DuckDB mirror of [[classTok]] — same classes, same precedence —
    * shared by every oracle that re-derives the classing in SQL. Like the
    * Spark forms it strips trailing line terminators before classing
    * (RE2 `$` does not match before a trailing newline, Java `$` does).
    */
  def duckClassTok(rawW: String): String = {
    val w = raw"regexp_replace($rawW, '[\r\n]+$$', '')"
    raw"""CASE
       | WHEN regexp_matches($w, '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$$') THEN '<UUID>'
       | WHEN regexp_matches($w, '^<\d+>$$') THEN '<PRI>'
       | WHEN regexp_matches($w, '^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2})?)?$$') THEN '<TS>'
       | WHEN regexp_matches($w, '^\d{2}:\d{2}:\d{2}(\.\d+)?$$') THEN '<TS>'
       | WHEN regexp_matches($w, '^\[\d{2}/[A-Za-z]{3}/\d{4}:\d{2}:\d{2}:\d{2}$$') THEN '<TS>'
       | WHEN regexp_matches($w, '^[+-]\d{4}\]$$') THEN '<TS>'
       | WHEN $w IN (${LogLevels.map(l => s"'$l'").mkString(",")}) THEN $w
       | WHEN regexp_matches($w, '^[a-zA-Z][a-zA-Z0-9_-]+\[\d+\]:$$') THEN regexp_replace($w, '\[\d+\]:$$', '[<PID>]:')
       | WHEN regexp_matches($w, '^\d{1,3}(\.\d{1,3}){3}(:\d+)?$$') THEN '<IP>'
       | WHEN regexp_matches($w, '^(0x)?[0-9a-fA-F]{8,}$$') AND regexp_matches($w, '[a-fA-F]') THEN '<HEX>'
       | WHEN regexp_matches($w, '^(/[^/ ]+){2,}/?$$') THEN '<PATH>'
       | WHEN regexp_matches($w, '^HTTP(/[12]\.[01])?$$') THEN $w
       | WHEN $w IN (${HttpMethods.map(m => s"'$m'").mkString(",")}) THEN $w
       | WHEN length($w) = 3 AND regexp_matches($w, '^[0-5]') AND regexp_matches($w, '^\d+(\.\d+)?$$') THEN $w
       | ELSE regexp_replace($w, '[0-9]+', '<N>', 'g') END"""
      .stripMargin.replace("\n", "")
  }

  /** One native compiled pass (graft.functions.ClassTokens) — the
    * `transform(..., classTok(_))` higher-order form ran the whole
    * when-chain interpreted per token and dominated the mining entries.
    * [[classTok]] above remains the executable spec; PatternsSpec
    * differential-tests the two against each other.
    */
  def maskedTokens(line: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ClassTokens(split(line, " "))

  /** Cluster lines of (stream, line) → (stream, pattern, samples_count).
    *
    * Two-phase: (1) ONE hash aggregation collapses the raw lines to
    * DISTINCT masked token sequences with counts — map-side partial
    * combine does the heavy reduction, so the shuffle carries
    * O(distinct patterns), not O(lines); (2) the per-position
    * generalization pass (posexplode + countDistinct) runs over those
    * few distinct sequences only. At 100 TB phase 2's input is bounded
    * by template cardinality (thousands), independent of row count.
    */
  def mineLines(lines: DataFrame): DataFrame =
    generalize(lines
      .select(col("stream"), maskedTokens(col("line")).as("ws"))
      .groupBy(col("stream"), col("ws"))
      .agg(count(lit(1)).as("samples_count")))

  /** Mined patterns over the canonical log table, keyed by event_type. */
  def mine(spark: SparkSession, dir: String): DataFrame =
    mineLines(Tables.logs(spark, dir).select(
        element_at(col("labels"), "event_type").as("stream"), col("line")))
      .withColumnRenamed("stream", "event_type")

  /** Cross-batch pattern merge — the associativity the streaming form
    * relies on (header claim; `foreachBatch` keeps a patterns state table
    * and folds each batch in). The cluster key is recoverable from the
    * pattern itself: `head` is part of the key so it is never generalized,
    * and `n` is the token count. Per position, tokens that differ ACROSS
    * batches generalize to `<_>` exactly as tokens differing within one
    * batch would ( <_> absorbs everything ), so
    * mergeMined(mine(b1) ∪ mine(b2)) == mine(b1 ∪ b2); counts sum.
    */
  def mergeMined(mined: DataFrame): DataFrame =
    generalize(mined.select(col("stream"),
      split(col("pattern"), " ").as("ws"), col("samples_count")))

  /** Per-position generalization over weighted token sequences
    * `(stream, ws, samples_count)`: within a cluster — keyed by Drain's
    * tree path (token count, head token) — positions whose token differs
    * become `<_>`, all-equal positions keep the literal; counts sum.
    * Shared by [[mineLines]] (phase 2) and [[mergeMined]] (where `<_>`
    * absorbs everything, making the fold associative across batches).
    */
  private def generalize(seqs: DataFrame): DataFrame = {
    val keyed = seqs.select(col("stream"), size(col("ws")).as("n"),
      element_at(col("ws"), 1).as("head"), col("ws"), col("samples_count"))
    val posed = keyed.select(col("stream"), col("n"), col("head"),
      col("samples_count"), posexplode(col("ws")).as(Seq("pos", "tok")))
    val posTok = posed
      .groupBy(col("stream"), col("n"), col("head"), col("pos"))
      .agg(when(countDistinct(col("tok")) === 1, min(col("tok")))
        .otherwise(lit("<_>")).as("tok_out"),
        sum(col("samples_count")).as("cnt"))
    posTok
      .groupBy(col("stream"), col("n"), col("head"))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("tok_out")))),
        s => s.getField("tok_out"))).as("pattern"),
        max(when(col("pos") === 0, col("cnt"))).as("samples_count"))
      .select(col("stream"), col("pattern"), col("samples_count"))
  }
}
