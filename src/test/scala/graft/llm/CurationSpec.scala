package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

class CurationSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)
  private def emb = Tables.embeddings(spark, sf)

  test("packSequences two-level prefix sum equals the single-window form") {
    // the sharding must only change the execution shape, never the math:
    // compare against a plain running-sum window over each source
    val packed = Curation.packSequences(docs, 256, shardSpan = 32)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("__before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor(col("__before") / 256).cast("long").as("seq_id"),
        pmod(col("__before"), lit(256L)).cast("long").as("seq_offset"))
    assert(packed.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(packed).count() == 0)
  }

  test("packSequences: offsets stay inside the budget; seq ids are dense per source") {
    val packed = Curation.packSequences(docs, 256, shardSpan = 32)
    assert(packed.filter(col("seq_offset") < 0 || col("seq_offset") >= 256).count() == 0)
    // a document's start offset = cumulative tokens before it, so the max
    // seq_id per source must be floor((total-last)/budget)-consistent:
    // every seq id in [0, max] appears (contiguous fill never skips a bin
    // unless one doc exceeds the budget — none do at 10..99 tokens)
    val bySrc = packed.groupBy("source")
      .agg(max("seq_id").as("mx"), countDistinct("seq_id").as("n"))
    assert(bySrc.filter(col("n") =!= col("mx") + 1).count() == 0)
  }

  test("domainMix keeps rate-1 sources fully and rate-0 sources not at all") {
    val rates = Map("src1" -> 1.0, "src2" -> 0.0, "src3" -> 0.5)
    val out = Curation.domainMix(docs, rates)
    val src1Total = docs.filter(col("source") === "src1").count()
    assert(out.filter(col("source") === "src1").count() == src1Total)
    assert(out.filter(col("source") === "src2").count() == 0)
    val kept3 = out.filter(col("source") === "src3").count()
    val total3 = docs.filter(col("source") === "src3").count()
    assert(kept3 > 0 && kept3 < total3)
    // deterministic: same selection on a second run
    val again = Curation.domainMix(docs, rates)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
  }

  test("unigram surprisal: uniform-random text scores near ln(vocab)") {
    // sanity on the LM shape: every doc's mean surprisal is positive and
    // bounded by ln(total_tokens) (a token seen once has the max surprisal)
    val s = Curation.unigramSurprisal(docs)
    assert(s.filter(col("surprisal") <= 0).count() == 0)
    val totalToks = s.agg(sum("n_tokens")).head.getLong(0).toDouble
    assert(s.filter(col("surprisal") > math.log(totalToks)).count() == 0)
  }

  test("tfidf top terms: ranks dense from 1, k bound respected") {
    val t = Curation.tfidfTopTerms(docs, 5)
    assert(t.filter(col("rank") < 1 || col("rank") > 5).count() == 0)
    val perDoc = t.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"))
    assert(perDoc.filter(col("n") =!= col("mx")).count() == 0)
    // a corpus-universal term (df = N) has idf 0 and can never outrank a
    // discriminative term with positive score
    assert(t.filter(col("tfidf") < 0).count() == 0)
  }

  test("c4 filters: flags are consistent with their inputs") {
    val f = Curation.c4Filters(docs)
    val bad = f.filter(
      (col("keep") === 1) && (col("n_words") < Curation.MinWords ||
        col("sum_word_len") < col("n_words") * 3 ||
        col("sum_word_len") > col("n_words") * 10 ||
        col("n_symbol") * 10 > col("n_words") ||
        col("has_brace") === 1 || col("has_lorem") === 1))
    assert(bad.count() == 0)
    // docs span 10..99 words with MinWords=50 → both classes non-empty
    assert(f.filter(col("keep") === 1).count() > 0)
    assert(f.filter(col("keep") === 0).count() > 0)
  }

  test("chunk near-dups: cross-doc only, LSH recall equals exact formulation") {
    val nd = Curation.chunkNearDups(docs, 0.85)
    // no same-document pair survives
    assert(nd.filter(floor(col("i") / Curation.ChunkIdBase) ===
      floor(col("j") / Curation.ChunkIdBase)).count() == 0)
    // exact cross-check: LSH-then-verify finds every exact shingle-share
    // pair at the threshold (the gate oracle is the exact formulation)
    val chunks = TextOps.chunk(docs, 40, 10)
      .select((col("doc_id") * Curation.ChunkIdBase + col("chunk_id")).as("doc_id"),
        col("chunk_text").as("text"))
    val exact = Dedup.ngramJaccardPairs(chunks, 0.85)
      .filter(floor(col("i") / Curation.ChunkIdBase) =!=
        floor(col("j") / Curation.ChunkIdBase))
      .select("i", "j")
    assert(nd.select("i", "j").exceptAll(exact).count() == 0)
    assert(exact.exceptAll(nd.select("i", "j")).count() == 0)
  }

  test("budget select: banded prefix sum equals the single-window greedy") {
    val sel = Curation.budgetSelect(docs, 600)
    val toks = TextOps.tokens(col("text"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs.select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_tokens"),
        floor(size(array_distinct(toks)) * 100 / size(toks)).cast("long")
          .as("score"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= 600)
      .select(col("doc_id"), col("source"), col("score"),
        col("n_tokens"), col("cum_tokens"))
    assert(sel.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(sel).count() == 0)
    // budget respected per source
    val over = sel.groupBy("source").agg(max("cum_tokens").as("mx"))
      .filter(col("mx") > 600)
    assert(over.count() == 0)
  }

  test("semantic dedup: canonical ids point to a kept lower id in the same cell") {
    val sd = Curation.semanticDedup(emb, 0.35)
    assert(sd.count() == emb.count())
    val dups = sd.filter(col("is_dup") === 1)
    // canonical strictly lower than the dup
    assert(dups.filter(col("canonical_id") >= col("vec_id")).count() == 0)
    // canonical is in the same cell
    val cells = sd.select(col("vec_id").as("canonical_id"),
      col("cell").as("canon_cell"))
    val crossCell = dups.join(cells, Seq("canonical_id"))
      .filter(col("cell") =!= col("canon_cell"))
    assert(crossCell.count() == 0)
    // non-dups have themselves as canonical
    assert(sd.filter(col("is_dup") === 0 &&
      col("canonical_id") =!= col("vec_id")).count() == 0)
  }
}
