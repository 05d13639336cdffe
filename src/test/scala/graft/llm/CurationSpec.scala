package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

class CurationSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)
  private def emb = Tables.embeddings(spark, sf)

  test("bigram surprisal: one bigram per adjacent pair, scores strictly positive") {
    val out = Curation.bigramSurprisal(docs)
    val toks = docs.select(col("doc_id"),
      (size(TextOps.tokens(col("text"))) - 1).cast("long").as("want"))
    // n_bigrams = n_tokens - 1 for every doc with >= 2 tokens
    assert(out.join(toks, Seq("doc_id"))
      .filter(col("n_bigrams") =!= col("want")).count() == 0)
    // add-k smoothing keeps every probability < 1 → surprisal > 0
    assert(out.filter(col("surprisal") <= 0.0).count() == 0)
  }

  test("keepBestPerCluster keeps exactly the max-quality member per cluster") {
    val out = Curation.keepBestPerCluster(docs, 0.8)
    // exactly one kept per cluster
    val perCluster = out.groupBy(col("cluster_id"))
      .agg(sum(col("kept")).as("nk"), max(col("quality")).as("mq"))
    assert(perCluster.filter(col("nk") =!= 1).count() == 0)
    // and the kept one carries the cluster's max quality
    assert(out.filter(col("kept") === 1)
      .join(perCluster, Seq("cluster_id"))
      .filter(col("quality") =!= col("mq")).count() == 0)
    // every document appears exactly once
    assert(out.count() == docs.count())
  }

  test("leakageFreeSplit keeps every near-dup cluster on one side") {
    val out = Curation.leakageFreeSplit(docs, 0.8, trainPct = 90)
    assert(out.count() == docs.count())
    // no cluster straddles the boundary
    assert(out.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") =!= 1).count() == 0)
    // both sides populated at 90/10 on 500 docs (deterministic hash)
    val sides = out.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sides.keySet == Set("train", "eval"))
    assert(sides("train") > sides("eval"))
  }

  test("shardAssign: round-robin-after-sort keeps shards within one max doc") {
    val out = Curation.shardAssign(docs, 8)
    assert(out.count() == docs.count())
    assert(out.select(countDistinct(col("shard"))).collect()(0).getLong(0) == 8)
    val totals = out.groupBy(col("shard"))
      .agg(sum(col("n_tokens")).as("t")).collect().map(_.getLong(1))
    val maxDoc = out.agg(max(col("n_tokens"))).collect()(0).getLong(0)
    assert(totals.max - totals.min <= maxDoc,
      s"spread ${totals.max - totals.min} > max doc $maxDoc")
  }

  test("dsirResample: top-n is TakeOrderedAndProject; draw is deterministic") {
    val out = Curation.dsirResample(docs, col("source") === "src0", n = 20)
    // scale canary: the global top-n must compile to the distributed
    // partial-top-n operator, never a full global Sort
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(out.count() == 20)
    // deterministic across partition layouts
    val again = Curation.dsirResample(
      docs.repartition(7, col("doc_id")), col("source") === "src0", n = 20)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
    // higher-weight docs are favored: mean selected weight beats corpus mean
    val selMean = out.agg(avg(col("weight"))).collect()(0).getDouble(0)
    val allMean = Curation.dsirWeights(docs, col("source") === "src0")
      .agg(avg(col("weight"))).collect()(0).getDouble(0)
    assert(selMean > allMean, s"$selMean <= $allMean")
  }

  test("shardAssign distributed rank equals the single-window form") {
    // the range-partition + offset rank must only change the execution
    // shape, never the math: compare against the naive global window
    val out = Curation.shardAssign(docs, 8)
    val w = Window.orderBy(col("n_tokens").desc, col("doc_id").asc)
    val naive = docs.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("shard",
        pmod(row_number().over(w) - 1, lit(8)).cast("long"))
    assert(out.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(out).count() == 0)
  }

  test("shardAssign: no un-partitioned window over the corpus (plan canary)") {
    // an un-partitioned Window runs in ONE task; the only one allowed in
    // this plan is the per-partition-offset window, which sits over a
    // ≤#partitions-row Aggregate — anything else is the 100 TB killer
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = Curation.shardAssign(docs, 8).queryExecution.optimizedPlan
    val bad = plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
    }
    assert(bad.isEmpty,
      s"un-partitioned window over non-aggregated input:\n${bad.mkString("\n")}")
  }

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

  test("substring dedup: planted shared span is flagged, unique doc is clean") {
    val s = spark
    import s.implicits._
    val span = (1 to 12).map(i => s"shared$i").mkString(" ")
    val d = Seq(
      (1L, s"alpha beta $span gamma"),
      (2L, s"$span delta epsilon zeta"),
      (3L, (1 to 20).map(i => s"uniq3_$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.substringDups(d, 12).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    // docs 1 and 2 each contain the planted 12-token span once
    assert(byId(1L)._2 >= 1 && byId(2L)._2 >= 1)
    assert(byId(3L)._2 == 0)
    // window counts: len - w + 1
    assert(byId(1L)._1 == 15 - 12 + 1 && byId(3L)._1 == 20 - 12 + 1)
  }

  test("hybrid rrf: both-list docs beat single-list docs at equal rank; k bound") {
    val out = Ranking.hybridRrfTopK(docs, emb, graft.gates.LlmGates.Bm25Terms,
      0L, 100, 25).collect()
    assert(out.length <= 25)
    // ranks are dense 1..n and rrf is non-increasing with rank
    val byRank = out.sortBy(_.getAs[Long]("rank"))
    assert(byRank.map(_.getAs[Long]("rank")).toSeq == (1L to out.length).toSeq)
    val rrfs = byRank.map(_.getAs[Double]("rrf"))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
    // a doc present in BOTH pools at ranks (r1, r2) must outscore a doc
    // present only in one pool at rank min(r1, r2)
    byRank.foreach { r =>
      val (rb, rc) = (Option(r.getAs[java.lang.Long]("r_bm25")),
        Option(r.getAs[java.lang.Long]("r_cos")))
      assert(rb.isDefined || rc.isDefined)
    }
  }

  test("int8 quantization: codes bounded, reconstruction error within half a step") {
    val out = Similarity.scalarQuantize(emb)
    // code_sum of 64 codes in [0,255]
    assert(out.filter(col("code_sum") < 0 ||
      col("code_sum") > 255L * 64).count() == 0)
    // max reconstruction error <= half a quantization step of the widest
    // dimension (span/255/2), with rounding slack
    val spans = emb.select(posexplode(col("embedding").cast("array<double>"))
        .as(Seq("d", "x")))
      .groupBy("d").agg((max(col("x")) - min(col("x"))).as("span"))
    val worst = spans.agg(max(col("span"))).head().getDouble(0)
    val bound = worst / 255.0 / 2.0 + 1e-9
    assert(out.filter(col("max_abs_err") > bound).count() == 0,
      s"errors exceed half-step bound $bound")
  }

  test("quality score: kept iff rounded score >= 0.5; scores in (0,1)") {
    val out = Curation.qualityScore(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q > 0.0 && q < 1.0)
      assert((r.getAs[Long]("kept") == 1L) == (q >= 0.5))
    }
  }

  test("cdc chunks: partition the token stream; boundaries stable under prefix edit") {
    val s = spark
    import s.implicits._
    val out = TextOps.cdcChunks(docs)
    // per doc: chunks tile 1..n with no gaps or overlaps
    val toks = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).as("n"))
    val tiled = out.groupBy("doc_id")
      .agg(sum(col("n_tokens")).as("covered"), max(col("start_tok") +
        col("n_tokens") - 1).as("last_end"), count(lit(1)).as("nc"))
      .join(toks, "doc_id")
    assert(tiled.filter(col("covered") =!= col("n") ||
      col("last_end") =!= col("n")).count() == 0)
    // CDC selling point: prepending tokens shifts only the head — chunk
    // texts strictly after the first shared cut point are identical
    val baseText = (1 to 60).map(i => s"w$i").mkString(" ")
    val a = Seq((1L, baseText)).toDF("doc_id", "text")
    val b = Seq((1L, s"prefix0 prefix1 $baseText")).toDF("doc_id", "text")
    val ca = TextOps.cdcChunks(a).select("chunk_text").as[String].collect()
    val cb = TextOps.cdcChunks(b).select("chunk_text").as[String].collect()
    // everything after the first shared cut is unchanged: the chunk lists
    // share a common suffix covering all of the base doc's chunks except
    // (at most) its head chunk — the prefix region may or may not gain an
    // extra cut of its own, but no downstream boundary moves
    assert(ca.length >= 2 && cb.length >= 2,
      s"expected multiple chunks, got ${ca.length}/${cb.length}")
    val common = ca.reverse.zip(cb.reverse)
      .takeWhile { case (x, y) => x == y }.length
    assert(common >= ca.length - 1,
      s"CDC boundaries shifted under a prefix edit: only $common of " +
        s"${ca.length} base chunks survived")
  }
}
