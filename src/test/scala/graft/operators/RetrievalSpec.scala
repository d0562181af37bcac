package graft.operators

import graft.SparkSpec
import graft.functions.TextFns
import graft.queries.Retrieval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 retrieval + DSIR importance selection: ranking-math contracts
  * on synthetic corpora (the cross-engine value gate is the DuckDB
  * oracle; these specs pin the semantics the oracle can't explain —
  * monotonicity in tf, idf discrimination, target-likeness ordering)
  * and the scale-shape plan contracts.
  */
class RetrievalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def toksDf(docs: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .withColumn("__toks", TextFns.tokens(col("text")))
      .select(col("doc_id"), col("__toks"))
  }

  test("bm25: higher tf wins at equal doc length; absent docs don't rank") {
    val toks = toksDf(Seq(
      1L -> "hash hash hash pad",
      2L -> "hash pad pad pad",
      3L -> "pad pad pad pad"))
    val got = Retrieval.bm25(toks, Seq(1 -> Seq("hash")), k = 10)
      .select("doc_id", "score_micro", "rnk").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L),
      "doc 3 has no query term and must not appear")
    assert(got(0).getLong(1) > got(1).getLong(1))
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 2L), "dense ranks from 1")
  }

  test("bm25: rarer term contributes more than a corpus-wide term (idf)") {
    // 'rare' df=1, 'common' df=4: at equal tf and dl the rare-term doc
    // must outrank the common-term doc for a query naming both.
    val toks = toksDf(Seq(
      1L -> "rare pad",
      2L -> "common pad",
      3L -> "common x",
      4L -> "common y",
      5L -> "common z"))
    val got = Retrieval.bm25(toks, Seq(1 -> Seq("rare", "common")), k = 10)
      .select("doc_id", "rnk").collect()
    assert(got.head.getLong(0) == 1L, s"rare-term doc must rank first: ${got.toSeq}")
  }

  test("bm25: length normalization — same tf, shorter doc wins") {
    val toks = toksDf(Seq(
      1L -> "hash pad",
      2L -> "hash pad pad pad pad pad pad pad"))
    val got = Retrieval.bm25(toks, Seq(1 -> Seq("hash")), k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L))
  }

  private def langToksDf(docs: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "lang", "text")
      .withColumn("__toks", TextFns.tokens(col("text")))
      .select(col("doc_id"), col("lang"), col("__toks"))
  }

  test("dsir: pool docs sharing the target's bigrams are selected first") {
    // Target (en) speaks "good clean data"; pool doc 10 mimics it,
    // pool docs 11/12 speak disjoint bigrams. keepFrac=0.34 of 3 → 2
    // kept: the mimic plus the zero-feature doc 11 (logw 0) beats doc
    // 12 whose features are raw-only (negative log-ratio).
    val toks = langToksDf(Seq(
      (1L, "en", "good clean data good clean data good clean data"),
      (2L, "en", "good clean data good clean data"),
      (10L, "fr", "good clean data good clean data"),
      (11L, "fr", "zzz"),
      (12L, "fr", "bad junk rows bad junk rows bad junk rows")))
    val got = Retrieval.dsir(toks, col("lang") === "en", v = 64, keepFrac = 0.34)
      .select("doc_id", "logw_micro")
      .orderBy(col("logw_micro").desc, col("doc_id").asc).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(10L, 11L),
      s"expected the target-like doc then the neutral doc: ${got.toSeq}")
    assert(got(0).getLong(1) > 0L, "target-like doc carries positive log-weight")
    assert(got(1).getLong(1) == 0L, "doc with no in-space features scores 0")
  }

  test("dsir: keepFrac bounds the selected count (ceil)") {
    val toks = langToksDf(
      (1L to 4L).map(i => (i, "en", "good clean data")) ++
        (10L to 17L).map(i => (i, "fr", s"filler words number$i here")))
    val got = Retrieval.dsir(toks, col("lang") === "en", v = 64, keepFrac = 0.25)
    assert(got.count() == 2, "ceil(0.25 * 8) = 2")
  }

  test("phrases: overlap-counted positional matches, repeated-token edge, no Generate in the plan") {
    val toks = toksDf(Seq(
      1L -> "a a a b",        // "a a" matches at pos 1 AND 2 (overlap counted)
      2L -> "a b a b",        // "a a" never: lone a's must not match the pair
      3L -> "x a",            // contains first term but not the phrase
      4L -> "a a"))           // exact-length doc (size == phrase length)
    val got = Retrieval.phrases(toks, Seq(1 -> Seq("a", "a"), 2 -> Seq("a", "b")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1, 1L, 2L), (1, 4L, 1L),
      (2, 1L, 1L), (2, 2L, 2L)), s"got $got")

    // the scan is map-side: no positional explode (Generate) anywhere
    val plan = Retrieval.phrases(toks, Seq(1 -> Seq("a", "b")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"phrase scan must not explode:\n$plan")
  }

  test("graft_phrase_count is bit-identical to the composed HOF matcher, codegen and interpreted") {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Seq("a", "b", "c", "d")
    // random corpora incl. empty docs and doc-length == phrase-length
    val docs = (0 until 120).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    }
    val phrases = Seq(Seq("a"), Seq("a", "a"), Seq("a", "b"),
      Seq("b", "a", "c"), Seq("d", "d", "d", "d"), Seq.empty[String])
    for (cg <- Seq("true", "false")) {
      ss.conf.set("spark.sql.codegen.wholeStage", cg)
      for (ph <- phrases) {
        val df = docs.toDF("doc_id", "toks")
        val got = df.select(col("doc_id"),
          Retrieval.phraseCount(col("toks"), typedlit(ph)).as("nat"),
          Retrieval.phraseCountComposed(col("toks"), typedlit(ph)).as("hof"))
          .collect()
        got.foreach { r =>
          assert(r.getInt(1) == r.getInt(2),
            s"codegen=$cg phrase=$ph doc=${r.getLong(0)}: native ${r.getInt(1)} != composed ${r.getInt(2)}")
        }
      }
    }
    ss.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("rrfFuse: both-system docs beat single-system; reciprocal weighting; determinism") {
    val ss = spark; import ss.implicits._
    def rk(rows: (Long, Long, Long)*) =
      rows.toDF("query_id", "doc_id", "rnk")
    // doc 10 ranked by both systems (3rd + 3rd) must beat doc 20
    // (1st in one system only): 2/(60+3) > 1/61.
    val a = rk((1L, 20L, 1L), (1L, 10L, 3L))
    val b = rk((1L, 30L, 1L), (1L, 10L, 3L))
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.head._1 == 10L, s"consensus doc must win: ${got.toSeq}")
    assert(got.head._2 == 2L * math.round(1e6 / 63.0), "reciprocal micro sum")
    // 20 and 30 tie on score (both rank-1 singles) → doc_id order
    assert(got.map(_._1).toSeq == Seq(10L, 20L, 30L))
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 3L), "dense output ranks")
  }

  test("bm25 index: probe equals the direct path; query buckets prune partitions") {
    val base = java.nio.file.Files.createTempDirectory("bm25_idx").toString
    val toks = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("__toks"))
    Retrieval.writeBm25Index(toks, base)

    val direct = Retrieval.bm25TopK(spark, sf)
    val probe = Retrieval.bm25TopKIndexed(spark, base, Retrieval.Queries)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows(probe) == rows(direct), "index probe diverged from the direct scorer")

    // the probe plans as partition PRUNING on the postings scan: the
    // term-hash bucket set is a partition filter, not a post-scan one
    val plan = probe.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.nonEmpty && pf.exists(l => l.contains("bucket") &&
      (l.contains("IN") || l.contains("in("))),
      s"postings scan must prune by bucket:\n${pf.mkString("\n")}")

    // a disjoint-vocabulary query set reads nothing but still answers
    assert(Retrieval.bm25TopKIndexed(spark, base,
      Seq(1 -> Seq("zzzznotaword"))).count() == 0)
  }

  test("plan contracts: broadcast-pruned postings, no sort-merge join; dsir cut merges nothing on the driver") {
    val bm25Plan = Retrieval.bm25TopK(spark, sf).queryExecution.executedPlan.toString
    assert(bm25Plan.contains("BroadcastHashJoin"), "query-term prune must broadcast")
    assert(!bm25Plan.contains("SortMergeJoin"),
      "nothing in BM25 may shuffle both sides of a join")

    // the scoring stage: λ attach broadcasts, nothing sort-merges
    val toks = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        TextFns.tokens(col("text")).as("__toks"))
    val lambda = Retrieval.dsirLambda(toks, col("lang") === "en", Retrieval.DsirV)
    val scoredPlan = Retrieval.dsirScores(toks.filter(col("lang") =!= "en"),
      lambda, Seq("doc_id", "lang")).queryExecution.executedPlan.toString
    assert(scoredPlan.contains("BroadcastHashJoin"), "λ attach must broadcast")
    assert(!scoredPlan.contains("SortMergeJoin"),
      "λ attach and pool aggregation must never shuffle both join sides")

    // the cut: K ∝ corpus, so TakeOrderedAndProject (a K-row driver
    // merge) is the scale-killer this shape exists to avoid — the
    // bucketed cut must plan as filters, with no ordered driver merge.
    // Asserted on the LAZY releasable form: dsirSelect itself now
    // checkpoints its narrow result eagerly (the corpusPrepare
    // lifecycle), which would hide the cut's plan from the assertion.
    // λ is materialized first — its own top-V selection is a BOUNDED
    // TakeOrdered (512 rows, legitimate) that would otherwise trip
    // the no-driver-merge assertion aimed at the K ∝ corpus cut.
    val scored = Retrieval.dsirScores(toks.filter(col("lang") =!= "en"),
      lambda.localCheckpoint(), Seq("doc_id", "lang"))
    val (cut, release) = graft.operators.Packing.topFracSelectReleasable(
      scored, "doc_id", "logw_micro", Retrieval.DsirKeepFrac)
    val dsirPlan = cut.queryExecution.executedPlan.toString
    release()
    assert(!dsirPlan.contains("TakeOrderedAndProject"),
      s"the keep-fraction cut must not merge K rows on the driver:\n$dsirPlan")
    assert(!dsirPlan.contains("SortMergeJoin"),
      "the cut is filters over the scored frame — no joins at all")
  }

  test("dsirThreshold: the frozen stream threshold reproduces the batch keep-set (no boundary ties)") {
    // pool scores strictly graded (i repetitions of the target
    // phrase → logw affine in i) so the boundary is tie-free and the
    // threshold form can reproduce the cut EXACTLY
    val toks = langToksDf(
      (1L to 4L).map(i => (i, "en", "good clean data")) ++
        (1L to 8L).map(i => (i + 9L, "fr",
          Seq.fill(i.toInt)("good clean data").mkString(" "))))
    val kept = Retrieval.dsir(toks, col("lang") === "en", v = 64, keepFrac = 0.3)
    val thr = Retrieval.dsirThreshold(kept)
    val lambda = Retrieval.dsirLambda(toks, col("lang") === "en", 64)
    val streamed = Retrieval.dsirScores(toks.filter(col("lang") =!= "en"),
      lambda, Seq("doc_id", "lang"))
      .filter(col("logw_micro") >= thr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batchSet = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    // threshold admission ⊇ batch cut always; equal when the boundary
    // score is tie-free (this fixture's distinct per-doc scores)
    assert(streamed == batchSet, s"stream $streamed vs batch $batchSet")
  }
}
