package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval + distribution-matched selection over the `documents`
  * corpus — the two search-shaped operators a training-data pipeline
  * runs constantly: keyword retrieval (contamination probes, targeted
  * corpus inspection, eval-set neighborhood pulls) and importance
  * resampling (building a pretraining mix that matches a target
  * distribution).
  *
  * Both are fully oracle-gated (hash-compared against a DuckDB
  * restatement): scores are fixed-point micro-rounded BEFORE any
  * cross-engine sum/compare, the same convention the perplexity
  * family uses, so double math can never flip a hash.
  *
  * Scale shape (the 100 TB reading):
  *  - BM25: the corpus-sized frames are one explode→broadcast-prune
  *    (query terms are a driver-bounded literal; non-matching tokens
  *    never reach a shuffle) and one (term, doc) partial-aggregated
  *    count. df/idf frames are bounded by the query-term count and
  *    broadcast. Final top-k is a per-query window over only the
  *    matched postings — parallel across queries, which is the
  *    natural unit of a retrieval batch.
  *  - DSIR: the feature table is a bounded top-V TakeOrdered (the
  *    explicit-V stand-in for DSIR's fixed hash-bucket dimension);
  *    per-feature log-ratios are a V-row broadcast; scoring is
  *    map-side; selection is orderBy+limit → TakeOrderedAndProject,
  *    never a single-partition global window.
  */
object Retrieval {

  /** BM25 parameters — the standard defaults (Robertson & Zaragoza
    * 2009, "The Probabilistic Relevance Framework: BM25 and Beyond",
    * §3.3; also Lucene's defaults).
    */
  val K1 = 1.2
  val B = 0.75
  val TopK = 10

  /** The fixed retrieval batch: deterministic literal queries over
    * the fixture vocabulary. A production run swaps in its own query
    * table; everything downstream is agnostic to how many queries
    * arrive (they only widen the broadcast term list).
    */
  val Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("hash", "join"),
    2 -> Seq("window", "sort", "stream"),
    3 -> Seq("spark", "table", "scan"),
    4 -> Seq("batch", "merge"),
    5 -> Seq("slow", "query", "filter"))

  /** BM25 top-k per query (Okapi BM25, Lucene idf variant
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` — always ≥ 0, no negative
    * idf for >half-corpus terms).
    *
    * Per-(term, doc) contributions are micro-rounded to BIGINT before
    * the per-(query, doc) sum, so `score_micro` is integer-exact in
    * both engines; rank ties break by doc_id.
    */
  def bm25TopK(s: SparkSession, dir: String): DataFrame =
    bm25(TextPipeline.tokenizedDocs(s, dir).select(col("doc_id"), col("__toks")),
      Queries, TopK)

  /** Core BM25 over any `(doc_id, __toks)` frame — the library
    * surface; [[bm25TopK]] is the gated fixture binding. For a
    * corpus queried repeatedly, build the on-disk inverted index once
    * ([[writeBm25Index]]) and probe it with [[bm25TopKIndexed]] —
    * same scorer, so the two paths cannot diverge.
    */
  def bm25(toks: DataFrame, queryBatch: Seq[(Int, Seq[String])], k: Int): DataFrame = {
    val queryTerms = queryTermsDf(toks.sparkSession, queryBatch)
    val termSet = queryTerms.select("term").distinct()

    // 1-row corpus stats; broadcast into the scorer like block_by_time.
    val stats = toks.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(col("__toks"))).as("avgdl"))

    // Corpus-sized section: a codegen'd arrays_overlap prefilter drops
    // docs containing NO query term before they ever explode (at
    // corpus scale most docs match no query; skipping their explode is
    // the dominant saving), then the broadcast query-term join prunes
    // the surviving postings BEFORE any shuffle.
    val termList = queryBatch.flatMap(_._2).distinct.sorted
    val tf = postingsOf(
      toks.filter(arrays_overlap(col("__toks"), typedlit(termList))))
      .join(broadcast(termSet), "term")

    // Document frequency per query term — bounded by |terms|, broadcast.
    val dfc = tf.groupBy("term")
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))

    scoreAndRank(tf, dfc, stats, queryTerms, k)
  }

  private def queryTermsDf(s: SparkSession,
                           queryBatch: Seq[(Int, Seq[String])]): DataFrame = {
    import s.implicits._
    queryBatch.flatMap { case (qid, terms) => terms.map(t => (qid, t)) }
      .toDF("query_id", "term")
  }

  /** Raw postings of a tokenized corpus: one `(term, doc_id, dl, tf)`
    * row per distinct (term, doc).
    */
  private def postingsOf(toks: DataFrame): DataFrame =
    toks
      .select(col("doc_id"), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).cast("double").as("tf"))

  /** The shared BM25 scorer: postings ⋈ broadcast df ⋈ broadcast query
    * terms ⋈ 1-row stats → micro-rounded contributions → per-(query,
    * doc) sum → per-query top-k. Both the direct path and the
    * index-probe path end here.
    */
  private def scoreAndRank(tf: DataFrame, dfc: DataFrame, stats: DataFrame,
                           queryTerms: DataFrame, k: Int): DataFrame = {
    val contrib = tf
      .join(broadcast(dfc), "term")
      .join(broadcast(queryTerms), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib_micro",
        round(
          log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
            * (col("tf") * lit(K1 + 1.0))
            / (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
            * lit(1e6)).cast("long"))

    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(sum(col("contrib_micro")).as("score_micro"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id").cast("long"), col("doc_id"), col("score_micro"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Gated binding of the on-disk index probe: builds the inverted
    * index ONCE per (session, corpus dir) into a temp directory (the
    * production shape — an index is built once and probed per query
    * batch; re-building per probe would benchmark the build, not the
    * probe), then answers [[Queries]] through [[bm25TopKIndexed]].
    * Shares `bm25_topk`'s oracle SQL: the probe must reproduce the
    * direct scorer exactly, and the driver's hash gate now checks
    * that equality against DuckDB every round.
    */
  def bm25TopKViaIndex(s: SparkSession, dir: String): DataFrame =
    bm25TopKIndexed(s, indexFor(s, dir), Queries, TopK)

  // Temp index dirs are deleted at JVM exit (batch mains — Verify,
  // Bench — are the only users of this binding; a long-lived service
  // calls writeBm25Index with its own durable path instead).
  private val indexDirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Prewarm hook: build (or find) the session's on-disk inverted
    * index for `dir` — the artifact [[bm25TopKViaIndex]] and
    * [[hybridRrf]] probe.
    */
  private[queries] def warmBm25Index(s: SparkSession, dir: String): Unit = {
    indexFor(s, dir); ()
  }

  private def indexFor(s: SparkSession, dir: String): String =
    indexDirs.computeIfAbsent((graft.SessionCache.idOf(s), dir), { _ =>
      val path = java.nio.file.Files
        .createTempDirectory("graft_bm25_idx")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(path).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      writeBm25Index(
        TextPipeline.tokenizedDocs(s, dir).select(col("doc_id"), col("__toks")),
        path.toString)
      path.toString
    })

  /** Partition count of the on-disk inverted index: postings land in
    * `bucket = pmod(xxhash64(term), nBuckets)` directories, so a
    * query's scan prunes to the partitions its terms hash into — the
    * retrieval twin of the IVF layout's probing-as-partition-pruning
    * (Similarity.writeIvfIndex). 64 buckets ≈ 1.6% of a 100 TB
    * posting set scanned per single-term query, before row-group
    * min/max pruning on `term` (postings are sorted within each
    * bucket) cuts further.
    */
  val Bm25Buckets = 64

  /** Materialize the inverted index: term-bucketed postings (sorted
    * by term within each bucket for row-group pruning), a per-term
    * document-frequency table in the same bucket layout, and the
    * 1-row corpus stats. df/stats are fixed at build time — probing
    * never recomputes corpus statistics, which is what makes the
    * probe's cost independent of corpus size.
    */
  /** The index-layout frame behind [[writeBm25Index]]: bucketed
    * posting rows, shared with the streaming appender
    * ([[graft.streaming.Incremental.bm25IndexStream]]) so batch build
    * and incremental append cannot diverge on the layout.
    */
  private[graft] def bm25PostingRows(toks: DataFrame, nBuckets: Int): DataFrame =
    postingsOf(toks)
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets)).cast("int"))

  def writeBm25Index(toks: DataFrame, path: String,
                     nBuckets: Int = Bm25Buckets): Unit = {
    // `__batch=-1` second partition level: directory-compatible with
    // the streaming appender's `bucket=<b>/__batch=<n≥0>/` (same
    // convention as the IVF layout), so a batch-built index can be
    // seeded and then incrementally maintained in place. Probes
    // select explicit columns, so the extra level is invisible.
    bm25PostingRows(toks, nBuckets)
      .withColumn("__batch", lit(-1L))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("overwrite").partitionBy("bucket", "__batch")
      .parquet(s"$path/postings")
    writeBm25Stats(toks.sparkSession, path)
    graft.operators.Dedup.writeIndexGeometry(toks.sparkSession, path,
      bm25Geometry(nBuckets))
  }

  private[graft] def bm25Geometry(nBuckets: Int): Map[String, String] =
    Map("kind" -> "bm25", "buckets" -> nBuckets.toString)

  /** (Re)compute the df table and corpus stats FROM the postings
    * layout — the "segment merge" of this index. The streaming
    * appender writes postings only (df/stats of a growing corpus
    * cannot be maintained append-only); probes between refreshes use
    * build-time df, the standard stale-statistics trade of segmented
    * search indexes, and a refresh restores exact [[bm25]] parity.
    * Docs are counted from distinct posting (doc_id, dl) pairs, so a
    * zero-token doc leaves the denominators at refresh — it can never
    * match a query either way.
    */
  def writeBm25Stats(spark: SparkSession, path: String): Unit = {
    val postings = spark.read.parquet(s"$path/postings")
      .select("term", "doc_id", "dl", "bucket")
    postings.groupBy("term", "bucket")
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("term"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/terms")
    postings.select("doc_id", "dl").distinct()
      .agg(
        count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 top-k against a [[writeBm25Index]] layout. The query terms'
    * buckets are computed driver-side (bounded by |terms|) and become
    * a partition-pruning `bucket IN (...)` predicate on both the
    * postings and the df scans; the term equi-filter pushes into the
    * pruned row groups. Identical scorer to [[bm25]] —
    * RetrievalSpec gates indexed ≡ direct.
    */
  def bm25TopKIndexed(spark: SparkSession, path: String,
                      queryBatch: Seq[(Int, Seq[String])], k: Int = TopK,
                      nBuckets: Int = Bm25Buckets): DataFrame = {
    graft.operators.Dedup.requireIndexGeometry(spark, path, bm25Geometry(nBuckets))
    val queryTerms = queryTermsDf(spark, queryBatch)
    val termSet = queryTerms.select("term").distinct()
    // the write side's hash, evaluated on the driver-bounded term
    // list through the same Spark expression — never reimplemented
    val buckets = termSet
      .select(pmod(xxhash64(col("term")), lit(nBuckets)).cast("int").as("bucket"))
      .distinct().collect().map(_.getInt(0)).toSeq

    val tf = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*))
      .join(broadcast(termSet), "term")
      .select("term", "doc_id", "dl", "tf")
    val dfc = spark.read.parquet(s"$path/terms")
      .filter(col("bucket").isin(buckets: _*))
      .join(broadcast(termSet), "term")
      .select("term", "df")
    val stats = spark.read.parquet(s"$path/stats")
    scoreAndRank(tf, dfc, stats, queryTerms, k)
  }

  /** The fixed phrase batch for the gated query — exact multi-token
    * phrases over the fixture vocabulary (lengths 2 and 3, including
    * a repeated-token phrase, the classic positional-index edge
    * case: "table table" must NOT match a lone "table").
    */
  val Phrases: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("table", "table"),
    2 -> Seq("fast", "sort"),
    3 -> Seq("hash", "join"),
    4 -> Seq("slow", "query"),
    5 -> Seq("query", "key", "scan"))

  def phraseMatch(s: SparkSession, dir: String): DataFrame =
    phrases(TextPipeline.tokenizedDocs(s, dir).select(col("doc_id"), col("__toks")),
      Phrases)

  /** Exact phrase search: per (phrase, doc), the number of token
    * positions where the full phrase matches — the contamination
    * probe / quote-finder a corpus team runs constantly ("find every
    * doc containing this exact benchmark sentence").
    *
    * Spark-first shape: NO positional explode at all. The phrase
    * batch broadcasts (P rows); `array_contains` on the phrase's
    * first token is the codegen'd prefilter (docs without it never
    * evaluate the scan); the match count is one codegen'd
    * higher-order `filter(sequence(...), i -> slice(toks,i,m)=ph)`
    * over each surviving doc — occurrences COUNTED, overlaps
    * included, entirely map-side. The only exchange is the final
    * result sort (output-sized). At 100 TB this is a single corpus
    * scan regardless of phrase count.
    *
    * The size guard matters for the same reason as
    * [[withBigramsCol]]: Spark's `sequence(1, 0)` DESCENDS rather
    * than returning empty.
    */
  def phrases(toks: DataFrame, batch: Seq[(Int, Seq[String])]): DataFrame = {
    val s = toks.sparkSession
    graft.plans.GraftExtensions.ensureRegistered(s)
    import s.implicits._
    val ph = batch.toDF("phrase_id", "phrase")
    toks
      .join(broadcast(ph),
        array_contains(col("__toks"), element_at(col("phrase"), 1)))
      .select(col("phrase_id"), col("doc_id"),
        phraseCount(col("__toks"), col("phrase")).cast("long").as("n_matches"))
      .filter(col("n_matches") > 0)
      .orderBy(col("phrase_id"), col("doc_id"))
  }

  /** Occurrence count of one phrase in a token-array column — the
    * matcher shared by [[phrases]] and the streaming phrase firewall
    * ([[graft.streaming.Incremental.phraseFilterStream]]), so batch
    * sweep and ingest gate cannot diverge on match semantics. Native
    * codegen'd one-pass scan ([[graft.plans.PhraseCount]] — the
    * composed HOF form allocates an m-element `slice` per candidate
    * position and runs interpreted; spec-asserted bit-identical).
    */
  def phraseCount(toks: org.apache.spark.sql.Column,
                  phrase: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    call_function("graft_phrase_count", toks, phrase)

  /** Built-ins-only matcher (same sliding-window overlap-counted
    * semantics, interpreted HOF) — the oracle-portable restatement
    * [[graft.plans.PhraseCount]] is property-tested against. The size
    * guard matters: Spark's `sequence(1, 0)` DESCENDS rather than
    * returning empty.
    */
  def phraseCountComposed(toks: org.apache.spark.sql.Column,
                          phrase: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(size(toks) >= size(phrase),
      size(filter(
        sequence(lit(1), size(toks) - size(phrase) + lit(1)),
        i => slice(toks, i, size(phrase)) === phrase)))
      .otherwise(lit(0))

  /** True iff the token array contains ANY of the given phrases —
    * the map-side firewall predicate (first-token `array_contains`
    * short-circuits the window scan per phrase).
    */
  def containsAnyPhrase(toks: org.apache.spark.sql.Column,
                        batch: Seq[Seq[String]]): org.apache.spark.sql.Column =
    batch.filter(_.nonEmpty).map { ph =>
      array_contains(toks, ph.head) &&
        phraseCount(toks, typedlit(ph)) > 0
    }.reduceOption(_ || _).getOrElse(lit(false))

  /** Hybrid-retrieval fusion depth (each system contributes its top
    * 20) and the standard RRF constant (Cormack, Clarke & Buettcher
    * 2009, "Reciprocal Rank Fusion outperforms Condorcet and
    * individual Rank Learning Methods": k = 60).
    */
  val RrfN = 20
  val RrfK0 = 60

  /** Hybrid retrieval: BM25 keyword ranking and dense-embedding
    * cosine ranking fused by reciprocal-rank fusion — the shape every
    * retrieval-augmented pipeline runs (sparse + dense, then fuse).
    * Query q's keyword side is [[Queries]](q); its dense side is the
    * embedding at vec_id = q (the fixture's doc/vec ids align).
    */
  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    // Keyword leg probes the SAME on-disk inverted index the
    // `bm25_indexed` gate maintains (round-18 optimization): the
    // direct scorer re-ran the corpus-wide postings pass — explode +
    // (term, doc) aggregate — on every fusion call, while the probe
    // reads the 64-bucket-pruned postings the session already built
    // once. Identical scorer, identical df/stats (built from the same
    // corpus), so the fused output is bit-identical — RetrievalSpec
    // pins indexed ≡ direct and the hash gate re-checks end to end.
    val kw = bm25TopKIndexed(s, indexFor(s, dir), Queries, RrfN)
      .select(col("query_id"), col("doc_id"), col("rnk"))
    val emb = graft.Tables.embeddings(s, dir)
    val dense = graft.operators.Similarity.bruteForceTopK(
        emb.filter(col("vec_id").isin(Queries.map(_._1.toLong): _*))
          .select(col("vec_id").as("query_id"), col("embedding")),
        emb.select(col("vec_id").as("doc_id"), col("embedding")),
        k = RrfN, corpusId = "doc_id")
      .select(col("query_id"), col("doc_id"), col("rank").cast("long").as("rnk"))
    rrfFuse(Seq(kw, dense), TopK)
  }

  /** Reciprocal-rank fusion over any set of `(query_id, doc_id, rnk)`
    * rankings: score(q, d) = Σ_systems 1/(k0 + rank_s(q, d)), each
    * reciprocal micro-rounded to BIGINT before the sum (the engine's
    * standard integer-exact cross-engine convention), ties broken by
    * doc_id.
    *
    * Scale shape: inputs are already per-query top-N frames (bounded
    * by |queries|·N·|systems| rows), so the union + per-(query, doc)
    * sum + per-query window all run on result-sized data — the
    * corpus-sized work happened inside the upstream rankers.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = RrfK0): DataFrame = {
    val contribs = rankings
      .map(_.select(col("query_id"), col("doc_id"),
        round(lit(1e6) / (lit(k0.toDouble) + col("rnk"))).cast("long").as("__c")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
    contribs.groupBy("query_id", "doc_id")
      .agg(sum(col("__c")).as("rrf_micro"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** DSIR feature-space dimension and selection fraction. V explicit
    * top-count bigrams stand in for the paper's fixed hashed-n-gram
    * bucket dimension (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling", §3: bag-of-hashed-ngrams with
    * 10k buckets); an explicit vocabulary keeps the oracle portable
    * and the state just as driver-bounded (one TakeOrdered of V rows).
    */
  val DsirV = 512
  val DsirAlpha = 0.5
  val DsirKeepFrac = 0.25

  /** DSIR-style importance selection: score every candidate-pool doc
    * (lang ≠ 'en') by how much its bigram distribution looks like the
    * target (lang = 'en'), keep the top 25%.
    *
    * Weight per doc = Σ_f n_f(doc) · λ(f),
    * λ(f) = ln(p̂_target(f) / p̂_raw(f)) with add-α smoothing over the
    * V-feature space, micro-rounded per FEATURE (λ is one broadcast
    * V-row table), so per-doc sums are integer-exact cross-engine.
    * The paper samples with Gumbel noise ∝ these weights; the
    * deterministic top-fraction variant here is its testable core
    * (same ordering statistic) — noise would un-gate the oracle.
    *
    * Selection is [[graft.operators.Packing.topFracSelect]] — the
    * bucketed exact cut, NOT orderBy + limit(K). limit(K) plans as
    * TakeOrderedAndProject, whose driver merge holds K rows: with
    * K = ceil(0.25 · pool) that is a driver-side collect of a quarter
    * of the corpus (and an Int K overflows past ~2³¹ pool docs). The
    * bucketed cut keeps driver state at the ≤ nBuckets count table,
    * K stays a Long, and the kept set is a filter of the scored frame
    * — the batch twin of the frozen `minLogwMicro` threshold the
    * streaming firewall already deploys
    * ([[graft.streaming.Incremental.dsirFilterStream]]; derive its
    * threshold from this cut via [[dsirThreshold]]).
    */
  def dsirSelect(s: SparkSession, dir: String): DataFrame =
    dsir(TextPipeline.tokenizedDocs(s, dir)
        .select(col("doc_id"), col("lang"), col("__toks")),
      col("lang") === "en", DsirV, DsirKeepFrac,
      // λ memoized per (session, corpus) — the quantizer/BPE-merges
      // contract (round-18 optimization): λ is a TRAINED MODEL (the
      // paper trains importance weights once, then scores any
      // candidate pool under them); re-deriving it per invocation
      // re-ran the two corpus-wide bigram passes (top-V TakeOrdered +
      // the restricted count aggregate) that training pays once. The
      // V-row table localCheckpoints eagerly — driver-bounded, like
      // every other frozen-model artifact.
      precomputedLambda = trainedDsirLambda(s, dir))

  private val dsirLambdaCache = new graft.SessionCache[String]

  /** The gated binding's trained λ, memoized per (session, corpus) —
    * also the prewarm hook, so a service startup overlaps training
    * with the other model builds.
    */
  private[queries] def trainedDsirLambda(s: SparkSession, dir: String): DataFrame =
    dsirLambdaCache.getOrElseUpdate(s, dir)(
      dsirLambda(TextPipeline.tokenizedDocs(s, dir)
          .select(col("doc_id"), col("lang"), col("__toks")),
        col("lang") === "en", DsirV).localCheckpoint())

  /** Core DSIR selection over any `(doc_id, lang, __toks)` frame with
    * an arbitrary target predicate — the library surface;
    * [[dsirSelect]] is the gated fixture binding (target = English).
    * `precomputedLambda` lets a caller supply an already-trained λ
    * table (the train-once production contract); null trains one here.
    */
  def dsir(toks: DataFrame, isTarget: org.apache.spark.sql.Column,
           v: Int, keepFrac: Double,
           precomputedLambda: DataFrame = null): DataFrame = {
    val lambda =
      if (precomputedLambda != null) precomputedLambda
      else dsirLambda(toks, isTarget, v)

    // Map-side scoring of the candidate pool: explode_outer (keeps
    // zero-bigram docs) → broadcast LEFT join on the V-row λ table →
    // ONE per-doc aggregation. No doc-keyed join anywhere: a
    // re-attach join here would be corpus×corpus (SortMergeJoin) at
    // scale; this shape is broadcast + a single doc_id shuffle with
    // map-side partial aggregation.
    val scored = dsirScores(toks.filter(!isTarget), lambda, Seq("doc_id", "lang"))

    // K = ceil(keep_frac · pool) falls out of the cut's own bucket
    // table (scored has exactly one row per pool doc), so there is no
    // separate count job and no ordered driver merge anywhere — see
    // the selection note above. Output is the kept SET (the gate
    // sorts rows before hashing; an orderBy here would re-pay a
    // kept-set-sized sort for nothing).
    //
    // Releasable cut + narrow result pin (the corpusPrepare
    // lifecycle): the scored frame — a full bigram-scoring chain — is
    // persisted WITH lineage inside the cut (executor-loss-safe),
    // evaluated once, and its pin released as soon as the narrow
    // (doc_id, lang, logw_micro) kept set is materialized; without
    // the pin the kept set's two filter branches would re-run the
    // scoring chain once each at materialization.
    //
    // persist, NOT localCheckpoint (round-15): the kept frame is
    // keepFrac-sized — CORPUS-scale at the 100 TB target (25% of the
    // pool), not a bounded summary — and localCheckpoint's truncated
    // lineage would turn any executor loss after this point into a
    // job failure. Persist keeps the short deterministic lineage
    // (source → scoring chain → cut filter, all literals), so lost
    // blocks recompute; the recompute re-pays the scoring chain for
    // those blocks only — the documented price of recoverability,
    // the Corpus.prepare convention (Corpus.scala:87). Steady-state
    // cost vs the old localCheckpoint: none (same one eager
    // materialization); blocks are freed by SessionCache eviction
    // upstream or the ContextCleaner when the frame goes out of reach.
    val (kept, release) = graft.operators.Packing.topFracSelectReleasable(
      scored, "doc_id", "logw_micro", keepFrac)
    val out = kept.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize while the scored pin still serves
    release()
    out
  }

  /** The frozen streaming threshold implied by a batch
    * [[dsir]]/[[topFracSelect]] cut: the minimum `logw_micro` among
    * the kept rows — one bounded aggregate over the (already
    * result-sized) kept frame. [[graft.streaming.Incremental
    * .dsirFilterStream]] admits `logw_micro >= threshold`, which
    * reproduces the batch keep-set up to boundary-score ties (a
    * threshold cannot split a tie the way the id tiebreak does — the
    * documented batch/stream seam; on micro-rounded scores ties are
    * rare and the stream errs INCLUSIVE).
    */
  def dsirThreshold(kept: DataFrame): Long =
    kept.agg(min(col("logw_micro"))).head() match {
      case r if r.isNullAt(0) => Long.MaxValue // empty cut admits nothing
      case r => r.getLong(0)
    }

  /** Word bigrams, built in-plan (no shuffle): "tok[i] tok[i+1]".
    * The size guard matters: Spark's sequence(1, 0) DESCENDS ([1, 0])
    * rather than returning empty, so a 0/1-token doc would index past
    * the array end (ANSI error) without it.
    */
  private def withBigramsCol(toks: DataFrame): DataFrame =
    toks.withColumn("__bigrams",
      expr("CASE WHEN size(__toks) >= 2 THEN transform(sequence(1, size(__toks) - 1), " +
        "i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1))) " +
        "ELSE CAST(array() AS array<string>) END"))

  /** Train the DSIR λ table: `(f, lambda_micro)` over the top-`v`
    * corpus bigrams — one TakeOrdered + one bounded aggregate; the
    * result is V rows, broadcastable anywhere (including collected
    * into a frozen streaming firewall — see
    * [[graft.streaming.Incremental.dsirFilterStream]]).
    */
  def dsirLambda(toks: DataFrame, isTarget: org.apache.spark.sql.Column,
                 v: Int): DataFrame = {
    val occ = withBigramsCol(toks).select(col("doc_id"),
      isTarget.as("__tgt"), explode(col("__bigrams")).as("f"))

    // Feature space: top-V corpus bigrams (count desc, bigram asc) —
    // bounded state, deterministic, TakeOrdered not full sort.
    val feats = occ.groupBy("f").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("f").asc)
      .limit(v)
      .select("f")

    // Per-feature target/raw counts restricted to the V features.
    val counts = occ
      .join(broadcast(feats), "f")
      .groupBy("f")
      .agg(
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("__tgt"), 1L).otherwise(0L)).as("cr"))

    // Totals over the feature space (1 row), then λ_micro per feature.
    val totals = counts.agg(
      sum(col("ct")).cast("double").as("tt"),
      sum(col("cr")).cast("double").as("tr"))
    val lambda = counts.crossJoin(broadcast(totals))
      .withColumn("lambda_micro",
        round(
          log(((col("ct") + lit(DsirAlpha)) / (col("tt") + lit(DsirAlpha * v)))
            / ((col("cr") + lit(DsirAlpha)) / (col("tr") + lit(DsirAlpha * v))))
            * lit(1e6)).cast("long"))
      .select("f", "lambda_micro")

    lambda
  }

  /** Score a `(keyCols…, __toks)` frame under a trained λ table:
    * per-row importance log-weight (`logw_micro`) and in-space
    * feature count (`n_feats`). explode_outer keeps zero-bigram rows;
    * the λ attach broadcasts; the only shuffle is the per-key
    * aggregation (map-side partial).
    */
  def dsirScores(toks: DataFrame, lambda: DataFrame,
                 keyCols: Seq[String]): DataFrame =
    withBigramsCol(toks)
      .select(keyCols.map(col) :+ explode_outer(col("__bigrams")).as("f"): _*)
      .join(broadcast(lambda), Seq("f"), "left")
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(when(col("lambda_micro").isNotNull, 1L).otherwise(0L)).as("n_feats"),
        coalesce(sum(col("lambda_micro")), lit(0L)).as("logw_micro"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bm25_topk" -> (bm25TopK _),
    "bm25_indexed" -> (bm25TopKViaIndex _),
    "phrase_match" -> (phraseMatch _),
    "hybrid_rrf" -> (hybridRrf _),
    "dsir_select" -> (dsirSelect _))

  private def queriesValuesSql: String =
    Queries.flatMap { case (qid, terms) => terms.map(t => s"($qid, '$t')") }
      .mkString(", ")

  /** DuckDB restatements. Tokenization/normalization mirrors
    * TextPipeline's `toksSql` exactly (same normText contract); both
    * engines micro-round at the identical point.
    */
  /** The bm25 ranked-postings CTE chain (`t` … `r`), shared by the
    * `bm25_topk` oracle (cut at [[TopK]]) and the `hybrid_rrf` oracle
    * (keyword leg, cut at [[RrfN]]).
    */
  private def bm25RankedCtesSql(toksSql: String): String =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
       |                 AVG(len(toks)) AS avgdl FROM t),
       |q(query_id, term) AS (VALUES $queriesValuesSql),
       |tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t),
       |tf AS (SELECT term, doc_id, dl, CAST(COUNT(*) AS DOUBLE) AS tf
       |       FROM tok WHERE term IN (SELECT DISTINCT term FROM q)
       |       GROUP BY term, doc_id, dl),
       |dfc AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
       |        FROM tf GROUP BY term),
       |sc AS (SELECT q.query_id, tf.doc_id,
       |         CAST(SUM(CAST(round(
       |           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
       |           * (tf * ${K1 + 1.0}) / (tf + $K1 * (${1.0 - B} + $B * dl / avgdl))
       |           * 1000000) AS BIGINT)) AS BIGINT) AS score_micro
       |       FROM tf JOIN dfc USING (term) JOIN q ON q.term = tf.term, stats
       |       GROUP BY q.query_id, tf.doc_id),
       |r AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_micro,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY score_micro DESC, doc_id ASC) AS BIGINT) AS rnk
       |      FROM sc)""".stripMargin

  private def phrasesValuesSql: String =
    Phrases.map { case (pid, ph) =>
      s"($pid, [${ph.map(w => s"'$w'").mkString(", ")}])"
    }.mkString(", ")

  def oracles: Map[String, String] = {
    val normSql =
      "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
    val toksSql = s"list_filter(string_split($normSql, ' '), x -> x <> '')"
    val dotSql = (a: String, b: String) =>
      s"list_reduce(list_transform(range(1, len($a) + 1), " +
        s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
    Map(
      "bm25_topk" ->
        s"""WITH ${bm25RankedCtesSql(toksSql)}
           |SELECT query_id, doc_id, score_micro, rnk FROM r
           |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin,
      // the index probe must equal the direct scorer — same oracle
      "bm25_indexed" ->
        s"""WITH ${bm25RankedCtesSql(toksSql)}
           |SELECT query_id, doc_id, score_micro, rnk FROM r
           |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin,
      "phrase_match" ->
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |p(phrase_id, phrase) AS (VALUES $phrasesValuesSql),
           |m AS (SELECT phrase_id, doc_id,
           |        CAST(len(list_filter(range(1, len(toks) - len(phrase) + 2),
           |          i -> toks[i:i + len(phrase) - 1] = phrase)) AS BIGINT) AS n_matches
           |      FROM t, p WHERE len(toks) >= len(phrase))
           |SELECT phrase_id, doc_id, n_matches FROM m WHERE n_matches > 0
           |ORDER BY phrase_id, doc_id""".stripMargin,
      "hybrid_rrf" ->
        s"""WITH ${bm25RankedCtesSql(toksSql)},
           |e AS (SELECT vec_id, embedding AS v,
           |  sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings),
           |dq AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e
           |       WHERE vec_id IN (${Queries.map(_._1).mkString(", ")})),
           |dc AS (SELECT vec_id AS doc_id, v AS cv, nrm AS cn FROM e),
           |ds AS (SELECT query_id, doc_id,
           |  round(CASE WHEN qn * cn = 0 THEN 0.0
           |             ELSE ${dotSql("qv", "cv")} / (qn * cn) END, 6) AS cos
           |  FROM dq, dc WHERE query_id <> doc_id),
           |dr AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
           |         ORDER BY cos DESC, doc_id ASC) AS drnk FROM ds),
           |u AS (SELECT query_id, doc_id,
           |        CAST(round(1000000.0 / ($RrfK0 + rnk)) AS BIGINT) AS c
           |      FROM (SELECT query_id, doc_id, rnk FROM r WHERE rnk <= $RrfN
           |            UNION ALL
           |            SELECT query_id, doc_id, CAST(drnk AS BIGINT) AS rnk
           |            FROM dr WHERE drnk <= $RrfN)),
           |f AS (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_micro
           |      FROM u GROUP BY query_id, doc_id)
           |SELECT query_id, doc_id, rrf_micro,
           |  CAST(row_number() OVER (PARTITION BY query_id
           |    ORDER BY rrf_micro DESC, doc_id ASC) AS BIGINT) AS rnk
           |FROM f QUALIFY rnk <= $TopK ORDER BY query_id, rnk""".stripMargin,
      "dsir_select" ->
        s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
           |bg AS (SELECT doc_id, lang, unnest(
           |         [toks[i] || ' ' || toks[i + 1] for i in range(1, len(toks))]) AS f
           |       FROM t),
           |feats AS (SELECT f FROM (
           |  SELECT f, COUNT(*) AS n FROM bg GROUP BY f
           |  ORDER BY n DESC, f ASC LIMIT $DsirV)),
           |counts AS (SELECT bg.f,
           |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct,
           |    SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS cr
           |  FROM bg JOIN feats ON bg.f = feats.f GROUP BY bg.f),
           |totals AS (SELECT CAST(SUM(ct) AS DOUBLE) AS tt,
           |                  CAST(SUM(cr) AS DOUBLE) AS tr FROM counts),
           |lam AS (SELECT f, CAST(round(ln(
           |    ((ct + $DsirAlpha) / (tt + ${DsirAlpha * DsirV}))
           |    / ((cr + $DsirAlpha) / (tr + ${DsirAlpha * DsirV}))) * 1000000) AS BIGINT)
           |    AS lambda_micro
           |  FROM counts, totals),
           |ps AS (SELECT doc_id, COUNT(*) AS n_feats,
           |         CAST(SUM(lambda_micro) AS BIGINT) AS logw_micro
           |       FROM bg JOIN lam ON bg.f = lam.f
           |       WHERE lang <> 'en' GROUP BY doc_id),
           |pool AS (SELECT t.doc_id, t.lang,
           |           COALESCE(ps.n_feats, 0) AS n_feats,
           |           COALESCE(ps.logw_micro, 0) AS logw_micro
           |         FROM t LEFT JOIN ps ON t.doc_id = ps.doc_id
           |         WHERE t.lang <> 'en')
           |SELECT doc_id, lang, n_feats, logw_micro FROM pool
           |QUALIFY row_number() OVER (ORDER BY logw_micro DESC, doc_id ASC)
           |  <= ceil($DsirKeepFrac * COUNT(*) OVER ())
           |ORDER BY logw_micro DESC, doc_id ASC""".stripMargin)
  }
}
