package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the CCNet-style learned
  * fluency signal (Wenzek et al. 2020 score Common Crawl with a KenLM
  * 5-gram model and bucket the corpus by perplexity; GPT-3/LLaMA
  * pipelines keep the idea). This is the structural Spark-shaped
  * version: a vocab-capped BIGRAM model with Laplace smoothing,
  * trained and applied as pure relational aggregates — swap the order
  * or the smoothing constant and the shapes below do not change.
  *
  * Scale shape:
  *  - the VOCAB is top-V unigrams (deterministic count-desc, token-asc
  *    tiebreak) — V rows, driver/broadcast-sized BY CONSTRUCTION; every
  *    out-of-vocab token folds to `<unk>`, so model size is bounded
  *    regardless of corpus size (the KenLM pruning analogue);
  *  - unigram/bigram COUNTS are map-side-combinable groupBys over
  *    8-byte-ish keys — the corpus shuffles counts, never documents;
  *  - SCORING joins each doc's bigrams against the count tables:
  *    the unigram side broadcasts (≤ V+1 rows); the bigram side is a
  *    bounded-key equi-join (≤ (V+1)² distinct keys, Zipf-sparse in
  *    practice).
  *
  * Determinism contract (the repo-wide oracle rule: no cross-row
  * DOUBLE sums): each bigram's log-probability is quantized to
  * integer MICRO-units per row (deterministic given the row), summed
  * exactly as BIGINT, and converted to a double only at the output
  * boundary — partition order can never move the hash.
  */
object LanguageModel {

  val Unk = "<unk>"

  /** Top-`v` unigrams of a (doc_id, __toks) frame by corpus count —
    * count desc, token asc: deterministic under any partitioning.
    */
  def vocabTopV(toks: DataFrame, v: Int): DataFrame =
    toks.select(explode(col("__toks")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("token").asc)
      .limit(v)
      .select(col("token"))

  /** Tokens with out-of-vocab words folded to [[Unk]], keeping the
    * array form (bigrams need adjacency). The vocab collects to a
    * driver set — v-bounded by construction — and evaluates as a
    * codegen'd set membership inside the transform.
    */
  def remapToVocab(toks: Column, vocab: Seq[String]): Column =
    transform(toks, t => when(t.isInCollection(vocab), t).otherwise(lit(Unk)))

  /** Adjacent-bigram frame (doc_id, w1, w2) of a (doc_id, __toks)
    * frame — a per-row zip of the array with its own tail, then one
    * explode: no positional self-join, no shuffle.
    */
  def docBigrams(toks: DataFrame): DataFrame =
    toks
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("__toks"), lit(1), col("__n") - 1),
        slice(col("__toks"), lit(2), col("__n") - 1))).as("__bg"))
      .select(col("doc_id"),
        col("__bg.0").as("w1"), col("__bg.1").as("w2"))

  /** Per-doc bigram perplexity under a Laplace-smoothed vocab-capped
    * bigram model trained on the corpus itself (self-perplexity — the
    * standard corpus-filtering setup scores with a model trained on a
    * trusted corpus; the wiring is identical, `model` just comes from
    * elsewhere).
    *
    * p(w2|w1) = (c2(w1,w2) + 1) / (c1(w1) + v + 1), log-quantized to
    * micro-nats per bigram, summed exactly:
    * ppl = exp(−Σ round(10^6·ln p) / 10^6 / n).
    *
    * @param toks (doc_id, __toks) pre-tokenized docs
    * @param v    vocab cap (top-V unigrams; rest fold to `<unk>`)
    * @return (doc_id, n_bigrams, ppl) for docs with ≥ 2 tokens
    */
  def selfPerplexity(toks: DataFrame, v: Int): DataFrame =
    selfPerplexityReleasable(toks, v)._1

  /** [[selfPerplexity]] plus a release handle for the staged bigram
    * pin — repeated scoring over DIFFERENT corpora in one session
    * would otherwise accumulate bigram-row-sized (larger than the
    * corpus) cached blocks until LRU eviction. Callers release after
    * materializing the result (the [[graft.queries.TextPipeline]]
    * perplexity memo does; ad-hoc one-shot callers may use the plain
    * wrapper and rely on session end).
    */
  def selfPerplexityReleasable(toks: DataFrame, v: Int)
      : (DataFrame, () => Unit) = {
    val vocab = vocabTopV(toks, v).collect().map(_.getString(0)).toSeq
    val remapped = toks.select(col("doc_id"),
      remapToVocab(col("__toks"), vocab).as("__toks"))
    // pinned: the frame feeds c1, c2, AND the scoring join — without
    // it the tokenize→remap→explode chain runs three times (plus the
    // vocab pass). persist, NOT localCheckpoint: the frame is
    // bigram-row-sized (≈ token count, LARGER than the corpus row
    // count), so truncated lineage would make one executor loss
    // unrecoverable at scale; the kept lineage is a short
    // deterministic scan → remap (broadcast vocab) → explode chain.
    val bigrams = docBigrams(remapped)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // model counts: map-side-combinable, key-bounded
    val c1 = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("__c1"))
    val c2 = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("__c2"))
    (scoreBigrams(bigrams, c1, c2, v), () => { bigrams.unpersist(false); () })
  }

  /** A frozen bigram model: the deterministic vocab plus the two
    * count frames, both key-bounded (≤ v+1 and ≤ (v+1)² rows) and
    * eagerly pinned so consumers — including a streaming filter's
    * every micro-batch — never re-run the training aggregation.
    */
  final case class BigramModel(vocab: Seq[String], starts: DataFrame,
                               counts: DataFrame, v: Int)

  /** Train a frozen [[BigramModel]] on a reference corpus — the CCNet
    * setup (score candidate data with a model trained on TRUSTED
    * text); [[selfPerplexity]] is the degenerate same-corpus case.
    */
  def trainBigramModel(toks: DataFrame, v: Int): BigramModel = {
    val vocab = vocabTopV(toks, v).collect().map(_.getString(0)).toSeq
    val bigrams = docBigrams(toks.select(col("doc_id"),
      remapToVocab(col("__toks"), vocab).as("__toks")))
    BigramModel(vocab,
      bigrams.groupBy(col("w1")).agg(count(lit(1)).as("__c1"))
        .localCheckpoint(),
      bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c2"))
        .localCheckpoint(),
      v)
  }

  /** Per-doc perplexity of NEW documents under a frozen model: the
    * same scoring arithmetic as [[selfPerplexity]], with unseen
    * bigrams/starts smoothing from zero counts (left joins) — on the
    * training corpus itself every key is present, so the two paths
    * agree bit-for-bit.
    */
  def perplexityOf(toks: DataFrame, model: BigramModel): DataFrame =
    scoreBigrams(
      docBigrams(toks.select(col("doc_id"),
        remapToVocab(col("__toks"), model.vocab).as("__toks"))),
      model.starts, model.counts, model.v)

  /** Shared scorer: Laplace probability per bigram, micro-nat
    * integer log accumulation (the determinism contract), ppl per
    * doc. Left joins default absent model keys to count 0.
    */
  private def scoreBigrams(bigrams: DataFrame, c1: DataFrame,
                           c2: DataFrame, v: Int): DataFrame =
    bigrams
      .join(c2, Seq("w1", "w2"), "left")
      .join(broadcast(c1), Seq("w1"), "left")
      .withColumn("__lp_micro",
        round(log((coalesce(col("__c2"), lit(0L)) + 1.0) /
          (coalesce(col("__c1"), lit(0L)) + (v + 1).toDouble))
          * 1000000.0).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__lp_micro")).as("__lp_sum"))
      .withColumn("ppl", round(exp(
        -(col("__lp_sum").cast("double") / 1000000.0)
          / col("n_bigrams").cast("double")), 6))
      .select(col("doc_id"), col("n_bigrams"), col("ppl"))
}
