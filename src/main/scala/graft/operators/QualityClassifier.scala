package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Model-based document quality filtering — the GPT-3-style learned
  * classifier stage (Brown et al. 2020, appendix A: "a logistic
  * regression classifier ... with features from Spark's standard
  * tokenizer and HashingTF", kept with the Pareto-threshold rule
  * `np.random.pareto(α) > 1 − document_score`). The heuristic score
  * ([[TextFns.qualityScore]]) is the hand-written rule set; this is
  * the LEARNED counterpart every production corpus pipeline layers on
  * top, here as three pieces that all run inside whole-row projection
  * (zero shuffles on the scoring path):
  *
  *  - engine-portable feature hashing ([[hashBucket]]): bucket =
  *    uint32(md5[0:8]) mod d — md5 is md5 everywhere, so a DuckDB /
  *    Trino / Postgres oracle reproduces the exact feature map (the
  *    same portability contract as [[TextFns.contentHash]]; Spark's
  *    own `HashingTF` uses murmur3, which no portable SQL restates);
  *  - a scoring fold ([[score]]): σ(bias + Σ_tokens w[bucket(t)]) as
  *    one per-row lambda fold over the token array with the weight
  *    vector as a constant-folded array literal — no join against a
  *    weight table, no shuffle, and the fold order (0.0-seeded left
  *    fold, bias added after) is IEEE-identical to a seedless SQL
  *    `list_reduce`;
  *  - the Pareto acceptance rule ([[paretoKeep]]): deterministic
  *    U ∈ (0,1] from the content hash replaces `np.random` (same
  *    md5-prefix convention as [[graft.pipelines.Corpus.mixtureSample]]),
  *    so the kept set is reproducible and oracle-checkable while
  *    keeping the published rule's score-graded acceptance curve.
  *
  * Training ([[train]]) is full-batch gradient descent run AS Spark
  * aggregations: the model (d+1 doubles) lives on the driver — driver
  * -sized BY CONSTRUCTION like the IVF coarse quantizer — and each
  * iteration is ONE map-side-combinable aggregation over the persisted
  * feature frame (per-bucket residual sums; a sentinel bucket carries
  * the bias gradient so no second job). Nothing corpus-sized ever
  * reaches the driver; iterations cost one corpus-partition scan each
  * with ≤ (d+1)·partitions rows shuffled. Spark ML's LogisticRegression
  * would need a Vector-assembly UDF and brings its own iteration
  * machinery; this keeps the whole trainer in relational aggregates.
  *
  * Reference scope: the reference engine has no learned-filter
  * surface; this extends the training-data operator family (SURVEY §2
  * north-star operators) beside the heuristic `text_stats` signals.
  */
object QualityClassifier {

  /** Engine-portable hashed feature id in [0, d): the first 8 md5 hex
    * digits of the token as a uint32, mod d. */
  def hashBucket(token: Column, d: Int): Column =
    (conv(substring(md5(token.cast("binary")), 1, 8), 16, 10)
      .cast("long") % d).cast("int")

  /** Linear margin bias + Σ w[bucket(t)] over a token array, as ONE
    * codegen'd pass ([[graft.plans.HashedMargin]] — no per-token hex
    * string or base-conversion parse). The fold is seeded 0.0 with
    * bias added OUTSIDE, so engines whose reduce is seedless (DuckDB
    * `list_reduce`) restate it IEEE-exactly; an empty token array
    * scores exactly `bias`. Bit-identical to [[marginComposed]]
    * (property-tested).
    */
  def margin(toks: Column, weights: Array[Double], bias: Double): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.HashedMargin(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(toks),
        weights, bias))

  /** The built-ins-only formulation of [[margin]] — the portable
    * reference the native expression is property-tested against (and
    * the shape the DuckDB oracle restates).
    */
  private[graft] def marginComposed(toks: Column, weights: Array[Double],
                                    bias: Double): Column = {
    val w = array(weights.map(lit): _*)
    lit(bias) + aggregate(toks, lit(0.0),
      (acc, t) => acc + element_at(w, hashBucket(t, weights.length) + 1))
  }

  /** Classifier score σ(margin) ∈ (0, 1). */
  def score(toks: Column, weights: Array[Double], bias: Double): Column =
    lit(1.0) / (lit(1.0) + exp(-margin(toks, weights, bias)))

  /** GPT-3's acceptance rule with the RNG made content-deterministic:
    * keep iff pareto(α) > 1 − score, where pareto(α) = U^(−1/α) − 1
    * and U ∈ (0,1] is (uint32(md5(text)[0:8]) + 1) / 2^32. Documents
    * score-graded: a score of 1.0 keeps unless the content hash is
    * the single all-ones prefix (U = 1 ⇒ pareto = 0, a 2^−32 corner
    * where the strict `>` drops the doc — the oracle applies the
    * identical rule, so the gate cannot diverge); lower scores keep
    * with the published Pareto tail probability — reproducible across
    * runs and engines.
    */
  def paretoKeep(text: Column, scoreCol: Column, alpha: Double): Column = {
    val u = (conv(substring(TextFns.contentHash(text), 1, 8), 16, 10)
      .cast("double") + 1.0) / 4294967296.0
    pow(u, -1.0 / alpha) - 1.0 > lit(1.0) - scoreCol
  }

  /** Full-batch logistic-regression trainer over hashed token
    * features. Returns (weights, bias) — d+1 doubles, driver-sized by
    * construction. Deterministic given a deterministic input (zero
    * init, full-batch updates; per-partition sum order perturbs the
    * last ulp only).
    *
    * @param docs     training frame
    * @param textCol  document text (tokenized with [[TextFns.tokens]])
    * @param labelCol boolean/0-1 label (1 = high quality)
    * @param d        hashed feature dimension
    * @param iters    gradient steps (each = one pass over the
    *                 persisted feature frame)
    * @param lr       learning rate
    * @param l2       L2 regularization strength
    */
  def train(docs: DataFrame, textCol: Column, labelCol: Column,
            d: Int = 64, iters: Int = 60, lr: Double = 1.0,
            l2: Double = 0.0): (Array[Double], Double) = {
    // Features stage ONCE: per-doc bucket ids (with repetition — a
    // token occurring twice contributes its weight twice, matching
    // the scoring fold). persist keeps lineage (recoverable after
    // executor loss), unlike localCheckpoint — this frame is
    // corpus-sized.
    val feats = docs
      // null text/label rows would count in the denominator n but
      // emit NO gradient rows (explode(null) is empty) — silently
      // shrinking every update. Exclude them up front.
      .filter(textCol.isNotNull && labelCol.isNotNull)
      .select(labelCol.cast("double").as("__y"),
        transform(TextFns.tokens(textCol),
          t => hashBucket(t, d)).as("__b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = feats.count().toDouble // materializes the persist
    require(n > 0, "empty training frame")

    val w = Array.fill(d)(0.0)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val wl = array(w.map(lit): _*)
      // residual r = σ(margin) − y per doc; ∂L/∂w_k = Σ_docs r per
      // bucket OCCURRENCE (repetition = count weighting). The
      // sentinel bucket d rides the same explode so one aggregation
      // yields every gradient component including the bias.
      val g = feats
        .withColumn("__r",
          lit(1.0) / (lit(1.0) + exp(-(lit(b) + aggregate(col("__b"),
            lit(0.0), (acc, bk) => acc + element_at(wl, bk + 1)))))
            - col("__y"))
        .select(explode(concat(col("__b"), array(lit(d)))).as("__k"),
          col("__r"))
        .groupBy(col("__k")).agg(sum(col("__r")).as("__g"))
        .collect() // ≤ d+1 rows by construction
      val grad = Array.fill(d + 1)(0.0)
      g.foreach(r => grad(r.getInt(0)) = r.getDouble(1))
      var i = 0
      while (i < d) { w(i) -= lr * (grad(i) / n + l2 * w(i)); i += 1 }
      b -= lr * grad(d) / n
      it += 1
    }
    feats.unpersist()
    (w, b)
  }
}
