package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sequence packing for LLM training-data pipelines: assign documents
  * to fixed-token-budget chunks ("concat and chunk") by cumulative
  * token count.
  *
  * Scale shape: docs are SHARDED (here by `pmod(id, nShards)`; any
  * distribution key works) and each shard packs independently under a
  * per-shard running total — the window is `partitionBy(shard)`, never
  * global, so 1000 executors pack 1000 shards with no coordination and
  * no single-partition window (the round-1 scale-killer class). A doc
  * lands in the chunk its first token falls into:
  * `chunk = floor(cum_before / budget)` — deterministic integer
  * arithmetic, portable to any SQL oracle as a windowed SUM.
  */
object Packing {

  /** @param docs       input frame
    * @param idCol      unique orderable id (pack order within shard)
    * @param nTokensCol per-doc token count
    * @param budget     tokens per packed chunk (e.g. 4096)
    * @param nShards    parallel packing streams
    * @return input + (shard, n_tokens, cum_tokens, chunk_id)
    */
  def packByTokenBudget(docs: DataFrame, idCol: Column, nTokensCol: Column,
                        budget: Int, nShards: Int): DataFrame =
    packSharded(docs.withColumn("shard", pmod(idCol, lit(nShards)).cast("int")),
      idCol, nTokensCol, budget)

  /** Packing core over a PRE-ASSIGNED `shard` column and an arbitrary
    * in-shard order — the generalization that lets
    * [[deterministicShuffle]]'s (shard, pos) drive pack order instead
    * of raw ids ([[graft.pipelines.Corpus.prepare]]'s shuffled mode).
    * Same single per-shard windowed cumsum; `orderCol` must be unique
    * within a shard for a deterministic chunking.
    */
  def packSharded(docs: DataFrame, orderCol: Column, nTokensCol: Column,
                  budget: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", nTokensCol.cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("chunk_id",
        floor((col("cum_tokens") - col("n_tokens")) / budget).cast("long"))
  }

  /** Exact token-budget selection — "keep the highest-scored docs
    * until a global token budget B" (the FineWeb/Gopher-style
    * quality-cut step, made exact): under the total order
    * (score DESC, id ASC), keep every doc whose cumulative token
    * count BEFORE it is < B (the [[packByTokenBudget]] cum-before
    * convention — the crossing doc fills the budget).
    *
    * Scale shape — global order WITHOUT a global sort: scores are
    * coarse-bucketed into ≤ nBuckets+1 order-preserving ranges
    * (integer width from one min/max agg), per-bucket token totals
    * collect to the driver (bounded by nBuckets BY CONSTRUCTION),
    * and the descending cumsum over that tiny table decides each
    * bucket wholesale: buckets above the crossing keep everything,
    * buckets below drop everything, and ONLY the single boundary
    * bucket pays a fine ordered cumsum — a window over ~1/nBuckets
    * of the corpus, with the driver-computed token offset. A
    * score-tie pileup can widen the boundary bucket (worst case:
    * every doc shares one score → the fine window IS the corpus);
    * that skew is the documented cost of exactness, and nBuckets is
    * the knob.
    *
    * DETERMINISM REQUIREMENT (self-contained form): the staged pin is
    * released on return, so the scored projection recomputes at each
    * consumer materialization, and the driver-computed boundary/offset
    * constants assume every recomputation yields the same rows. The
    * source and score expression must therefore be deterministic — a
    * non-deterministic score (rand(), current_timestamp(), a mutating
    * source) silently skews the cut. For such sources use
    * [[budgetSelectReleasable]] and release only AFTER materializing
    * (the snapshot-consistent lifecycle).
    *
    * @param budget token budget B (kept iff cum_before < B)
    * @return the kept rows as the (idCol, nTokensCol, scoreCol)
    *         projection (the operator materializes exactly that)
    */
  def budgetSelect(docsIn: DataFrame, idCol: String, nTokensCol: String,
                   scoreCol: String, budget: Long,
                   nBuckets: Int = 1000): DataFrame = {
    // self-contained form: the staged pin is released on return, so
    // the returned plan recomputes the (narrow) staged projection at
    // materialization — once per consumer branch. Callers whose score
    // expression is an expensive chain, or who materialize the kept
    // set more than once, should use [[budgetSelectReleasable]] and
    // release after materializing (the Corpus.prepare lifecycle).
    val (kept, release) = budgetSelectReleasable(
      docsIn, idCol, nTokensCol, scoreCol, budget, nBuckets)
    release()
    kept
  }

  /** [[budgetSelect]] with the staged-frame pin surfaced: the scored
    * projection is persisted (MEMORY_AND_DISK — lineage kept, so an
    * executor loss recomputes lost blocks rather than failing the
    * job, the Corpus.prepare fault-tolerance contract at the 100 TB
    * target) and the caller unpersists via the returned release
    * handle AFTER materializing the kept set.
    */
  def budgetSelectReleasable(docsIn: DataFrame, idCol: String,
                             nTokensCol: String, scoreCol: String,
                             budget: Long, nBuckets: Int = 1000)
      : (DataFrame, () => Unit) = {
    // one pinned materialization serves all three consumers (min/max
    // agg, bucket-sum collect, kept filters): the score expression —
    // often a full tokenization chain — evaluates ONCE, and the
    // driver-side cumsum sees a consistent snapshot (the cut
    // constants stay correct after release because the source is
    // deterministic — the same contract every Spark recompute relies
    // on).
    val docs = docsIn.select(col(idCol), col(nTokensCol).cast("long").as(nTokensCol),
      col(scoreCol).cast("long").as(scoreCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val release = () => { docs.unpersist(blocking = false); () }
    val agg = docs.agg(min(col(scoreCol)), max(col(scoreCol))).head()
    if (agg.isNullAt(0)) return (docs.limit(0), release)
    val (mn, mx) = (agg.getLong(0), agg.getLong(1))
    val width = math.max(1L, (mx - mn) / nBuckets + 1)
    val bucketed = docs.withColumn("__bucket",
      floor((col(scoreCol).cast("long") - lit(mn)) / lit(width)).cast("long"))
    // ≤ nBuckets+1 rows by construction — the driver-side cumsum table
    val sums = bucketed.groupBy(col("__bucket"))
      .agg(sum(col(nTokensCol).cast("long")).as("__t")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    var cum = 0L; var boundary = -1L; var offset = 0L; var crossed = false
    for ((b, t) <- sums if !crossed) {
      if (cum + t <= budget) cum += t
      else { boundary = b; offset = cum; crossed = true }
    }
    val keepCols = docs.columns.map(col).toSeq
    if (!crossed) return (docs, release) // budget never exhausted — keep all
    val full = bucketed.filter(col("__bucket") > boundary).select(keepCols: _*)
    // fine pass: ONE boundary bucket, ordered (score desc, id asc),
    // cum-before rule with the driver-computed offset
    val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val edge = bucketed.filter(col("__bucket") === boundary)
      .withColumn("__cum", sum(col(nTokensCol).cast("long")).over(w))
      .filter(lit(offset) + col("__cum") - col(nTokensCol) < budget)
      .select(keepCols: _*)
    (full.unionByName(edge), release)
  }

  /** Exact top-K selection WITHOUT an ordered driver merge — the
    * count-based sibling of [[budgetSelect]] (n_tokens ≡ 1): keep
    * exactly the first `k` rows under the (score DESC, id ASC) total
    * order. `orderBy(...).limit(k)` plans as TakeOrderedAndProject,
    * which merges nParts·K rows ON THE DRIVER — fine for a top-100,
    * fatal when K ∝ corpus (a 25% keep of a billion-doc pool is a
    * 250M-row driver merge). Here the cut is derived, never merged:
    * coarse score buckets → per-bucket COUNTS to the driver
    * (≤ nBuckets+1 rows BY CONSTRUCTION) → descending cumsum decides
    * whole buckets, and only the single boundary bucket pays a fine
    * ordered rank (~1/nBuckets of the input; an all-ties pileup can
    * widen it — the documented cost of exactness, nBuckets the knob).
    * The kept set is returned as a FILTER of the input — no global
    * sort, no TakeOrdered, no driver rows beyond the count table.
    *
    * `scoreCol` must be a non-null integral column (the engine's
    * micro-rounding convention) so bucket arithmetic and row ordering
    * cannot disagree.
    *
    * DETERMINISM REQUIREMENT: same contract as [[budgetSelect]] — the
    * self-contained form recomputes the scored projection after the
    * driver derives the cut constants, so source and score must be
    * deterministic; otherwise use [[topKSelectReleasable]] and release
    * after materializing.
    */
  def topKSelect(docs: DataFrame, idCol: String, scoreCol: String,
                 k: Long, nBuckets: Int = 1000): DataFrame = {
    val (kept, release) = topSelect(docs, idCol, scoreCol, _ => k, nBuckets)
    release()
    kept
  }

  /** [[topKSelect]] with the staged-frame pin surfaced — see
    * [[budgetSelectReleasable]] for the lifecycle contract.
    */
  def topKSelectReleasable(docs: DataFrame, idCol: String, scoreCol: String,
                           k: Long, nBuckets: Int = 1000)
      : (DataFrame, () => Unit) =
    topSelect(docs, idCol, scoreCol, _ => k, nBuckets)

  /** [[topKSelect]] with K derived from the input size — keep the top
    * `ceil(frac · n)` rows. The count comes free from the same bucket
    * table that drives the cut, so no separate count job and no
    * Int-overflow K arithmetic anywhere (K stays a Long end to end).
    *
    * DETERMINISM REQUIREMENT: same contract as [[budgetSelect]] —
    * deterministic source and score, or use
    * [[topFracSelectReleasable]] and release after materializing.
    */
  def topFracSelect(docs: DataFrame, idCol: String, scoreCol: String,
                    frac: Double, nBuckets: Int = 1000): DataFrame = {
    val (kept, release) =
      topSelect(docs, idCol, scoreCol, n => math.ceil(frac * n).toLong, nBuckets)
    release()
    kept
  }

  /** [[topFracSelect]] with the staged-frame pin surfaced — see
    * [[budgetSelectReleasable]] for the lifecycle contract.
    */
  def topFracSelectReleasable(docs: DataFrame, idCol: String, scoreCol: String,
                              frac: Double, nBuckets: Int = 1000)
      : (DataFrame, () => Unit) =
    topSelect(docs, idCol, scoreCol, n => math.ceil(frac * n).toLong, nBuckets)

  private def topSelect(docsIn: DataFrame, idCol: String, scoreCol: String,
                        kOf: Long => Long, nBuckets: Int)
      : (DataFrame, () => Unit) = {
    // one pinned materialization serves both consumers (bucket-count
    // collect, kept filters) — same consistency contract as
    // [[budgetSelectReleasable]]; callers pass the narrow scored
    // projection. persist, NOT localCheckpoint: the staged frame is
    // corpus-sized, and truncated lineage would make an executor loss
    // unrecoverable at the 100 TB target — persist keeps the short
    // deterministic lineage so lost blocks recompute.
    val docs = docsIn.persist(StorageLevel.MEMORY_AND_DISK)
    val release = () => { docs.unpersist(blocking = false); () }
    val agg = docs.agg(min(col(scoreCol).cast("long")),
      max(col(scoreCol).cast("long"))).head()
    if (agg.isNullAt(0)) return (docs.limit(0), release)
    val (mn, mx) = (agg.getLong(0), agg.getLong(1))
    val width = math.max(1L, (mx - mn) / nBuckets + 1)
    val bucketed = docs.withColumn("__bucket",
      floor((col(scoreCol).cast("long") - lit(mn)) / lit(width)).cast("long"))
    // ≤ nBuckets+1 rows by construction — the driver-side cumsum table
    val counts = bucketed.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    val k = kOf(counts.map(_._2).sum)
    var cum = 0L; var boundary = -1L; var offset = 0L; var crossed = false
    for ((b, n) <- counts if !crossed) {
      if (cum + n <= k) cum += n
      else { boundary = b; offset = cum; crossed = true }
    }
    val keepCols = docs.columns.map(col).toSeq
    if (!crossed) return (docs, release) // k >= input size — keep all
    val full = bucketed.filter(col("__bucket") > boundary).select(keepCols: _*)
    // fine pass: ONE boundary bucket, row_number under the global
    // comparator, kept while the driver-computed offset + rank <= k
    val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
    val edge = bucketed.filter(col("__bucket") === boundary)
      .withColumn("__rn", row_number().over(w))
      .filter(lit(offset) + col("__rn") <= k)
      .select(keepCols: _*)
    (full.unionByName(edge), release)
  }

  /** Weighted sampling WITHOUT replacement — Efraimidis–Spirakis
    * (2006) order sampling, the quality-/length-weighted subsample
    * step of a corpus-curation pipeline ("keep K docs, longer/better
    * docs proportionally more likely, deterministic across re-runs
    * and engines"): each row draws a hash-uniform u ∈ (0,1) from the
    * md5 of its id and ranks by key = ln(u)/w (monotone in the
    * paper's u^(1/w)); the global top-K by key is EXACTLY a weighted
    * draw without replacement. No RNG — u is a pure function of the
    * id, so the sample is reproducible and order-independent, the
    * [[deterministicShuffle]] discipline applied to weighted choice.
    *
    * Scale shape: key derivation is map-side; the top-K is
    * `orderBy(...).limit(K)` → TakeOrderedAndProject (per-partition
    * K-heaps + a driver merge of nParts·K rows), never a global sort
    * (plan-asserted in PackingSpec). The key is micro-rounded to
    * BIGINT before ranking so the comparison is integer-exact across
    * engines (ties broken by id).
    *
    * Weight range: the fixed 1e6 micro scale resolves keys down to
    * |ln(u)/w| ≥ 5e-7, i.e. weights up to ~1e4 keep ≥ ~100 micro-units
    * of resolution for typical u. Far beyond that (w ≳ 2e6·|ln u|)
    * keys round to 0 and the draw degenerates to id order among the
    * heaviest rows. Callers with unbounded weights pre-normalize
    * (divide by max(w)) — E-S ordering is invariant under a positive
    * weight rescale, and the constant must stay shared with any oracle
    * restatement, so the scale is a documented contract, not adaptive.
    *
    * The contract is now ENFORCED in-plan: a weight that is
    * non-positive or beyond [[MaxSampleWeight]] raises a runtime
    * error on the offending ROW (an `raise_error` branch fused into
    * the key expression — zero extra jobs, map-side, fires only when
    * hit) instead of silently degenerating to id order. Callers with
    * unbounded weights pass `normalize = true`, which rescales by one
    * `max(w)` aggregate (E-S ordering is invariant under a positive
    * rescale, so the sample is identical to pre-divided weights).
    *
    * @param weightCol strictly-positive weight — violations raise at
    *                  runtime; see the weight range note above for
    *                  the supported magnitude
    * @param normalize divide weights by their global max first (one
    *                  extra aggregate job); use when weights are not
    *                  already bounded by [[MaxSampleWeight]]
    * @return (idCol, weight cols kept by caller, key_micro) — the K
    *         selected rows
    */
  def weightedSample(docs: DataFrame, idCol: Column, weightCol: Column,
                     k: Int, normalize: Boolean = false): DataFrame = {
    val w0 = weightCol.cast("double")
    val w =
      if (!normalize) w0
      else {
        // E-S is invariant under positive rescale: dividing by max(w)
        // brings any weight range into (0, 1] without changing the
        // selected set (ties in key_micro can shift only at the
        // micro-rounding seam, the documented resolution contract)
        val mx = docs.agg(max(w0)).head() match {
          case r if r.isNullAt(0) => 1.0
          case r => r.getDouble(0)
        }
        w0 / lit(if (mx > 0.0) mx else 1.0)
      }
    // loud-contract guard, fused into the key so column pruning can
    // never drop it: a non-positive weight flips the key sign, an
    // oversized one rounds every key to 0 — both silently reorder the
    // draw to id order, which no caller ever wants
    val wChecked = when(w <= lit(0.0) || w > lit(MaxSampleWeight),
      raise_error(concat(
        lit(s"weightedSample: weight "), w.cast("string"),
        lit(s" outside (0, $MaxSampleWeight] — pre-scale or pass normalize=true"))))
      .otherwise(w)
    // 8 hex chars = 32 bits; +0.5 keeps u strictly inside (0,1) so
    // ln(u) is finite and nonzero at both hash extremes
    val u = (conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    docs
      .withColumn("key_micro",
        round(log(u) / wChecked * lit(1e6)).cast("long"))
      .orderBy(col("key_micro").desc, idCol.asc)
      .limit(k)
  }

  /** Largest weight [[weightedSample]] accepts un-normalized: past
    * ~2e6·|ln u| the micro-rounded key collapses to 0 and the draw
    * degenerates to id order; 1e6 leaves margin for the small-|ln u|
    * tail while admitting every realistic raw count (token counts,
    * quality scores).
    */
  val MaxSampleWeight: Double = 1e6

  /** Reproducible global shuffle — the training-order step between
    * curation and packing: every epoch needs the corpus in a
    * different-but-reproducible random order, identical across
    * re-runs, cluster sizes, and engines (no RNG, no
    * `rand(seed)`-partition coupling). Order is the md5 of
    * (seed, id): changing `seed` ("epoch-0", "epoch-1", …) reshuffles;
    * fixing it makes the order a pure function of the data.
    *
    * Scale shape: shard = hash mod `nShards`, position = per-shard
    * rank — ONE hash-partitioned exchange and per-shard sorts, never a
    * global total-order sort; readers stream shards independently in
    * (shard, pos) order.
    *
    * @return input + (shard int, pos long) — pos is 1-based within
    *         shard, dense, gap-free
    */
  def deterministicShuffle(docs: DataFrame, idCol: Column, nShards: Int,
                           seed: String): DataFrame = {
    // 15 hex digits = 60 bits: inside Long range in both engines
    val h = conv(substring(md5(concat(lit(seed), idCol.cast("string"))
      .cast("binary")), 1, 15), 16, 10).cast("long")
    docs.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__h"), idCol)).cast("long"))
      .drop("__h")
  }

  /** The dual of packing: SPLIT each document into fixed token windows
    * of `chunkSize` every `stride` tokens (overlapping when
    * stride < chunkSize) — context-window chunking for embedding /
    * retrieval corpora. Pure per-row explode (no window, no shuffle):
    * each of 1000 executors chunks its own rows. Window starts are
    * 0, stride, 2·stride, … up to the last multiple of stride below
    * the token count, so every token is covered iff
    * stride <= chunkSize; empty docs yield no chunks.
    *
    * @param docs    input with `idCol` and a pre-staged token array
    *                `toksCol` (HOF cost contract: pass a materialized
    *                attribute, not an inline tokenize)
    * @return (id, chunk_start, chunk_tokens, chunk_text)
    */
  def chunkByTokenWindow(docs: DataFrame, idCol: Column, toksCol: Column,
                         chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize for full coverage")
    val n = size(toksCol).cast("long")
    docs
      .filter(size(toksCol) > 0)
      .withColumn("__start", explode(sequence(lit(0L),
        floor((n - 1L) / stride) * stride, lit(stride.toLong))))
      .select(idCol.as("id"),
        col("__start").as("chunk_start"),
        least(lit(chunkSize.toLong), n - col("__start")).as("chunk_tokens"),
        array_join(slice(toksCol, (col("__start") + 1L).cast("int"),
          lit(chunkSize)), " ").as("chunk_text"))
  }
}
