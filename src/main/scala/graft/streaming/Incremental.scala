package graft.streaming

import graft.functions.TimeFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}

/** Incremental / micro-batch execution (SURVEY §2.9): the reference is
  * cron-driven batch with hand-rolled cursors (`ingestion_cursors` +
  * `startblock` resume). Structured Streaming subsumes that pattern:
  * the checkpoint IS the cursor (exactly-once file offsets), and
  * `Trigger.AvailableNow` gives "run as a job, process only what's
  * new, stop" — the cron-friendly shape.
  *
  * Two surfaces:
  *  - [[ingestIncrement]]: file-source stream → 6h-bucket-partitioned
  *    append, checkpointed. Re-running is a no-op until new files
  *    arrive; each run appends exactly the delta. This is the
  *    engine-native replacement for the reference's cursor loop.
  *  - [[userCursors]]: arbitrary keyed state via mapGroupsWithState —
  *    the running per-user max-event cursor (the same GREATEST-merge
  *    semantics as `merlin_etl.py:159-175`, but inside the engine).
  */
object Incremental {

  /** One micro-batch pass: consume new event files from `srcDir`,
    * append them to `destDir` partitioned by the 6h snapshot bucket,
    * checkpoint at `checkpointDir`, and stop when caught up.
    */
  def ingestIncrement(spark: SparkSession, srcDir: String, destDir: String,
                      checkpointDir: String): Unit = {
    val stream = spark.readStream.schema(graft.Tables.eventsSchema).parquet(srcDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.withColumn("bucket_unix", TimeFns.bucket6h(col("ts")))
          .write.mode("append").partitionBy("bucket_unix").parquet(destDir)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming verbatim-leak decontamination: consume new document
    * files from `srcDir`, drop every doc sharing an exact `k`-gram
    * with the STATIC holdout, append survivors to `destDir` — the
    * "benchmark firewall" run continuously in front of a training-data
    * lake instead of as a batch sweep.
    *
    * Execution shape: the holdout gram set and its Bloom filter are
    * built ONCE at query start (the holdout is small and static by
    * premise — the same premise as [[graft.operators.Decontam]]); each
    * micro-batch then runs the identical Bloom-prune → confirm-join →
    * anti-join composition via `foreachBatch`, so per-batch semantics
    * are EXACTLY the batch operator's (exact at any fpp) and the
    * checkpoint gives exactly-once file consumption. Stateless per
    * batch — no streaming state beyond the source offsets.
    *
    * @param holdoutToks static (…, __toks) frame of held-out docs
    * @return survivors schema: (doc_id, text)
    */
  def decontamStream(spark: SparkSession, srcDir: String,
                     holdoutToks: DataFrame, destDir: String,
                     checkpointDir: String, k: Int = 8,
                     fpp: Double = 0.01): Unit = {
    import graft.functions.TextFns
    import graft.operators.Decontam
    graft.plans.GraftExtensions.ensureRegistered(spark)
    // shared derivation with the batch operator — same gram unit,
    // same hash, same Bloom sizing (incl. the runtime-filter cap
    // raise), so stream and sweep can never diverge
    val holdoutGrams = Decontam.holdoutGramSet(holdoutToks, k)
    val nHoldout = math.max(holdoutGrams.count(), 1L)
    val bloom = Decontam.buildBloom(holdoutGrams, nHoldout, fpp)

    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(docsSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val leaked = Decontam.docGramHashes(
            batch.select(col("doc_id"),
              TextFns.tokens(col("text")).as("__toks")), k)
          .filter(call_function("graft_bloom_contains", lit(bloom), col("gram")))
          .join(holdoutGrams, Seq("gram"), "left_semi")
          .select(col("doc_id")).distinct()
        batch.join(leaked, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("text"))
          .write.mode("append").parquet(destDir)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming partial-copy decontamination — the winnow twin of
    * [[decontamStream]]: incoming docs are dropped when they share
    * ≥ `minShared` distinct winnowing fingerprints with the static
    * holdout (the partially-edited leak the exact-gram firewall
    * misses — see [[graft.operators.Decontam.winnowLeaks]]). Same
    * derivation sharing discipline: the holdout fingerprint set and
    * the per-batch scan both go through [[graft.operators.Decontam
    * .docWinnowFps]], so stream and batch sweep can never diverge on
    * the fingerprint unit. Stateless beyond source offsets; the
    * Bloom is built ONCE at query start. Survivors land partitioned
    * by micro-batch id (`__batch=`) with dynamic overwrite —
    * foreachBatch is at-least-once on side effects, so a replayed
    * batch overwrites its own partition instead of duplicating rows
    * (readers that don't want the provenance column just don't
    * select it).
    *
    * No corpus-docfreq boilerplate cap here: a stream has no corpus
    * to measure frequency over — pre-compute the cap into
    * `holdoutDocs` (drop its boilerplate fps) when template text is
    * a concern.
    *
    * @param holdoutDocs static (doc_id, text) frame of held-out docs
    * @return survivors schema: (doc_id, text)
    */
  def winnowDecontamStream(spark: SparkSession, srcDir: String,
                           holdoutDocs: DataFrame, destDir: String,
                           checkpointDir: String, k: Int = 8, w: Int = 10,
                           minShared: Int = 1, fpp: Double = 0.01): Unit = {
    import graft.operators.Decontam
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val holdoutFps = Decontam.docWinnowFps(holdoutDocs, col("text"), k, w)
      .select(col("fp")).distinct().localCheckpoint()
    val nHoldout = math.max(holdoutFps.count(), 1L)
    val bloom = Decontam.buildBloom(
      holdoutFps.select(col("fp").as("gram")), nHoldout, fpp)

    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(docsSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val leaked = Decontam.docWinnowFps(batch, col("text"), k, w)
          .filter(call_function("graft_bloom_contains", lit(bloom), col("fp")))
          .join(holdoutFps, Seq("fp"), "left_semi")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") >= minShared)
          .select(col("doc_id"))
        batch.join(leaked, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("text"))
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch").parquet(destDir)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming model-based quality filter — the learned-classifier
    * firewall ([[graft.operators.QualityClassifier]]) applied per
    * micro-batch: score each incoming doc under the frozen weights
    * and keep it by the content-deterministic Pareto rule. Both the
    * score and the draw are pure per-row expressions, so the whole
    * filter is STATELESS beyond source offsets and — because the
    * Pareto U comes from the content hash, not an RNG — a replayed
    * batch makes the identical keep decision; combined with the
    * `__batch=` dynamic-overwrite sink, the output is exactly-once.
    * Streaming keep set ≡ the batch filter over the same docs by
    * construction (the SAME `score`/`paretoKeep` columns — there is
    * no stream-specific scoring path to diverge).
    *
    * @return survivors schema: (doc_id, text, model_score)
    */
  def qualityFilterStream(spark: SparkSession, srcDir: String,
                          weights: Array[Double], bias: Double,
                          destDir: String, checkpointDir: String,
                          alpha: Double = 9.0): Unit = {
    import graft.operators.QualityClassifier
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(docsSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .withColumn("model_score", QualityClassifier.score(
            graft.functions.TextFns.tokens(col("text")), weights, bias))
          .filter(QualityClassifier.paretoKeep(
            col("text"), col("model_score"), alpha))
          .select(col("doc_id"), col("text"), col("model_score"))
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch").parquet(destDir)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming semantic-decontamination firewall — the frozen-holdout
    * twin of [[graft.operators.Similarity.semanticDecontam]]: arriving
    * embedded documents are scored against a FIXED holdout (benchmark)
    * split and admitted iff their nearest-holdout cosine stays under
    * `eps`. The holdout frame collects ONCE at stream start (it is
    * driver-sized by construction — the coarse-quantizer boundedness
    * argument) and every micro-batch scores through the same operator
    * call, so stream ≡ batch is by shared code, not reimplementation
    * (IncrementalSpec pins output ≡ batch-over-union). Stateless
    * beyond source offsets; `__batch=` dynamic overwrite ⇒
    * exactly-once on replay. The 100 TB shape: benchmark sets change
    * rarely — a NEW holdout means a new stream (and a batch back-scrub
    * of the already-admitted corpus), exactly like retraining the
    * quality/perplexity firewalls' frozen models.
    *
    * @return survivors schema: (vec_id, embedding)
    */
  def semanticDecontamStream(spark: SparkSession, srcDir: String,
                             holdout: DataFrame, eps: Double,
                             destDir: String, checkpointDir: String): Unit = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val vecSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    // pin the holdout once — semanticDecontam collects it per call,
    // and a per-batch re-collect of an unchanging frame is waste
    val frozenHoldout = holdout
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val q = spark.readStream.schema(vecSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // null-embedding arrivals PASS THROUGH rather than vanish: the
        // scorer's inner join on the (null) nearest id would silently
        // drop them, and a firewall must never silently lose data it
        // cannot judge (the substrScrubStream null-text convention) —
        // an unembeddable doc is not evidence of contamination
        val scored = graft.operators.Similarity.semanticDecontam(
          batch.filter(col("embedding").isNotNull), frozenHoldout, eps)
        batch.filter(col("embedding").isNull)
          .unionByName(batch.join(
            scored.filter(col("kept")).select("vec_id"), Seq("vec_id"),
            "left_semi"))
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch").parquet(destDir)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming perplexity firewall — the frozen-model twin of the
    * batch fluency ceiling ([[graft.pipelines.Corpus.prepare]]'s
    * `maxPpl` stage): incoming docs are scored under a
    * [[graft.operators.LanguageModel.BigramModel]] trained ONCE on a
    * trusted reference corpus (the CCNet setup) and dropped when
    * their perplexity exceeds the ceiling. The model's count frames
    * are pinned at training, so each micro-batch joins against
    * materialized key-bounded frames — no per-batch re-training.
    * Docs with < 2 tokens carry no perplexity and pass, identical to
    * the batch stage. Stateless beyond source offsets; `__batch=`
    * dynamic overwrite ⇒ exactly-once.
    *
    * @return survivors schema: (doc_id, text)
    */
  def perplexityFilterStream(spark: SparkSession, srcDir: String,
                             model: graft.operators.LanguageModel.BigramModel,
                             maxPpl: Double, destDir: String,
                             checkpointDir: String): Unit = {
    import graft.operators.LanguageModel
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(docsSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dropped = LanguageModel.perplexityOf(
          batch.select(col("doc_id"),
            graft.functions.TextFns.tokens(col("text")).as("__toks")),
          model)
          .filter(col("ppl") > maxPpl).select(col("doc_id"))
        batch.join(dropped, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("text"))
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch").parquet(destDir)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming DSIR firewall — the frozen-model twin of the batch
    * importance selection ([[graft.queries.Retrieval.dsir]]): incoming
    * docs are scored under a λ table trained ONCE
    * ([[graft.queries.Retrieval.dsirLambda]] on a reference
    * target/raw split) and kept when their importance log-weight
    * clears a frozen threshold. At stream time DSIR's keep-fraction
    * cut becomes a fixed `minLogwMicro` (derived at training from the
    * batch cut's boundary value) — a stream has no global rank, and a
    * threshold is how the paper's selection deploys online. λ is V
    * rows, passed as driver data and rebroadcast per batch; scoring
    * is the shared [[graft.queries.Retrieval.dsirScores]] map, so
    * batch and stream cannot diverge. Stateless beyond source
    * offsets; `__batch=` dynamic overwrite ⇒ exactly-once.
    *
    * @param lambdaRows the trained λ table, `(bigram, λ_micro)`
    * @return survivors schema: (doc_id, text, logw_micro)
    */
  def dsirFilterStream(spark: SparkSession, srcDir: String,
                       lambdaRows: Seq[(String, Long)],
                       minLogwMicro: Long, destDir: String,
                       checkpointDir: String): Unit = {
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(docsSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import batch.sparkSession.implicits._
        val lambda = lambdaRows.toDF("f", "lambda_micro")
        graft.queries.Retrieval.dsirScores(
          batch.select(col("doc_id"), col("text"),
            graft.functions.TextFns.tokens(col("text")).as("__toks")),
          lambda, Seq("doc_id", "text"))
          .filter(col("logw_micro") >= minLogwMicro)
          .select(col("doc_id"), col("text"), col("logw_micro"))
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch").parquet(destDir)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming weighted reservoir — the online form of
    * [[graft.operators.Packing.weightedSample]] (Efraimidis–Spirakis
    * order sampling). Because the E-S key is a PURE FUNCTION of
    * (id, weight) — a hash-uniform, no RNG — top-K-of-union equals
    * union-of-top-Ks re-topped: each micro-batch computes its local
    * top-K and merges it with the stored reservoir, keeping the
    * global top-K. The result after any batch is EXACTLY the batch
    * [[graft.operators.Packing.weightedSample]] over all documents
    * seen so far (spec-asserted across checkpointed restarts).
    *
    * State is the K-row reservoir parquet itself — bounded by K at
    * any stream length, no keyed state store; the merge is
    * idempotent (duplicate re-deliveries carry identical keys and
    * dedup by id), so replay after a checkpoint loss converges to
    * the same reservoir.
    *
    * Crash safety: each batch writes a NEW `__v=<batchId>` snapshot
    * directory and the merge reads the latest COMMITTED one
    * (marker-carrying — [[readReservoir]]), never overwriting the
    * file set it is reading. An in-place overwrite (the first-cut
    * form) had a delete-then-write window in which a crash lost the
    * reservoir unrecoverably — committed source batches are never
    * re-read, so offset replay could not reconstruct it. A replayed
    * batch whose own snapshot is NOT yet committed re-merges onto the
    * pre-batch snapshot and writes its `__v` dir fresh; a replayed
    * batch whose snapshot IS already committed (crash landed between
    * the marker write and the streaming checkpoint commit — by then
    * the pre-batch snapshot may already be pruned) is SKIPPED: the
    * committed `__v=batchId` dir is byte-for-byte the merge this
    * replay would recompute (the E-S key is a pure function of the
    * data), so re-running it would only read-and-overwrite the same
    * path, which Spark rejects. Older snapshots are pruned
    * best-effort after each commit.
    */
  def weightedReservoirStream(spark: SparkSession, srcDir: String,
                              reservoirDir: String, checkpointDir: String,
                              k: Int = 50): Unit = {
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(docsSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prev = latestReservoirVersion(batch.sparkSession, reservoirDir)
        // replay wedge guard: a committed __v == batchId means this
        // batch's merge already landed (the crash fell between the
        // marker write and the checkpoint commit). Re-merging would
        // read __v=batchId while overwriting the same path — Spark
        // rejects that — and the pre-batch snapshot may be pruned;
        // the committed snapshot IS this batch's deterministic
        // result, so the replay is a no-op. (if/else, NOT an early
        // return — `return` in a closure throws NonLocalReturnControl,
        // which on the streaming thread would fail the query.)
        //
        // ONLY equality is a legitimate replay: under the documented
        // crash window prev can never be strictly ahead of the batch
        // being delivered. prev > batchId means the streaming
        // checkpoint was lost/reset while the reservoir dir survived
        // (batch ids restarted at 0) — silently skipping would commit
        // every new batch up to the old version as processed and DROP
        // its data, so fail loudly instead.
        if (prev.exists(_ > batchId)) {
          throw new IllegalStateException(
            s"weightedReservoirStream: committed reservoir snapshot __v=${prev.get} " +
            s"is ahead of delivered batch $batchId — streaming checkpoint and " +
            s"reservoir dir '$reservoirDir' are out of sync (checkpoint reset/loss " +
            "with a surviving reservoir). Refusing to skip new data: clear the " +
            "reservoir dir or restore the matching checkpoint.")
        } else if (!prev.contains(batchId)) {
          val staged = batch.select(col("doc_id"),
            size(graft.functions.TextFns.tokens(col("text")))
              .cast("long").as("n_tokens"))
          // weight clamped to MaxSampleWeight, NOT normalize=true: the
          // merge compares key_micro ACROSS batches, so the key must
          // stay a pure function of (id, weight) — a per-batch max
          // rescale would make keys incomparable between batches. The
          // clamp keeps the key pure and defuses the poison pill a
          // single ≥1e6-token doc would otherwise arm (raise_error in
          // the key → batch never commits → every restart replays and
          // re-raises); docs at/beyond the clamp tie at max weight
          // (id-ordered among themselves), which is the documented
          // resolution limit, not data loss.
          val batchTop = graft.operators.Packing.weightedSample(
            staged, col("doc_id"),
            least(col("n_tokens") + 1,
              lit(graft.operators.Packing.MaxSampleWeight.toLong)), k)
            .select(col("doc_id"), col("n_tokens"), col("key_micro"))
          val merged = prev match {
            case None => batchTop
            case Some(v) => batchTop.unionByName(
                batch.sparkSession.read.parquet(s"$reservoirDir/__v=$v"))
              .dropDuplicates("doc_id")
              .orderBy(col("key_micro").desc, col("doc_id").asc)
              .limit(k)
          }
          // new snapshot dir — the read set above is never touched, so
          // a crash at ANY point leaves the previous committed snapshot
          // intact and the replayed batch simply re-merges onto it. The
          // explicit marker (created only after the write returns) is
          // the commit record — the session disables _SUCCESS files
          merged.write.mode("overwrite").parquet(s"$reservoirDir/__v=$batchId")
          val fs = new org.apache.hadoop.fs.Path(reservoirDir)
            .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
          fs.createNewFile(new org.apache.hadoop.fs.Path(
            s"$reservoirDir/__v=$batchId", CommitMarker))
          // prune superseded snapshots (best-effort: a crash here only
          // leaves extra committed dirs; reads always pick the latest)
          reservoirVersions(batch.sparkSession, reservoirDir)
            .filter(_ < batchId)
            .foreach(v => fs.delete(
              new org.apache.hadoop.fs.Path(s"$reservoirDir/__v=$v"), true))
        }
      }
      .start()
    q.awaitTermination()
  }

  /** Marker file recording a fully-written reservoir snapshot
    * (written AFTER the parquet write returns — the session disables
    * the committer's own _SUCCESS files).
    */
  private val CommitMarker = "_graft_committed"

  /** Committed (marker-carrying) reservoir snapshot versions under
    * `reservoirDir/__v=<batchId>/`, ascending.
    */
  private def reservoirVersions(spark: SparkSession, reservoirDir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(reservoirDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__v="))
      .filter(s => fs.exists(new org.apache.hadoop.fs.Path(s.getPath, CommitMarker)))
      .map(_.getPath.getName.stripPrefix("__v=").toLong)
      .sorted
  }

  private def latestReservoirVersion(spark: SparkSession,
                                     reservoirDir: String): Option[Long] =
    reservoirVersions(spark, reservoirDir).lastOption

  /** The current reservoir — the latest committed snapshot (empty
    * K-schema frame if none yet). The read-side twin of
    * [[weightedReservoirStream]]'s versioned layout.
    */
  def readReservoir(spark: SparkSession, reservoirDir: String): DataFrame =
    latestReservoirVersion(spark, reservoirDir) match {
      case Some(v) => spark.read.parquet(s"$reservoirDir/__v=$v")
      case None => spark.emptyDataFrame
        .withColumn("doc_id", lit(0L)).withColumn("n_tokens", lit(0L))
        .withColumn("key_micro", lit(0L)).limit(0)
    }

  /** Streaming exact-substring scrub firewall — the frozen-model twin
    * of the batch ExactSubstr removal
    * ([[graft.operators.Dedup.exactSubstrScrubOfTokens]]): a
    * reference corpus (which holds every canonical copy) trains a
    * duplicated-gram set ONCE
    * ([[graft.operators.Dedup.frozenDupGrams]]); arriving documents
    * have every span matching a frozen gram REMOVED (not dropped —
    * the doc survives minus its already-seen passages), through the
    * SHARED positioned-gram derivation and splice, so batch and
    * stream cannot diverge on span semantics. A stream has no global
    * first-occurrence order; the reference's copy is canonical by
    * contract — the same frozen-model reduction as the
    * DSIR/perplexity/phrase firewalls. Stateless beyond source
    * offsets; `__batch=` dynamic overwrite ⇒ exactly-once.
    *
    * @param dupGramRows frozen duplicated-gram hashes as a driver
    *                    Seq — this signature is for SMALL frozen sets
    *                    (benchmark/eval contamination references). At
    *                    minOcc=1 the gram set is ~reference token
    *                    count ([[graft.operators.Dedup
    *                    .frozenDupGrams]] size contract): a large
    *                    reference must NOT be collected — keep its
    *                    gram table in parquet and use
    *                    [[substrScrubStreamFromDir]], whose per-batch
    *                    join size-decides broadcast vs shuffle
    * @return survivors schema: (doc_id, n_tokens, n_removed,
    *         clean_text)
    */
  def substrScrubStream(spark: SparkSession, srcDir: String,
                        dupGramRows: Seq[Long], destDir: String,
                        checkpointDir: String, k: Int = 8): Unit =
    substrScrubStreamCore(spark, srcDir, destDir, checkpointDir, k,
      s => { import s.implicits._; dupGramRows.toDF("gram") })

  /** [[substrScrubStream]] with the frozen gram set read from parquet
    * instead of a driver Seq — the LARGE-reference form: the gram
    * table never touches the driver, and each micro-batch's gram join
    * is size-decided by Catalyst (broadcast when the set is small,
    * shuffled hash join when it exceeds the broadcast threshold).
    */
  def substrScrubStreamFromDir(spark: SparkSession, srcDir: String,
                               dupGramsDir: String, destDir: String,
                               checkpointDir: String, k: Int = 8): Unit =
    substrScrubStreamCore(spark, srcDir, destDir, checkpointDir, k,
      s => s.read.parquet(dupGramsDir))

  private def substrScrubStreamCore(spark: SparkSession, srcDir: String,
                                    destDir: String, checkpointDir: String,
                                    k: Int,
                                    gramsOf: SparkSession => DataFrame): Unit = {
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(docsSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dupGrams = gramsOf(batch.sparkSession)
        // coalesce: a null-text doc tokenizes to null __toks and the
        // splice would emit null n_tokens/clean_text. The firewall's
        // contract is "remove already-seen spans"; a null text holds
        // no span and passes through as an empty doc — the same
        // null-text pass-through as phraseFilterStream.
        graft.operators.Dedup.scrubByFrozenGrams(
          batch.select(col("doc_id"),
            graft.functions.TextFns.tokens(coalesce(col("text"), lit("")))
              .as("__toks")),
          dupGrams, k)
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch").parquet(destDir)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming phrase firewall: drop (or tag) arriving documents that
    * contain any of a frozen list of exact phrases — the
    * benchmark-sentence contamination gate run at ingest instead of as
    * a batch sweep. Per micro-batch one map-side filter through the
    * SHARED [[graft.queries.Retrieval.phraseCount]] matcher (same
    * tokenization, same overlap-counted sliding-window match as the
    * batch `phrase_match` query, so the two paths cannot diverge on
    * semantics); docs matching NO phrase pass through. No join, no
    * shuffle, no state beyond source offsets; exactly-once by
    * `__batch` dynamic overwrite.
    */
  def phraseFilterStream(spark: SparkSession, srcDir: String,
                         phrases: Seq[(Int, Seq[String])], destDir: String,
                         checkpointDir: String): Unit = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(docsSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // coalesce: a null-text doc tokenizes to null and the match
        // predicate evaluates null — without the coalesce, filter(!null)
        // silently DROPPED such rows as if contaminated. The firewall's
        // contract is "drop docs that MATCH a phrase"; a null text
        // matches nothing and passes through.
        batch
          .withColumn("__toks", graft.functions.TextFns.tokens(col("text")))
          .filter(!coalesce(graft.queries.Retrieval.containsAnyPhrase(
            col("__toks"), phrases.map(_._2)), lit(false)))
          .select(col("doc_id"), col("text"))
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch").parquet(destDir)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming MinHash-LSH index maintenance: arriving documents'
    * banded signatures append into the
    * [[graft.operators.Dedup.writeMinhashIndex]] layout — per
    * micro-batch one narrow map (the SHARED
    * `Dedup.minhashIndexRows` derivation: same shingling, signature
    * expression, and banding as the batch build and the batch pair
    * sweep) + a partitioned append under `part=<p>/__batch=<n≥0>/`
    * with dynamic overwrite (exactly-once on replay; the batch seed
    * lives at `__batch=-1`). Combined with
    * [[graft.operators.Dedup.minhashProbe]] this is incremental
    * near-dup dedup: each new batch probes the ever-growing index at
    * batch-joined cost, then appends itself — no state beyond source
    * offsets, no corpus-side recompute, unlike the batch sweep whose
    * self-join grows with the full corpus every run.
    */
  def minhashIndexStream(spark: SparkSession, srcDir: String, indexDir: String,
                         checkpointDir: String, shingleLen: Int = 3,
                         bands: Int = 16, rowsPerBand: Int = 8): Unit = {
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    // complete any crashed compaction swap BEFORE the stream starts:
    // a replayed batch must never probe a live tree missing merged
    // segments (round 18 — see Dedup.recoverPendingSwap)
    graft.operators.Dedup.recoverPendingMinhashSwap(spark, indexDir)
    val q = spark.readStream.schema(docsSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendToMinhashIndex(
          batch.select(col("doc_id"),
            graft.functions.TextFns.tokens(col("text")).as("__toks")),
          indexDir, batchId, shingleLen, bands, rowsPerBand)
      }
      .start()
    q.awaitTermination()
    // post-invocation maintenance at the quiescent point (round 18):
    // segment-merge once the committed batch count reaches the
    // spark.graft.index.autoCompactSegments threshold, bounding the
    // per-probe listing cost flat in stream lifetime
    graft.operators.Dedup.autoCompactMinhashIndex(spark, indexDir)
  }

  /** One micro-batch's append into the two-table LSH index layout
    * (the SHARED `Dedup.minhashIndexFrames` derivation; dynamic
    * overwrite under `__batch=<n>` ⇒ exactly-once on replay) — used
    * by both [[minhashIndexStream]] and [[minhashDedupStream]].
    */
  private def appendToMinhashIndex(toks: DataFrame, indexDir: String,
                                   batchId: Long, shingleLen: Int,
                                   bands: Int, rowsPerBand: Int): Unit = {
    // geometry sidecar, declared BEFORE any rows land (round 17): an
    // unseeded firewall CREATES the index (declares freely, the
    // writeMinhashIndex parameters), but a mis-parameterized appender
    // against an EXISTING index must fail loud here — appending under
    // the wrong partitioning and relabeling the sidecar would make
    // every later probe silently miss the previously-indexed rows
    graft.operators.Dedup.declareIndexGeometry(toks.sparkSession, indexDir,
      graft.operators.Dedup.minhashGeometry(shingleLen, bands, rowsPerBand,
        graft.operators.Dedup.MinhashParts))
    val (bandRows, sigRows) = graft.operators.Dedup.minhashIndexFrames(
      toks, shingleLen, bands, rowsPerBand, graft.operators.Dedup.MinhashParts)
    // repartition on the layout key before writing — the batch
    // builder's discipline (writeMinhashIndex). Without it every
    // session task writes into every `part=` directory, so each
    // append lands up to tasks×parts files (the ×30 rehearsal
    // measured 8,192 files for a 100 MB index after four waves —
    // 12 KB/file) and every later probe pays listing + footer +
    // tiny-split scheduling over all of them: at corpus scale the
    // FILE COUNT, not the byte count, becomes the probe's wall.
    // One batch-sized shuffle buys one file per partition per batch.
    bandRows.repartition(col("part"))
      .sortWithinPartitions(col("band"), col("bucket"))
      .withColumn("__batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("part", "__batch").parquet(s"$indexDir/bands")
    sigRows.repartition(col("spart"))
      .sortWithinPartitions(col("doc_id"))
      .withColumn("__batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("spart", "__batch").parquet(s"$indexDir/sigs")
  }

  /** Shared Hamming-index micro-batch append: banded survivor rows
    * under `part=/__batch=` dynamic overwrite plus the geometry
    * sidecar — all four perceptual firewalls route here so an
    * unseeded stream creates an index indistinguishable from a batch
    * [[graft.operators.Dedup.writeHammingIndex]] build.
    */
  private def appendToHammingIndex(sigs: DataFrame, indexDir: String,
                                   batchId: Long, maxDist: Int,
                                   alignCols: Seq[String] = Nil): Unit = {
    // declared BEFORE the rows land — the appendToMinhashIndex rule
    graft.operators.Dedup.declareIndexGeometry(sigs.sparkSession, indexDir,
      graft.operators.Dedup.hammingGeometry(maxDist,
        graft.operators.Dedup.HammingParts, alignCols))
    graft.operators.Dedup.hammingIndexRows(
        sigs, maxDist, graft.operators.Dedup.HammingParts, alignCols)
      // one file per partition per batch — the appendToMinhashIndex
      // file-compaction rule (and writeHammingIndex's own layout)
      .repartition(col("part"))
      .sortWithinPartitions(col("chunk"), col("piece"))
      .withColumn("__batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("part", "__batch").parquet(s"$indexDir/bands")
  }

  /** Streaming MinHash near-dup firewall — the production use of the
    * on-disk LSH band index: arriving documents are admitted iff they
    * are NOT an estimated-Jaccard-≥θ near-dup of an already-admitted
    * document; admitted documents join the index themselves. The
    * lexical twin of [[semanticDedupStream]], with the same
    * three-step per-micro-batch shape:
    *
    *  1. dedup WITHIN the batch by the full batch rule — the SHARED
    *     candidate sweep ([[graft.operators.Dedup
    *     .minhashCandidatesOfTokens]]: same shingling, signature
    *     expression, banding) at θ, connected components over the
    *     pair graph, min-doc_id keeps per component (the
    *     [[graft.operators.Dedup.componentLosers]] pruning path — no
    *     stream-specific dedup rule to diverge);
    *  2. drop batch survivors with an est_jaccard ≥ θ candidate
    *     against the index ([[graft.operators.Dedup.minhashProbe]] —
    *     partition-pruned to the ≤64 parts the batch's bands hash
    *     into, never a corpus scan);
    *  3. append survivors' banded rows under `part=<p>/__batch=<n>/`
    *     (dynamic overwrite ⇒ exactly-once) and the surviving
    *     documents under `__batch=<n>/` in destDir.
    *
    * Replay safety: the probe excludes `__batch = <current>`, so a
    * replayed micro-batch reproduces its original decisions instead
    * of colliding with its own appended signatures.
    *
    * Every step is deterministic (xxhash64 end to end), so unlike the
    * eps-chain caveat in SemDeDup the whole stream is EXACTLY
    * reproducible: IncrementalSpec asserts the streaming kept set ≡ a
    * sequential batch-by-batch application of the identical rule.
    * State is the on-disk index only — no keyed state, no corpus-side
    * recompute; each micro-batch costs O(batch) regardless of how
    * large the admitted corpus has grown.
    */
  def minhashDedupStream(spark: SparkSession, srcDir: String, indexDir: String,
                         destDir: String, checkpointDir: String,
                         threshold: Double = 0.5, shingleLen: Int = 3,
                         bands: Int = 16, rowsPerBand: Int = 8): Unit = {
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    // complete any crashed compaction swap BEFORE the stream starts:
    // a replayed batch must never probe a live tree missing merged
    // segments (round 18 — see Dedup.recoverPendingSwap)
    graft.operators.Dedup.recoverPendingMinhashSwap(spark, indexDir)
    val q = spark.readStream.schema(docsSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.operators.Dedup
        val toks = batch.select(col("doc_id"), col("text"),
          graft.functions.TextFns.tokens(col("text")).as("__toks"))
        val pairs = Dedup.minhashCandidatesOfTokens(
          toks.select(col("doc_id"), col("__toks")),
          shingleLen, bands, rowsPerBand)
          .filter(col("est_jaccard") >= threshold)
        val batchKept = toks.join(
          Dedup.componentLosers(pairs).withColumnRenamed("node", "doc_id"),
          Seq("doc_id"), "left_anti")
        // Existence probe through the Hadoop FileSystem API (the
        // [[semanticDedupStream]] keeper-probe lesson): an unseeded
        // index means the first batch has nothing to collide with.
        val bandsPath = new org.apache.hadoop.fs.Path(s"$indexDir/bands")
        val indexExists = bandsPath
          .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
          .exists(bandsPath)
        val indexHits =
          if (!indexExists) batchKept.limit(0).select(col("doc_id"))
          else Dedup.minhashProbe(
            batchKept.select(col("doc_id"), col("__toks")), indexDir,
            shingleLen, bands, rowsPerBand,
            excludeBatch = Some(batchId))
            .filter(col("est_jaccard") >= threshold)
            .select(col("probe_id").as("doc_id")).distinct()
        // decide once — the index append and the kept-corpus write
        // below must see the SAME survivor set, not re-run the probe
        val survivors = batchKept.join(indexHits, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        appendToMinhashIndex(
          survivors.select(col("doc_id"), col("__toks")),
          indexDir, batchId, shingleLen, bands, rowsPerBand)
        survivors.select(col("doc_id"), col("text"))
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch").parquet(destDir)
      }
      .start()
    q.awaitTermination()
    // post-invocation maintenance at the quiescent point (round 18)
    graft.operators.Dedup.autoCompactMinhashIndex(spark, indexDir)
  }

  /** COMPOSED streaming curation firewall — [[graft.pipelines.Corpus
    * .prepare]]'s stage chain run at ingest time as ONE stream:
    * exact dedup → MinHash near-dup firewall → quality floor →
    * (opt-in) frozen-bigram perplexity ceiling → (opt-in) semantic
    * benchmark decontamination, in the batch pipeline's stage order,
    * with the batch pipeline's per-stage row accounting written per
    * micro-batch. This is the 100 TB ingest shape: documents are
    * judged ONCE, on arrival, against state that grows only with the
    * ADMITTED corpus (an exact-fingerprint store and the MinHash band
    * index, both on-disk, both partition-pruned probes) — never by
    * re-sweeping the lake.
    *
    * Stage semantics are the batch stages' own, by shared code:
    *  1. EXACT — within-batch [[graft.operators.Dedup.exactSurvivors]]
    *     (keep-min per normalized-text fingerprint), then drop
    *     arrivals whose fingerprint is already in the admitted store
    *     (`indexDir/exact`, partitioned `part=pmod(fp,64)` — a probe
    *     reads ≤64 pruned partitions, never the store). Fingerprints
    *     of exact-stage SURVIVORS are recorded regardless of
    *     later-stage fate — the batch pipeline's sequential-stage
    *     semantics, where a dup of a later-dropped junk doc is still
    *     a dup (stage 1 runs before quality there too).
    *  2. NEAR-DUP — [[minhashDedupStream]]'s exact rule, inlined:
    *     within-batch candidates → component min-id keeps, then the
    *     band-index probe, then survivors join the index.
    *  2b. SEMDEDUP (opt-in, `semanticEps`+`semanticCentroids`) — the
    *     batch pipeline's stage-2b ([[graft.pipelines.Corpus.prepare]])
    *     as [[semanticDedupStream]]'s per-batch rule: within-batch
    *     SemDeDup under the FROZEN quantizer (same assignment, pair
    *     blocking, components, least-prototypical keep), then drop
    *     survivors within eps of an already-admitted keeper in their
    *     cluster (keeper scan pruned to the batch's clusters),
    *     survivors appending themselves to the keepers index at
    *     `indexDir/semkeep` (the writeIvfIndex layout). The quantizer
    *     MUST be frozen — retraining it re-keys the keeper layout,
    *     which is a rebuild, not maintenance. Docs without an
    *     embedding pass untouched (the stage-5 rule).
    *  3. QUALITY — `TextFns.qualityScoreOf ≥ minQuality`, the batch
    *     stage-3 rule, map-only.
    *  4. PPL (opt-in, `pplModel`+`maxPpl`) — the frozen-model
    *     [[perplexityFilterStream]] rule: <2-token docs carry no
    *     perplexity and pass.
    *  5. SEMANTIC (opt-in, `decontamHoldout`) — the frozen-holdout
    *     [[semanticDecontamStream]] rule; null-embedding arrivals
    *     pass this stage untouched (never silently lose data the
    *     scorer cannot judge).
    *
    * The single tokenization pass is staged per batch and reused by
    * shingling, quality, and perplexity — the batch pipeline's
    * discipline. Replay safety: both state probes exclude
    * `__batch = <current>` and all writes are dynamic partition
    * overwrites, so a replayed micro-batch reproduces its original
    * decisions exactly-once. Per-stage counts land under
    * `destDir/_accounting/__batch=<n>/` (underscore-prefixed, so
    * corpus readers of `destDir` never see it); disabled stages
    * record -1, the [[graft.pipelines.Corpus.PrepareStats]]
    * convention.
    *
    * Source schema: (doc_id long, text string, embedding
    * array&lt;float&gt; nullable — may be entirely null when the
    * semantic stage is off).
    */
  def curationFirewallStream(spark: SparkSession, srcDir: String,
                             indexDir: String, destDir: String,
                             checkpointDir: String,
                             jaccard: Double = 0.5, minQuality: Double = 0.3,
                             shingleLen: Int = 3, bands: Int = 16,
                             rowsPerBand: Int = 8,
                             semanticEps: Double = 0.0,
                             semanticCentroids: DataFrame = null,
                             pplModel: graft.operators.LanguageModel.BigramModel = null,
                             maxPpl: Double = 0.0,
                             decontamHoldout: DataFrame = null,
                             decontamEps: Double = 0.8,
                             withStats: Boolean = true): Unit = {
    import graft.operators.Dedup
    import graft.functions.TextFns
    graft.plans.GraftExtensions.ensureRegistered(spark)
    require(semanticEps <= 0.0 || semanticCentroids != null,
      "curationFirewallStream: semanticEps > 0 needs a FROZEN semanticCentroids " +
        "quantizer (train once outside the stream — retraining re-keys the " +
        "keeper layout, which is a rebuild, not maintenance)")
    // keepers-index geometry (the semanticDedupStream rule): quantizer
    // checksum + eps, computed once per stream call
    val semKeeperGeo =
      if (semanticEps <= 0.0) Map.empty[String, String]
      else {
        val (ids, vecs) =
          graft.operators.Similarity.collectQuantizer(semanticCentroids)
        graft.operators.Similarity.ivfGeometryOf(ids, vecs) +
          ("eps" -> semanticEps.toString)
      }
    val ExactParts = 64
    // pin the frozen holdout once (the semanticDecontamStream lesson:
    // a per-batch re-collect of an unchanging frame is waste)
    val frozenHoldout =
      if (decontamHoldout == null) null
      else decontamHoldout.select(col("vec_id"), col("embedding")).localCheckpoint()
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    // complete any crashed compaction swap BEFORE the stream starts:
    // a replayed batch must never probe a live tree missing merged
    // segments (round 18 — see Dedup.recoverPendingSwap)
    graft.operators.Dedup.recoverPendingSwap(spark, s"$indexDir/exact", "part")
    graft.operators.Dedup.recoverPendingMinhashSwap(spark, indexDir)
    graft.operators.Dedup.recoverPendingSwap(spark, s"$indexDir/semkeep", "centroid")
    val q = spark.readStream.schema(docsSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val hconf = s.sparkContext.hadoopConfiguration
        def exists(p: String): Boolean = {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(hconf).exists(hp)
        }
        // pin the micro-batch once: the accounting count and the
        // stage chain consume it several times, and an unbuffered
        // batch frame re-reads the source files per consumer (the ×10
        // rehearsal measured 2-3 source scans per trigger without it)
        val staged = batch.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nInput = if (withStats) staged.count() else -1L

        // single staged tokenization, reused by stages 2-4
        val toks = staged.withColumn("__toks", TextFns.tokens(col("text")))

        // ---- stage 1: exact -------------------------------------
        // localCheckpoint: the within-batch survivor frame feeds the
        // partition-prune collect, the store anti-join, and (through
        // exactKept) the fingerprint-store write — un-pinned, the
        // fingerprint+window pipeline executed up to three times per
        // micro-batch (round-16 advisor finding; only `staged` was
        // cached, not this derived frame)
        val within = Dedup.exactSurvivors(toks, col("doc_id"), col("text"))
          .withColumn("__fp", TextFns.fingerprint(col("text")))
          .withColumn("__part", pmod(col("__fp"), lit(ExactParts)).cast("int"))
          .localCheckpoint()
        val exactStatePath = s"$indexDir/exact"
        val exactGeometry = Map("kind" -> "exact_fp", "parts" -> ExactParts.toString)
        val exactKept =
          if (!exists(exactStatePath)) within // already pinned above
          else {
            graft.operators.Dedup.requireIndexGeometry(s, exactStatePath,
              exactGeometry)
            // reads the pinned `within`, so the prune list costs one
            // scan of the materialized frame, not a pipeline re-run
            val parts = within.select(col("__part")).distinct()
              .collect().map(_.getInt(0)).toSeq
            val seen = s.read.parquet(exactStatePath)
              .filter(col("part").isin(parts: _*))
              .filter(col("__batch") =!= batchId)
              .select(col("fp").as("__fp"))
            within.join(seen, Seq("__fp"), "left_anti").localCheckpoint()
          }
        exactKept.select(col("__fp").as("fp"), col("__part").as("part"))
          // one file per partition per batch — the appendToMinhashIndex
          // file-compaction rule (this store is probed every batch)
          .repartition(col("part"))
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("part", "__batch").parquet(exactStatePath)
        graft.operators.Dedup.writeIndexGeometry(s, exactStatePath, exactGeometry)

        // ---- stage 2: near-dup (the minhashDedupStream rule) ----
        val pairs = Dedup.minhashCandidatesOfTokens(
          exactKept.select(col("doc_id"), col("__toks")),
          shingleLen, bands, rowsPerBand)
          .filter(col("est_jaccard") >= jaccard)
        val batchKept = exactKept.join(
          Dedup.componentLosers(pairs).withColumnRenamed("node", "doc_id"),
          Seq("doc_id"), "left_anti")
        val bandsPath = s"$indexDir/bands"
        val indexHits =
          if (!exists(bandsPath)) batchKept.limit(0).select(col("doc_id"))
          else Dedup.minhashProbe(
            batchKept.select(col("doc_id"), col("__toks")), indexDir,
            shingleLen, bands, rowsPerBand, excludeBatch = Some(batchId))
            .filter(col("est_jaccard") >= jaccard)
            .select(col("probe_id").as("doc_id")).distinct()
        val nearKept = batchKept.join(indexHits, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        appendToMinhashIndex(nearKept.select(col("doc_id"), col("__toks")),
          indexDir, batchId, shingleLen, bands, rowsPerBand)

        // ---- stage 2b (opt-in): SemDeDup firewall ---------------
        // the batch pipeline's stage 2b as semanticDedupStream's
        // per-batch rule; keepers live at indexDir/semkeep in the
        // writeIvfIndex layout, probes prune to the batch's clusters
        val semDedupOn = semanticEps > 0.0
        val semKept =
          if (!semDedupOn) nearKept
          else {
            val embedded = nearKept.filter(col("embedding").isNotNull)
              .select(col("doc_id").as("vec_id"), col("embedding"))
            // 1. within-batch dedup by the full batch rule (same
            //    assignment, blocking, components, keep rule)
            val (dec, releaseSem) = graft.operators.Similarity
              .semanticDedupReleasable(embedded, semanticCentroids, semanticEps)
            val surv = dec.filter(col("keep"))
              .select(col("vec_id"), col("cluster"))
              .join(embedded.select(col("vec_id"),
                col("embedding").as("__v")), Seq("vec_id"))
              .localCheckpoint() // micro-batch-sized; read thrice below
            releaseSem() // scored pin served the eager checkpoint
            // 2. drop survivors within eps of an existing keeper in
            //    their cluster — pruned to the batch's clusters
            //    (driver list bounded by nCentroids), replay-safe
            val clusters = surv.select(col("cluster")).distinct()
              .collect().map(_.getLong(0)).toSeq
            val keepPath = s"$indexDir/semkeep"
            val keeperDup =
              if (!exists(keepPath) || clusters.isEmpty)
                surv.limit(0).select(col("vec_id"))
              else {
                // geometry check before the probe: a different frozen
                // quantizer (or eps) prunes to clusters the keepers
                // index never populated — fail loud (round 17)
                graft.operators.Dedup.requireIndexGeometry(s, keepPath,
                  semKeeperGeo)
                s.read.parquet(keepPath)
                  .filter(col("centroid").isin(clusters: _*) &&
                    col("__batch") =!= batchId)
                  .select(col("centroid").cast("long").as("cluster"),
                    col("embedding").as("__kv"))
                  .join(broadcast(surv), Seq("cluster"))
                  // round-6 comparison — the same quantization the
                  // batch pair rule applies (Similarity.cosinePairsBlocked)
                  .filter(round(graft.operators.Similarity.cosine(
                    col("__v"), col("__kv")), 6) >= semanticEps)
                  .select(col("vec_id")).distinct()
              }
            // 3. the remainder join the keepers index themselves
            val keepers = surv.join(keeperDup, Seq("vec_id"), "left_anti")
              .localCheckpoint()
            // skip the write when nothing survived: a partitioned
            // empty write would create a schemaless parquet dir the
            // next batch's exists()-guarded read cannot open (dynamic
            // overwrite touches no partitions on empty data anyway).
            // The sidecar declaration rides the same guard so an
            // empty declare never creates a data-less directory.
            if (!keepers.isEmpty) {
              graft.operators.Dedup.declareIndexGeometry(s, keepPath,
                semKeeperGeo)
              keepers.select(col("vec_id"), col("__v").as("embedding"),
                  col("cluster").as("centroid"))
                // one file per cluster per batch (file-compaction rule)
                .repartition(col("centroid"))
                .withColumn("__batch", lit(batchId))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("centroid", "__batch").parquet(keepPath)
            }
            // fingerprint-less docs pass untouched — never silently
            // lose data the scorer cannot judge (the stage-5 rule)
            nearKept.filter(col("embedding").isNull)
              .unionByName(nearKept.join(
                keepers.select(col("vec_id").as("doc_id")),
                Seq("doc_id"), "left_semi"))
          }

        // ---- stage 3: quality floor -----------------------------
        val qualKept = semKept.filter(
          TextFns.qualityScoreOf(col("text"), col("__toks")) >= minQuality)

        // ---- stage 4 (opt-in): frozen perplexity ceiling --------
        val pplOn = pplModel != null && maxPpl > 0.0
        val pplKept =
          if (!pplOn) qualKept
          else {
            val dropped = graft.operators.LanguageModel.perplexityOf(
              qualKept.select(col("doc_id"), col("__toks")), pplModel)
              .filter(col("ppl") > maxPpl).select(col("doc_id"))
            qualKept.join(dropped, Seq("doc_id"), "left_anti")
          }

        // ---- stage 5 (opt-in): semantic decontamination ---------
        val semOn = frozenHoldout != null
        val finalKept =
          if (!semOn) pplKept
          else {
            val embedded = pplKept.filter(col("embedding").isNotNull)
              .select(col("doc_id").as("vec_id"), col("embedding"))
            val keptIds = graft.operators.Similarity.semanticDecontam(
              embedded, frozenHoldout, decontamEps)
              .filter(col("kept")).select(col("vec_id").as("doc_id"))
            pplKept.filter(col("embedding").isNull)
              .unionByName(pplKept.join(keptIds, Seq("doc_id"), "left_semi"))
          }
        val out = finalKept.localCheckpoint()

        if (withStats) {
          import s.implicits._
          Seq((nInput, exactKept.count(), nearKept.count(),
            if (semDedupOn) semKept.count() else -1L,
            qualKept.count(),
            if (pplOn) pplKept.count() else -1L,
            if (semOn) out.count() else -1L,
            out.count()))
            .toDF("input", "after_exact", "after_neardup", "after_semdedup",
              "after_quality", "after_ppl", "after_semantic", "kept")
            .withColumn("__batch", lit(batchId))
            .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch").parquet(s"$destDir/_accounting")
        }
        out.select(col("doc_id"), col("text"), col("embedding"))
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch").parquet(destDir)
        staged.unpersist(blocking = false)
        ()
      }
      .start()
    q.awaitTermination()
    // post-invocation maintenance at the quiescent point (round 18):
    // every state store this firewall maintains gets the LSM
    // segment-merge once its committed batch count reaches the
    // spark.graft.index.autoCompactSegments threshold
    graft.operators.Dedup.autoCompactIndexSegments(
      spark, s"$indexDir/exact", "part")
    graft.operators.Dedup.autoCompactMinhashIndex(spark, indexDir)
    graft.operators.Dedup.autoCompactIndexSegments(
      spark, s"$indexDir/semkeep", "centroid")
  }

  /** COMPOSED streaming MEDIA firewall — [[graft.pipelines.MediaCorpus
    * .prepare]]'s stage chain at ingest time as ONE stream: decode →
    * perceptual dHash near-dup pruning (within-batch pigeonhole sweep
    * + on-disk Hamming index probe) → brightness feature floor, with
    * per-stage accounting per micro-batch — the multimodal sibling of
    * [[curationFirewallStream]].
    *
    * Stage semantics are the batch pipeline's, by shared code:
    *  1. DECODE — [[graft.operators.Media.decodeImages]], one codec
    *     pass per batch staged for all downstream consumers;
    *     undecodable payloads drop here (the 2_decoded account).
    *  2. NEAR-DUP — the batch rule exactly: decoded survivors lose to
    *     within-batch Hamming-component minima and to
    *     already-admitted index matches; unlike [[phashDedupStream]]
    *     (fingerprint-only firewall), rows that decode but carry NO
    *     fingerprint pass this stage untouched — the
    *     [[graft.pipelines.MediaCorpus.prepare]] anti-join semantics
    *     (a doc the fingerprinter cannot judge is not evidence of
    *     duplication), at the cost that such rows are also not
    *     indexable against future arrivals.
    *  3. FEATURE FLOOR — codegen'd brightness against [lo, hi].
    *
    * The admitted output is MANIFEST-shaped (`id, brightness,
    * n_pixels`) — placement + features, never pixels; at 100 TB the
    * pixels stay in the lake and only decisions leave the stream.
    * Replay-safe like every firewall here: the index probe excludes
    * the current `__batch`, all writes dynamic-overwrite.
    */
  def mediaFirewallStream(spark: SparkSession, srcDir: String,
                          indexDir: String, destDir: String,
                          checkpointDir: String, maxDist: Int = 3,
                          minBrightness: Double = 0.0,
                          maxBrightness: Double = 255.0,
                          withStats: Boolean = true): Unit = {
    val imgSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.BinaryType)))
    // complete any crashed compaction swap BEFORE the stream starts:
    // a replayed batch must never probe a live tree missing merged
    // segments (round 18 — see Dedup.recoverPendingSwap)
    graft.operators.Dedup.recoverPendingSwap(spark, s"$indexDir/bands", "part")
    val q = spark.readStream.schema(imgSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.operators.{Dedup, Media}
        val s = batch.sparkSession
        graft.plans.GraftExtensions.ensureRegistered(s)
        // pin the raw batch once (the curationFirewallStream lesson:
        // the accounting count and the decode would otherwise each
        // scan the source files)
        val staged = batch.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nInput = if (withStats) staged.count() else -1L
        // one codec pass per batch, three consumers (fingerprint,
        // floor, manifest) — batch-sized, so localCheckpoint
        val decoded = Media.decodeImages(staged).localCheckpoint()
        val nDecoded = if (withStats) decoded.count() else -1L

        val sig = Media.resizeImages(decoded, 9, 8)
          .select(col("id").as("doc_id"),
            call_function("graft_dhash64", col("pixels"), col("width"),
              col("height"), col("channels")).as("sh"))
          .filter(col("sh").isNotNull)
        val pairs = Dedup.hammingPairsOfSignatures(sig, maxDist)
        val losers = Dedup.componentLosers(pairs)
          .select(col("node").as("id")).localCheckpoint()
        val sigKept = sig.join(
          losers.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_anti")
        val bandsPath = new org.apache.hadoop.fs.Path(s"$indexDir/bands")
        val indexExists = bandsPath
          .getFileSystem(s.sparkContext.hadoopConfiguration).exists(bandsPath)
        val indexHits = (
          if (!indexExists) sigKept.limit(0).select(col("doc_id"))
          else Dedup.hammingProbe(sigKept, indexDir, maxDist,
            excludeBatch = Some(batchId))
            .select(col("probe_id").as("doc_id")).distinct())
          .localCheckpoint()
        // admitted fingerprints join the index (decide once — same
        // survivor set for append and output)
        appendToHammingIndex(
          sigKept.join(indexHits, Seq("doc_id"), "left_anti"),
          indexDir, batchId, maxDist)
        // the batch pipeline's anti-join: decoded rows lose only by id
        val deduped = decoded
          .join(losers, Seq("id"), "left_anti")
          .join(indexHits.withColumnRenamed("doc_id", "id"), Seq("id"), "left_anti")

        val feats = Media.imageFeatures(deduped)
        val kept = feats
          .filter(col("brightness").between(minBrightness, maxBrightness))
          .withColumn("n_pixels",
            (col("width") * col("height") * col("channels")).cast("long"))
          .select(col("id"), col("brightness"), col("n_pixels"))
          .localCheckpoint()

        if (withStats) {
          import s.implicits._
          Seq((nInput, nDecoded, deduped.count(), kept.count()))
            .toDF("input", "decoded", "after_neardup", "after_feature")
            .withColumn("__batch", lit(batchId))
            .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch").parquet(s"$destDir/_accounting")
        }
        kept.withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch").parquet(destDir)
        staged.unpersist(blocking = false)
        ()
      }
      .start()
    q.awaitTermination()
    // post-invocation maintenance at the quiescent point (round 18)
    graft.operators.Dedup.autoCompactIndexSegments(
      spark, s"$indexDir/bands", "part")
  }

  /** Streaming perceptual-image near-dup firewall — the multimodal
    * twin of [[minhashDedupStream]], over the on-disk Hamming index
    * ([[graft.operators.Dedup.writeHammingIndex]]): arriving ENCODED
    * images are admitted iff their dHash fingerprint is NOT within
    * Hamming distance `maxDist` of an already-admitted image's; the
    * LAION-style ingest-time image dedup a 100 TB multimodal corpus
    * runs continuously. Same three-step per-micro-batch shape:
    *
    *  1. decode → canonical 9×8 resize → native
    *     [[graft.plans.DHash64]] fingerprint (decode-or-drop: rows
    *     whose payload doesn't decode, or whose fingerprint is null,
    *     never reach the index — the Media family convention), then
    *     dedup WITHIN the batch by the full batch rule (the SHARED
    *     [[graft.operators.Dedup.hammingPairsOfSignatures]] pigeonhole
    *     sweep + [[graft.operators.Dedup.componentLosers]] min-id
    *     keeps — no stream-specific rule to diverge);
    *  2. drop batch survivors with a Hamming-≤maxDist match against
    *     the index ([[graft.operators.Dedup.hammingProbe]] —
    *     partition-pruned to the ≤64 parts the batch's pieces hash
    *     into, never a corpus scan);
    *  3. append survivors' banded rows under `part=<p>/__batch=<n>/`
    *     (dynamic overwrite ⇒ exactly-once on replay; the probe
    *     excludes `__batch = <current>`, so a replayed batch
    *     reproduces its original decisions) and the surviving
    *     `(doc_id, sh)` rows under `__batch=<n>/` in destDir.
    *
    * Every step is deterministic (stub-codec decode, integer dHash,
    * xxhash64 banding), so the whole stream is exactly reproducible:
    * IncrementalSpec asserts the streaming kept set ≡ a sequential
    * batch-by-batch application of the identical rule. State is the
    * on-disk index only — each micro-batch costs O(batch) regardless
    * of how large the admitted corpus has grown.
    */
  def phashDedupStream(spark: SparkSession, srcDir: String, indexDir: String,
                       destDir: String, checkpointDir: String,
                       maxDist: Int = 3): Unit = {
    val imgSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.BinaryType)))
    // complete any crashed compaction swap BEFORE the stream starts:
    // a replayed batch must never probe a live tree missing merged
    // segments (round 18 — see Dedup.recoverPendingSwap)
    graft.operators.Dedup.recoverPendingSwap(spark, s"$indexDir/bands", "part")
    val q = spark.readStream.schema(imgSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.operators.{Dedup, Media}
        graft.plans.GraftExtensions.ensureRegistered(batch.sparkSession)
        val sig = Media.resizeImages(Media.decodeImages(batch), 9, 8)
          .select(col("id").as("doc_id"),
            call_function("graft_dhash64", col("pixels"), col("width"),
              col("height"), col("channels")).as("sh"))
          .filter(col("sh").isNotNull)
        val pairs = Dedup.hammingPairsOfSignatures(sig, maxDist)
        val batchKept = sig.join(
          Dedup.componentLosers(pairs).withColumnRenamed("node", "doc_id"),
          Seq("doc_id"), "left_anti")
        // unseeded-start probe guard — the minhashDedupStream idiom
        val bandsPath = new org.apache.hadoop.fs.Path(s"$indexDir/bands")
        val indexExists = bandsPath
          .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
          .exists(bandsPath)
        val indexHits =
          if (!indexExists) batchKept.limit(0).select(col("doc_id"))
          else Dedup.hammingProbe(batchKept, indexDir, maxDist,
            excludeBatch = Some(batchId))
            .select(col("probe_id").as("doc_id")).distinct()
        // decide once — the index append and the kept write below
        // must see the SAME survivor set, not re-run the probe
        val survivors = batchKept.join(indexHits, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        appendToHammingIndex(survivors, indexDir, batchId, maxDist)
        survivors.withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch").parquet(destDir)
      }
      .start()
    q.awaitTermination()
    // post-invocation maintenance at the quiescent point (round 18)
    graft.operators.Dedup.autoCompactIndexSegments(
      spark, s"$indexDir/bands", "part")
  }

  /** Streaming ACOUSTIC near-dup firewall — [[phashDedupStream]] with
    * the energy-envelope fingerprint ([[graft.plans.AudioHash64]]):
    * arriving encoded clips are admitted iff their hash is not within
    * Hamming `maxDist` of an admitted clip's, through the same on-disk
    * Hamming band index (decode-or-drop, within-batch sweep + min-id
    * keeps, partition-pruned probe, `part/__batch` append with replay
    * exclusion). The within-batch sweep runs the CAPPED default —
    * acoustic fingerprints are the family's low-entropy member
    * (BASELINE ×30: the uncapped sweep is output-bound by
    * construction on clustered corpora), the
    * `audio_phash_capped_recall` QUALITY floor gates the seam.
    */
  def audioPhashDedupStream(spark: SparkSession, srcDir: String,
                            indexDir: String, destDir: String,
                            checkpointDir: String, maxDist: Int = 3): Unit = {
    val clipSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.BinaryType)))
    // complete any crashed compaction swap BEFORE the stream starts:
    // a replayed batch must never probe a live tree missing merged
    // segments (round 18 — see Dedup.recoverPendingSwap)
    graft.operators.Dedup.recoverPendingSwap(spark, s"$indexDir/bands", "part")
    val q = spark.readStream.schema(clipSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.operators.{Dedup, Media}
        graft.plans.GraftExtensions.ensureRegistered(batch.sparkSession)
        val sig = Media.decodeAudio(batch)
          .select(col("id").as("doc_id"),
            call_function("graft_audiohash64", col("samples")).as("sh"))
          .filter(col("sh").isNotNull)
        val pairs = Dedup.hammingPairsOfSignatures(sig, maxDist)
        val batchKept = sig.join(
          Dedup.componentLosers(pairs).withColumnRenamed("node", "doc_id"),
          Seq("doc_id"), "left_anti")
        // unseeded-start probe guard — the minhashDedupStream idiom
        val bandsPath = new org.apache.hadoop.fs.Path(s"$indexDir/bands")
        val indexExists = bandsPath
          .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
          .exists(bandsPath)
        val indexHits =
          if (!indexExists) batchKept.limit(0).select(col("doc_id"))
          else Dedup.hammingProbe(batchKept, indexDir, maxDist,
            excludeBatch = Some(batchId))
            .select(col("probe_id").as("doc_id")).distinct()
        // decide once — the index append and the kept write below
        // must see the SAME survivor set, not re-run the probe
        val survivors = batchKept.join(indexHits, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        appendToHammingIndex(survivors, indexDir, batchId, maxDist)
        survivors.withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch").parquet(destDir)
      }
      .start()
    q.awaitTermination()
    // post-invocation maintenance at the quiescent point (round 18)
    graft.operators.Dedup.autoCompactIndexSegments(
      spark, s"$indexDir/bands", "part")
  }

  /** Streaming TEMPORAL VIDEO near-dup firewall — the clip-level twin
    * that completes the image/audio/video fingerprint triple: an
    * arriving clip is admitted iff fewer than `minFrames` of its
    * sampled frames are Hamming-≤maxDist matches of the SAME-INDEX
    * frames of any single admitted clip (the ≥2-of-3 rollup of
    * [[graft.queries.MediaPipeline.mediaVideoPhash]]). The on-disk
    * index stores per-frame banded rows with `frame` as an ALIGNMENT
    * key of the band join itself ([[graft.operators.Dedup
    * .hammingProbe]] `alignCols`): pieces shared by misaligned frames
    * never become candidates, so probe exchange volume stays
    * per-frame at any clip length. Same three-step per-micro-batch
    * shape and replay-exclusion contract as its siblings; frames
    * sample every `stride`-th (the [[graft.operators.Media
    * .sampleFrames]] rule), and clips whose payload fails the
    * container walk contribute no frames and are dropped (the
    * decode-or-drop convention).
    */
  def videoPhashDedupStream(spark: SparkSession, srcDir: String,
                            indexDir: String, destDir: String,
                            checkpointDir: String, maxDist: Int = 3,
                            stride: Int = 2, minFrames: Int = 2): Unit = {
    val clipSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.BinaryType)))
    // complete any crashed compaction swap BEFORE the stream starts:
    // a replayed batch must never probe a live tree missing merged
    // segments (round 18 — see Dedup.recoverPendingSwap)
    graft.operators.Dedup.recoverPendingSwap(spark, s"$indexDir/bands", "part")
    val q = spark.readStream.schema(clipSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.operators.{Dedup, Media}
        graft.plans.GraftExtensions.ensureRegistered(batch.sparkSession)
        // composite key = clip·1000 + frame (the videoPhashPairsOf
        // contract, same in-plan assert_true guard rationale: the
        // fixture path samples ≤ a handful of frames; a longer clip
        // fails loudly instead of corrupting pairs)
        val keyGuard = coalesce(
          assert_true(col("frame_index") < 1000,
            lit("videoPhashDedupStream: frame_index >= 1000 would " +
              "corrupt the clip*1000 + frame composite key"))
            .cast(org.apache.spark.sql.types.LongType),
          lit(0L))
        val frames = Media.sampleFrames(batch, stride)
          .select((col("id") * 1000 + col("frame_index") + keyGuard).as("key"),
            col("payload"))
        val sig = Media.resizeImages(Media.decodeImages(frames, idCol = "key"), 9, 8)
          .select((col("id") / 1000).cast(org.apache.spark.sql.types.LongType)
              .as("doc_id"),
            (col("id") % 1000).as("frame"),
            call_function("graft_dhash64", col("pixels"), col("width"),
              col("height"), col("channels")).as("sh"))
          .filter(col("sh").isNotNull)
          .localCheckpoint()
        // within-batch clip dedup: aligned-frame pairs → ≥minFrames
        // rollup → component losers (min-id keeps), the batch rule
        val framePairs = Dedup.hammingPairsOfSignatures(sig, maxDist,
          alignCols = Seq("frame"))
        val clipPairs = framePairs.groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("__fm"))
          .filter(col("__fm") >= minFrames)
        val batchKept = sig.join(
          Dedup.componentLosers(clipPairs).withColumnRenamed("node", "doc_id"),
          Seq("doc_id"), "left_anti")
        val bandsPath = new org.apache.hadoop.fs.Path(s"$indexDir/bands")
        val indexExists = bandsPath
          .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
          .exists(bandsPath)
        val indexHits =
          if (!indexExists) batchKept.limit(0).select(col("doc_id"))
          else Dedup.hammingProbe(batchKept, indexDir, maxDist,
            excludeBatch = Some(batchId), alignCols = Seq("frame"))
            .groupBy(col("probe_id"), col("index_id"))
            .agg(count(lit(1)).as("__fm"))
            .filter(col("__fm") >= minFrames)
            .select(col("probe_id").as("doc_id")).distinct()
        val survivors = batchKept.join(indexHits, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        appendToHammingIndex(survivors, indexDir, batchId, maxDist,
          alignCols = Seq("frame"))
        survivors.withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch").parquet(destDir)
      }
      .start()
    q.awaitTermination()
    // post-invocation maintenance at the quiescent point (round 18)
    graft.operators.Dedup.autoCompactIndexSegments(
      spark, s"$indexDir/bands", "part")
  }

  /** Streaming BM25 index maintenance: new documents' postings append
    * into the [[graft.queries.Retrieval.writeBm25Index]] layout as
    * they arrive — per micro-batch one narrow map (the shared
    * `bm25PostingRows` derivation, so batch build and incremental
    * append cannot diverge on tokenization, tf math, or term
    * bucketing) + a partitioned append under
    * `bucket=<b>/__batch=<n≥0>/` with dynamic overwrite, so a
    * replayed micro-batch overwrites its own sub-partitions instead
    * of double-indexing (exactly-once; the batch seed lives at
    * `__batch=-1` and never collides). Between refreshes, probes see
    * the new postings but build-time df/stats — the standard
    * stale-statistics trade of segmented search indexes;
    * [[graft.queries.Retrieval.writeBm25Stats]] is the segment-merge
    * that restores exact direct-scorer parity. Stateless beyond
    * source offsets.
    */
  def bm25IndexStream(spark: SparkSession, srcDir: String, indexDir: String,
                      checkpointDir: String,
                      nBuckets: Int = graft.queries.Retrieval.Bm25Buckets): Unit = {
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    // complete any crashed compaction swap BEFORE the stream starts:
    // a replayed batch must never probe a live tree missing merged
    // segments (round 18 — see Dedup.recoverPendingSwap)
    graft.operators.Dedup.recoverPendingSwap(spark, s"$indexDir/postings", "bucket")
    val q = spark.readStream.schema(docsSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // declare-before-append (round 17): an appender running with a
        // different nBuckets against an existing index would bucket new
        // postings under the wrong partitioning AND rebrand the sidecar
        // — fail loud here, before any rows land
        graft.operators.Dedup.declareIndexGeometry(batch.sparkSession, indexDir,
          graft.queries.Retrieval.bm25Geometry(nBuckets))
        graft.queries.Retrieval.bm25PostingRows(
          batch.select(col("doc_id"),
            graft.functions.TextFns.tokens(col("text")).as("__toks")),
          nBuckets)
          // one term-sorted file per bucket per batch — the
          // writeBm25Index layout (file-compaction rule)
          .repartition(col("bucket"))
          .sortWithinPartitions(col("term"), col("doc_id"))
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket", "__batch").parquet(s"$indexDir/postings")
      }
      .start()
    q.awaitTermination()
    // post-invocation maintenance at the quiescent point (round 18)
    graft.operators.Dedup.autoCompactIndexSegments(
      spark, s"$indexDir/postings", "bucket")
  }

  /** Streaming IVF index maintenance: new vectors append into the
    * [[graft.operators.Similarity.writeIvfIndex]] partition layout as
    * they arrive — per micro-batch one narrow map (the shared
    * `ivfIndexRows` assignment, so batch build and incremental append
    * cannot diverge) + a partitioned append. The index stays
    * immediately probe-able between batches via
    * [[graft.operators.Similarity.probeIvfIndex]] (partition pruning
    * reads only probed `centroid=` directories; appended files join
    * their directory transparently). Rows land under
    * `centroid=<id>/__batch=<n>/` with dynamic overwrite, so a
    * replayed micro-batch (foreachBatch is at-least-once on side
    * effects) overwrites its own sub-partitions instead of
    * double-indexing its vectors; probes select explicit columns, so
    * the extra partition level is invisible to them. The quantizer is
    * static by design — re-training centroids re-keys the layout,
    * which is a rebuild ([[graft.operators.Similarity.writeIvfIndex]]),
    * not maintenance — and is collected to driver arrays ONCE at
    * query start, not per batch. Stateless beyond source offsets.
    *
    * @param vecSchema schema of the source parquet (id + vector col)
    */
  def ivfIndexStream(spark: SparkSession, srcDir: String,
                     centroids: DataFrame, destDir: String,
                     checkpointDir: String, nAssign: Int = 1,
                     corpusId: String = "neighbor_id",
                     vecCol: String = "embedding"): Unit = {
    import graft.operators.Similarity
    val vecSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(corpusId,
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(vecCol,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    // the quantizer collects ONCE here (nCentroids-bounded arrays);
    // each micro-batch reuses the collected object — no per-batch
    // driver job, and (for a two-level frame) the same approximate
    // assignment as the batch builder
    val cq = Similarity.collectQuantizerHier(centroids)
    // geometry sidecar computed once, from the SAME collected arrays
    // (no second centroid collect — the round-17 advisor fix)
    val geometry = Similarity.ivfGeometryOf(cq.ids, cq.vecs)
    // complete any crashed compaction swap BEFORE the stream starts:
    // a replayed batch must never probe a live tree missing merged
    // segments (round 18 — see Dedup.recoverPendingSwap)
    graft.operators.Dedup.recoverPendingSwap(spark, destDir, "centroid")
    val q = spark.readStream.schema(vecSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // declare-before-append (round 17): a re-trained/different
        // quantizer re-keys the layout — that is a REBUILD
        // (writeIvfIndex), never maintenance; appending under it and
        // rebranding the sidecar would make every later probe pass the
        // geometry check while missing the previously-indexed vectors
        graft.operators.Dedup.declareIndexGeometry(batch.sparkSession, destDir,
          geometry)
        Similarity.ivfIndexRowsQ(batch, cq, nAssign, corpusId, vecCol)
          // one file per centroid per batch (file-compaction rule)
          .repartition(col("centroid"))
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("centroid", "__batch").parquet(destDir)
      }
      .start()
    q.awaitTermination()
    // post-invocation maintenance at the quiescent point (round 18)
    graft.operators.Dedup.autoCompactIndexSegments(spark, destDir, "centroid")
  }

  /** Streaming SemDeDup — the semantic twin of the exact/winnow/
    * model/ppl firewalls, closing the one batch family without a
    * streaming counterpart. Incoming vectors are admitted iff they
    * are NOT within cosine `eps` of any already-kept vector in their
    * cluster; admitted vectors become keepers themselves. State is
    * the on-disk keepers index in the [[graft.operators.Similarity
    * .writeIvfIndex]] layout (`centroid=<id>/__batch=<n>/`), so a
    * batch-built index seeds the stream directly and each micro-batch
    * reads ONLY the `centroid=` directories its vectors assign to
    * (partition pruning — never the whole keeper set).
    *
    * Per micro-batch:
    *  1. dedup WITHIN the batch by the full batch rule
    *     ([[graft.operators.Similarity.semanticDedup]]: same
    *     assignment, same pair blocking, same connected-components
    *     grouping, same least-prototypical keep — no stream-specific
    *     scoring path to diverge);
    *  2. drop batch survivors within `eps` of an existing keeper in
    *     their cluster (the batch side is micro-batch-sized and
    *     BROADCAST into the pruned keeper scan);
    *  3. append the remainder under `centroid=<id>/__batch=<n>/`
    *     with dynamic overwrite.
    *
    * Replay safety: keepers written by the CURRENT batch id are
    * excluded from step 2's reference set, so a replayed micro-batch
    * (foreachBatch is at-least-once) reproduces its original
    * decisions instead of seeing its own output and dropping
    * everything; its re-write then lands on its own partitions —
    * exactly-once net effect.
    *
    * Invariant (spec-asserted): at every point, same-cluster keepers
    * are pairwise below `eps` — the same guarantee the batch rule
    * gives (one representative per duplicate group), maintained
    * incrementally. The streaming keep CHOICE inside a group can
    * differ from a single batch run over the union (first-arrival
    * wins across batches; that is inherent to any online dedup), but
    * soundness — every dropped vector has a keeper within `eps` in
    * its cluster — holds identically.
    */
  def semanticDedupStream(spark: SparkSession, srcDir: String,
                          centroids: DataFrame, keepersDir: String,
                          checkpointDir: String, eps: Double,
                          corpusId: String = "vec_id",
                          vecCol: String = "embedding"): Unit = {
    import graft.operators.Similarity
    // keeper-index geometry (round 17): the keepers layout is keyed by
    // the frozen quantizer's assignment AND the admission eps — a
    // probe/appender under a different quantizer prunes to clusters
    // the index never populated (the silent-miss class), and a
    // different eps breaks the pairwise-below-eps keeper invariant.
    // Checksum computed ONCE per stream call from one driver collect.
    // `kind` stays "ivf" — the keepers ARE a writeIvfIndex layout, and
    // a batch-built IVF index seeds the stream directly (its sidecar
    // carries no eps yet; the absent key is trusted and the stream's
    // declaration adds it).
    val keeperGeo = {
      val (ids, vecs) = Similarity.collectQuantizer(centroids)
      Similarity.ivfGeometryOf(ids, vecs) + ("eps" -> eps.toString)
    }
    val vecSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(corpusId,
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(vecCol,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    // complete any crashed compaction swap BEFORE the stream starts:
    // a replayed batch must never probe a live tree missing merged
    // segments (round 18 — see Dedup.recoverPendingSwap)
    graft.operators.Dedup.recoverPendingSwap(spark, keepersDir, "centroid")
    val q = spark.readStream.schema(vecSchema).parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch = batch0.localCheckpoint() // micro-batch-sized
        // 1. within-batch dedup by the full batch rule
        val (dec, release) = Similarity.semanticDedupReleasable(
          batch, centroids, eps, corpusId, vecCol)
        val survivors = dec.filter(col("keep"))
          .select(col("vec_id"), col("cluster"))
          .join(batch.select(col(corpusId).as("vec_id"),
            col(vecCol).as("__v")), Seq("vec_id"))
          .localCheckpoint() // micro-batch-sized; read twice below
        release() // scored pin served the eager checkpoint above
        // 2. drop survivors within eps of an existing keeper in their
        // cluster. The keeper scan prunes to the batch's clusters
        // (driver list bounded by nCentroids) and excludes rows this
        // same batch id wrote (replay safety).
        val clusters = survivors.select(col("cluster")).distinct()
          .collect().map(_.getLong(0)).toSeq
        // Existence probe through the Hadoop FileSystem API — a
        // java.io.File check only sees the local filesystem, so on
        // HDFS/S3 an existing keepers index would read as absent and
        // step 2 would silently admit semantic duplicates.
        val keepersPath = new org.apache.hadoop.fs.Path(keepersDir)
        val keepersExist = keepersPath
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(keepersPath)
        val keeperDup =
          if (!keepersExist || clusters.isEmpty)
            survivors.limit(0).select(col("vec_id"))
          else {
            // geometry check before the probe (round 17): a different
            // quantizer prunes to clusters the index never populated
            // — fail loud instead of silently admitting duplicates
            graft.operators.Dedup.requireIndexGeometry(spark, keepersDir,
              keeperGeo)
            spark.read.parquet(keepersDir)
              .filter(col("centroid").isin(clusters: _*) &&
                col("__batch") =!= batchId)
              .select(col("centroid").cast("long").as("cluster"),
                col(vecCol).as("__kv"))
              .join(broadcast(survivors), Seq("cluster"))
              // round-6 comparison — the same quantization the batch
              // pair rule applies (Similarity.cosinePairsBlocked)
              .filter(round(Similarity.cosine(col("__v"), col("__kv")), 6) >= eps)
              .select(col("vec_id")).distinct()
          }
        val admitted = survivors.join(keeperDup, Seq("vec_id"), "left_anti")
          .select(col("vec_id").as(corpusId), col("__v").as(vecCol),
            col("cluster").as("centroid"))
          .localCheckpoint() // micro-batch-sized; read twice below
        // skip BOTH the declare and the write when the batch admits no
        // keepers (the curationFirewallStream semkeep guard, round 18):
        // an unconditional declare on an empty batch — e.g. an empty
        // AvailableNow run against an unseeded stream — creates
        // keepersDir containing only the geometry sidecar, the next
        // batch's keepersExist guard then passes, and the data-less
        // parquet read fails schema inference, wedging the stream.
        // Dynamic overwrite touches no partitions on empty data anyway.
        if (!admitted.isEmpty) {
          // declare-before-append: validates again (cheap, one FS
          // read) then stamps the quantizer checksum + eps the
          // keepers now carry
          graft.operators.Dedup.declareIndexGeometry(spark, keepersDir, keeperGeo)
          admitted
            // one file per cluster per batch (file-compaction rule)
            .repartition(col("centroid"))
            .withColumn("__batch", lit(batchId))
            .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
            .partitionBy("centroid", "__batch").parquet(keepersDir)
        } else if (keepersExist)
          // validate-only: a mis-parameterized stream must still fail
          // loud even when its batch happens to admit nothing
          graft.operators.Dedup.requireIndexGeometry(spark, keepersDir, keeperGeo)
      }
      .start()
    q.awaitTermination()
    // post-invocation maintenance at the quiescent point (round 18)
    graft.operators.Dedup.autoCompactIndexSegments(spark, keepersDir, "centroid")
  }

  /** Continuously-maintained per-group heavy hitters: the
    * [[graft.plans.MGKernel]] Misra–Gries rules as
    * `flatMapGroupsWithState` keyed state — the streaming twin of
    * [[graft.operators.HeavyHitters.exactTopKPerGroup]]'s pass 1.
    * Each micro-batch folds its rows into the group's bounded summary
    * (state ≤ `capacity` entries per group, FOREVER, regardless of
    * vocabulary growth) and emits the current top-`k` lower-bound
    * weights. A streaming run is repeated mergeable-summary updating,
    * so the MG bounds hold over the FULL stream history — for the
    * STATE: every item with total frequency > N/capacity is in the
    * group's state, weights within N/capacity below truth. The
    * EMISSION truncates that state to the k largest weights (raise
    * `k` toward `capacity` if the consumer needs every
    * above-threshold item). Null items are skipped, matching the
    * batch aggregate. Exactness certification needs
    * the recount pass — run the batch composition over the lake when
    * an exact answer is required; this surface is the cheap continuous
    * monitor (trending tokens, hot keys, drift alarms).
    *
    * @param docs streaming Dataset of (group, item) pairs
    * @return per micro-batch: (group, item, weight_lb, rnk ≤ k)
    */
  def heavyHittersStream(docs: org.apache.spark.sql.Dataset[(String, String)],
                         k: Int = 10, capacity: Int = 256)
      : org.apache.spark.sql.Dataset[(String, String, Long, Int)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, Long], (String, String, Long, Int)](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        case (grp, rows, state: GroupState[Map[String, Long]]) =>
          val buf = scala.collection.mutable.HashMap.from(
            state.getOption.getOrElse(Map.empty))
          rows.foreach { case (_, item) =>
            if (item != null) graft.plans.MGKernel.update(buf, item, capacity)
          }
          state.update(buf.toMap)
          buf.toSeq.sortBy { case (item, w) => (-w, item) }.take(k)
            .zipWithIndex.iterator
            .map { case ((item, w), i) => (grp, item, w, i + 1) }
      }
  }

  /** CERTIFIED-EXACT streaming top-K per group — the streaming
    * composition of the two batch passes in
    * [[graft.operators.HeavyHitters.exactTopKPerGroup]]: a
    * continuously-merged MG candidate summary (pass 1, incremental)
    * plus a distributed recount against the accumulated history
    * (pass 2, per micro-batch), certified by the same two sufficient
    * conditions — so unlike [[heavyHittersStream]]'s lower bounds, the
    * emitted ranks are EXACT or the batch refuses loudly.
    *
    * Per micro-batch, inside `foreachBatch`:
    *  1. the batch lands in `stateDir/lake` partitioned by BATCH ID
    *     with dynamic overwrite — a replayed batch (foreachBatch is
    *     at-least-once on side effects) overwrites its own partition,
    *     keeping lake counts exact;
    *  2. the per-group MG summary table is advanced as a VERSION
    *     `stateDir/summaries/v=<batchId>` = COMBINE(previous version,
    *     batch MG aggregate): counters add per (group, item), then the
    *     (capacity+1)-th largest weight subtracts from all and
    *     non-positive entries drop — the Misra–Gries merge of Agarwal
    *     et al., "Mergeable Summaries" (PODS'12), as three relational
    *     ops. Versioning makes replay idempotent: a re-run of batch n
    *     rebuilds v=n from v<n deterministically instead of
    *     double-merging. Summary error after any merge sequence stays
    *     ≤ N/capacity, so every item with true frequency > N/capacity
    *     is a candidate — the certification bar below;
    *  3. groups TOUCHED by the batch are recounted exactly against the
    *     full lake (semi-join on candidates — only candidate rows
    *     shuffle), certified per group (full coverage, or k-th count
    *     clears N/capacity; otherwise IllegalStateException names the
    *     groups), and their partitions of `outDir` are dynamically
    *     overwritten. Untouched groups received no rows, so their
    *     stored result is still exact — per-batch work scales with the
    *     batch's groups, only the recount scan touches history.
    *
    * `outDir` is therefore always a certified-exact (grp, item, n,
    * rnk ≤ k) table as of the last processed batch.
    */
  def certifiedTopKStream(spark: SparkSession, srcDir: String, stateDir: String,
                          outDir: String, checkpointDir: String,
                          k: Int = 10, capacity: Int = 256): Unit = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("item",
        org.apache.spark.sql.types.StringType)))
    val lakeDir = s"$stateDir/lake"
    val summDir = s"$stateDir/summaries"

    def versions(s: SparkSession): Seq[Long] = {
      val p = new org.apache.hadoop.fs.Path(summDir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .collect { case n if n.startsWith("v=") => n.drop(2).toLong }
    }

    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val s = batch0.sparkSession
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        // micro-batch-sized; consumed by the lake write, the summary
        // merge, and the touched-group set
        val batch = batch0.filter(col("item").isNotNull).localCheckpoint()

        // 1. idempotent lake append
        batch.withColumn("__batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch").parquet(lakeDir)

        // 2. versioned MG COMBINE
        val prevV = versions(s).filter(_ < batchId).sorted.lastOption
        val prev = prevV.map(v => s.read.parquet(s"$summDir/v=$v"))
          .getOrElse(Seq.empty[(String, String, Long)].toDF("grp", "item", "w"))
        val bSumm = batch.groupBy(col("grp"))
          .agg(call_function("graft_mg", col("item"), lit(capacity)).as("__mg"))
          .select(col("grp"), explode(col("__mg")))
          .toDF("grp", "item", "w")
        val wRank = Window.partitionBy(col("grp"))
          .orderBy(col("w").desc, col("item").asc)
        val wGrp = Window.partitionBy(col("grp"))
        val merged = prev.unionByName(bSumm)
          .groupBy(col("grp"), col("item")).agg(sum(col("w")).as("w"))
          .withColumn("__rnk", row_number().over(wRank))
          .withColumn("__wth",
            max(when(col("__rnk") === capacity + 1, col("w"))).over(wGrp))
          .withColumn("w", col("w") - coalesce(col("__wth"), lit(0L)))
          .filter(col("w") > 0).select(col("grp"), col("item"), col("w"))
        merged.write.mode("overwrite").parquet(s"$summDir/v=$batchId")
        // GC: keep the current and one prior version (the only one a
        // restart can replay from under AvailableNow's one-batch redo)
        versions(s).filter(v => v < batchId && !prevV.contains(v)).foreach { v =>
          val p = new org.apache.hadoop.fs.Path(s"$summDir/v=$v")
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        }

        // 3. exact recount + certification for touched groups
        val touched = batch.select(col("grp")).distinct()
        val lake = s.read.parquet(lakeDir)
          .join(touched, Seq("grp"), "left_semi")
          .filter(col("item").isNotNull)
        val cands = s.read.parquet(s"$summDir/v=$batchId")
          .join(touched, Seq("grp"), "left_semi").select(col("grp"), col("item"))
        val confirmed = lake.join(cands, Seq("grp", "item"), "left_semi")
          .groupBy(col("grp"), col("item")).agg(count(lit(1)).as("n"))
          .localCheckpoint() // candidate-sized; feeds certify + output
        val ranked = confirmed.withColumn("rnk", row_number().over(
          Window.partitionBy(col("grp")).orderBy(col("n").desc, col("item").asc)))
        // certification starts from TOUCHED, not from the candidates:
        // a touched group whose merged summary collapsed to zero
        // entries (possible when a batch carries > capacity distinct
        // singletons) would otherwise produce no cert row at all and
        // its stale stored result would silently stand as "exact".
        // With no candidates every aggregate below is null → __ok
        // coalesces to false → the group is refused loudly.
        val cert = touched
          .join(ranked.groupBy(col("grp"))
            .agg(sum(col("n")).as("__sum"),
              max(when(col("rnk") === k, col("n"))).as("__kth"),
              count(lit(1)).as("__cand")), Seq("grp"), "left")
          .join(lake.groupBy(col("grp")).agg(count(lit(1)).as("__n")), "grp")
          .withColumn("__ok", coalesce(
            col("__sum") === col("__n") ||
              (col("__cand") >= k && col("__kth") * capacity > col("__n")),
            lit(false)))
        val bad = cert.filter(!col("__ok")).select(col("grp"))
          .collect().map(_.getString(0))
        if (bad.nonEmpty)
          throw new IllegalStateException(
            s"MG capacity $capacity cannot certify exact top-$k for groups: " +
              bad.sorted.mkString(", ") + ". Retry with a larger capacity.")

        // 4. idempotent per-group result refresh
        ranked.filter(col("rnk") <= k)
          .select(col("grp"), col("item"), col("n"),
            col("rnk").cast("long").as("rnk"))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("grp").parquet(outDir)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Windowed rollup of the incrementally-built table — bucket
    * partition pruning applies because [[ingestIncrement]] partitioned
    * by bucket_unix.
    */
  def bucketRollup(spark: SparkSession, destDir: String): DataFrame =
    spark.read.parquet(destDir)
      .groupBy(col("bucket_unix"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

  /** Streaming form of the reference's sliding 60-minute activity
    * window (`ingest_activity_and_report.sh:36,81` runs it as a cron
    * batch against now(); the streaming engine runs it continuously on
    * EVENT time): watermarked sliding window → per (window, type)
    * counts/sums. Late events beyond the watermark are dropped — the
    * batch reference has the same effective behavior, since a row
    * arriving after the cron window has passed is never counted.
    * Exposed unsunk; tests attach a memory sink, production appends to
    * a bucket-partitioned table.
    */
  def slidingActivity(spark: SparkSession, srcDir: String,
                      windowLen: String = "60 minutes",
                      slide: String = "15 minutes",
                      watermark: String = "2 hours"): DataFrame =
    spark.readStream.schema(graft.Tables.eventsSchema).parquet(srcDir)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming duplicate suppression within the watermark — the
    * streaming counterpart of M2's insert-ignore key
    * (`dropDuplicatesWithinWatermark` keeps state bounded; an
    * unbounded `dropDuplicates` would accrete every key forever).
    */
  def dedupStream(spark: SparkSession, srcDir: String,
                  keyCols: Seq[String], watermark: String = "2 hours"): DataFrame =
    spark.readStream.schema(graft.Tables.eventsSchema).parquet(srcDir)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class HolderUpd(contract_address: String, holder_address: String,
                             balance_raw: String, seq: Long)
  final case class TopEntry(contract_address: String, rnk: Int,
                            holder_address: String, balance_raw: String)

  val holderUpdSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[HolderUpd].schema

  /** The reference's signature computation — Top-100 holders per token
    * — as a CONTINUOUSLY-maintained stream instead of a 6-hourly batch
    * refresh: balance updates arrive, per-token state keeps each
    * holder's latest balance (last-writer-wins by `seq`, so replayed
    * or reordered micro-batches converge to the same state), and every
    * micro-batch emits the token's current Top-K.
    *
    * State is the per-token holder→(balance, seq) map — the same
    * information the batch refresh scans, because a true top-K over
    * balances that can DECREASE cannot evict below-K holders (one of
    * them may re-enter when a leader drops). Production runs this on
    * the RocksDB state store; the emitted Top-K is identical to
    * running [[graft.domain.Top100]] over the final balances —
    * including the ranking key: balances are canonical uint256 raw
    * STRINGS ordered by (length DESC, string DESC, holder ASC), the
    * repo's lossless NUMERIC(78,0) contract, never a Double that
    * collapses wei-scale balances above 2^53.
    *
    * State growth guards (the map is per-token holder cardinality and
    * never shrinks on its own — a long-running job needs an escape
    * hatch):
    *  - `inactivityTimeout` (e.g. `Some("30 days")`): tokens receiving
    *    no updates for that long have their state EVICTED (processing-
    *    time timeout). Trade-off made explicit: an evicted token that
    *    wakes up rebuilds state from its post-eviction updates only, so
    *    holders whose last update predates eviction drop out of its
    *    Top-K until they next move. Correct-by-default is eviction OFF.
    *  - `stateSizeHook` fires as (token, holderCount) on every state
    *    update — wire it to a metrics sink to alarm on runaway maps.
    */
  def streamingTop100(spark: SparkSession, srcDir: String, k: Int = 100,
                      inactivityTimeout: Option[String] = None,
                      stateSizeHook: (String, Int) => Unit = noopStateHook): DataFrame = {
    import spark.implicits._
    val upds = spark.readStream.schema(holderUpdSchema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir).as[HolderUpd]
    val timeoutConf =
      if (inactivityTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    upds.groupByKey(_.contract_address)
      .flatMapGroupsWithState(org.apache.spark.sql.streaming.OutputMode.Update(),
        timeoutConf)(top100Update(k, inactivityTimeout, stateSizeHook))
      .toDF()
  }

  val noopStateHook: (String, Int) => Unit = (_, _) => ()

  /** The per-group state transition of [[streamingTop100]], exposed so
    * specs can drive it directly against a scripted [[GroupState]]
    * (eviction and re-entry are processing-time behaviors that an e2e
    * stream test cannot deterministically trigger).
    */
  private[streaming] def top100Update(k: Int, inactivityTimeout: Option[String],
      stateSizeHook: (String, Int) => Unit)(
      token: String, batch: Iterator[HolderUpd],
      state: GroupState[Map[String, (String, Long)]]): Iterator[TopEntry] = {
    if (state.hasTimedOut) {
      // inactivity eviction: drop the map, emit nothing — the token
      // re-enters cleanly when its next update arrives
      state.remove()
      Iterator.empty
    } else {
      val prev = state.getOption.getOrElse(Map.empty[String, (String, Long)])
      val next = batch.foldLeft(prev) { (m, u) =>
        m.get(u.holder_address) match {
          case Some((_, s)) if s >= u.seq => m // stale replay: keep newer
          case _ => m.updated(u.holder_address, (u.balance_raw, u.seq))
        }
      }
      state.update(next)
      inactivityTimeout.foreach(state.setTimeoutDuration)
      stateSizeHook(token, next.size)
      // (length DESC, string DESC) = exact numeric DESC for canonical
      // decimal strings; holder ASC tiebreak matches Top100.compute
      next.toSeq.sortBy { case (h, (b, _)) => (-b.length, b, h) }(
        Ordering.Tuple3(Ordering.Int, Ordering.String.reverse, Ordering.String))
        .take(k).zipWithIndex
        .map { case ((h, (b, _)), i) => TopEntry(token, i + 1, h, b) }.iterator
    }
  }

  /** Event-time sessionization: gap-based `session_window` per user —
    * the training-pipeline view of user activity (a session closes
    * after `gap` of silence; windows merge as late-but-in-watermark
    * events arrive). Batch and streaming share the same expression, so
    * the spec gates streaming output against the batch run verbatim.
    */
  def sessionizedActivity(spark: SparkSession, srcDir: String,
                          gap: String = "30 minutes",
                          watermark: String = "2 hours"): DataFrame =
    spark.readStream.schema(graft.Tables.eventsSchema).parquet(srcDir)
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col("sw.start").as("session_start"), col("sw.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Watermarked stream-stream attribution join: each purchase matches
    * the same user's clicks in the preceding `horizon`. Both sides
    * carry watermarks and the join condition carries the time bound —
    * the two things Spark needs to EVICT join state (an unbounded
    * stream-stream join is a memory leak by construction; with the
    * bound, rows age out once the other side's watermark passes).
    */
  def attributionJoin(spark: SparkSession, srcDir: String,
                      horizon: String = "60 minutes",
                      watermark: String = "2 hours"): DataFrame = {
    def src = spark.readStream.schema(graft.Tables.eventsSchema).parquet(srcDir)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double, props: String)
  final case class UserCursor(user_id: Long, last_event_id: Long, events_seen: Long)

  /** Keyed streaming state: per-user monotonic cursor (max event id +
    * count), updated per micro-batch via mapGroupsWithState. Returns
    * the streaming DataFrame; callers attach a sink (tests use the
    * memory sink in update mode).
    */
  def userCursors(spark: SparkSession, srcDir: String): DataFrame = {
    import spark.implicits._
    val events = spark.readStream.schema(graft.Tables.eventsSchema)
      .parquet(srcDir).as[Event]
    def update(user: Long, batch: Iterator[Event],
               state: GroupState[UserCursor]): UserCursor = {
      val prev = state.getOption.getOrElse(UserCursor(user, -1L, 0L))
      val next = batch.foldLeft(prev)((c, e) =>
        UserCursor(user, math.max(c.last_event_id, e.event_id), c.events_seen + 1))
      state.update(next)
      next
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
      .toDF()
  }
}
