package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins (brief §custom-operators:
  * "as-of join, range join"), composed from existing operators — the
  * preferred implementation tier, no custom physical plan needed.
  *
  * Scale shapes:
  *  - [[asOfJoin]] is the UNION + keyed-window pattern: tag both
  *    sides, union, one window pass per key ordered by time carrying
  *    the latest right payload forward. ONE shuffle on the join key,
  *    state per row is O(1) (`last` over an unbounded-preceding frame
  *    is a running value, not a buffered frame) — never the
  *    leftRows × rightRows range explosion of a naive θ-join. Skew
  *    honesty: a window partition is one task, so a single key holding
  *    a large fraction of all rows serializes there — with
  *    high-cardinality keys (user/symbol/doc ids) this is the right
  *    trade at any scale; for a pathological hot key use
  *    [[asOfJoinSkewed]], which pre-splits by coarse time bucket and
  *    carries the previous bucket's last right row across boundaries.
  *  - [[rangeJoin]] is interval bucketing: explode each interval to
  *    the fixed-width buckets it covers, equi-join on (key, bucket),
  *    dedup, verify true overlap. Pair work is proportional to
  *    genuinely-overlapping bucket co-occupancy, not |L|×|R|;
  *    `bucketWidth` tunes the explode-vs-collision trade exactly like
  *    a time-series index granularity.
  */
object Temporal {

  /** For each left row, the LATEST right row with `rightTs <=
    * leftTs` (and same key), i.e. the classic backward as-of join —
    * or, with `forward = true`, the EARLIEST right row with
    * `rightTs >= leftTs`. Right payload columns come back prefixed,
    * null when no right row qualifies. `tolerance` (seconds) drops
    * matches farther than `tolerance` from `leftTs` in the join
    * direction. Timestamps must be numeric (epoch-style): the forward
    * variant is the backward one on the negated time axis, which
    * preserves the single-shuffle running-`last` shape for both
    * directions.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               rightPrefix: String = "right_",
               toleranceSec: Option[Long] = None,
               forward: Boolean = false): DataFrame = {
    def ord(c: Column): Column = if (forward) -c else c
    val rightPayload = right.columns.filterNot(c => keyCols.contains(c))
    val l = left.withColumn("__ts", ord(col(leftTs)))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightPayload.map(col): _*).schema.fields)))
    val r = right.select(
      keyCols.map(col) ++ Seq(
        ord(col(rightTs)).as("__ts"), lit(0).as("__side"),
        struct(rightPayload.map(col): _*).as("__r")): _*)
    // right rows sort BEFORE left rows at equal ts → ties match
    // (at-or-before semantics)
    val unioned = l.select(
      keyCols.map(col) ++ Seq(col("__ts"), col("__side"), col("__r")) ++
        left.columns.filterNot(c => keyCols.contains(c)).map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    matchAndExtract(unioned, keyCols.map(col), rightPayload, rightPrefix,
      toleranceSec)
  }

  /** Skew-resistant as-of join: identical semantics to [[asOfJoin]]
    * but the single keyed window — one task per key — is replaced by
    * a window per (key, coarse time bucket), so a pathological hot
    * key (one key holding half of all rows) spreads across
    * rows-span / `bucketWidth` tasks instead of serializing in one.
    *
    * Correctness across bucket boundaries: a left row early in bucket
    * `b` may need a right row from an earlier bucket. We aggregate
    * the last right row per (key, bucket) — a map-side-combinable
    * `max(struct(ts, payload))` — then run ONE small window over the
    * per-bucket aggregate frame (|keys| × |buckets| rows, data-size
    * independent) to carry the running last right row into each later
    * bucket, and inject it as a synthetic right row that sorts first
    * (its timestamp is from an earlier bucket, hence below the bucket
    * floor). The carried row keeps its original timestamp, so
    * `toleranceSec` stays exact.
    *
    * Tie note: with duplicate right timestamps per key, [[asOfJoin]]
    * picks an arbitrary one of the tied payloads while this variant
    * picks the struct-max; equal on any input whose (key, ts) is
    * unique on the right, which the equivalence spec pins.
    */
  def asOfJoinSkewed(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                     leftTs: String, rightTs: String, bucketWidth: Long,
                     rightPrefix: String = "right_",
                     toleranceSec: Option[Long] = None,
                     forward: Boolean = false): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def ord(c: Column): Column = if (forward) -c else c
    def bkt(c: Column): Column = floor(c / bucketWidth).cast("long")
    val rightPayload = right.columns.filterNot(c => keyCols.contains(c))
    val keyC = keyCols.map(col)

    val r = right.select(
      keyC ++ Seq(ord(col(rightTs)).as("__ts"),
        struct(rightPayload.map(col): _*).as("__r")): _*)
      .withColumn("__bkt", bkt(col("__ts")))
    val l = left.withColumn("__ts", ord(col(leftTs)))
      .withColumn("__bkt", bkt(col("__ts")))

    // Last right row per (key, bucket): partial-aggregated map-side,
    // shuffle carries one struct per group.
    val perBucket = r.groupBy(keyC :+ col("__bkt"): _*)
      .agg(max(struct(col("__ts"), col("__r"))).as("__lastr"))
    // Every bucket either side occupies; right-only buckets must stay
    // in the carry window so their payload propagates across gaps.
    val allBuckets = l.select(keyC :+ col("__bkt"): _*).distinct()
      .unionByName(perBucket.select(keyC :+ col("__bkt"): _*)).distinct()
    val wCarry = Window.partitionBy(keyC: _*).orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = allBuckets
      .join(perBucket, keyCols :+ "__bkt", "left")
      .withColumn("__carry", last(col("__lastr"), ignoreNulls = true).over(wCarry))
      .filter(col("__carry").isNotNull)
      .select(keyC ++ Seq(col("__bkt"),
        col("__carry").getField("__ts").as("__ts"),
        lit(0).as("__side"),
        col("__carry").getField("__r").as("__r")): _*)

    val rTagged = r.select(keyC ++ Seq(col("__bkt"), col("__ts"),
      lit(0).as("__side"), col("__r")): _*)
    val lTagged = l.select(
      keyC ++ Seq(col("__bkt"), col("__ts"), lit(1).as("__side"),
        lit(null).cast(org.apache.spark.sql.types.StructType(
          right.select(rightPayload.map(col): _*).schema.fields)).as("__r")) ++
        left.columns.filterNot(c => keyCols.contains(c)).map(col): _*)
    val unioned = lTagged
      .unionByName(rTagged, allowMissingColumns = true)
      .unionByName(carried, allowMissingColumns = true)
    matchAndExtract(unioned, keyC :+ col("__bkt"), rightPayload, rightPrefix,
      toleranceSec)
  }

  /** Skew probe for the as-of variants: estimate the hottest key's
    * total row count (both sides) from a fixed-seed sample. Returns
    * `None` when no key is hot enough to serialize a window task —
    * take [[asOfJoin]] — or `Some(bucketWidth)` sized so the hot key's
    * time span spreads over ~`targetHotTasks` window partitions —
    * take [[asOfJoinSkewed]].
    *
    * Cost: one sampled aggregate + a 1-row TakeOrdered, run EAGERLY at
    * plan-build time (two small jobs). At 100 TB that is a 0.1–1%
    * scan deciding whether to pay the carry machinery — the same
    * trade AQE's skew-join stats make, but across the window operator
    * Spark's AQE cannot re-plan.
    */
  private[operators] def probeAsOfSkew(left: DataFrame, right: DataFrame,
                                       keyCols: Seq[String],
                                       leftTs: String, rightTs: String,
                                       hotKeyRowThreshold: Long,
                                       targetHotTasks: Int,
                                       sampleFraction: Double): Option[Long] = {
    val keyC = keyCols.map(col)
    def side(df: DataFrame, ts: String): DataFrame =
      df.select(keyC :+ col(ts).cast("long").as("__ts"): _*)
    val all = side(left, leftTs).unionByName(side(right, rightTs))
    val f = math.min(1.0, sampleFraction)
    val sampled = if (f >= 1.0) all else all.sample(withReplacement = false, f, seed = 42L)
    val top = sampled.groupBy(keyC: _*)
      .agg(count(lit(1)).as("__n"), min(col("__ts")).as("__lo"), max(col("__ts")).as("__hi"))
      .orderBy(col("__n").desc +: keyC.map(_.asc): _*)
      .limit(1).collect()
    top.headOption.flatMap { row =>
      val est = (row.getAs[Long]("__n") / f).toLong
      if (est < hotKeyRowThreshold) None
      else {
        val span = math.max(1L, row.getAs[Long]("__hi") - row.getAs[Long]("__lo"))
        Some(math.max(1L, span / math.max(1, targetHotTasks)))
      }
    }
  }

  /** Adaptive as-of join: [[probeAsOfSkew]] decides, per input, whether
    * the hot-key mitigation is worth its carry machinery — unskewed
    * inputs pay only the probe over the plain [[asOfJoin]], skewed
    * inputs get [[asOfJoinSkewed]] with a bucketWidth derived from the
    * hot key's actual time span (instead of a caller-guessed constant).
    * Semantics are identical either way on inputs whose right (key,
    * ts) is unique (the [[asOfJoinSkewed]] tie note).
    *
    * `hotKeyRowThreshold` defaults to 2M rows — the point where one
    * window task's sort+scan visibly serializes a stage; below it the
    * plain path's single shuffle wins on any cluster.
    */
  def asOfJoinAuto(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTs: String, rightTs: String,
                   rightPrefix: String = "right_",
                   toleranceSec: Option[Long] = None,
                   forward: Boolean = false,
                   hotKeyRowThreshold: Long = 2000000L,
                   targetHotTasks: Int = 64,
                   sampleFraction: Double = 0.01): DataFrame =
    probeAsOfSkew(left, right, keyCols, leftTs, rightTs,
        hotKeyRowThreshold, targetHotTasks, sampleFraction) match {
      case None => asOfJoin(left, right, keyCols, leftTs, rightTs,
        rightPrefix, toleranceSec, forward)
      case Some(w) => asOfJoinSkewed(left, right, keyCols, leftTs, rightTs,
        bucketWidth = w, rightPrefix, toleranceSec, forward)
    }

  /** Shared tail of the as-of variants: one window pass over the
    * tagged union carrying the latest right payload/timestamp forward,
    * keep left rows, apply tolerance, unpack the payload struct.
    */
  private def matchAndExtract(unioned: DataFrame, partCols: Seq[Column],
                              rightPayload: Seq[String], rightPrefix: String,
                              toleranceSec: Option[Long]): DataFrame = {
    val w = Window.partitionBy(partCols: _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__matchTs", last(
        when(col("__side") === 0, col("__ts")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val tol = toleranceSec.fold(matched)(t => matched.withColumn("__match",
        when(col("__matchTs") >= col("__ts") - t, col("__match")))
      .withColumn("__matchTs",
        when(col("__matchTs") >= col("__ts") - t, col("__matchTs"))))
    rightPayload.foldLeft(tol) { (df, c) =>
      df.withColumn(rightPrefix + c, col("__match").getField(c))
    }.drop("__ts", "__side", "__r", "__match", "__matchTs", "__bkt")
  }

  /** Bucket width probe for [[rangeJoin]]: the median interval length
    * from a fixed-seed sample of both sides. At the median, a typical
    * interval explodes to ~2 buckets (bounded replication) while a
    * bucket co-locates ~2 interval-lengths of data (bounded collision
    * false positives) — the balanced point of the explode-vs-collision
    * trade [[rangeJoin]]'s `bucketWidth` knob tunes, and result-
    * invariant in any case (the spec proves width-invariance).
    * Zero-length-dominated inputs floor at width 1.
    */
  private[operators] def probeRangeWidth(left: DataFrame, right: DataFrame,
                                         leftStart: String, leftEnd: String,
                                         rightStart: String, rightEnd: String,
                                         sampleFraction: Double): Long = {
    def lens(df: DataFrame, s: String, e: String): DataFrame =
      df.select((col(e).cast("long") - col(s).cast("long")).as("__len"))
    val all = lens(left, leftStart, leftEnd)
      .unionByName(lens(right, rightStart, rightEnd))
    val f = math.min(1.0, sampleFraction)
    val sampled = if (f >= 1.0) all else all.sample(withReplacement = false, f, seed = 42L)
    val m = sampled.agg(
      percentile_approx(col("__len"), lit(0.5), lit(10000)).as("__m"))
      .head().get(0)
    math.max(1L, if (m == null) 1L else m.asInstanceOf[Number].longValue())
  }

  /** [[rangeJoin]] with the bucket width derived from a cheap sampled
    * interval-length probe instead of a caller guess — same results at
    * any width (bucketing only generates candidates; the exact overlap
    * predicate decides), so the probe is purely a cost decision, the
    * [[asOfJoinAuto]] pattern applied to the interval case.
    */
  def rangeJoinAuto(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                    leftStart: String, leftEnd: String,
                    rightStart: String, rightEnd: String,
                    sampleFraction: Double = 0.01): DataFrame =
    rangeJoin(left, right, keyCols, leftStart, leftEnd, rightStart, rightEnd,
      probeRangeWidth(left, right, leftStart, leftEnd, rightStart, rightEnd,
        sampleFraction))

  /** Interval-overlap join: pairs of (left, right) rows sharing a key
    * whose [start, end] ranges overlap. Both sides' intervals explode
    * to `bucketWidth`-sized buckets; candidates meet on (key, bucket)
    * and the exact overlap predicate prunes bucket-edge false
    * positives. Endpoints are inclusive.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                leftStart: String, leftEnd: String,
                rightStart: String, rightEnd: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketed(df: DataFrame, s: String, e: String, tag: String): DataFrame =
      df.withColumn("__b", explode(sequence(
          floor(col(s) / bucketWidth).cast("long"),
          floor(col(e) / bucketWidth).cast("long"))))
        .withColumnRenamed(s, tag + s).withColumnRenamed(e, tag + e)
    val lb = bucketed(left, leftStart, leftEnd, "")
    val rb = bucketed(
      right.select(keyCols.map(col) ++ Seq(col(rightStart), col(rightEnd)): _*),
      rightStart, rightEnd, "r__")
    lb.join(rb, keyCols :+ "__b")
      .filter(col(leftStart) <= col("r__" + rightEnd) &&
        col("r__" + rightStart) <= col(leftEnd))
      .drop("__b")
      .dropDuplicates(keyCols ++ Seq(leftStart, leftEnd,
        "r__" + rightStart, "r__" + rightEnd))
      .withColumnRenamed("r__" + rightStart, rightStart)
      .withColumnRenamed("r__" + rightEnd, rightEnd)
  }
}
