package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {

  test("asOfJoin matches each left row to the latest at-or-before right row per key") {
    val ss = spark; import ss.implicits._
    val trades = Seq( // (sym, ts, qty)
      ("A", 10L, 1L), ("A", 25L, 2L), ("A", 30L, 3L), ("B", 15L, 4L), ("C", 9L, 5L))
      .toDF("sym", "ts", "qty")
    val quotes = Seq( // (sym, ts, px)
      ("A", 5L, 100.0), ("A", 20L, 101.0), ("A", 30L, 102.0), ("B", 16L, 200.0))
      .toDF("sym", "qts", "px")
    val got = Temporal.asOfJoin(trades, quotes, Seq("sym"), "ts", "qts")
      .select(col("sym"), col("ts"), col("qty"), col("right_px"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(got == Set(
      ("A", 10L, 1L, Some(100.0)),
      ("A", 25L, 2L, Some(101.0)),
      ("A", 30L, 3L, Some(102.0)), // equal ts matches (at-or-before)
      ("B", 15L, 4L, None),        // quote arrives after the trade
      ("C", 9L, 5L, None)))        // no quotes for the key at all
  }

  test("asOfJoin forward matches the earliest at-or-after right row; tolerance caps the lookahead") {
    val ss = spark; import ss.implicits._
    val trades = Seq(("A", 10L, 1L), ("A", 21L, 2L), ("B", 5L, 3L))
      .toDF("sym", "ts", "qty")
    val quotes = Seq(("A", 10L, 100.0), ("A", 20L, 101.0), ("A", 30L, 102.0))
      .toDF("sym", "qts", "px")
    val got = Temporal.asOfJoin(trades, quotes, Seq("sym"), "ts", "qts",
        forward = true)
      .select(col("sym"), col("ts"), col("right_px"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(got == Set(
      ("A", 10L, Some(100.0)), // equal ts matches (at-or-after)
      ("A", 21L, Some(102.0)), // skips the 20 quote, takes the next
      ("B", 5L, None)))        // no quotes for the key
    val tight = Temporal.asOfJoin(trades, quotes, Seq("sym"), "ts", "qts",
        forward = true, toleranceSec = Some(5L))
      .filter(col("ts") === 21L).select("right_px").collect().head
    assert(tight.isNullAt(0), "match farther than the lookahead must drop")
  }

  test("asOfJoin tolerance drops stale matches") {
    val ss = spark; import ss.implicits._
    val l = Seq(("A", 100L, 1L)).toDF("k", "ts", "v")
    val r = Seq(("A", 10L, 9.0)).toDF("k", "rts", "x")
    val loose = Temporal.asOfJoin(l, r, Seq("k"), "ts", "rts")
      .select("right_x").collect().head
    assert(loose.getDouble(0) == 9.0)
    val tight = Temporal.asOfJoin(l, r, Seq("k"), "ts", "rts",
      toleranceSec = Some(50L)).select("right_x").collect().head
    assert(tight.isNullAt(0), "match older than the tolerance must drop")
  }

  test("asOfJoin composite keys partition matches independently") {
    val ss = spark; import ss.implicits._
    val l = Seq(("A", "x", 10L, 1L), ("A", "y", 10L, 2L), ("B", "x", 10L, 3L))
      .toDF("k1", "k2", "ts", "v")
    val r = Seq(("A", "x", 5L, 1.0), ("A", "y", 7L, 2.0), ("B", "y", 3L, 9.0))
      .toDF("k1", "k2", "rts", "p")
    val got = Temporal.asOfJoin(l, r, Seq("k1", "k2"), "ts", "rts")
      .select(col("k1"), col("k2"), col("right_p"))
      .collect().map(x => (x.getString(0), x.getString(1),
        Option(x.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(got == Set(
      ("A", "x", Some(1.0)),
      ("A", "y", Some(2.0)),   // same k1, different k2 — no bleed
      ("B", "x", None)))       // (B,x) must not see (B,y)'s quote
  }

  test("asOfJoinSkewed equals asOfJoin on a hot-key fixture (one key = 50% of rows), all variants") {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(42)
    // "HOT" holds half of all rows on both sides; the rest spread
    // over 50 keys. Right (key, ts) kept unique so the tie-order
    // caveat in the Scaladoc never kicks in.
    def side(n: Int, tsCol: String): org.apache.spark.sql.DataFrame = {
      val rows = scala.collection.mutable.LinkedHashMap[(String, Long), Double]()
      var i = 0
      while (rows.size < n) {
        val k = if (i % 2 == 0) "HOT" else "k" + rnd.nextInt(50)
        rows.getOrElseUpdate((k, rnd.nextInt(5000).toLong), rnd.nextDouble())
        i += 1
      }
      rows.toSeq.map { case ((k, t), v) => (k, t, v) }.toDF("k", tsCol, "v")
    }
    val l = side(400, "ts")
    val r = side(400, "rts").withColumnRenamed("v", "p")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "ts", "v", "right_p").collect().map(_.toSeq).toSet
    for (fwd <- Seq(false, true); tol <- Seq(None, Some(300L));
         width <- Seq(1L, 97L, 1000L, 100000L)) {
      val plain = norm(Temporal.asOfJoin(l, r, Seq("k"), "ts", "rts",
        toleranceSec = tol, forward = fwd))
      val skewed = norm(Temporal.asOfJoinSkewed(l, r, Seq("k"), "ts", "rts",
        bucketWidth = width, toleranceSec = tol, forward = fwd))
      assert(skewed == plain,
        s"mismatch at forward=$fwd tolerance=$tol bucketWidth=$width")
    }
  }

  test("asOfJoinAuto probes skew: plain path on uniform keys, derived-width skewed path on a hot key") {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(7)
    val uniformL = (1 to 300).map(i => ("k" + (i % 60), rnd.nextInt(5000).toLong, i.toLong))
      .toDF("k", "ts", "v")
    val uniformR = (1 to 300).map(i => ("k" + (i % 60), rnd.nextInt(5000).toLong, rnd.nextDouble()))
      .distinct.toDF("k", "rts", "p").dropDuplicates("k", "rts")
    val hotL = (1 to 300).map(i =>
      (if (i % 2 == 0) "HOT" else "k" + (i % 40), rnd.nextInt(5000).toLong, i.toLong))
      .toDF("k", "ts", "v")

    // probe decision itself (sampleFraction 1.0 = exact counts):
    // uniform keys stay under the threshold → None → plain path
    assert(Temporal.probeAsOfSkew(uniformL, uniformR, Seq("k"), "ts", "rts",
      hotKeyRowThreshold = 100L, targetHotTasks = 8, sampleFraction = 1.0).isEmpty)
    // the hot key trips it → Some(width) with width ≈ span/targetHotTasks
    val w = Temporal.probeAsOfSkew(hotL, uniformR, Seq("k"), "ts", "rts",
      hotKeyRowThreshold = 100L, targetHotTasks = 8, sampleFraction = 1.0)
    assert(w.nonEmpty && w.get >= 1L && w.get <= 5000L / 8 + 1,
      s"derived width $w should spread the hot span over ~8 tasks")

    // end-to-end: auto equals plain on BOTH shapes (forced-exact probe)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "ts", "v", "right_p").collect().map(_.toSeq).toSet
    for (l <- Seq(uniformL, hotL)) {
      val auto = norm(Temporal.asOfJoinAuto(l, uniformR, Seq("k"), "ts", "rts",
        hotKeyRowThreshold = 100L, targetHotTasks = 8, sampleFraction = 1.0))
      assert(auto == norm(Temporal.asOfJoin(l, uniformR, Seq("k"), "ts", "rts")))
    }
  }

  test("asOfJoinSkewed carries the last right row across empty buckets") {
    val ss = spark; import ss.implicits._
    // right row at t=3, then a long gap: buckets 1..9 are right-empty
    // and the left rows at t=55 and t=95 must still see it.
    val l = Seq(("A", 55L, 1L), ("A", 95L, 2L)).toDF("k", "ts", "v")
    val r = Seq(("A", 3L, 7.5)).toDF("k", "rts", "p")
    val got = Temporal.asOfJoinSkewed(l, r, Seq("k"), "ts", "rts",
        bucketWidth = 10L)
      .select("ts", "right_p").collect()
      .map(x => (x.getLong(0), x.getDouble(1))).toSet
    assert(got == Set((55L, 7.5), (95L, 7.5)))
  }

  test("rangeJoin result is bucketWidth-invariant (1, tiny, interval-sized, huge)") {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(7)
    val l = Seq.tabulate(40) { i =>
      val s = rnd.nextInt(300).toLong; ("k" + (i % 2), s, s + rnd.nextInt(50))
    }.toDF("k", "ls", "le")
    val r = Seq.tabulate(40) { i =>
      val s = rnd.nextInt(300).toLong; ("k" + (i % 2), s, s + rnd.nextInt(50))
    }.toDF("k", "rs", "re")
    def run(w: Long) = Temporal.rangeJoin(l, r, Seq("k"), "ls", "le", "rs", "re", w)
      .select("k", "ls", "le", "rs", "re").collect().map(_.toSeq).toSet
    val widths = Seq(1L, 7L, 50L, 100000L).map(run)
    assert(widths.head.nonEmpty)
    assert(widths.distinct.size == 1,
      "bucket width is a performance knob — it must never change the result")
  }

  test("rangeJoin equals the naive overlap θ-join, without the cross product") {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(11)
    val l = Seq.tabulate(60) { i =>
      val s = rnd.nextInt(1000).toLong; ("k" + (i % 3), s, s + rnd.nextInt(80))
    }.toDF("k", "ls", "le")
    val r = Seq.tabulate(60) { i =>
      val s = rnd.nextInt(1000).toLong; ("k" + (i % 3), s, s + rnd.nextInt(80))
    }.toDF("k", "rs", "re")
    val got = Temporal.rangeJoin(l, r, Seq("k"), "ls", "le", "rs", "re",
      bucketWidth = 64L)
      .select("k", "ls", "le", "rs", "re")
      .collect().map(_.toSeq).toSet
    val want = l.join(r, Seq("k"))
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .dropDuplicates("k", "ls", "le", "rs", "re")
      .select("k", "ls", "le", "rs", "re")
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("rangeJoinAuto derives a median-length width and matches the fixed-width result") {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(19)
    val l = Seq.tabulate(80) { i =>
      val s = rnd.nextInt(1000).toLong; ("k" + (i % 3), s, s + 20 + rnd.nextInt(20))
    }.toDF("k", "ls", "le")
    val r = Seq.tabulate(80) { i =>
      val s = rnd.nextInt(1000).toLong; ("k" + (i % 3), s, s + 20 + rnd.nextInt(20))
    }.toDF("k", "rs", "re")
    // exact probe (fraction 1.0): median of lengths in [20, 39]
    val w = Temporal.probeRangeWidth(l, r, "ls", "le", "rs", "re", sampleFraction = 1.0)
    assert(w >= 20L && w <= 39L, s"median-length width out of range: $w")
    // zero-length intervals floor at 1
    val pt = Seq(("k", 5L, 5L)).toDF("k", "ls", "le")
    assert(Temporal.probeRangeWidth(pt, pt.toDF("k", "rs", "re"),
      "ls", "le", "rs", "re", 1.0) == 1L)

    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "ls", "le", "rs", "re").collect().map(_.toSeq).toSet
    val auto = norm(Temporal.rangeJoinAuto(l, r, Seq("k"), "ls", "le", "rs", "re",
      sampleFraction = 1.0))
    val fixed = norm(Temporal.rangeJoin(l, r, Seq("k"), "ls", "le", "rs", "re",
      bucketWidth = 64L))
    assert(auto == fixed && auto.nonEmpty)
  }
}
