package graft

import graft.operators.Rankings
import graft.pipelines.Report
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests (SURVEY §5.3) using ScalaCheck generators with
  * a FIXED seed (deterministic CI). Pure driver-side formatters iterate
  * hundreds of cases; Spark-side properties generate one batch and
  * assert over a single job (per-trial Spark jobs would be
  * pathologically slow).
  */
class PropertySpec extends SparkSpec {

  private def sample[T](g: Gen[T], seed: Long = 42L): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("commify preserves the numeric value and only inserts commas") {
    val cases = sample(Gen.listOfN(300, for {
      int <- Gen.chooseNum(0L, 999999999999L)
      frac <- Gen.chooseNum(0, 999)
    } yield s"$int.$frac"))
    for (s <- cases) {
      val two = Report.twoDec(s)
      val c = Report.commify(two)
      assert(c.replace(",", "") == two, s"case $s")
      val groups = c.split("\\.")(0).split(",")
      assert(groups.head.nonEmpty && groups.head.length <= 3, s"case $s -> $c")
      assert(groups.tail.forall(_.length == 3), s"case $s -> $c")
    }
  }

  test("humanize picks the largest fitting K/M/B/T unit") {
    val cases = sample(Gen.listOfN(300, Gen.chooseNum(0L, 10000000000000L)), 7L)
    for (n <- cases) {
      val h = Report.humanize(n.toString)
      val suffix =
        if (n >= 1000000000000L) "T"
        else if (n >= 1000000000L) "B"
        else if (n >= 1000000L) "M"
        else if (n >= 1000L) "K"
        else ""
      if (suffix.isEmpty) assert(h.matches("""\d+\.\d{2}"""), s"$n -> $h")
      else assert(h.endsWith(suffix), s"$n -> $h")
    }
  }

  test("top-K is a prefix of the full ranking for every group (batch property)") {
    val ss = spark; import ss.implicits._
    val rows = sample(Gen.listOfN(300, for {
      g <- Gen.oneOf("a", "b", "c")
      id <- Gen.chooseNum(0, 10000)
      v <- Gen.chooseNum(-1000.0, 1000.0)
    } yield (g, id.toLong, v))).distinctBy(r => (r._1, r._2))
    val df = rows.toDF("g", "id", "v")
    val k = 7
    val topK = Rankings.topKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc, col("id").asc), k)
      .select("g", "id").as[(String, Long)].collect().toSet
    val full = Rankings.topKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc, col("id").asc), Int.MaxValue)
      .select(col("g"), col("id"), col("rnk")).as[(String, Long, Int)].collect()
    val prefix = full.filter(_._3 <= k).map(t => (t._1, t._2)).toSet
    assert(topK == prefix)
    assert(full.groupBy(_._1).forall { case (_, rs) => rs.exists(_._3 == 1) })
  }

  test("scaleByDecimals inverts: scaled × 10^d round-trips the raw (batch property)") {
    val ss = spark; import ss.implicits._
    val cases = sample(Gen.listOfN(200, for {
      raw <- Gen.chooseNum(0L, Long.MaxValue / 2)
      d <- Gen.oneOf(0, 2, 6, 8, 12, 18)
    } yield (raw.toString, d)))
    val bad = cases.toDF("raw", "d")
      .withColumn("scaled", graft.functions.AmountFns.scaleByDecimals(col("raw"), col("d")))
      .withColumn("back", col("scaled") * pow(lit(10.0), col("d")).cast("decimal(38,0)"))
      .filter(col("back").cast("decimal(38,0)").cast("string") =!= col("raw"))
      .count()
    assert(bad == 0)
  }

  test("cursor GREATEST-merge is monotonic and order-insensitive (batch property)") {
    val ss = spark; import ss.implicits._
    val streams = sample(Gen.listOfN(20, for {
      s <- Gen.identifier.map(_.take(8))
      b1 <- Gen.chooseNum(0L, 1000000L)
      b2 <- Gen.chooseNum(0L, 1000000L)
    } yield (s, b1, b2))).distinctBy(_._1)
    def store() = new graft.domain.MerlStore(spark,
      java.nio.file.Files.createTempDirectory("prop_cursors").toString)
    def batch(vals: Seq[(String, Long)]) =
      vals.toDF("stream", "last_scanned_block")
        .withColumn("last_page", lit(1))
        .withColumn("metadata", lit("{}"))
    val ab = store()
    ab.mergeCursors(batch(streams.map(t => (t._1, t._2))))
    ab.mergeCursors(batch(streams.map(t => (t._1, t._3))))
    val ba = store()
    ba.mergeCursors(batch(streams.map(t => (t._1, t._3))))
    ba.mergeCursors(batch(streams.map(t => (t._1, t._2))))
    def state(st: graft.domain.MerlStore) =
      st.read("ingestion_cursors").select("stream", "last_scanned_block")
        .as[(String, Long)].collect().toMap
    val a = state(ab); val b = state(ba)
    assert(a == b)
    assert(streams.forall { case (s, b1, b2) => a(s) == math.max(b1, b2) })
  }

  test("z-order address laws: per-dim monotone, bounded, dim-swap = bit-swap") {
    import graft.plans.ZInterleave
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.LongType
    def z(vals: Long*): Long =
      ZInterleave(vals.map(v => Literal(v, LongType))).eval(null).asInstanceOf[Long]
    val cases = sample(Gen.listOfN(200, for {
      x <- Gen.chooseNum(0L, (1L << 31) - 2)
      y <- Gen.chooseNum(0L, (1L << 31) - 1)
    } yield (x, y)), 13L)
    for ((x, y) <- cases) {
      // monotone in each dimension with the other fixed — the property
      // file-level min/max pruning relies on
      assert(z(x + 1, y) > z(x, y), s"x-monotonicity at ($x,$y)")
      if (y < (1L << 31) - 1) assert(z(x, y + 1) > z(x, y), s"y-monotonicity at ($x,$y)")
      // 2 dims × 31 bits → always below 2^62, never negative
      assert(z(x, y) >= 0L && z(x, y) < (1L << 62), s"bounds at ($x,$y)")
      // swapping dims swaps the even/odd bit planes: z(x,y) and z(y,x)
      // carry the same multiset of bits
      assert(java.lang.Long.bitCount(z(x, y)) == java.lang.Long.bitCount(z(y, x)))
    }
    // interleave distributes over per-dim maxima: the address of the
    // per-dim max bounds every address in a file (min/max skipping)
    for (((x1, y1), (x2, y2)) <- cases.zip(cases.reverse)) {
      val zmax = z(math.max(x1, x2), math.max(y1, y2))
      assert(zmax >= z(x1, y1) || zmax >= z(x2, y2))
    }
  }

  test("BucketIndex binary search equals the linear-scan definition") {
    import graft.plans.BucketIndex
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.DoubleType
    val cases = sample(Gen.listOfN(150, for {
      nb <- Gen.chooseNum(1, 40)
      bounds <- Gen.listOfN(nb, Gen.chooseNum(-100.0, 100.0))
      x <- Gen.chooseNum(-150.0, 150.0)
    } yield (bounds.sorted, x)), 23L)
    for ((bounds, x) <- cases) {
      val got = BucketIndex(Literal(x, DoubleType), bounds.toIndexedSeq)
        .eval(null).asInstanceOf[Long]
      val want = bounds.count(_ <= x).toLong
      assert(got == want, s"x=$x bounds=$bounds")
    }
  }

  test("MinHash signature is duplicate-invariant (min over a multiset)") {
    import graft.plans.MinHashSig
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def sig(toks: Seq[String]): Seq[Long] =
      MinHashSig(Literal(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any]),
        ArrayType(StringType)), 3, 16)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    val base = Seq("a", "b", "c", "d", "e", "f")
    // determinism: identical input, identical signature
    assert(sig(base) == sig(base))
    // min-over-multiset law: a doc whose shingle set is a SUPERSET
    // (doubling the doc adds seam shingles, drops none) can only keep
    // or DECREASE each of the 16 minima
    val single = sig(base)
    val doubled = sig(base ++ base)
    single.zip(doubled).foreach { case (s, d) => assert(d <= s) }
  }

  test("deterministicShuffle is a permutation for any shard count (batch property)") {
    val ss = spark; import ss.implicits._
    import graft.operators.Packing
    val n = 400
    val docs = (1L to n.toLong).toDF("doc_id")
    for (shards <- Seq(1, 3, 32)) {
      val out = Packing.deterministicShuffle(docs, col("doc_id"), shards, "s")
        .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
      assert(out.map(_._1).sorted.toSeq == (1L to n.toLong))
      assert(out.forall(r => r._2 >= 0 && r._2 < shards))
      out.groupBy(_._2).values.foreach { sh =>
        assert(sh.map(_._3).sorted.toSeq == (1L to sh.size.toLong))
      }
    }
  }
}
