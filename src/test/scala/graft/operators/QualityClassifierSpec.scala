package graft.operators

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {

  /** Reference md5-prefix bucket, computed with java.security directly
    * — independent of the Catalyst expression under test. */
  private def refBucket(token: String, d: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    val hex = md.take(4).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % d).toInt
  }

  test("hashBucket matches an independent md5-prefix reference") {
    val ss = spark; import ss.implicits._
    val toks = Seq("the", "spark", "query", "zz9", "a")
    val got = toks.toDF("t")
      .select(QualityClassifier.hashBucket(col("t"), 64).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == toks.map(refBucket(_, 64)),
      "Catalyst bucket must equal the MessageDigest reference")
  }

  test("score folds the exact weight sum: reference arithmetic, empty doc = sigmoid(bias)") {
    val ss = spark; import ss.implicits._
    val d = 8
    val w = Array.tabulate(d)(i => (i - 3) * 0.25)
    val b = 0.5
    val text = "alpha beta alpha" // repetition must count twice
    val expected = {
      val s = "alpha beta alpha".split(" ")
        .foldLeft(0.0)((acc, t) => acc + w(refBucket(t, d)))
      1.0 / (1.0 + math.exp(-(b + s)))
    }
    val got = Seq(text, "").toDF("text")
      .select(QualityClassifier.score(TextFns.tokens(col("text")), w, b).as("s"))
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0) - expected) < 1e-12)
    assert(math.abs(got(1) - 1.0 / (1.0 + math.exp(-b))) < 1e-12,
      "empty token array must score sigmoid(bias)")
  }

  test("native HashedMargin is bit-identical to the composed hex-route fold") {
    val ss = spark; import ss.implicits._
    val rng = new scala.util.Random(11)
    val vocab = Vector("the", "data", "spark", "zz", "a1", "ünïcode", "x" * 40)
    val docs = (1 to 200).map { i =>
      (i.toLong, Seq.fill(rng.nextInt(30))(vocab(rng.nextInt(vocab.size))))
    } :+ (900L, Seq.empty[String]) // empty array must score exactly bias
    val w = Array.tabulate(64)(i => math.sin(i) * 2.0)
    val b = -1.25
    val df = docs.toDF("id", "toks")
    val rows = df.select(col("id"),
        QualityClassifier.margin(col("toks"), w, b).as("nat"),
        QualityClassifier.marginComposed(col("toks"), w, b).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"margin diverged for id ${r.getLong(0)}")
    }
    // null ELEMENT: both formulations must null-poison
    val nulls = Seq((1L, Seq[String]("ok", null))).toDF("id", "toks")
      .select(QualityClassifier.margin(col("toks"), w, b).as("nat"),
        QualityClassifier.marginComposed(col("toks"), w, b).as("ref"))
      .head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1),
      "null token must null both margins")
  }

  test("paretoKeep is deterministic, score-graded, and certain at score 1") {
    val ss = spark; import ss.implicits._
    val docs = (1 to 400).map(i => s"doc body number $i with words").toDF("text")
    def kept(score: Double): Long = docs
      .filter(QualityClassifier.paretoKeep(col("text"), lit(score), 9.0))
      .count()
    // pareto(alpha) >= 0 always, so score 1 keeps every doc except
    // the 2^-32 all-ones-md5-prefix corner (absent from this fixture)
    assert(kept(1.0) == 400L, "score 1 must keep the whole fixture")
    val lo = kept(0.05); val hi = kept(0.6)
    assert(lo < hi && hi < 400,
      s"acceptance must grade with score (got $lo < $hi < 400)")
    assert(kept(0.6) == kept(0.6), "content-hash draw must be reproducible")
  }

  test("trainer separates a planted vocabulary split with held-out accuracy >= 0.95") {
    val ss = spark; import ss.implicits._
    val rng = new scala.util.Random(7)
    val goodV = Vector("clean", "prose", "article", "review", "essay", "report")
    val badV = Vector("zzqx", "spam1", "click", "jnk", "garbl", "xxo")
    def doc(v: Vector[String]): String =
      Seq.fill(12)(v(rng.nextInt(v.size))).mkString(" ")
    val rows = (1 to 300).map { i =>
      val good = i % 2 == 0
      (i.toLong, doc(if (good) goodV else badV), good)
    }
    val df = rows.toDF("doc_id", "text", "label")
    val train = df.filter(col("doc_id") % 5 =!= 0)
    val holdout = df.filter(col("doc_id") % 5 === 0)
    val (w, b) = QualityClassifier.train(
      train, col("text"), col("label"), d = 32, iters = 40, lr = 1.0)
    assert(w.length == 32 && w.exists(_ != 0.0), "weights must move")
    val acc = holdout.select(
      avg(((QualityClassifier.score(TextFns.tokens(col("text")), w, b) >= 0.5)
        === col("label")).cast("double")).as("a")).head.getDouble(0)
    assert(acc >= 0.95, s"held-out accuracy $acc below 0.95")
  }

  test("train moves loss toward separation monotonically enough: 5 iters beat 1") {
    val ss = spark; import ss.implicits._
    val rows = (1 to 80).map { i =>
      val good = i % 2 == 0
      (i.toLong, if (good) "fine text words here" else "junkzz blob qq xx", good)
    }
    val df = rows.toDF("doc_id", "text", "label")
    def logloss(iters: Int): Double = {
      val (w, b) = QualityClassifier.train(
        df, col("text"), col("label"), d = 16, iters = iters, lr = 1.0)
      df.select(avg(
        -(col("label").cast("double") *
          log(QualityClassifier.score(TextFns.tokens(col("text")), w, b)) +
          (lit(1.0) - col("label").cast("double")) *
            log(lit(1.0) - QualityClassifier.score(
              TextFns.tokens(col("text")), w, b)))).as("l"))
        .head.getDouble(0)
    }
    assert(logloss(5) < logloss(1), "more gradient steps must reduce loss")
  }
}
