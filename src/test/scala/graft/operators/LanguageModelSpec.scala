package graft.operators

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {

  private def toksOf(docs: Seq[(Long, String)]) = {
    val ss = spark; import ss.implicits._
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), TextFns.tokens(col("text")).as("__toks"))
  }

  test("selfPerplexity matches a hand-computed Laplace bigram model") {
    // corpus: d1 = "a b a b", d2 = "a b"  (v = 8 ⇒ nothing folds)
    // bigram starts: a→b ×3, b→a ×1 ⇒ c1(a)=3, c1(b)=1
    // p(b|a) = (3+1)/(3+9) = 1/3 ; p(a|b) = (1+1)/(1+9) = 1/5
    val v = 8
    def lpm(p: Double): Long = math.round(math.log(p) * 1e6)
    def ppl(ps: Seq[Double]): Double = {
      val s = ps.map(lpm).sum
      BigDecimal(math.exp(-(s.toDouble / 1e6) / ps.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val res = LanguageModel.selfPerplexity(
      toksOf(Seq((1L, "a b a b"), (2L, "a b"))), v)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(res(1L) == ((3L, ppl(Seq(1.0 / 3, 1.0 / 5, 1.0 / 3)))))
    assert(res(2L) == ((1L, ppl(Seq(1.0 / 3)))))
  }

  test("fluent (common-bigram) docs score lower perplexity than scrambled ones") {
    val common = (1 to 40).map(i => (i.toLong, "the cat sat on the mat"))
    val fluent = (100L, "the cat sat on the mat")
    val scrambled = (101L, "mat the on sat cat the")
    val res = LanguageModel.selfPerplexity(
      toksOf(common :+ fluent :+ scrambled), v = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(res(100L) < res(101L),
      s"fluent ${res(100L)} must beat scrambled ${res(101L)}")
  }

  test("vocab cap folds rare tokens to <unk>; one-token docs are excluded") {
    val ss = spark; import ss.implicits._
    // 'z' dominates; with v = 1 every other token folds to <unk>
    val toks = toksOf(Seq((1L, "z z z z z"), (2L, "q r z"), (3L, "solo")))
    val vocab = LanguageModel.vocabTopV(toks, 1)
      .collect().map(_.getString(0)).toSeq
    assert(vocab == Seq("z"))
    val remapped = toks
      .select(col("doc_id"),
        LanguageModel.remapToVocab(col("__toks"), vocab).as("__toks"))
    val bg = LanguageModel.docBigrams(remapped)
      .as[(Long, String, String)].collect().toSet
    assert(bg.collect { case (2L, a, b) => (a, b) } ==
      Set(("<unk>", "<unk>"), ("<unk>", "z")))
    // doc 3 has one token — no bigrams, absent from scoring
    val scored = LanguageModel.selfPerplexity(toks, 1)
      .select("doc_id").as[Long].collect().toSet
    assert(scored == Set(1L, 2L))
  }
}
