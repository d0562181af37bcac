package graft.operators

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DecontamSpec extends SparkSpec {

  /** train doc 1 quotes test doc 10's opening 8 tokens verbatim;
    * train doc 2 shares no 8-gram with any holdout doc. */
  private def toks: DataFrame = {
    val ss = spark; import ss.implicits._
    val leaked = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      (1L, s"intro words then $leaked and a tail", "train"),
      (2L, "completely fresh training content with no overlap at all here", "train"),
      (10L, s"$leaked closing remarks", "test"),
      (11L, "independent validation document about other things entirely", "val"))
      .toDF("doc_id", "text", "split")
      .select(col("doc_id"), TextFns.tokens(col("text")).as("__toks"), col("split"))
  }

  test("leakedGrams finds the verbatim quote and only it") {
    val ss = spark; import ss.implicits._
    val r = Decontam.leakedGrams(toks, k = 8)
      .as[(Long, Long)].collect().toSet
    // doc 1 windows containing all of "alpha..theta" in order: the
    // quote spans tokens 4..11 of a 13-token doc → exactly 1 shared
    // 8-gram with doc 10 (whose grams are windows of 10 tokens).
    assert(r == Set((1L, 1L)))
  }

  test("winnowLeaks catches a partially-edited copy the exact-gram filter misses") {
    val ss = spark; import ss.implicits._
    // test doc 10's paragraph, copied into train doc 1 with ONE word
    // swapped mid-paragraph: every 8-TOKEN gram crosses the edit (the
    // paragraph is 15 tokens), so exact-gram decontam goes blind —
    // but the long unedited character runs on each side of the edit
    // still exceed w+k−1 = 17 normalized chars, so winnowing fires.
    val para = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron"
    val edited = para.replace(" theta ", " EDITED ")
    val docs = Seq(
      (1L, s"training preamble $edited trailing words", "train"),
      (2L, "completely fresh training content with no overlap at all here", "train"),
      (10L, s"$para closing remarks", "test"),
      (11L, "independent validation document about other things entirely", "val"))
      .toDF("doc_id", "text", "split")
    val winnow = Decontam.winnowLeaks(docs, col("text"), k = 8, w = 10,
      minShared = 2).as[(Long, Long)].collect().toSet
    assert(winnow.exists(_._1 == 1L), s"edited copy not caught: $winnow")
    assert(!winnow.exists(_._1 == 2L), s"clean doc flagged: $winnow")
    val exact = Decontam.leakedGrams(
      docs.select(col("doc_id"), TextFns.tokens(col("text")).as("__toks"),
        col("split")), k = 8)
      .as[(Long, Long)].collect().toSet
    assert(exact.isEmpty, s"the edit should break every 8-token gram: $exact")
  }

  test("winnowLeaks boilerplate cap drops fingerprints carried by too many docs") {
    val ss = spark; import ss.implicits._
    val boiler = "standard legal disclaimer text appended to every single document"
    val docs = (Seq(
      (10L, s"$boiler and the test content", "test")) ++
      (1L to 6L).map(i => (i, s"$boiler plus training doc number $i", "train")))
      .toDF("doc_id", "text", "split")
    val uncapped = Decontam.winnowLeaks(docs, col("text"), k = 8, w = 10,
      minShared = 1).count()
    val capped = Decontam.winnowLeaks(docs, col("text"), k = 8, w = 10,
      minShared = 1, maxDocFreq = 3).count()
    assert(uncapped >= 6L, s"boilerplate should leak everywhere uncapped: $uncapped")
    assert(capped == 0L, s"cap 3 must drop the 7-doc boilerplate: $capped")
  }

  test("Bloom stage never changes the answer: sloppy fpp ≡ tight fpp") {
    val tight = Decontam.leakedGrams(toks, k = 8, fpp = 0.0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sloppy = Decontam.leakedGrams(toks, k = 8, fpp = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight == sloppy)
  }

  test("docs shorter than k fall back to whole-doc grams") {
    val ss = spark; import ss.implicits._
    val short = Seq(
      (1L, "tiny shared doc", "train"),
      (9L, "tiny shared doc", "test"),
      (2L, "other tiny doc", "train"))
      .toDF("doc_id", "text", "split")
      .select(col("doc_id"), TextFns.tokens(col("text")).as("__toks"), col("split"))
    val r = Decontam.leakedGrams(short, k = 8)
      .as[(Long, Long)].collect().toSet
    assert(r == Set((1L, 1L)))
  }

  test("membership prune sits pre-shuffle in the corpus scan") {
    val plan = Decontam.leakedGrams(toks, k = 8).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom membership in plan:\n$plan")
  }
}
