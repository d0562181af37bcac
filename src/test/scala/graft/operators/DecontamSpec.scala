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
