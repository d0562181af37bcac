package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {

  test("prepare: exact dup, near dup, and junk drop in order; survivors split and pack") {
    val ss = spark; import ss.implicits._
    val good = "the quick brown fox jumps over the lazy dog and then naps all day long"
    val docs = Seq(
      (1L, good),
      (2L, good.toUpperCase + "!!"),                       // exact dup of 1 after norm
      (3L, good.replace("naps", "sleeps")),                // near dup of 1
      (4L, "completely different words about spark engines processing data at scale"),
      (5L, "zz zz zz zz zz zz zz zz zz zz zz zz")          // junk: repetitive, no stopwords
    ).toDF("doc_id", "text")

    // junk doc scores ≈0.37 (short, no stopwords, 2-char words); real
    // prose ≥0.6 — the 0.4 floor separates cleanly
    val (prepared, stats) = Corpus.prepare(docs, jaccard = 0.5, minQuality = 0.4,
      budget = 32, nShards = 2)

    assert(stats.input == 5)
    assert(stats.afterExact == 4, "doc 2 collapses into doc 1")
    assert(stats.afterNearDup == 3, "doc 3 collapses into doc 1's cluster")
    assert(stats.afterQuality == 2, s"doc 5 fails the quality floor: $stats")

    val rows = prepared.select("doc_id", "split", "shard", "chunk_id").collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 4L))
    assert(rows.forall(r => Set("train", "val", "test")(r.getString(1))))
    assert(rows.forall(r => r.getLong(3) >= 0))

    // idempotency: preparing the prepared survivors changes nothing
    val again = Corpus.prepare(prepared.select("doc_id", "text"),
      jaccard = 0.5, minQuality = 0.4, budget = 32, nShards = 2)._2
    assert(again.afterQuality == stats.afterQuality)

    // withStats=false: same frame, no accounting actions
    val (lazyPrep, noStats) = Corpus.prepare(docs, jaccard = 0.5, minQuality = 0.4,
      budget = 32, nShards = 2, withStats = false)
    assert(noStats == Corpus.PrepareStats(-1, -1, -1, -1))
    assert(lazyPrep.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 4L))
  }

  test("mixtureRates matches the hand-computed temperature rule") {
    val ss = spark; import ss.implicits._
    // source a: 9 tokens (w=3), source b: 16 tokens (w=4); Σw=7.
    // budget 14 → rate_a = 14·(3/7)/9 = 2/3, rate_b = 14·(4/7)/16 = 1/2
    val dt = Seq(("a", 4L), ("a", 5L), ("b", 16L)).toDF("source", "__n")
    val r = Corpus.mixtureRates(dt, budget = 14L)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq(("a", 2L, 9L, 0.666667), ("b", 1L, 16L, 0.5)))
  }

  test("mixtureRates caps at 1 for sources under their target share") {
    val ss = spark; import ss.implicits._
    val dt = Seq(("tiny", 2L), ("huge", 10000L)).toDF("source", "__n")
    val r = Corpus.mixtureRates(dt, budget = 500L)
      .select("source", "rate").as[(String, Double)].collect().toMap
    assert(r("tiny") == 1.0, s"tiny source must keep everything: $r")
    assert(r("huge") < 1.0)
  }

  test("mixtureSample is deterministic and keeps rate-1 sources whole") {
    val ss = spark; import ss.implicits._
    val docs = (1 to 60).map { i =>
      val src = if (i <= 5) "small" else "big"
      (i.toLong, s"document number $i with body text repeated " * 3, src)
    }.toDF("doc_id", "text", "source")
    val n = length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1
    val once = Corpus.mixtureSample(docs, n, budget = 200L)
      .select("doc_id").as[Long].collect().toSet
    val again = Corpus.mixtureSample(docs, n, budget = 200L)
      .select("doc_id").as[Long].collect().toSet
    assert(once == again, "content-hash sampling must be re-run-stable")
    val rates = Corpus.mixtureRates(
      docs.withColumn("__n", n).select(col("source"), col("__n")), budget = 200L)
      .select("source", "rate").as[(String, Double)].collect().toMap
    if (rates("small") >= 1.0)
      assert((1L to 5L).toSet.subsetOf(once), s"rate-1 source dropped docs: $once")
    assert(once.nonEmpty && once.size < 60, "big source must be subsampled")
  }
}
