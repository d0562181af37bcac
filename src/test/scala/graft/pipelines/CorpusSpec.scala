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
}
