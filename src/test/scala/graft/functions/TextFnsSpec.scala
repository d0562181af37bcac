package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  private def onText(text: String)(c: org.apache.spark.sql.Column) = {
    val ss = spark; import ss.implicits._
    Seq(text).toDF("text").select(c)
  }

  test("normText lowercases, strips punctuation, collapses whitespace") {
    assert(one[String](onText("  Hello,   WORLD!! 42 ")(TextFns.normText(col("text"))))
      == "hello world 42")
  }

  test("tokens of empty and punctuation-only text is empty, not ['']") {
    assert(one[Int](onText("")(TextFns.tokenCount(col("text")))) == 0)
    assert(one[Int](onText("?!... --- !!")(TextFns.tokenCount(col("text")))) == 0)
    assert(one[Int](onText("one two")(TextFns.tokenCount(col("text")))) == 2)
  }

  test("bpeTokenCount counts word chunks, single digits, punctuation marks") {
    // "abc" + '1','2','3' + '!' = 5
    assert(one[Int](onText("abc 123!")(TextFns.bpeTokenCount(col("text")))) == 5)
  }

  test("punctRatio and guards for empty text") {
    assert(one[Double](onText("")(TextFns.punctRatio(col("text")))) == 0.0)
    // "ab!?" → 2 punct of 4 chars
    assert(one[Double](onText("ab!?")(TextFns.punctRatio(col("text")))) == 0.5)
  }

  test("avgWordLen over normalized tokens; 0 for empty") {
    assert(one[Double](onText("")(TextFns.avgWordLen(col("text")))) == 0.0)
    assert(one[Double](onText("ab cdef")(TextFns.avgWordLen(col("text")))) == 3.0)
  }

  test("stopwordRatio counts fixed-set hits") {
    assert(one[Double](onText("the cat")(TextFns.stopwordRatio(col("text")))) == 0.5)
    assert(one[Double](onText("zebra quux")(TextFns.stopwordRatio(col("text")))) == 0.0)
  }

  test("qualityScore stays in [0,1] across degenerate inputs") {
    for (t <- Seq("", "x", "the the the", "a" * 2000, "?!?!?!", "normal prose with the usual words in it")) {
      val q = one[Double](onText(t)(TextFns.qualityScore(col("text"))))
      assert(q >= 0.0 && q <= 1.0, s"quality($t) = $q out of range")
    }
  }

  test("langGuess picks marker-majority language, 'und' when nothing matches") {
    assert(one[String](onText("the cat and the dog is here")(TextFns.langGuess(col("text")))) == "en")
    assert(one[String](onText("der hund und die katze ist nicht hier")(TextFns.langGuess(col("text")))) == "de")
    assert(one[String](onText("el perro es una mascota para la casa")(TextFns.langGuess(col("text")))) == "es")
    assert(one[String](onText("zzz qqq")(TextFns.langGuess(col("text")))) == "und")
    assert(one[String](onText("")(TextFns.langGuess(col("text")))) == "und")
  }

  test("wordShingles produces n-grams; short docs collapse to one shingle") {
    val ss = spark; import ss.implicits._
    val got = Seq("a b c d").toDF("text")
      .select(TextFns.wordShingles(col("text"), 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(TextFns.wordShingles(col("text"), 3)).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("fingerprint is normalization-invariant and discriminates texts") {
    val ss = spark; import ss.implicits._
    val fps = Seq("Hello, World!", "hello   world", "goodbye world").toDF("text")
      .select(TextFns.fingerprint(col("text"))).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("scrubText removes URLs, emails and IPs; counts see every occurrence") {
    val ss = spark; import ss.implicits._
    val dirty = "see https://a.io/x?q=1 or http://b.co mail bob.s+1@ex-a.org " +
      "from 10.0.255.7 then\t more   text"
    val row = Seq(dirty).toDF("text")
      .withColumn("pii", TextFns.piiMatches(col("text")))
      .select(
        TextFns.scrubText(col("text")).as("clean"),
        TextFns.countUrlsOf(col("pii")).as("u"),
        TextFns.countEmailsOf(col("pii")).as("e"),
        TextFns.countIpsOf(col("pii")).as("i")).head()
    assert(row.getString(0) == "see or mail from then more text")
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) == (2L, 1L, 1L))
  }

  test("fused PII pass: single consumption, URL beats embedded email/IP") {
    val ss = spark; import ss.implicits._
    // the email and the dotted quad sit INSIDE the URL's \S+ span: the
    // fused leftmost-first alternation consumes them as one URL match,
    // so they are neither double-counted nor double-scrubbed
    val dirty = "go https://h.io/u@e.org/10.1.2.3 end plus lone 10.9.9.9"
    val row = Seq(dirty).toDF("text")
      .withColumn("pii", TextFns.piiMatches(col("text")))
      .select(
        TextFns.scrubText(col("text")).as("clean"),
        TextFns.countUrlsOf(col("pii")).as("u"),
        TextFns.countEmailsOf(col("pii")).as("e"),
        TextFns.countIpsOf(col("pii")).as("i")).head()
    assert(row.getString(0) == "go end plus lone")
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) == (1L, 0L, 1L))
  }

  test("extractUrls and urlHost pull links and their domains in order") {
    val ss = spark; import ss.implicits._
    val got = Seq("pre https://a.io/x?q=1 mid http://b.co post no.scheme.here")
      .toDF("text").select(
        TextFns.extractUrls(col("text")).as("urls"),
        transform(TextFns.extractUrls(col("text")),
          u => TextFns.urlHost(u)).as("hosts")).head()
    assert(got.getSeq[String](0) == Seq("https://a.io/x?q=1", "http://b.co"))
    assert(got.getSeq[String](1) == Seq("a.io", "b.co"))
  }

  test("scrubText leaves clean text intact (modulo whitespace collapse)") {
    val ss = spark; import ss.implicits._
    val got = Seq("plain words,  punctuation. kept! v1.2 a@ b.c")
      .toDF("text").select(TextFns.scrubText(col("text"))).as[String].head()
    assert(got == "plain words, punctuation. kept! v1.2 a@ b.c")
  }
}
