package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpec {

  private def images = {
    val ss = spark; import ss.implicits._
    Seq((1L, Media.stubImage(1L, 4, 4, 3)),
      (2L, Media.stubImage(2L, 8, 2, 1)),
      (3L, "not an image".getBytes("UTF-8"))).toDF("id", "payload")
  }

  test("decodeImages parses headers per partition and drops undecodable rows") {
    val d = Media.decodeImages(images)
    val got = d.select("id", "width", "height", "channels", "format")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .toSet
    assert(got == Set((1L, 4, 4, 3, "img0"), (2L, 8, 2, 1, "img0")))
    val px = d.filter(col("id") === 1L).select("pixels").head().getAs[Array[Byte]](0)
    assert(px.length == 4 * 4 * 3)
    assert(px(0) == ((1 * 31 + 0) % 256).toByte && px(5) == ((1 * 31 + 35) % 256).toByte)
  }

  test("imageFeatures computes exact brightness and histogram via expressions") {
    val ss = spark; import ss.implicits._
    // constant-pixel image: 9 bytes of value 100 → brightness 100, all in bin 3
    val flat = Array.fill(9)(100.toByte)
    val payload = Media.ImageMagic ++ Array[Byte](0, 3, 0, 3, 1) ++ flat
    val d = Media.decodeImages(Seq((7L, payload)).toDF("id", "payload"))
    val f = Media.imageFeatures(d)
      .select(col("brightness"), col("histogram8")).head()
    assert(f.getDouble(0) == 100.0)
    assert(f.getSeq[Int](1) == Seq(0, 0, 0, 9, 0, 0, 0, 0))
  }

  test("imageFeatures self-registers its functions on a session missing the extensions") {
    val ss = spark; import ss.implicits._
    // simulate a session built WITHOUT spark.sql.extensions: drop the
    // functions from the registry; imageFeatures must restore them
    // (GraftExtensions.ensureRegistered) instead of failing analysis
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = ss.sessionState.functionRegistry
    reg.dropFunction(new FunctionIdentifier("graft_byte_sum"))
    reg.dropFunction(new FunctionIdentifier("graft_byte_hist8"))
    val flat = Array.fill(9)(100.toByte)
    val payload = Media.ImageMagic ++ Array[Byte](0, 3, 0, 3, 1) ++ flat
    val d = Media.decodeImages(Seq((7L, payload)).toDF("id", "payload"))
    val f = Media.imageFeatures(d).select(col("brightness")).head()
    assert(f.getDouble(0) == 100.0)
  }

  test("imageFeatures at a production-size payload (≥1 MB) through the native byte expressions") {
    val ss = spark; import ss.implicits._
    // 646×646×3 ≈ 1.25 MB of pixels — the payload size where the old
    // hex()+substr unpack was O(bytes) interpreted string slicing
    val (w, h, c) = (646, 646, 3)
    val payload = Media.stubImage(9L, w, h, c)
    assert(payload.length > 1024 * 1024)
    val d = Media.decodeImages(Seq((9L, payload)).toDF("id", "payload"))
    val f = Media.imageFeatures(d)

    // no hex-unpack anywhere in the plan; features come from the
    // native codegen'd expressions
    val plan = f.queryExecution.executedPlan.toString
    assert(!plan.contains("hex("), s"hex-path must be gone, plan:\n$plan")
    assert(plan.contains("graft_byte_sum") && plan.contains("graft_byte_hist8"))

    // exact against a direct Scala computation on the same bytes
    val px = payload.drop(9)
    val expectedBrightness = px.map(_ & 0xff).map(_.toLong).sum.toDouble / (w * h * c)
    val expectedHist = {
      val counts = new Array[Int](8)
      px.foreach(b => counts((b & 0xff) >>> 5) += 1)
      counts.toSeq
    }
    val row = f.select(col("brightness"), col("histogram8")).head()
    assert(row.getDouble(0) == expectedBrightness)
    assert(row.getSeq[Int](1) == expectedHist)
  }

  test("resizeImages nearest-neighbor halves dimensions") {
    val d = Media.decodeImages(images).filter(col("id") === 1L)
    val r = Media.resizeImages(d, 2, 2)
    val row = r.head()
    assert(row.getAs[Int]("width") == 2 && row.getAs[Int]("height") == 2)
    val px = row.getAs[Array[Byte]]("pixels")
    assert(px.length == 2 * 2 * 3)
    // top-left pixel of the resize = source pixel (0,0), all channels
    val src = Media.decodeImages(images).filter(col("id") === 1L)
      .head().getAs[Array[Byte]]("pixels")
    assert(px.take(3).sameElements(src.take(3)))
  }

  test("audio: decode roundtrips the stub clip; features match hand computation") {
    val ss = spark; import ss.implicits._
    val id = 3L
    val clips = Seq((id, Media.stubAudio(id, n = 8, rate = 8000)),
      (99L, Array[Byte](1, 2, 3))) // malformed → dropped
      .toDF("id", "payload")
    val feats = Media.audioFeatures(Media.decodeAudio(clips)).collect()
    assert(feats.length == 1, "malformed payload must be dropped")
    val r = feats.head
    val want = Array.tabulate(8)(i => ((id * 37 + i * 11) % 2048).toInt - 1024)
    assert(r.getAs[Int]("sample_rate") == 8000 && r.getAs[Int]("n_samples") == 8)
    assert(r.getAs[scala.collection.Seq[Int]]("samples").toSeq == want.toSeq,
      "sign-extended roundtrip")
    val rms = math.sqrt(want.map(v => v.toLong * v).sum.toDouble / 8)
    assert(r.getAs[Double]("rms") == BigDecimal(rms)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Int]("peak") == want.map(math.abs).max)
    val zc = want.sliding(2).count(p => p(0) * p(1) < 0)
    assert(r.getAs[Int]("zero_crossings") == zc)
  }

  test("sampleFrames keeps every stride-th frame of a video payload") {
    val ss = spark; import ss.implicits._
    val vid = Seq((5L, Media.stubVideo(5L, frames = 6, w = 4, h = 4, c = 1)))
      .toDF("id", "payload")
    val sampled = Media.sampleFrames(vid, stride = 2)
    val idx = sampled.select("frame_index").collect().map(_.getInt(0)).sorted.toSeq
    assert(idx == Seq(0, 2, 4))
    // every sampled frame decodes as a standalone image
    val dec = Media.decodeImages(sampled.select(col("id"), col("payload")))
    assert(dec.count() == 3)
  }
}
