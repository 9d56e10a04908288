package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RealCodecSpec extends SparkSpec {
  import spark.implicits._

  private val ids = Seq(0L, 1L, 2L, 7L, 48L, 49L, 100L).toDF("doc_id")

  test("image fixture round-trips through the REAL JDK decoders") {
    val fix = ImageCodec.encodeFixture(ids, "doc_id")
    val meta = ImageCodec.decodeImageMeta(fix, "doc_id", "image")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    ids.collect().map(_.getLong(0)).foreach { id =>
      val (w, h, fmt) = meta(id)
      assert(w == ImageCodec.fixtureWidth(id))
      assert(h == ImageCodec.fixtureHeight(id))
      assert(fmt == (if (id % 2 == 0) "png" else "jpeg"))
    }
  }

  test("PNG pixel-lane sums match the analytic pattern exactly") {
    val even = ids.where(col("doc_id") % 2 === 0)
    val fix = ImageCodec.encodeFixture(even, "doc_id")
    val got = ImageCodec.pixelLaneSums(fix, "doc_id", "image", dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    even.collect().map(_.getLong(0)).foreach { id =>
      val w = ImageCodec.fixtureWidth(id)
      val h = ImageCodec.fixtureHeight(id)
      val expect = Array.fill(8)(0L)
      for (y <- 0 until h; x <- 0 until w)
        expect(x % 8) += Math.floorMod(x * 31L + y * 17L + id, 256L)
      assert(got(id) == expect.toSeq, s"doc $id")
    }
  }

  test("resize halves decoded geometry") {
    val fix = ImageCodec.encodeFixture(ids, "doc_id")
    ImageCodec.resizeHalf(fix, "doc_id", "image").collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == math.max(1, ImageCodec.fixtureWidth(id) / 2))
      assert(r.getInt(2) == math.max(1, ImageCodec.fixtureHeight(id) / 2))
      assert(r.getLong(3) > 0)
    }
  }

  test("animated GIF: frame count, sampled indexes, and lossless gray sums") {
    // 8-bit grayscale must round-trip GIF's 256-entry palette exactly —
    // that is what lets the oracle verify DECODED frame content
    // analytically rather than trusting the encoder.
    val fix = ImageCodec.encodeGifFixture(ids, "doc_id")
    val rows = ImageCodec.sampleGifFrames(fix, "doc_id", "video", stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getInt(3), r.getLong(4), r.getInt(5))).toMap
    ids.collect().map(_.getLong(0)).foreach { id =>
      val nf = ImageCodec.gifFrameCount(id)
      val w = ImageCodec.gifWidth(id)
      val h = ImageCodec.gifHeight(id)
      val sampled = (0 until nf by 2)
      assert(rows.keys.count(_._1 == id) == sampled.size, s"doc $id sampled frames")
      sampled.foreach { f =>
        val (gw, gh, sum, gn) = rows((id, f))
        assert(gn == nf, s"doc $id frame count")
        assert((gw, gh) == ((w, h)), s"doc $id frame dims")
        var expect = 0L
        for (y <- 0 until h; x <- 0 until w)
          expect += Math.floorMod(x * 31L + y * 17L + id + f * 53L, 256L)
        assert(sum == expect, s"doc $id frame $f gray sum")
      }
    }
  }

  test("WAV decode: format fields and exact PCM sample sum") {
    val fix = AudioCodec.encodeFixture(ids, "doc_id")
    AudioCodec.decodeAudioMeta(fix, "doc_id", "audio").collect().foreach { r =>
      val id = r.getLong(0)
      val n = AudioCodec.fixtureSamples(id)
      assert(r.getInt(1) == AudioCodec.SampleRate)
      assert(r.getInt(2) == 1 && r.getInt(3) == 16)
      assert(r.getLong(4) == n.toLong)
      val expect = (0 until n).map(i => AudioCodec.fixtureSample(id, i).toLong).sum
      assert(r.getLong(5) == expect, s"doc $id")
    }
  }
}
