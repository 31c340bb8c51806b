package graft

import graft.operators.{Multimodal, MultimodalAv}
import org.scalatest.funsuite.AnyFunSuite

/** The audio/video codec round-trips behind `media_av_stats`: encoded
  * fixture bytes must decode back to the exact closed-form content (WAV is
  * PCM, Y4M is raw planes — both lossless, so equality is the contract),
  * corrupt/foreign payloads must degrade to None rather than kill tasks,
  * and the shared feature kernel must dispatch all four modalities.
  */
class MultimodalAvSpec extends AnyFunSuite {

  test("WAV round-trip recovers every sample, rate and channel count") {
    for ((id, n) <- MultimodalAv.WavClips) {
      val a = MultimodalAv.decodeAudio(MultimodalAv.wavBytes(-id, n)).get
      assert(a.sampleRate == MultimodalAv.WavRate && a.channels == 1)
      assert(a.samples.length == n)
      val expect = (0 until n).map(i => MultimodalAv.wavSample(-id, i))
      assert(a.samples.toSeq == expect, s"clip $id")
    }
  }

  test("WAV samples span the signed 16-bit domain (negatives survive)") {
    val samples = MultimodalAv.WavClips.flatMap { case (id, n) =>
      (0 until n).map(i => MultimodalAv.wavSample(-id, i))
    }
    assert(samples.exists(_ < 0) && samples.exists(_ > 0),
      "fixture must exercise both signs or the LE16 assembly is untested")
  }

  test("Y4M round-trip recovers dimensions, frame count and every pixel sum") {
    for ((id, w, h, f) <- MultimodalAv.Y4mClips) {
      val v = MultimodalAv.decodeVideo(MultimodalAv.y4mBytes(-id, w, h, f)).get
      assert(v.w == w && v.h == h && v.frames.length == f)
      for (fr <- 0 until f; y <- 0 until h; x <- 0 until w) {
        val (yv, uv, vv) = MultimodalAv.yuvChannels(-id, fr, x, y)
        assert(v.frames(fr)(y * w + x) == yv + uv + vv, s"clip $id f=$fr ($x,$y)")
      }
    }
  }

  test("frame sampling keeps frames 0, 2, 4, …") {
    val v = MultimodalAv.decodeVideo(MultimodalAv.y4mBytes(5L, 3, 3, 5)).get
    val sampled = MultimodalAv.frameSample(v, 2)
    assert(sampled.length == 3)
    assert(sampled(0).sameElements(v.frames(0)) &&
      sampled(1).sameElements(v.frames(2)) && sampled(2).sameElements(v.frames(4)))
  }

  test("resample keeps samples 0, 4, 8, … and divides the rate") {
    val a = MultimodalAv.decodeAudio(MultimodalAv.wavBytes(9L, 50)).get
    val d = MultimodalAv.resample(a, 4)
    assert(d.sampleRate == MultimodalAv.WavRate / 4 && d.channels == 1)
    assert(d.samples.toSeq == (0 until 50 by 4).map(i => a.samples(i)))
  }

  test("corrupt and foreign payloads degrade to None, never throw") {
    val wav = MultimodalAv.wavBytes(3L, 50)
    assert(MultimodalAv.decodeAudio(wav.take(20)).isEmpty, "truncated WAV")
    val y4m = MultimodalAv.y4mBytes(3L, 3, 3, 2)
    assert(MultimodalAv.decodeVideo(y4m.dropRight(5)).isEmpty, "truncated frame")
    val txt = "plain text payload".getBytes("UTF-8")
    assert(MultimodalAv.decodeAudio(txt).isEmpty)
    assert(MultimodalAv.decodeVideo(txt).isEmpty)
    // cross-codec: each decoder rejects the other's magic
    assert(MultimodalAv.decodeAudio(y4m).isEmpty)
    assert(MultimodalAv.decodeVideo(wav).isEmpty)
  }

  test("unsupported Y4M colorspace (C420 default) degrades to the stub") {
    val c420 = ("YUV4MPEG2 W4 H4 F25:1\nFRAME\n" + "x" * 24).getBytes("US-ASCII")
    assert(MultimodalAv.decodeVideo(c420).isEmpty)
  }

  test("feature kernel dispatches audio and video through the real codecs") {
    val wav = MultimodalAv.wavBytes(7L, 100)
    val a = MultimodalAv.decodeAudio(wav).get
    val fromSamples = a.samples.map(_ + 32768)
    val stripe = fromSamples.length / 8
    val expect0 = fromSamples.take(stripe).sum.toDouble / stripe
    assert(Multimodal.decodeFeatures(wav)(0) == expect0,
      "audio features must come from decoded samples, not container bytes")

    val y4m = MultimodalAv.y4mBytes(7L, 4, 4, 3)
    val v = MultimodalAv.decodeVideo(y4m).get
    val flat = v.frames.flatten
    val vs = flat.length / 8
    val vexpect0 = flat.take(vs).sum.toDouble / vs
    assert(Multimodal.decodeFeatures(y4m)(0) == vexpect0,
      "video features must come from decoded planes, not container bytes")
  }

  test("the media-ANN plane lever cuts candidates; planted duplicate stays top-1") {
    val spark = GraftSession.getOrCreate("graft-test", "local[4]")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // deterministic diverse payloads; media 21 duplicates query 20 exactly
    def payload(i: Long): String = {
      val r = new scala.util.Random(i)
      (1 to 24).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val media = (1L to 200L)
      .map(i => (i, if (i == 21) payload(20) else payload(i)))
      .toDF("media_id", "txt")
      .select(col("media_id"), encode(col("txt"), "UTF-8").as("payload"),
        struct(lit("txt").as("kind"),
          length(col("txt")).cast("long").as("width")).as("meta"))
    val r3 = Multimodal.mediaAnnOf(media, Multimodal.MediaPlanes).collect()
    val r6 = Multimodal.mediaAnnOf(media, Multimodal.MediaPlanes6).collect()
    assert(r6.length < r3.length,
      s"6 planes must shrink the candidate set: ${r6.length} vs ${r3.length}")
    def top1(rows: Array[org.apache.spark.sql.Row]): Long = rows
      .filter(r => r.getLong(0) == 20L && r.getLong(2) == 1L).head.getLong(1)
    assert(top1(r3) === 21L && top1(r6) === 21L,
      "the exact duplicate must stay rank 1 under both plane sets")

    // adaptive floor: 200 media / target 64 → np = max(3, ⌈log₂(3.1)⌉) = 3,
    // so the adaptive plan must REPRODUCE the fixed-3 result bit-for-bit
    val ra = Multimodal.mediaAnnOf(media, Multimodal.MediaPlanes6,
      Some(64L)).collect()
    assert(ra.map(_.toString).sorted.toSeq ===
      r3.map(_.toString).sorted.toSeq,
      "under the floor the adaptive mask must equal the fixed 3-plane plan")
  }

  test("adaptive media-ANN planes grow with the corpus; duplicate stays top-1") {
    val spark = GraftSession.getOrCreate("graft-test", "local[4]")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def payload(i: Long): String = {
      val r = new scala.util.Random(i)
      (1 to 24).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    // 1000 media → np = ⌈log₂(1000/64)⌉ = 4 > the 3-plane floor
    val media = (1L to 1000L)
      .map(i => (i, if (i == 21) payload(20) else payload(i)))
      .toDF("media_id", "txt")
      .select(col("media_id"), encode(col("txt"), "UTF-8").as("payload"),
        struct(lit("txt").as("kind"),
          length(col("txt")).cast("long").as("width")).as("meta"))
    // candidate (pre-top-k) pairs — the quantity that grows n²/buckets
    // under a fixed plane count
    val fixed3Cands =
      Multimodal.mediaAnnScored(media, Multimodal.MediaPlanes, None).count()
    val adaptiveCands = Multimodal.mediaAnnScored(media,
      Multimodal.MediaPlanes6, Some(64L)).count()
    // np = 4 is one plane past the floor → candidates ≈ halve (a
    // balanced plane splits every bucket in two); 2/3 leaves room for
    // imbalance while still proving a structural cut
    assert(adaptiveCands * 3 < fixed3Cands * 2,
      s"the adaptive count must shrink candidates past the floor: " +
        s"$adaptiveCands vs $fixed3Cands")
    val adaptive = Multimodal.mediaAnnOf(media, Multimodal.MediaPlanes6,
      Some(64L)).collect()
    def top1(rows: Array[org.apache.spark.sql.Row]): Long = rows
      .filter(r => r.getLong(0) == 20L && r.getLong(2) == 1L).head.getLong(1)
    assert(top1(adaptive) === 21L,
      "the exact duplicate must stay rank 1 under the adaptive count")
  }
}
