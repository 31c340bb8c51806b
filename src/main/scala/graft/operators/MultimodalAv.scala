package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audio/video halves of the multimodal surface (image half:
  * [[Multimodal]]). Both go through REAL codecs that work in this
  * zero-egress environment:
  *
  *  - audio: WAV (RIFF/PCM) through `javax.sound.sampled` — the JDK's
  *    built-in audio codec, the audio analog of the `javax.imageio` image
  *    path;
  *  - video: YUV4MPEG2 (Y4M) — the standard uncompressed video container
  *    (mplayer/ffmpeg interchange format; plain-text header + raw YUV
  *    planes per frame). Uncompressed by design, so parsing the container
  *    IS the codec; we support the C444 colorspace (full-resolution
  *    planes) and degrade anything else to the byte stub rather than
  *    guess at chroma upsampling.
  *
  * Fixtures are genuine WAV/Y4M files whose samples/pixels follow closed
  * forms; the DuckDB oracle recomputes every sample and every sampled
  * frame's pixels from the formulas, so a green hash is a sample-exact /
  * pixel-exact codec round-trip proof — same evidence standard as the PNG
  * path. Frame sampling (every `step`-th frame) is the video-specific
  * operator a training pipeline runs before feature extraction; it
  * happens inside the partition-batched kernel, before anything wide.
  *
  * Scale shape: decode is map-only (`mapPartitions`, one iterator pass);
  * payload bytes never shuffle — features and stats leave the decode
  * stage as fixed-width columns. At 100 TB the media rows arrive via
  * `Multimodal.binaryFileTable` and the same kernel applies unchanged.
  */
object MultimodalAv {

  /** Decoded PCM audio: interleaved 16-bit samples widened to Int. */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
      samples: Array[Int])

  /** Decoded video: per-frame row-major per-pixel (Y+U+V) channel sums —
    * the same luminance-proxy scalar as [[Multimodal.DecodedImage]].
    */
  final case class DecodedVideo(w: Int, h: Int, frames: Array[Array[Int]])

  /** REAL WAV decode via the JDK codec (`javax.sound.sampled`): RIFF/WAVE
    * payloads by magic number, 16-bit signed PCM only. None for anything
    * the codec rejects — corrupt bodies degrade, they don't kill tasks.
    */
  def decodeAudio(payload: Array[Byte]): Option[DecodedAudio] = {
    val isRiff = payload.length > 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
      payload(10) == 'V' && payload(11) == 'E'
    if (!isRiff) None
    else scala.util.Try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        require(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16, "16-bit signed PCM only")
        val bytes = in.readAllBytes()
        val n = bytes.length / 2
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          samples(i) =
            if (fmt.isBigEndian) (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)
            else (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
          i += 1
        }
        DecodedAudio(fmt.getSampleRate.toInt, fmt.getChannels, samples)
      } finally in.close()
    }.toOption
  }

  /** Y4M (YUV4MPEG2) decode: "YUV4MPEG2 ..." header by magic, C444
    * colorspace (one byte per channel per pixel, no chroma subsampling),
    * then FRAME-delimited raw Y/U/V planes. None for anything else.
    */
  def decodeVideo(payload: Array[Byte]): Option[DecodedVideo] = {
    val magic = "YUV4MPEG2 ".getBytes("US-ASCII")
    val hasMagic = payload.length > magic.length &&
      magic.indices.forall(i => payload(i) == magic(i))
    if (!hasMagic) None
    else scala.util.Try {
      def lineEnd(from: Int): Int = {
        var i = from
        while (payload(i) != '\n') i += 1
        i
      }
      var pos = lineEnd(0)
      val toks = new String(payload, 0, pos, "US-ASCII").split(" ").toSeq.tail
      pos += 1
      def tag(c: Char): Option[String] =
        toks.collectFirst { case t if t.nonEmpty && t.head == c => t.tail }
      val w = tag('W').get.toInt
      val h = tag('H').get.toInt
      // spec default is C420; we only decode full-res planes
      require(tag('C').getOrElse("420") == "444", "C444 only")
      require(w > 0 && h > 0, "positive dimensions")
      val n = w * h
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      while (pos < payload.length) {
        val nl = lineEnd(pos)
        require(new String(payload, pos, nl - pos, "US-ASCII")
          .startsWith("FRAME"), "FRAME marker")
        pos = nl + 1
        require(pos + 3 * n <= payload.length, "truncated frame")
        val sums = new Array[Int](n)
        var p = 0
        while (p < n) {
          sums(p) = (payload(pos + p) & 0xff) + (payload(pos + n + p) & 0xff) +
            (payload(pos + 2 * n + p) & 0xff)
          p += 1
        }
        frames += sums
        pos += 3 * n
      }
      DecodedVideo(w, h, frames.toArray)
    }.toOption
  }

  /** Keep every `step`-th frame (0, step, 2·step, …) — the frame-sampling
    * pass a training pipeline runs before per-frame feature extraction.
    */
  def frameSample(v: DecodedVideo, step: Int): Array[Array[Int]] =
    v.frames.zipWithIndex.collect { case (fr, i) if i % step == 0 => fr }

  /** Decimate to every `step`-th sample — the audio analog of
    * [[frameSample]] (a real resampler would low-pass first; decimation is
    * the deterministic sampling half, which is what the oracle can prove).
    */
  def resample(a: DecodedAudio, step: Int): DecodedAudio =
    DecodedAudio(a.sampleRate / step, a.channels,
      a.samples.zipWithIndex.collect { case (s, i) if i % step == 0 => s })

  // ---- fixtures: real files, closed-form content ------------------------

  /** WAV fixture clips: (media_id, sample count). Ids clear of doc_ids and
    * of the PNG fixture range; -200 ≡ 0 (mod 20) so the ANN query set can
    * contain an audio row. Counts vary so stripe handling sees n % 8 ≠ 0.
    */
  private[graft] val WavClips: Seq[(Long, Int)] =
    (0 until 8).map(i => (-200L - i, 40 + 13 * i))

  private[graft] val WavRate = 8000

  /** Sample formula for clip `idp` (= -media_id): multipliers large enough
    * to wrap the 16-bit modulus, so samples span the full signed range
    * (both signs must occur or the LE16 assembly is untested). MUST stay
    * in sync with the SQL in [[mediaAvStats]]'s oracle.
    */
  private[graft] def wavSample(idp: Long, i: Int): Int =
    (((7919 * idp + 3571 * i) % 65536) - 32768).toInt

  /** REAL WAV bytes for one clip — `javax.sound.sampled` encode of the
    * formula samples (16-bit little-endian mono PCM). Lossless, so decode
    * must recover them exactly.
    */
  private[graft] def wavBytes(idp: Long, n: Int): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = wavSample(idp, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      WavRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Y4M fixture clips: (media_id, width, height, frame count). -300 ≡ 0
    * (mod 20); sizes vary so the per-frame pixel count isn't uniform.
    */
  private[graft] val Y4mClips: Seq[(Long, Int, Int, Int)] =
    (0 until 6).map(i => (-300L - i, 3 + i % 3, 3 + (i * 2) % 4, 2 + i))

  /** YUV channel formula for clip `idp`, frame `f`, pixel (x, y). MUST
    * stay in sync with [[yuvSumSql]].
    */
  private[graft] def yuvChannels(idp: Long, f: Int, x: Int, y: Int): (Int, Int, Int) = (
    ((3 * idp + 7 * f + 11 * x + 13 * y) % 256).toInt,
    ((5 * idp + f + 2 * x + 3 * y) % 256).toInt,
    ((idp + 9 * f + 4 * x + 5 * y) % 256).toInt)

  /** The same formula in DuckDB for row-major pixel `p` of frame `fr` of a
    * (media_id, w, h, f) row: the per-pixel Y+U+V sum.
    */
  private def yuvSumSql: String =
    """(  ((3 * (-media_id) + 7 * fr + 11 * (p % w) + 13 * (p // w)) % 256)
      |  + ((5 * (-media_id) + fr + 2 * (p % w) + 3 * (p // w)) % 256)
      |  + ((1 * (-media_id) + 9 * fr + 4 * (p % w) + 5 * (p // w)) % 256))""".stripMargin

  /** REAL Y4M bytes for one clip: standard header + FRAME-delimited raw
    * C444 planes carrying the formula channels.
    */
  private[graft] def y4mBytes(idp: Long, w: Int, h: Int, f: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n".getBytes("US-ASCII"))
    var fr = 0
    while (fr < f) {
      bos.write("FRAME\n".getBytes("US-ASCII"))
      var plane = 0
      while (plane < 3) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (yv, uv, vv) = yuvChannels(idp, fr, x, y)
            bos.write(plane match { case 0 => yv; case 1 => uv; case _ => vv })
            x += 1
          }
          y += 1
        }
        plane += 1
      }
      fr += 1
    }
    bos.toByteArray
  }

  /** Both fixture families as media rows under the standard
    * (media_id, payload, meta) contract. Payloads are genuine WAV / Y4M
    * files encoded on the driver (14 tiny clips).
    */
  private[graft] def avFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val wavRows = WavClips.map { case (id, n) =>
      (id, wavBytes(-id, n), "wav", n.toLong)
    }
    val y4mRows = Y4mClips.map { case (id, w, h, f) =>
      (id, y4mBytes(-id, w, h, f), "y4m", w.toLong)
    }
    (wavRows ++ y4mRows).toDF("media_id", "payload", "kind", "width")
      .select(col("media_id"), col("payload"),
        struct(col("kind"), col("width")).as("meta"))
  }

  private def wavValuesSql: String =
    WavClips.map { case (id, n) => s"($id, $n)" }.mkString(", ")

  private def y4mValuesSql: String =
    Y4mClips.map { case (id, w, h, f) => s"($id, $w, $h, $f)" }.mkString(", ")

  /** Oracled query: decoded-stream stats for the audio and video rows.
    * Audio rows carry (sample_rate, channels, n_samples), `samp_fp` =
    * md5 over EVERY decoded sample, and the 4:1 decimation's rate +
    * `resamp_fp` (the resample pass); video rows carry dimensions, frame
    * counts, and `vid_fp` = md5 over every pixel of every 2nd frame (the
    * frame-sample pass). The oracle recomputes both fingerprints from the
    * generation formulas, so a green hash proves the engine genuinely
    * round-tripped each codec — sample for sample, pixel for pixel.
    * Audio-domain columns are NULL on video rows and vice versa (same
    * domain-separation discipline as `media_stats`).
    */
  val mediaAvStats: GraftQuery = new GraftQuery {
    val name = "media_av_stats"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      val media = avFixture(spark)
      // partition-batched REAL decode; magic-number dispatch, no
      // per-kind plumbing — the same kernel would take a mixed corpus
      val decoded = media.select(col("media_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          decodeAudio(bytes) match {
            case Some(a) =>
              val deci = resample(a, 4)
              (id, "wav", Some(a.sampleRate.toLong), Some(a.channels.toLong),
                Some(a.samples.length.toLong), Some(a.samples.mkString(",")),
                Some(deci.sampleRate.toLong), Some(deci.samples.mkString(",")),
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[String])
            case None =>
              val v = decodeVideo(bytes).get // fixture is all-decodable
              val sampled = frameSample(v, 2)
              (id, "y4m", None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[String],
                None: Option[Long], None: Option[String],
                Some(v.w.toLong), Some(v.h.toLong), Some(v.frames.length.toLong),
                Some(sampled.length.toLong),
                Some(sampled.flatten.mkString(",")))
          }
        })
        .toDF("media_id", "kind", "sample_rate", "channels", "n_samples",
          "samp_str", "resamp_rate", "resamp_str",
          "vid_w", "vid_h", "n_frames", "frames_sampled", "vid_str")
      decoded
        .withColumn("samp_fp", md5(col("samp_str")))
        .withColumn("resamp_fp", md5(col("resamp_str")))
        .withColumn("vid_fp", md5(col("vid_str")))
        .select(col("media_id"), col("kind"), col("sample_rate"),
          col("channels"), col("n_samples"), col("samp_fp"),
          col("resamp_rate"), col("resamp_fp"), col("vid_w"),
          col("vid_h"), col("n_frames"), col("frames_sampled"), col("vid_fp"))
        .orderBy("media_id")
    }

    def oracle: Option[String] = Some(s"""
      WITH wav AS (SELECT * FROM (VALUES $wavValuesSql) AS t(media_id, n)),
      wavstats AS (
        SELECT media_id, 'wav' AS kind,
               CAST($WavRate AS BIGINT) AS sample_rate,
               CAST(1 AS BIGINT) AS channels,
               CAST(n AS BIGINT) AS n_samples,
               md5(array_to_string(list_transform(range(n), i ->
                 ((7919 * (-media_id) + 3571 * i) % 65536) - 32768), ',')) AS samp_fp,
               CAST($WavRate // 4 AS BIGINT) AS resamp_rate,
               md5(array_to_string(list_transform(range(0, n, 4), i ->
                 ((7919 * (-media_id) + 3571 * i) % 65536) - 32768), ',')) AS resamp_fp,
               CAST(NULL AS BIGINT) AS vid_w, CAST(NULL AS BIGINT) AS vid_h,
               CAST(NULL AS BIGINT) AS n_frames,
               CAST(NULL AS BIGINT) AS frames_sampled,
               CAST(NULL AS VARCHAR) AS vid_fp
        FROM wav),
      y4m AS (SELECT * FROM (VALUES $y4mValuesSql) AS t(media_id, w, h, f)),
      y4mstats AS (
        SELECT media_id, 'y4m' AS kind,
               CAST(NULL AS BIGINT) AS sample_rate,
               CAST(NULL AS BIGINT) AS channels,
               CAST(NULL AS BIGINT) AS n_samples,
               CAST(NULL AS VARCHAR) AS samp_fp,
               CAST(NULL AS BIGINT) AS resamp_rate,
               CAST(NULL AS VARCHAR) AS resamp_fp,
               CAST(w AS BIGINT) AS vid_w, CAST(h AS BIGINT) AS vid_h,
               CAST(f AS BIGINT) AS n_frames,
               CAST((f + 1) // 2 AS BIGINT) AS frames_sampled,
               md5(array_to_string(flatten(list_transform(range(0, f, 2), fr ->
                 list_transform(range(w * h), p ->
                   $yuvSumSql))), ',')) AS vid_fp
        FROM y4m)
      SELECT * FROM wavstats UNION ALL SELECT * FROM y4mstats
      ORDER BY media_id
    """)
  }

  val all: Seq[GraftQuery] = Seq(mediaAvStats)
}
