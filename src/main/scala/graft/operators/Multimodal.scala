package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * are opaque `binary` columns with typed metadata, processed by
  * per-partition batch operators. The actual codecs (image/audio decode)
  * are NOT available in this environment, so the decode kernel is a
  * clearly-marked deterministic stub — but the Spark-side contract is real:
  * schema (binary payload + metadata struct), partition-batched execution
  * (`mapPartitions`, the JVM analog of `mapInPandas` batch shape), and
  * pushdown-friendly metadata-only pruning.
  *
  * The media table is synthesized from `documents` (payload = UTF-8 bytes);
  * on a real corpus the payload column would come from parquet/binaryFile.
  */
object Multimodal {

  /** media_id + payload(binary) + meta struct(kind, width). */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(col("source").as("kind"), col("n_chars").as("width")).as("meta"))

  /** Raw-file ingestion: a directory of media files through Spark's
    * built-in `binaryFile` source, normalized to the same
    * (media_id, payload, meta) contract as [[mediaTable]] — so every
    * downstream operator (decode, resize, stats) is layout-agnostic.
    * `pathGlobFilter` prunes by extension WITHOUT reading payloads, and
    * the file-status `length` feeds metadata-only filters; media_id is the
    * stable 64-bit hash of the path (no driver-side listing involved).
    * At 100 TB this is the standard one-file-one-row staging read; Spark
    * parallelizes over files and packs small ones per task via
    * `maxPartitionBytes`/`filesOpenCostInBytes`.
    */
  def binaryFileTable(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("content").as("payload"),
        struct(
          regexp_extract(col("path"), "\\.([^./]+)$", 1).as("kind"),
          col("length").cast("long").as("width")).as("meta"),
        col("path"))

  /** STUB decode kernel: a real deployment would decode image/audio bytes
    * here (e.g. JavaCV); this deterministic fake derives "features" from the
    * raw bytes so the pipeline shape (binary → fixed-width feature vector)
    * is fully exercised. Runs per partition over an iterator — the batch
    * execution shape a vectorized decoder needs.
    */
  def decodeFeatures(payload: Array[Byte], nFeatures: Int = 8): Array[Double] = {
    // ??? real codec goes here; deterministic fake: mean byte value per stripe
    if (payload.isEmpty) Array.fill(nFeatures)(0.0)
    else {
      val stripe = math.max(1, payload.length / nFeatures)
      (0 until nFeatures).toArray.map { i =>
        val s = payload.slice(i * stripe, math.min((i + 1) * stripe, payload.length))
        if (s.isEmpty) 0.0 else s.map(_ & 0xff).sum.toDouble / s.length
      }
    }
  }

  /** "Resize": byte-domain downsample keeping every `step`-th byte — stands
    * in for image resize / audio resample; preserves payload type.
    */
  def resize(payload: Array[Byte], step: Int): Array[Byte] =
    payload.indices.collect { case i if i % step == 0 => payload(i) }.toArray

  /** Partition-batched feature extraction over the media table (the
    * mapPartitions shape: one iterator pass, no per-row task overhead).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val rows = media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
    rows.mapPartitions(_.map { case (id, bytes) =>
      (id, bytes.length, decodeFeatures(bytes))
    }).toDF("media_id", "byte_ct", "features")
  }

  /** Oracled query: metadata + byte-domain stats + a 16-stride frame-sample
    * fingerprint (every 16th char), all computable on both engines.
    */
  val mediaStats: GraftQuery = new GraftQuery {
    val name = "media_stats"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      mediaTable(spark, sfDir)
        .withColumn("byte_ct", length(col("payload")).cast("long"))
        .withColumn("payload_md5", md5(col("payload")))
        .withColumn("frame_ct", ceil(col("byte_ct") / lit(16.0)).cast("long"))
        // frame sample: first byte of each 16-byte frame (payload is UTF-8
        // text here, so chars ≡ bytes; a codec would sample real frames)
        .withColumn("txt", col("payload").cast("string"))
        .withColumn("sample_fp",
          when(length(col("txt")) > 0,
            md5(array_join(
              transform(sequence(lit(1), length(col("txt")), lit(16)),
                i => col("txt").substr(i, lit(1))), "")))
            .otherwise(md5(lit("")))) // empty payload: sequence(1,0) is illegal in Spark
        .select(col("media_id"), col("meta.kind").as("kind"),
          col("meta.width").as("width"), col("byte_ct"), col("frame_ct"),
          col("payload_md5"), col("sample_fp"))
        .orderBy("media_id")

    def oracle: Option[String] = Some("""
      SELECT doc_id AS media_id, source AS kind, n_chars AS width,
             CAST(length(text) AS BIGINT) AS byte_ct,
             CAST(ceil(length(text) / 16.0) AS BIGINT) AS frame_ct,
             md5(text) AS payload_md5,
             md5(array_to_string(list_transform(generate_series(1, length(text), 16),
                   i -> substr(text, i, 1)), '')) AS sample_fp
      FROM documents ORDER BY media_id
    """)
  }

  val all: Seq[GraftQuery] = Seq(mediaStats)
}
