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

  /** Multibyte probe rows unioned into the media path by [[mediaStats]]
    * (negative ids keep clear of real doc_ids). They force byte_ct (octets
    * of the UTF-8 payload) and char_ct (code points) to DIVERGE, so the
    * hash gate proves the query keeps the two domains separate — the
    * single-byte testdata corpus alone cannot catch a byte/char
    * conflation. The same literals appear verbatim in the oracle SQL.
    */
  private val FixtureRows: Seq[(Long, String)] = Seq(
    -1L -> "héllo wörld — résumé",
    -2L -> "多字节テストabc")

  private def multibyteFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    FixtureRows.toDF("media_id", "text")
      .select(col("media_id"), encode(col("text"), "UTF-8").as("payload"),
        struct(lit("fixture").as("kind"),
          char_length(col("text")).cast("long").as("width")).as("meta"))
  }

  private def fixtureSql: String = FixtureRows.map { case (id, t) =>
    val lit = t.replace("'", "''")
    s"UNION ALL SELECT $id, '$lit', 'fixture', length('$lit')"
  }.mkString("\n        ")

  /** Oracled query: metadata + byte- AND char-domain stats + a 16-stride
    * frame-sample fingerprint, all computable on both engines. byte_ct is
    * the payload octet count (DuckDB `strlen`), char_ct the code-point
    * count (DuckDB `length`); frame_ct and the frame sample are defined in
    * the CHAR domain (a codec would frame real media units, not octets).
    * The multibyte fixture rows make any byte/char mix-up a hash mismatch.
    */
  val mediaStats: GraftQuery = new GraftQuery {
    val name = "media_stats"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      mediaTable(spark, sfDir)
        .unionByName(multibyteFixture(spark))
        .withColumn("byte_ct", length(col("payload")).cast("long"))
        .withColumn("payload_md5", md5(col("payload")))
        .withColumn("txt", col("payload").cast("string"))
        .withColumn("char_ct", char_length(col("txt")).cast("long"))
        .withColumn("frame_ct", ceil(col("char_ct") / lit(16.0)).cast("long"))
        // frame sample: first char of each 16-char frame
        .withColumn("sample_fp",
          when(col("char_ct") > 0,
            md5(array_join(
              transform(sequence(lit(1), col("char_ct").cast("int"), lit(16)),
                i => col("txt").substr(i, lit(1))), "")))
            .otherwise(md5(lit("")))) // empty payload: sequence(1,0) is illegal in Spark
        .select(col("media_id"), col("meta.kind").as("kind"),
          col("meta.width").as("width"), col("byte_ct"), col("char_ct"),
          col("frame_ct"), col("payload_md5"), col("sample_fp"))
        .orderBy("media_id")

    def oracle: Option[String] = Some(s"""
      WITH media AS (
        SELECT doc_id AS media_id, text, source AS kind, n_chars AS width
        FROM documents
        $fixtureSql)
      SELECT media_id, kind, width,
             CAST(strlen(text) AS BIGINT) AS byte_ct,
             CAST(length(text) AS BIGINT) AS char_ct,
             CAST(ceil(length(text) / 16.0) AS BIGINT) AS frame_ct,
             md5(text) AS payload_md5,
             md5(array_to_string(list_transform(generate_series(1, length(text), 16),
                   i -> substr(text, i, 1)), '')) AS sample_fp
      FROM media ORDER BY media_id
    """)
  }

  /** The 3 sign-hash hyperplanes for [[mediaAnn]]: Hadamard rows over the
    * 8 stub feature dims — balanced ±1 coefficients, so the all-positive
    * byte-mean features still spread across the 8 buckets.
    */
  private val MediaPlanes: Seq[Seq[Int]] = Seq(
    Seq(1, 1, 1, 1, -1, -1, -1, -1),
    Seq(1, 1, -1, -1, 1, 1, -1, -1),
    Seq(1, -1, 1, -1, 1, -1, 1, -1))

  /** The decode→embed→dedup COMPOSITION as one oracled query: media
    * payloads through the stub [[decodeFeatures]] kernel
    * (partition-batched [[extractFeatures]]), normalized, sign-bucketed on
    * the literal [[MediaPlanes]], then an LSH candidate equi-join on the
    * bucket id with top-3 cosine neighbors per query — the
    * [[Similarity]] ANN shape running on DECODED media features instead of
    * the embeddings table, proving the multimodal plumbing feeds the ANN
    * operators end-to-end.
    *
    * Oracle domain: ASCII-only payloads (where UTF-8 byte values ≡ code
    * points, so DuckDB can recompute the byte-stripe means with
    * `unicode(substr(...))`); both engines apply the same filter. All
    * arithmetic is order-pinned (exact integer stripe sums, one division;
    * left-to-right dot folds) so cos_bp is bit-equal cross-engine.
    */
  val mediaAnn: GraftQuery = new GraftQuery {
    val name = "media_ann"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      graft.expressions.DotProductDouble.register(spark)
      val media = mediaTable(spark, sfDir)
        .withColumn("txt", col("payload").cast("string"))
        .filter(length(col("payload")) === char_length(col("txt")) &&
          length(col("payload")) > 0)
        .drop("txt")
      val feats = extractFeatures(spark, media)
        .select(col("media_id"), col("features").as("v"))
        .withColumn("nrm", sqrt(expr("dot_double(v, v)")))
      def planeDot(p: Seq[Int]) = p.zipWithIndex.map { case (c, i) =>
        element_at(col("v"), i + 1) * lit(c)
      }.reduce(_ + _)
      val bucketed = feats.withColumn("bucket",
        MediaPlanes.zipWithIndex.map { case (p, i) =>
          when(planeDot(p) > 0, lit(1L << i)).otherwise(lit(0L))
        }.reduce(_ bitwiseOR _))
      val q = bucketed.filter(pmod(col("media_id"), lit(20)) === 0)
      val scored = q.as("q")
        .join(bucketed.as("c"),
          col("q.bucket") === col("c.bucket") && col("q.media_id") =!= col("c.media_id"))
        .withColumn("cos_bp",
          floor(expr("dot_double(q.v, c.v)") * lit(10000.0) /
            (col("q.nrm") * col("c.nrm"))).cast("long"))
      val w = Window.partitionBy(col("q.media_id"))
        .orderBy(col("cos_bp").desc, col("c.media_id"))
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q.media_id").as("query_id"), col("c.media_id").as("neighbor_id"),
          col("rank").cast("long").as("rank"), col("cos_bp"))
        .orderBy("query_id", "rank")
    }

    def oracle: Option[String] = {
      // the same stub decode in SQL: stripe = max(1, len/8) chars, feature
      // i = exact integer sum of code points in stripe i / stripe length
      // (trailing len-8*stripe chars drop, like Array.slice in the kernel)
      def planeSql(p: Seq[Int]) = p.zipWithIndex.map { case (c, i) =>
        (if (c > 0) "+ " else "- ") + s"v[${i + 1}]"
      }.mkString(" ").stripPrefix("+ ")
      val bucketSql = MediaPlanes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN ${planeSql(p)} > 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      Some(s"""
      WITH m AS (
        SELECT doc_id AS media_id, text, length(text) AS len,
               greatest(1, length(text) // 8) AS stripe
        FROM documents
        WHERE strlen(text) = length(text) AND length(text) > 0),
      f AS (
        SELECT media_id,
               list_transform(range(8), i ->
                 CASE WHEN least((i + 1) * stripe, len) <= i * stripe THEN 0.0
                      ELSE CAST(list_sum(list_transform(
                             range(i * stripe + 1, least((i + 1) * stripe, len) + 1),
                             j -> unicode(substr(text, CAST(j AS BIGINT), 1)))) AS DOUBLE)
                           / (least((i + 1) * stripe, len) - i * stripe) END) AS v
        FROM m),
      n AS (
        SELECT media_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
               $bucketSql AS bucket
        FROM f),
      scored AS (
        SELECT q.media_id AS query_id, c.media_id AS neighbor_id,
               CAST(floor(list_sum(list_transform(generate_series(1, 8),
                      i -> q.v[i] * c.v[i])) * 10000.0 / (q.nrm * c.nrm)) AS BIGINT) AS cos_bp
        FROM n q JOIN n c ON q.bucket = c.bucket AND q.media_id <> c.media_id
        WHERE q.media_id % 20 = 0),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_bp DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_bp
      FROM ranked WHERE rank <= 3 ORDER BY query_id, rank
      """)
    }
  }

  val all: Seq[GraftQuery] = Seq(mediaStats, mediaAnn)
}
