package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LINE-level corpus deduplication — the boilerplate-removal pass between
  * exact whole-document dedup ([[Dedup.exact]]) and substring span dedup
  * ([[SpanDedup]]): drop the individual lines that repeat across many
  * documents of one source (site templates, navigation chrome, license
  * footers) while keeping the documents themselves. This is a standard
  * stage of public web-corpus pipelines (CCNet's hashed-line dedup,
  * RefinedWeb's line-wise corrections, Gopher's repetition filters); the
  * reference has no counterpart operator (its text surface stops at
  * keyword splitting — `RT/app/dws/KeywordStatsApp.java`), so this extends
  * the engine's dedup family the way a 100 TB training-data user needs.
  *
  * The synthetic corpus has no newlines, so the "line" unit here is a
  * fixed-width pseudo-line: consecutive non-overlapping [[SegWords]]-word
  * segments (position i covers tokens [i*W, i*W+W)). The operator is
  * unit-agnostic — a real corpus swaps the segmenter for
  * `split(text, '\n')` and everything downstream is unchanged. Joining
  * the segments back with a single space reconstructs the document text
  * verbatim (spec-pinned), so "document minus its boilerplate lines" is
  * exact, not approximate.
  *
  * Scale design (the shapes that survive 100 TB):
  *  - the document-frequency pass is ONE corpus-sized exchange — a
  *    per-doc-distinct segment projection aggregated by (source, seg),
  *    partial-agg friendly, key fine-grained (source x segment text), no
  *    skew concentration. Cost class = the tokenize/word-count pass every
  *    corpus statistic in this engine already pays.
  *  - the boilerplate SET (df >= [[DfThreshold]] within a source) is
  *    vocabulary-small by construction — Zipf head, the exact reason the
  *    pass exists — so the clean pass joins it BROADCAST: map-side flag,
  *    no corpus-side shuffle on the wide segment key. The only other
  *    exchange is the groupBy(doc_id) reassembly, keyed on the unique doc
  *    id. Per-batch/incremental variants would maintain the df counts as
  *    an additive fold exactly like [[graft.streaming.CollocStream]].
  *  - output stays integer/string-exact (counts + md5 fingerprints), so
  *    the DuckDB oracle hashes match bit-for-bit.
  */
object LineDedup {

  /** Words per pseudo-line (the corpus has no newlines; see scaladoc). */
  private val SegWords = 4

  /** A segment is boilerplate once it appears in at least this many
    * DISTINCT documents of one source. 2 is the floor that makes the op
    * observable at sf0.001 (40 segments) through sf0.1 (597); a real
    * deployment raises it with corpus size.
    */
  private val DfThreshold = 2

  /** (doc_id, source, pos, seg): non-overlapping [[SegWords]]-word
    * segments in document order. `words` is materialized as an attribute
    * BEFORE the lambda so the higher-order `transform` captures a column
    * reference, not a computed expression (the per-element re-evaluation
    * trap documented at [[graft.functions.TextFunctions.wordShingles]]).
    * Public for the streaming twin ([[graft.streaming.LineDedupStream]]),
    * whose per-batch deltas must segment EXACTLY as the batch query does.
    */
  def segmentsOf(docs: DataFrame): DataFrame = segments(docs)

  /** The boilerplate report over an arbitrary docs frame — the streaming
    * twin's specs compare the maintained table against this rebuild.
    */
  def boilerplateOf(docs: DataFrame): DataFrame = boilerplate(segments(docs))

  private def segments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), split(col("text"), " ").as("words"))
      .select(col("doc_id"), col("source"),
        posexplode(transform(
          sequence(lit(0), ceil(size(col("words")) / SegWords.toDouble).cast("int") - 1,
            lit(1)),
          i => array_join(slice(col("words"), i * SegWords + 1, lit(SegWords)), " "))))
      .toDF("doc_id", "source", "pos", "seg")

  /** (source, seg, df_docs) for segments at/above the df threshold. The
    * per-doc `.distinct()` before the count keeps a segment repeated
    * INSIDE one document from counting as corpus-level boilerplate.
    */
  private def boilerplate(segs: DataFrame): DataFrame =
    segs.select("doc_id", "source", "seg").distinct()
      .groupBy("source", "seg")
      .agg(count(lit(1)).as("df_docs"))
      .filter(col("df_docs") >= DfThreshold)

  private val duckSegs: String = s"""
    base AS (SELECT doc_id, source, string_split(text, ' ') AS words FROM documents),
    poss AS (SELECT doc_id, source, words,
                    unnest(range(0, CAST(ceil(len(words) / $SegWords.0) AS INT))) AS pos
             FROM base),
    segs AS (SELECT doc_id, source, pos,
                    array_to_string(words[(pos*$SegWords+1):(pos*$SegWords+$SegWords)], ' ') AS seg
             FROM poss)"""

  /** The boilerplate report: which lines repeat, where, how often. */
  val lines: GraftQuery = new GraftQuery {
    val name = "boilerplate_lines"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      boilerplate(segments(Tables.load(spark, sfDir, "documents")))
        .orderBy("source", "seg")

    def oracle: Option[String] = Some(s"""
      WITH $duckSegs
      SELECT source, seg, count(DISTINCT doc_id) AS df_docs
      FROM segs GROUP BY source, seg
      HAVING count(DISTINCT doc_id) >= $DfThreshold
      ORDER BY source, seg
    """)
  }

  /** Per-document cleaning result: kept/dropped segment counts plus the
    * md5 of the document with its boilerplate lines removed (segments
    * re-joined in position order — for an untouched document this equals
    * md5(text), spec-pinned). The boilerplate side is broadcast; kept
    * segments reassemble via null-skipping collect_list over (pos, seg)
    * structs sorted by position.
    */
  val clean: GraftQuery = new GraftQuery {
    val name = "line_dedup_clean"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val segs = segments(Tables.load(spark, sfDir, "documents"))
      val bl = broadcast(
        boilerplate(segs).select(col("source"), col("seg"), lit(1).as("bl")))
      segs.join(bl, Seq("source", "seg"), "left")
        .groupBy("doc_id")
        .agg(
          sum(when(col("bl").isNull, 1).otherwise(0)).cast("long").as("kept_segs"),
          sum(when(col("bl").isNotNull, 1).otherwise(0)).cast("long").as("dropped_segs"),
          md5(array_join(
            transform(
              array_sort(collect_list(
                when(col("bl").isNull, struct(col("pos"), col("seg"))))),
              s => s.getField("seg")),
            " ")).as("clean_fp"))
        .orderBy("doc_id")
    }

    def oracle: Option[String] = Some(s"""
      WITH $duckSegs,
      bl AS (SELECT source, seg FROM segs GROUP BY source, seg
             HAVING count(DISTINCT doc_id) >= $DfThreshold)
      SELECT s.doc_id AS doc_id,
             count(*) FILTER (WHERE b.seg IS NULL) AS kept_segs,
             count(*) FILTER (WHERE b.seg IS NOT NULL) AS dropped_segs,
             md5(coalesce(
               string_agg(CASE WHEN b.seg IS NULL THEN s.seg END, ' ' ORDER BY s.pos),
               '')) AS clean_fp
      FROM segs s LEFT JOIN bl b ON s.source = b.source AND s.seg = b.seg
      GROUP BY s.doc_id ORDER BY doc_id
    """)
  }

  /** The streaming twin ([[graft.streaming.LineDedupStream]]) under the
    * CORRECTNESS gate, not just a spec: documents arrive as two batches
    * (doc-id parity), the (source, seg) df table maintains incrementally
    * (additive tile-local merges — a doc lands in exactly one batch, so
    * per-batch distinct-doc counts sum exactly), and the boilerplate
    * report over the MAINTAINED table must hash-match the very same
    * oracle as the batch [[lines]] query — the streamed ≡ batch law,
    * checked by DuckDB. The colloc_stream_maintained precedent.
    */
  val linesStream: GraftQuery = new GraftQuery {
    val name = "line_dedup_stream_maintained"

    private def root(sfDir: String): String =
      SnapshotDiff.scratchRoot("linededup", sfDir)

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val docs = Tables.load(spark, sfDir, "documents")
      val r = root(sfDir)
      SnapshotDiff.rmTree(r)
      graft.streaming.LineDedupStream.applyBatch(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), 1L, r)
      graft.streaming.LineDedupStream.applyBatch(
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), 2L, r)
      graft.streaming.LineDedupStream.liveReport(spark, r, DfThreshold).get
        .orderBy("source", "seg")
    }

    // the BATCH query's oracle verbatim — that equality is the point
    def oracle: Option[String] = lines.oracle
  }

  val all: Seq[GraftQuery] = Seq(lines, clean, linesStream)
}
