package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SUBSTRING-granularity contamination / dedup — the span-level pass that
  * doc-level Jaccard (Dedup.ngramJaccard) structurally misses: a few-hundred-
  * token verbatim run inside an otherwise-unique document moves whole-doc
  * Jaccard by a few percent but is exactly what train-set decontamination
  * must catch.
  *
  * Design (equi-joins only, no pair enumeration):
  *  1. positional word n-grams per document — element i of the shingle
  *     array is the gram starting at token i;
  *  2. equi-join on the gram value: every matched position pair
  *     (pos_a, pos_b) of an identical n-gram;
  *  3. run reconstruction on the DIAGONAL: a shared run of consecutive
  *     tokens matches at consecutive positions on both sides, so all its
  *     gram matches share `diff = pos_a - pos_b`. Within a
  *     (doc_a, doc_b, diff) group, gaps-and-islands (pos − row_number())
  *     splits matches into maximal runs; a run of m consecutive matched
  *     grams is a shared span of m + n − 1 tokens.
  *
  * Scale: the only join is the gram equi-join, whose key cardinality grows
  * with the corpus. The contamination variant broadcasts the (small)
  * benchmark side — one map-only pass over corpus grams. The corpus-corpus
  * variant self-joins and therefore caps per-gram document frequency first
  * (df ≤ 64): an ultra-common boilerplate gram ("all rights reserved …")
  * would otherwise fan out quadratically on its key; spans consisting
  * PURELY of such grams are boilerplate, not plagiarism, and dropping them
  * is the documented semantic (runs containing at least one sub-cap gram
  * survive, split at the capped positions). The window partition key
  * (doc_a, doc_b, diff) is fine-grained, so run reconstruction never
  * concentrates on a reducer.
  *
  * The gram key is FINGERPRINTED (48-bit md5 prefix) before any exchange:
  * the joined-words string is the widest column of every shuffle in this
  * family, and both engines apply the identical md5 fingerprint so the
  * oracle stays exact (collision odds ~2^-48 per gram pair; a collision
  * would merge two gram values identically on both sides). Measured ~2.5x
  * on the corpus-corpus path at sf0.1.
  *
  * Reference anchor: extends the reference's keyword/dedup analytics
  * (RT keyword split + dedup coverage) to span granularity; no counterpart
  * operator exists there.
  */
object SpanDedup {

  /** 48-bit gram fingerprint: the first 12 hex chars of md5 as a long.
    * Shuffling/joining the 8-byte fingerprint instead of the ~50-byte
    * joined-words string is the main scale lever of the span family (the
    * gram key is by far the widest column of every exchange). Collision
    * odds are ~2^-48 per gram pair — and the oracle applies the SAME
    * fingerprint, so the two engines agree even when one lands.
    */
  private def gramHash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** DuckDB mirror of [[gramHash]] over SQL expression `x`. */
  private def duckGramHash(x: String): String = duckHashHex(x, 12)

  /** Positional gram table (doc_id, pos, gram), pos 1-based, gram
    * FINGERPRINTED ([[gramHash]]). The token arrays are session-shared:
    * both span queries (and only they) re-tokenize the whole corpus
    * otherwise.
    */
  /** The session-shared tokenized corpus (doc_id, ws). */
  private[operators] def sharedToks(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.shared(s"doc_toks:$sfDir") {
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("ws"))
    }

  private def gramTable(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val toks = sharedToks(spark, sfDir)
    toks
      .select(col("doc_id"), posexplode(positionalShingles(col("ws"), n)).as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        gramHash(col("gram")).as("gram"))
  }

  /** [[gramTable]] over any (doc_id, text) frame — fixture-testable. */
  private[graft] def gramTableOf(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), posexplode(positionalShingles(col("ws"), n)).as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("gram"))

  /** Matched positions (ida, idb, pos_a, pos_b) → maximal-run spans of
    * ≥ minSpan tokens for gram width n.
    */
  private def spans(m: DataFrame, n: Int, minSpan: Int,
      ida: String, idb: String, posa: String, posb: String): DataFrame = {
    val w = Window.partitionBy(col(ida), col(idb), col(posa) - col(posb))
      .orderBy(col(posa))
    m.withColumn("isl", col(posa) - row_number().over(w))
      .groupBy(col(ida), col(idb), (col(posa) - col(posb)).as("diff"), col("isl"))
      .agg(count(lit(1)).as("c"), min(col(posa)).as(s"${posa}_start"),
        min(col(posb)).as(s"${posb}_start"))
      .withColumn("span_tokens", (col("c") + lit(n - 1)).cast("long"))
      .filter(col("span_tokens") >= minSpan)
      .select(col(ida), col(idb), col(s"${posa}_start").as(posa),
        col(s"${posb}_start").as(posb), col("span_tokens"))
      .orderBy(ida, idb, posa, posb)
  }

  /** The contamination core over SEPARATE corpus/bench positional gram
    * tables: bench grams broadcast, map-only match, diagonal run
    * reconstruction. Each corpus document's spans depend only on itself
    * and the (static) bench set — which is exactly why this unit streams:
    * [[graft.streaming.SpanStream]] runs it per micro-batch against the
    * same broadcast bench grams, and the accumulated spans provably equal
    * the one-shot result (SpanStreamSpec).
    */
  private[graft] def contaminationSpansAgainst(corpusG: DataFrame,
      benchG: DataFrame, n: Int, minSpan: Int): DataFrame = {
    val bench = benchG
      .select(col("doc_id").as("bench_id"), col("gram"), col("pos").as("pos_b"))
    val m = corpusG
      .join(broadcast(bench), "gram")
      .select(col("doc_id"), col("bench_id"), col("pos"), col("pos_b"))
    spans(m, n, minSpan, "doc_id", "bench_id", "pos", "pos_b")
  }

  /** Contamination spans (bench = doc_id < 20) over a positional gram
    * table — the [[contaminationSpan]] body, fixture-testable.
    */
  private[graft] def contaminationSpansOf(g: DataFrame, n: Int, minSpan: Int): DataFrame =
    contaminationSpansAgainst(g.filter(col("doc_id") >= 20),
      g.filter(col("doc_id") < 20), n, minSpan)

  /** Corpus-corpus shared spans over a positional gram table — the
    * [[dedupSpan]] body, fixture-testable.
    */
  private[graft] def spanPairsOf(g0: DataFrame, n: Int, minSpan: Int, dfCap: Int): DataFrame = {
    // persisted: both sides of the self-join and the df-cap read it
    val g = graft.CacheRegistry.persist(g0)
    val keep = g.groupBy("gram")
      .agg(count_distinct(col("doc_id")).as("df"))
      .filter(col("df") <= dfCap)
      .select("gram")
    val gk = g.join(keep, "gram")
    val m = gk.as("a")
      .join(gk.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
    spans(m, n, minSpan, "doc_a", "doc_b", "pos_a", "pos_b")
  }

  /** DuckDB CTE `g(doc_id, pos, gram)` — positional n-gram mirror, gram
    * fingerprinted exactly like [[gramHash]].
    */
  private def duckGramCte(n: Int): String = duckToksCte + s"""
      , g0 AS (
        SELECT doc_id,
               unnest(generate_series(1, greatest(len(ws) - ${n - 1}, 0))) AS pos,
               unnest(list_transform(generate_series(1, greatest(len(ws) - ${n - 1}, 0)),
                        i -> array_to_string(ws[i:i+${n - 1}], ' '))) AS gram_s
        FROM toks),
      g AS (SELECT doc_id, pos, ${duckGramHash("gram_s")} AS gram FROM g0)"""

  /** Benchmark span contamination: corpus docs sharing a verbatim run of
    * ≥ 12 tokens with an eval-set document (bench = doc_id < 20, the
    * deterministic stand-in [[Dedup.contamination]] uses). Gram width 5:
    * fine enough that a 12-token span yields 8 consecutive matches, coarse
    * enough that chance 5-token matches are rare. Bench grams broadcast —
    * the corpus side never shuffles before run reconstruction, and THAT
    * shuffle carries matched positions only.
    */
  val contaminationSpan: GraftQuery = new GraftQuery {
    val name = "contamination_span"
    private val n = 5

    def run(spark: SparkSession, sfDir: String): DataFrame =
      contaminationSpansOf(gramTable(spark, sfDir, n), n, 12)

    def oracle: Option[String] = Some(duckGramCte(n) + s"""
      , b AS (SELECT doc_id AS bench_id, gram, pos AS pos_b FROM g WHERE doc_id < 20),
      c AS (SELECT doc_id, gram, pos FROM g WHERE doc_id >= 20),
      m AS (SELECT c.doc_id, b.bench_id, c.pos, b.pos_b
            FROM c JOIN b USING (gram)),
      r AS (SELECT doc_id, bench_id, pos, pos_b, pos - pos_b AS diff,
                   pos - row_number() OVER (PARTITION BY doc_id, bench_id, pos - pos_b
                                            ORDER BY pos) AS isl
            FROM m),
      s AS (SELECT doc_id, bench_id, min(pos) AS pos, min(pos_b) AS pos_b,
                   count(*) + ${n - 1} AS span_tokens
            FROM r GROUP BY doc_id, bench_id, diff, isl)
      SELECT doc_id, bench_id, pos, pos_b, CAST(span_tokens AS BIGINT) AS span_tokens
      FROM s WHERE span_tokens >= 12
      ORDER BY doc_id, bench_id, pos, pos_b
    """)
  }

  /** Corpus-corpus span dedup: pairs of documents sharing a verbatim run
    * of ≥ 16 tokens, found WITHOUT comparing any document pair — matched
    * gram positions fall out of the (df-capped) gram self-join. Gram width
    * 8 (self-join side is the whole corpus, so chance matches cost more
    * than on the bench path).
    */
  private[operators] val SpanN = 8
  private[operators] val SpanMin = 16
  private[operators] val SpanDfCap = 64

  /** The corpus-corpus span-pair frame at the dedup_span constants,
    * session-shared: both `dedup_span` and `span_coverage` consume the
    * identical (tiny) result, and the gram self-join behind it is the
    * family's most expensive plan.
    */
  private[graft] def sharedSpanPairs(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.shared(s"span_pairs:$sfDir") {
      spanPairsOf(gramTable(spark, sfDir, SpanN), SpanN, SpanMin, SpanDfCap)
    }

  val dedupSpan: GraftQuery = new GraftQuery {
    val name = "dedup_span"
    private val n = SpanN
    private val dfCap = SpanDfCap

    def run(spark: SparkSession, sfDir: String): DataFrame =
      sharedSpanPairs(spark, sfDir)

    def oracle: Option[String] = Some(duckSpanPairsCtes + """
      SELECT doc_a, doc_b, pos_a, pos_b, span_tokens
      FROM sp ORDER BY doc_a, doc_b, pos_a, pos_b
    """)
  }

  /** DuckDB CTE chain ending in `sp(doc_a, doc_b, pos_a, pos_b,
    * span_tokens)` — the dedup_span pair table at the shared constants.
    */
  private[operators] def duckSpanPairsCtes: String = duckGramCte(SpanN) + s"""
      , keep AS (SELECT gram FROM g GROUP BY gram
                 HAVING count(DISTINCT doc_id) <= $SpanDfCap),
      gk AS (SELECT g.* FROM g JOIN keep USING (gram)),
      m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.pos AS pos_a, b.pos AS pos_b
            FROM gk a JOIN gk b ON a.gram = b.gram AND a.doc_id < b.doc_id),
      r AS (SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diff,
                   pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, pos_a - pos_b
                                              ORDER BY pos_a) AS isl
            FROM m),
      s AS (SELECT doc_a, doc_b, min(pos_a) AS pos_a, min(pos_b) AS pos_b,
                   count(*) + ${SpanN - 1} AS span_tokens
            FROM r GROUP BY doc_a, doc_b, diff, isl),
      sp AS (SELECT doc_a, doc_b, pos_a, pos_b,
                    CAST(span_tokens AS BIGINT) AS span_tokens
             FROM s WHERE span_tokens >= $SpanMin)"""

  /** Doc-level shared-text coverage — the decontamination VERDICT composed
    * from the span pairs: for each document appearing in any shared span
    * (either side), the union of its span intervals, the covered-token
    * count, coverage in basis points of the document's token count, and a
    * drop flag at ≥ 50%. A doc half-made of text that exists elsewhere is
    * a near-dup even when every individual pair looks small — exactly what
    * pair-at-a-time span lists under-report. Interval union is
    * gaps-and-islands over (start, end) per document: the window partition
    * key is the doc id, so reconstruction never concentrates on a reducer;
    * overlapping intervals from different partners collapse before
    * counting, so no token is counted twice.
    */
  val spanCoverage: GraftQuery = new GraftQuery {
    val name = "span_coverage"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val sp = sharedSpanPairs(spark, sfDir)
      // DISTINCT makes (s, e) a TOTAL order inside each doc partition —
      // with duplicate intervals the window ORDER BY has peer rows and a
      // parallel window evaluation was measured to return run-varying
      // results in the oracle engine; duplicates add nothing to a union
      val iv = sp.select(col("doc_a").as("doc_id"), col("pos_a").as("s"),
          (col("pos_a") + col("span_tokens") - 1).as("e"))
        .unionByName(sp.select(col("doc_b").as("doc_id"), col("pos_b").as("s"),
          (col("pos_b") + col("span_tokens") - 1).as("e")))
        .distinct()
      val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cov = iv
        .withColumn("maxe", max(col("e")).over(wPrev))
        .withColumn("new_isl",
          when(col("maxe").isNull || col("s") > col("maxe"), 1L).otherwise(0L))
        .withColumn("isl", sum(col("new_isl")).over(wRun))
        .groupBy(col("doc_id"), col("isl"))
        .agg(min(col("s")).as("is"), max(col("e")).as("ie"))
        .groupBy(col("doc_id"))
        .agg(sum(col("ie") - col("is") + 1).as("covered_tokens"))
      val tc = sharedToks(spark, sfDir)
        .select(col("doc_id"), size(col("ws")).cast("long").as("token_ct"))
      cov.join(tc, "doc_id")
        .withColumn("coverage_bp",
          floor(col("covered_tokens") * lit(10000.0) / col("token_ct")).cast("long"))
        .withColumn("drop_flag", (col("coverage_bp") >= 5000).cast("long"))
        .select("doc_id", "token_ct", "covered_tokens", "coverage_bp", "drop_flag")
        .orderBy("doc_id")
    }

    def oracle: Option[String] = Some(duckSpanPairsCtes + """
      , iv AS (
        SELECT DISTINCT doc_id, st, en FROM (
          SELECT doc_a AS doc_id, pos_a AS st, pos_a + span_tokens - 1 AS en FROM sp
          UNION ALL
          SELECT doc_b, pos_b, pos_b + span_tokens - 1 FROM sp)),
      mx AS (
        SELECT doc_id, st, en,
               max(en) OVER (PARTITION BY doc_id ORDER BY st, en
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
        FROM iv),
      fl AS (SELECT *, CASE WHEN maxe IS NULL OR st > maxe THEN 1 ELSE 0 END AS new_isl
             FROM mx),
      il AS (SELECT *, sum(new_isl) OVER (PARTITION BY doc_id ORDER BY st, en
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
             FROM fl),
      mg AS (SELECT doc_id, isl, min(st) AS st, max(en) AS en FROM il GROUP BY 1, 2),
      cov AS (SELECT doc_id, CAST(sum(en - st + 1) AS BIGINT) AS covered_tokens
              FROM mg GROUP BY 1),
      tc AS (SELECT doc_id, len(ws) AS token_ct FROM toks)
      SELECT c.doc_id, CAST(t.token_ct AS BIGINT) AS token_ct, c.covered_tokens,
             CAST(floor(c.covered_tokens * 10000.0 / t.token_ct) AS BIGINT) AS coverage_bp,
             CAST(floor(c.covered_tokens * 10000.0 / t.token_ct) >= 5000 AS BIGINT) AS drop_flag
      FROM cov c JOIN tc t USING (doc_id) ORDER BY doc_id
    """)
  }

  val all: Seq[GraftQuery] = Seq(contaminationSpan, dedupSpan, spanCoverage)
}
