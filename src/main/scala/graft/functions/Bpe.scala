package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-learned byte-pair encoding (Sennrich et al. 2016) for EXACT
  * token accounting — replacing the chars/4 estimate the pipeline carried
  * before.
  *
  * Three pieces, split the way a production pipeline splits them:
  *
  *  - TRAIN ([[train]] / [[trainFromHistogram]]): the distributed part is
  *    the word histogram (one tokenize-explode-groupBy over the corpus —
  *    the only stage that sees all the data); the merge loop then runs
  *    over word TYPES on the driver, exactly like standard BPE trainers,
  *    with memory ∝ vocabulary, not corpus. At 100 TB one trains on a
  *    sampled histogram; the loop is unchanged. Deterministic: best pair
  *    by (count desc, pair lexicographic), merges stop below count 2.
  *  - MODEL: the shipped tokenizer is [[SeedMerges]] — trained ONCE from
  *    the pinned [[SeedCorpus]] fixture by the very same trainer (no
  *    hand-written merge list to drift), then applied everywhere,
  *    train-once-apply-forever like any production tokenizer. Pinning
  *    the TRAINING INPUT rather than per-corpus retraining is what lets
  *    the DuckDB oracle carry the identical merge table as literals at
  *    every scale factor.
  *  - APPLY ([[encode]] / [[docCounts]]): the merge list broadcasts;
  *    each distinct word TYPE is segmented once per partition (repeat:
  *    merge the best-ranked applicable pair, all occurrences, left to
  *    right) and per-document counts come from a hash join of the token
  *    stream against the segmented types — occurrences never re-run the
  *    merge loop. [[duckBpeCtes]] mirrors the apply in DuckDB as a
  *    recursive CTE over a delimited segmentation string, so oracles
  *    verify exact subword-level equality.
  */
object Bpe {

  /** Merge-table size for the shipped model. */
  val NumMerges = 64

  /** The pinned training fixture: enough repetitive English that the
    * learned merges cover common subwords (the/ing/tion/er/and...).
    */
  val SeedCorpus: String =
    """The engine reads the data and the engine writes the data. Training
      |data processing is the thing this engine is doing: reading documents,
      |scoring documents, deduplicating documents and packing documents into
      |training sequences. The processing pipeline is running and running;
      |the pipeline keeps reading, keeps scoring, keeps writing. Everything
      |interesting is happening in the partitions: partitioning the data,
      |shuffling the data, joining the data. The tokenizer is learning the
      |merges from the corpus and applying the merges to the corpus. Common
      |endings like running, reading, writing, packing, scoring and
      |processing share the ing ending; nations, stations and operations
      |share the tion ending; readers, writers and workers share the er
      |ending. The counting is exact because the tokenizer is exact. These
      |sentences repeat the most common words of the language: the, and, is,
      |of, to, in, that, it, for, was, with, as, his, on, be, at, by, had.
      |""".stripMargin

  private def splitWords(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  /** Left-to-right single-pass merge of every occurrence of `pair` —
    * the same scan order as SQL `replace` on the delimited form, so the
    * engine and the oracle segment identically.
    */
  private def mergePair(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (pair._1 + pair._2)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** The Sennrich merge loop over a word histogram: count adjacent
    * symbol pairs (overlapping, frequency-weighted), merge the most
    * frequent everywhere, repeat. Ties break lexicographically; pairs
    * seen fewer than twice never merge (a singleton merge memorizes one
    * word, it doesn't compress a corpus).
    */
  def trainFromHistogram(hist: Seq[(String, Long)], nMerges: Int = NumMerges): Seq[(String, String)] = {
    var vocab: Vector[(Vector[String], Long)] =
      hist.map { case (w, f) => (w.map(_.toString).toVector, f) }.toVector
    val out = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var halt = false
    while (!halt && out.size < nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some((pair, c)) if c >= 2 =>
          out += pair
          vocab = vocab.map { case (syms, f) => (mergePair(syms, pair), f) }
        case _ => halt = true
      }
    }
    out.toList
  }

  /** Learn a merge table from a documents frame: ONE distributed word
    * histogram (collected sorted, so the driver loop sees a canonical
    * order), then [[trainFromHistogram]].
    */
  def train(docs: DataFrame, nMerges: Int = NumMerges): Seq[(String, String)] = {
    val hist = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy("word")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromHistogram(hist, nMerges)
  }

  /** The shipped model: the trainer's own output on the seed fixture. */
  lazy val SeedMerges: Seq[(String, String)] =
    trainFromHistogram(
      splitWords(SeedCorpus).groupBy(identity).toSeq
        .map { case (w, ws) => (w, ws.size.toLong) }
        .sortBy(_._1))

  def ranks(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Encode one word: repeatedly apply the best-ranked (earliest-learned)
    * merge present anywhere in the current segmentation, to ALL its
    * occurrences, until none applies — the standard BPE apply.
    */
  def encode(word: String, rk: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var best: ((String, String), Int) = (null, Int.MaxValue)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        rk.get(p) match {
          case Some(r) if r < best._2 => best = (p, r)
          case _ => ()
        }
        i += 1
      }
      if (best._1 == null) done = true
      else {
        syms = mergePair(syms, best._1)
        done = syms.length < 2
      }
    }
    syms
  }

  /** Per-word segmented types for the distinct words of a token stream:
    * (word, n_sub, sub_str) with sub_str = the subwords joined by ",,"
    * (the oracle's delimited form). The model rides a broadcast; each
    * type is segmented once.
    */
  private[graft] def segmentTypes(tok: DataFrame): DataFrame = {
    val spark = tok.sparkSession
    import spark.implicits._
    val bcM = spark.sparkContext.broadcast(SeedMerges.toVector)
    tok.select("word").distinct().as[String].mapPartitions { it =>
      val rk = ranks(bcM.value)
      it.map { w =>
        val segs = encode(w, rk)
        (w, segs.length.toLong, segs.mkString(",,"))
      }
    }.toDF("word", "n_sub", "sub_str")
  }

  /** Per-document EXACT token counts under the shipped model:
    * (doc_id, bpe_ct). Documents with no tokens have no row — callers
    * needing them left-join and coalesce to 0.
    */
  def docCounts(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("word"))
    tok.join(segmentTypes(tok), "word")
      .groupBy("doc_id").agg(sum("n_sub").as("bpe_ct"))
  }

  /** [[docCounts]] over the sf dir's documents table as a SESSION-SHARED
    * frame — the segmented-vocab counts are a natural shared artifact (a
    * tokenizer is applied once per corpus, not once per consumer).
    * Three queries (text_stats, pack_sequences, sample_mixture) read
    * the identical frame; corpus_card deliberately does NOT (its
    * partials must run on corpus slices). Like every shared frame, the
    * cache is bound to the session that built it and released by the
    * harness's `CacheRegistry.clearAll()` at end of run.
    */
  def docCountsShared(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame =
    graft.CacheRegistry.shared(s"bpe_counts:$sfDir") {
      docCounts(graft.Tables.load(spark, sfDir, "documents"))
    }

  /** [[graft.functions.TextFunctions.duckToksCte]] with the RECURSIVE
    * keyword the BPE chain needs.
    */
  def duckToksRecursiveCte: String =
    TextFunctions.duckToksCte.replaceFirst("WITH ", "WITH RECURSIVE ")

  /** DuckDB mirror of the apply: the seed merge table as literals, the
    * recursive best-rank merge over a `,a,,b,` delimited segmentation
    * (the `,x,` wrapping makes a pair pattern match ONLY whole adjacent
    * subwords, and SQL `replace` scans left-to-right non-overlapping —
    * the same semantics as [[mergePair]]). Produces:
    * `bpe_ex(doc_id, word, pos)`, `bpe_ty(word, n_sub, sub_str)` and
    * `bpe(doc_id, bpe_ct)`. Requires `toks` and a WITH RECURSIVE head
    * ([[duckToksRecursiveCte]]).
    */
  def duckBpeCtes: String = {
    val vals = SeedMerges.zipWithIndex
      .map { case ((a, b), i) => s"($i, '$a', '$b')" }.mkString(", ")
    s"""
      , bpe_merges(r, a, b) AS (SELECT * FROM (VALUES $vals) m),
      bpe_ex AS (SELECT doc_id, unnest(ws) AS word,
                        unnest(generate_series(1, len(ws))) AS pos FROM toks),
      bpe_vocab AS (SELECT DISTINCT word FROM bpe_ex),
      bpe_seg AS (
        SELECT word,
               ',' || array_to_string(list_transform(range(length(word)),
                 i -> substr(word, CAST(i + 1 AS BIGINT), 1)), ',,') || ',' AS s
        FROM bpe_vocab
        UNION ALL
        SELECT word,
               replace(s, ',' || m.a || ',,' || m.b || ',',
                          ',' || m.a || m.b || ',')
        FROM (SELECT word, s,
                (SELECT min(r) FROM bpe_merges m2
                 WHERE contains(s, ',' || m2.a || ',,' || m2.b || ',')) AS best
              FROM bpe_seg) x
        JOIN bpe_merges m ON m.r = x.best),
      bpe_final AS (
        SELECT word, s FROM bpe_seg
        WHERE NOT EXISTS (SELECT 1 FROM bpe_merges m
                          WHERE contains(s, ',' || m.a || ',,' || m.b || ','))),
      bpe_ty AS (SELECT word, len(string_split(s, ',,')) AS n_sub,
                        trim(s, ',') AS sub_str FROM bpe_final),
      bpe AS (
        SELECT doc_id, CAST(sum(n_sub) AS BIGINT) AS bpe_ct
        FROM bpe_ex JOIN bpe_ty USING (word) GROUP BY doc_id)"""
  }
}
