package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked full-text retrieval over the corpus: Okapi BM25 (Robertson &
  * Zaragoza 2009, the Lucene-default `(N - df + 0.5)/(df + 0.5) + 1` idf
  * variant) — the search stage the inverted-index family was missing: the
  * index queries prove lookup ≡ scan, this one RANKS what the lookup
  * returns.
  *
  * Everything is floor-scaled integer output after a shared double
  * formulation (the tfidf_top_terms discipline): per-(doc, term) scores
  * floor to x1000 BEFORE the per-doc sum, so both engines add the same
  * integers in any order.
  *
  * Scale shape: tf / df / doclen are ONE tokenize-explode pass into
  * fine-key aggregations; the 3-term query prunes the tf table through a
  * BROADCAST semi-join before any scoring math; top-20 is
  * TakeOrderedAndProject (no global sort materializes). At 100 TB the
  * same scoring runs off the inverted index instead of the scan — the
  * postings tables already store (token, doc_id, tf), and
  * `InvertedIndex.termLookup` prunes to ≤1 tile per query term
  * (RetrievalSpec pins index-served scoring ≡ this relational truth).
  */
object Retrieval {

  private val K1 = 1.2
  private val B = 0.75
  private val TopK = 20

  /** The deterministic 3-term query: the terms ranked 10th, 20th and 30th
    * by (df DESC, term ASC) — mid-frequency terms, selective enough to
    * rank and common enough to hit many documents (the rarest-terms probe
    * rule the index queries use would return near-singleton postings,
    * which exercises lookup but not ranking).
    */
  private val QueryRanks = Seq(10, 20, 30)

  /** BM25 per-(doc, term) scores for `postings(token, doc_id, tf)` against
    * the 3-term query, given per-doc lengths `dl(doc_id, dl)` and corpus
    * stats — shared by the oracled query (relational postings) and the
    * spec's index-served path (termLookup postings).
    */
  private[graft] def bm25Scores(postings: DataFrame, qterms: DataFrame,
      dl: DataFrame, stats: DataFrame): DataFrame =
    postings.join(broadcast(qterms), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("tfn",
        col("tf") * lit(K1 + 1.0) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))))
      .withColumn("term_score_x1000",
        floor(col("idf") * col("tfn") * lit(1000.0)).cast("long"))

  /** The search's relational inputs, shared with the spec's index-served
    * path: term frequencies, doc lengths, corpus stats and the 3-term
    * query frame.
    */
  private[graft] case class Parts(tf: DataFrame, dl: DataFrame,
      stats: DataFrame, df: DataFrame, qterms: DataFrame)

  /** Term frequencies of a (doc_id, text) frame — ONE tokenize-explode
    * pass into the fine (token, doc_id) aggregation.
    */
  private[graft] def termFreqs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** The deterministic query frame over a df relation: terms at
    * [[QueryRanks]] by (df DESC, token) — top-30 by TakeOrdered FIRST
    * (the vocabulary is corpus-sized; a global row_number over it would
    * single-partition the whole vocab), then rank the ≤30 survivors.
    */
  private[graft] def queryTerms(df: DataFrame): DataFrame = {
    val wq = Window.orderBy(col("df").desc, col("token"))
    df.orderBy(col("df").desc, col("token")).limit(QueryRanks.max)
      .withColumn("qrank", row_number().over(wq))
      .filter(col("qrank").isin(QueryRanks.map(Integer.valueOf): _*))
      .select(col("token"), col("df"))
  }

  /** [[Parts]] from already-derived tf/dl relations — shared by the
    * corpus query (cached derivations) and the maintained-serving path
    * ([[graft.streaming.SearchStream]] reads tf off index segments and
    * dl off its maintained table, then scores through the SAME math).
    */
  private[graft] def partsFrom(tf: DataFrame, dl: DataFrame): Parts = {
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")) * lit(1.0) / count(lit(1))).as("avgdl"))
    Parts(tf, dl, stats, df, queryTerms(df))
  }

  /** The corpus term-frequency relation, SHARED per session (the
    * docVectors/trainedCells discipline): every consumer of the
    * corpus-wide tokenize-explode — the search queries, the spec's
    * index-served path, [[CorpusStats]]'s vocabulary diagnostics — reads
    * one cached derivation; per-query persist would rescan the corpus
    * once per caller.
    */
  private[graft] def sharedTf(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.shared(s"bm25tf:$sfDir") {
      termFreqs(Tables.load(spark, sfDir, "documents"))
    }

  private[graft] def parts(spark: SparkSession, sfDir: String): Parts = {
    val tf = sharedTf(spark, sfDir)
    // doc length = sum of its term frequencies — derived off the cached tf
    val dl = graft.CacheRegistry.shared(s"bm25dl:$sfDir") {
      tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    }
    partsFrom(tf, dl)
  }

  /** Top-[[TopK]] documents of `scored` per-(doc, term) rows. */
  private[graft] def topDocs(scored: DataFrame): DataFrame = {
    val perDoc = scored
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("terms_hit"),
          sum(col("term_score_x1000")).as("score_x1000"))
        .orderBy(col("score_x1000").desc, col("doc_id"))
        .limit(TopK)
    perDoc.withColumn("rank",
        row_number().over(Window.orderBy(col("score_x1000").desc, col("doc_id")))
          .cast("long"))
      .select(col("rank"), col("doc_id"), col("terms_hit"), col("score_x1000"))
  }

  val bm25: GraftQuery = new GraftQuery {
    val name = "search_bm25"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val p = parts(spark, sfDir)
      topDocs(bm25Scores(p.tf, p.qterms, p.dl, p.stats))
    }

    def oracle: Option[String] = Some(duckToksCte + s"""
      , ex AS (SELECT doc_id, unnest(ws) AS token FROM toks),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM ex GROUP BY 1, 2),
      dl AS (SELECT doc_id, count(*) AS dl FROM ex GROUP BY 1),
      df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      stats AS (SELECT count(*) AS n_docs, sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
      qterms AS (
        SELECT token, df FROM (
          SELECT token, df, row_number() OVER (ORDER BY df DESC, token) AS qrank
          FROM df) WHERE qrank IN (${QueryRanks.mkString(", ")})),
      scored AS (
        SELECT tf.doc_id,
               CAST(floor(
                 ln((stats.n_docs - qterms.df + 0.5) / (qterms.df + 0.5) + 1.0)
                 * (tf.tf * CAST(${K1 + 1.0} AS DOUBLE) /
                    (tf.tf + $K1 * (${1.0 - B} + $B * dl.dl / stats.avgdl)))
                 * 1000.0) AS BIGINT) AS term_score_x1000
        FROM tf JOIN qterms USING (token) JOIN dl USING (doc_id) CROSS JOIN stats),
      perdoc AS (
        SELECT doc_id, count(*) AS terms_hit, sum(term_score_x1000) AS score_x1000
        FROM scored GROUP BY 1
        ORDER BY score_x1000 DESC, doc_id LIMIT $TopK)
      SELECT row_number() OVER (ORDER BY score_x1000 DESC, doc_id) AS rank,
             doc_id, terms_hit, CAST(score_x1000 AS BIGINT) AS score_x1000
      FROM perdoc ORDER BY rank""")
  }

  /** BM25 served off MAINTAINED state — the [[bm25]] ranking re-derived
    * with zero corpus rescans from what
    * [[graft.streaming.SearchStream]]'s ingest path maintains: LSM index
    * segments (postings), the additive df/dl stat tables and the 2-row
    * corpus counter table. The corpus arrives as THREE doc batches with
    * a segment cap of 2, so the ranking is served ACROSS a compaction
    * (retired segments + a merged one) — and the oracle is [[bm25]]'s
    * corpus-scan SQL verbatim: hash equality proves
    * maintained-and-compacted serving ≡ the relational truth.
    *
    * Scale: ingest cost ∝ batch (segment write + three tile-local
    * folds); serve cost ∝ candidates (per-term pruned segment lookups,
    * candidate-tile dl reads, one broadcast stats row). The only
    * corpus-RELATION pass at query time is the TakeOrdered over the df
    * table that FORMULATES the deterministic 3-term query — a real
    * engine takes user terms and skips it.
    */
  val bm25Maintained: GraftQuery = new GraftQuery {
    val name = "search_bm25_maintained"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // the ingest is byte-identical to the hybrid queries' lexical leg
      // (same contiguous 3-batch split, same segment cap), so all three
      // maintained-search queries read ONE per-session ingest
      // (hybridRoots' per-sfDir memo — the rehearsal contract runs once)
      val (r, _) = hybridRoots(spark, sfDir)
      graft.streaming.SearchStream.serve(spark, r).get
    }

    def oracle: Option[String] = bm25.oracle
  }

  /** Per-list depth feeding the fusion; fusion output stays [[TopK]]. */
  private val FuseDepth = 50

  /** RRF's rank-damping constant (Cormack, Clarke & Büttcher 2009). */
  private val RrfK = 60

  /** Concurrent queries in the maintained hybrid panel (docs 0..4). */
  private val HybridQ = 5L

  /** Hybrid retrieval: reciprocal-rank fusion of a LEXICAL ranking (BM25,
    * query = the 3 highest-tf tokens of document 0) and a SEMANTIC ranking
    * (cosine over the deterministic feature-hash doc embeddings against
    * document 0) — the fusion recipe hybrid search engines run, with both
    * branches reusing this engine's existing oracled stacks. Contributions
    * are pure integer divisions `1000000 div (RrfK + rank)` (a list a doc
    * misses contributes 0), so the fused score is engine-exact with no
    * float path at all.
    *
    * Scale shape: the lexical branch is [[bm25]]'s (broadcast 3-term
    * semi-join); the semantic branch broadcasts the ONE query vector into
    * a map-only codegen'd cosine pass (at corpus scale the IVF/LSH
    * blocking the ANN family provides replaces the scan); each branch
    * TakeOrders its own top-[[FuseDepth]], and fusion joins two 50-row
    * frames.
    */
  val hybridRrf: GraftQuery = new GraftQuery {
    val name = "search_hybrid_rrf"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val p = parts(spark, sfDir)
      val q0 = p.tf.filter(col("doc_id") === 0)
        .orderBy(col("tf").desc, col("token")).limit(3)
        .select(col("token"))
        .join(p.df, "token")
      val lexTop = bm25Scores(p.tf, q0, p.dl, p.stats)
        .filter(col("doc_id") =!= 0)
        .groupBy(col("doc_id"))
        .agg(sum(col("term_score_x1000")).as("s"))
        .orderBy(col("s").desc, col("doc_id")).limit(FuseDepth)
      val lex = lexTop.withColumn("lex_rank",
          row_number().over(Window.orderBy(col("s").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("lex_rank"))

      val v = TextEmbed.normalizedDocVectors(spark, sfDir)
      val qv = v.filter(col("doc_id") === 0)
        .select(col("v").as("qv"), col("nrm").as("qn"))
      val semTop = v.filter(col("doc_id") =!= 0)
        .crossJoin(broadcast(qv))
        .withColumn("cos_bp",
          floor(expr("dot_double(v, qv)") * lit(10000.0) /
            (col("nrm") * col("qn"))).cast("long"))
        .orderBy(col("cos_bp").desc, col("doc_id")).limit(FuseDepth)
      val sem = semTop.withColumn("sem_rank",
          row_number().over(Window.orderBy(col("cos_bp").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("sem_rank"))

      val fused = lex.join(sem, Seq("doc_id"), "full_outer")
        .withColumn("lex_rank", coalesce(col("lex_rank"), lit(0L)))
        .withColumn("sem_rank", coalesce(col("sem_rank"), lit(0L)))
        .withColumn("rrf_x1e6",
          when(col("lex_rank") > 0, expr(s"1000000L div (${RrfK}L + lex_rank)"))
            .otherwise(lit(0L)) +
          when(col("sem_rank") > 0, expr(s"1000000L div (${RrfK}L + sem_rank)"))
            .otherwise(lit(0L)))
        .orderBy(col("rrf_x1e6").desc, col("doc_id")).limit(TopK)
      fused.withColumn("rank",
          row_number().over(Window.orderBy(col("rrf_x1e6").desc, col("doc_id")))
            .cast("long"))
        .select(col("rank"), col("doc_id"), col("lex_rank"), col("sem_rank"),
          col("rrf_x1e6"))
    }

    def oracle: Option[String] = Some(TextEmbed.duckEmbedCtes + s"""
      , dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      ldf AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      stats AS (SELECT count(*) AS n_docs, sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
      q0 AS (SELECT token FROM tf WHERE doc_id = 0 ORDER BY tf DESC, token LIMIT 3),
      qterms AS (SELECT q0.token, ldf.df FROM q0 JOIN ldf USING (token)),
      lscored AS (
        SELECT tf.doc_id,
               CAST(floor(
                 ln((stats.n_docs - qterms.df + 0.5) / (qterms.df + 0.5) + 1.0)
                 * (tf.tf * CAST(${K1 + 1.0} AS DOUBLE) /
                    (tf.tf + $K1 * (${1.0 - B} + $B * dl.dl / stats.avgdl)))
                 * 1000.0) AS BIGINT) AS term_score_x1000
        FROM tf JOIN qterms USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
        WHERE tf.doc_id <> 0),
      lex AS (
        SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS lex_rank
        FROM (SELECT doc_id, sum(term_score_x1000) AS s FROM lscored GROUP BY 1
              ORDER BY s DESC, doc_id LIMIT $FuseDepth)),
      n2 AS (
        SELECT doc_id, list_transform(e, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * x))) AS nrm
        FROM vec),
      nz AS (SELECT * FROM n2 WHERE nrm > 0),
      qv AS (SELECT v, nrm FROM nz WHERE doc_id = 0),
      sem AS (
        SELECT doc_id, row_number() OVER (ORDER BY cos_bp DESC, doc_id) AS sem_rank
        FROM (
          SELECT c.doc_id,
                 CAST(floor(list_sum(list_transform(generate_series(1, len(c.v)),
                        i -> c.v[i] * qv.v[i])) * 10000.0 / (c.nrm * qv.nrm)) AS BIGINT) AS cos_bp
          FROM nz c CROSS JOIN qv WHERE c.doc_id <> 0
          ORDER BY cos_bp DESC, c.doc_id LIMIT $FuseDepth)),
      fused AS (
        SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
               coalesce(lex_rank, 0) AS lex_rank,
               coalesce(sem_rank, 0) AS sem_rank,
               (CASE WHEN lex_rank IS NULL THEN 0
                     ELSE 1000000 // ($RrfK + lex_rank) END
                + CASE WHEN sem_rank IS NULL THEN 0
                       ELSE 1000000 // ($RrfK + sem_rank) END) AS rrf_x1e6
        FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id),
      top AS (SELECT * FROM fused ORDER BY rrf_x1e6 DESC, doc_id LIMIT $TopK)
      SELECT row_number() OVER (ORDER BY rrf_x1e6 DESC, doc_id) AS rank, doc_id,
             CAST(lex_rank AS BIGINT) AS lex_rank,
             CAST(sem_rank AS BIGINT) AS sem_rank,
             CAST(rrf_x1e6 AS BIGINT) AS rrf_x1e6
      FROM top ORDER BY rank""")
  }

  /** Hybrid retrieval served off MAINTAINED indexes — [[hybridRrf]]'s
    * deployment shape: the lexical leg reads the
    * [[graft.streaming.SearchStream]] LSM index + additive stat tables
    * (ingested as three batches under a segment cap of 2, so the serve
    * crosses a compaction), and the semantic leg reads
    * [[graft.streaming.AnnStream]]'s maintained IVF cell postings over
    * the derived doc embeddings (top-2-cell probe — the real pruned
    * serving path, NOT the relational brute scan, which is why this
    * query carries its own oracle: the same IVF probe mirrored
    * relationally). Query = document 0 (its top-3 tf tokens for the
    * lexical leg, its embedding for the semantic leg — the
    * one-document point read standing in for a user query); fusion is
    * [[hybridRrf]]'s integer RRF verbatim.
    *
    * Scale: ingest ∝ batch on both legs; serve is 3 term lookups (≤1
    * pruned tile per live segment each), candidate-tile dl reads, 2
    * probed-cell tile reads, and a 50x50 fusion join. Zero corpus
    * rescans at query time.
    */
  val hybridMaintained: GraftQuery = new GraftQuery {
    val name = "search_hybrid_maintained"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val (r, ar) = hybridRoots(spark, sfDir)
      hybridServe(spark, sfDir, r, ar)
    }

    def oracle: Option[String] = hybridMaintainedOracle
  }

  /** Per-sfDir memo of the ingested hybrid state: BOTH maintained-serve
    * queries (the doc-0 point read and the query panel) serve off ONE
    * three-batch-plus-compaction ingest per session — the ingest is a
    * pure function of the fixture tables, so the memo is safe for the
    * fixed-fixture Verify/Bench sessions it serves (the
    * [[EmbedPca.solved]] precedent: a regenerated fixture under the
    * SAME path needs a new session). The multi-batch rehearsal contract
    * is untouched — it runs, once, with both serves reading its result.
    */
  private val hybridIngested =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def hybridRoots(spark: SparkSession, sfDir: String): (String, String) =
    hybridIngested.computeIfAbsent(sfDir, _ => {
      import graft.streaming.{AnnStream, SearchStream}
      val docs = Tables.load(spark, sfDir, "documents")
      val r = SnapshotDiff.scratchRoot("hybridstream", sfDir)
      SnapshotDiff.rmTree(r)
      SearchStream.contiguousBatches(docs, 3).zipWithIndex.foreach {
        case (b, i) => SearchStream.applyBatch(b, i + 1L, r, maxSegments = 2)
      }
      val dv = TextEmbed.normalizedDocVectors(spark, sfDir)
      SearchStream.contiguousBatches(dv, 3).zipWithIndex.foreach {
        case (b, i) => AnnStream.applyBatch(
          b.withColumnRenamed("doc_id", "vec_id"), i + 1L, s"$r/ann")
      }
      (r, s"$r/ann")
    })

  /** Hybrid retrieval for a QUERY PANEL off the same maintained indexes
    * — the deployment shape past [[hybridMaintained]]'s single point
    * read: [[HybridQ]] concurrent queries (docs 0..4 standing in for a
    * user-query batch) share one serve pass. Per-query cost stays
    * bounded: the lexical leg's term lookups are DISTINCT-token-bounded
    * with posting rows fanning out through the broadcast (qid, token,
    * df) frame ([[graft.streaming.SearchStream.scoredAtPanel]]), the
    * per-query top-[[FuseDepth]] is the exact two-phase salted form
    * ([[topKPerQuery]] — no query funnels its candidate set through one
    * window partition), and the semantic leg probes ≤ 2·[[HybridQ]]
    * cells total ([[graft.streaming.AnnStream.serve]]'s panel path) —
    * no N× corpus amplification anywhere.
    */
  val hybridMulti: GraftQuery = new GraftQuery {
    val name = "search_hybrid_multi"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.streaming.{AnnStream, SearchStream}
      val (r, ar) = hybridRoots(spark, sfDir)
      val docs = Tables.load(spark, sfDir, "documents")
      val dv = TextEmbed.normalizedDocVectors(spark, sfDir)
      // query formulation: each panel doc's top-3 tf tokens (the
      // hybridServe rule per query; ≤ 3·HybridQ driver rows)
      val wq = Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("token"))
      val qtoks = termFreqs(docs.filter(col("doc_id") < HybridQ))
        .withColumn("qr", row_number().over(wq))
        .filter(col("qr") <= 3)
        .select(col("doc_id").as("qid"), col("token")).collect()
        .map(rr => (rr.getLong(0), rr.getString(1)))
      val head = graft.sources.SnapshotTable
        .latestVersion(SearchStream.statsRoot(r)).get
      val dfByTok = SearchStream.dfRelation(spark, r, head)
        .filter(col("token").isin(qtoks.map(_._2).distinct: _*))
        .collect().map(rr => rr.getString(0) -> rr.getLong(1)).toMap
      val panel = qtoks.collect { case (q, t) if dfByTok.contains(t) =>
        (q, t, dfByTok(t)) }.toSeq
      val perDoc = SearchStream.scoredAtPanel(spark, r, head, panel)
        .filter(col("doc_id") =!= col("qid"))
        .groupBy(col("qid"), col("doc_id"))
        .agg(sum(col("term_score_x1000")).as("score_x1000"))
      val lex = topKPerQuery(perDoc, FuseDepth, MultiSalt)
        .select(col("qid"), col("doc_id"), col("rank").as("lex_rank"))
      val sem = AnnStream.serve(spark, ar,
          dv.filter(col("doc_id") < HybridQ)
            .withColumnRenamed("doc_id", "vec_id"), k = FuseDepth).get
        .select(col("query_id").as("qid"),
          col("neighbor_id").as("doc_id"), col("rank").as("sem_rank"))
      val fused = lex.join(sem, Seq("qid", "doc_id"), "full_outer")
        .withColumn("lex_rank", coalesce(col("lex_rank"), lit(0L)))
        .withColumn("sem_rank", coalesce(col("sem_rank"), lit(0L)))
        .withColumn("rrf_x1e6",
          when(col("lex_rank") > 0,
            expr(s"1000000L div (${RrfK}L + lex_rank)")).otherwise(lit(0L)) +
          when(col("sem_rank") > 0,
            expr(s"1000000L div (${RrfK}L + sem_rank)")).otherwise(lit(0L)))
      val wf = Window.partitionBy(col("qid"))
        .orderBy(col("rrf_x1e6").desc, col("doc_id"))
      fused.withColumn("rank", row_number().over(wf).cast("long"))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("rank"), col("doc_id"), col("lex_rank"),
          col("sem_rank"), col("rrf_x1e6"))
        .orderBy(col("qid"), col("rank"))
    }

    def oracle: Option[String] = hybridMultiOracle
  }

  /** The fused query-time read over already-ingested hybrid state —
    * split from the ingest so the serve-across-compaction spec can
    * drive it under its own batching/replay schedule. `r` is the
    * lexical SearchStream root, `ar` the AnnStream root over the
    * derived doc vectors.
    */
  private[graft] def hybridServe(spark: SparkSession, sfDir: String,
      r: String, ar: String): DataFrame = {
      import graft.streaming.{AnnStream, SearchStream}
      val docs = Tables.load(spark, sfDir, "documents")
      val dv = TextEmbed.normalizedDocVectors(spark, sfDir)
      // query formulation: ONE document's point read (doc 0) — tokens
      // ranked by tf for the lexical leg, its vector for the semantic
      val q0toks = termFreqs(docs.filter(col("doc_id") === 0))
        .orderBy(col("tf").desc, col("token")).limit(3)
        .select(col("token")).collect().map(_.getString(0)).toSeq
      val head = graft.sources.SnapshotTable
        .latestVersion(SearchStream.statsRoot(r)).get
      val qtRows = SearchStream.dfRelation(spark, r, head)
        .filter(col("token").isin(q0toks: _*)).collect()
        .map(rr => (rr.getString(0), rr.getLong(1))).toSeq
      val lexTop = SearchStream.scoredAt(spark, r, head, qtRows)
        .filter(col("doc_id") =!= 0)
        .groupBy(col("doc_id"))
        .agg(sum(col("term_score_x1000")).as("s"))
        .orderBy(col("s").desc, col("doc_id")).limit(FuseDepth)
      val lex = lexTop.withColumn("lex_rank",
          row_number().over(Window.orderBy(col("s").desc, col("doc_id")))
            .cast("long"))
        .select(col("doc_id"), col("lex_rank"))
      val sem = AnnStream.serve(spark, ar,
          dv.filter(col("doc_id") === 0)
            .withColumnRenamed("doc_id", "vec_id"), k = FuseDepth).get
        .select(col("neighbor_id").as("doc_id"),
          col("rank").as("sem_rank"))
      val fused = lex.join(sem, Seq("doc_id"), "full_outer")
        .withColumn("lex_rank", coalesce(col("lex_rank"), lit(0L)))
        .withColumn("sem_rank", coalesce(col("sem_rank"), lit(0L)))
        .withColumn("rrf_x1e6",
          when(col("lex_rank") > 0, expr(s"1000000L div (${RrfK}L + lex_rank)"))
            .otherwise(lit(0L)) +
          when(col("sem_rank") > 0, expr(s"1000000L div (${RrfK}L + sem_rank)"))
            .otherwise(lit(0L)))
        .orderBy(col("rrf_x1e6").desc, col("doc_id")).limit(TopK)
      fused.withColumn("rank",
          row_number().over(Window.orderBy(col("rrf_x1e6").desc, col("doc_id")))
            .cast("long"))
        .select(col("rank"), col("doc_id"), col("lex_rank"), col("sem_rank"),
          col("rrf_x1e6"))
  }

  private def hybridMaintainedOracle: Option[String] = Some(TextEmbed.duckEmbedCtes + s"""
      , dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      ldf AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      stats AS (SELECT count(*) AS n_docs, sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
      q0 AS (SELECT token FROM tf WHERE doc_id = 0 ORDER BY tf DESC, token LIMIT 3),
      qterms AS (SELECT q0.token, ldf.df FROM q0 JOIN ldf USING (token)),
      lscored AS (
        SELECT tf.doc_id,
               CAST(floor(
                 ln((stats.n_docs - qterms.df + 0.5) / (qterms.df + 0.5) + 1.0)
                 * (tf.tf * CAST(${K1 + 1.0} AS DOUBLE) /
                    (tf.tf + $K1 * (${1.0 - B} + $B * dl.dl / stats.avgdl)))
                 * 1000.0) AS BIGINT) AS term_score_x1000
        FROM tf JOIN qterms USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
        WHERE tf.doc_id <> 0),
      lex AS (
        SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS lex_rank
        FROM (SELECT doc_id, sum(term_score_x1000) AS s FROM lscored GROUP BY 1
              ORDER BY s DESC, doc_id LIMIT $FuseDepth)),
      n2 AS (
        SELECT doc_id, list_transform(e, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * x))) AS nrm
        FROM vec),
      nz AS (SELECT * FROM n2 WHERE nrm > 0),
      scents AS (
        SELECT doc_id AS cid, v AS cv, nrm AS cnrm
        FROM nz ORDER BY doc_id LIMIT 16),
      sassign AS (
        SELECT nz.doc_id, nz.v, nz.nrm, c.cid,
               CAST(floor(list_sum(list_transform(generate_series(1, len(nz.v)),
                      i -> nz.v[i] * c.cv[i])) * 10000.0 / (nz.nrm * c.cnrm)) AS BIGINT) AS ccos_bp
        FROM nz CROSS JOIN scents c),
      sranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY ccos_bp DESC, cid) AS crank
        FROM sassign),
      scorpus AS (SELECT doc_id, v, nrm, cid AS cell FROM sranked WHERE crank = 1),
      sqp AS (SELECT doc_id, v, nrm, cid AS cell FROM sranked
              WHERE crank <= 2 AND doc_id = 0),
      sem AS (
        SELECT doc_id, row_number() OVER (ORDER BY cos_bp DESC, doc_id) AS sem_rank
        FROM (
          SELECT c.doc_id,
                 CAST(floor(list_sum(list_transform(generate_series(1, len(q.v)),
                        i -> q.v[i] * c.v[i])) * 10000.0 / (q.nrm * c.nrm)) AS BIGINT) AS cos_bp
          FROM sqp q JOIN scorpus c ON q.cell = c.cell AND q.doc_id <> c.doc_id
          ORDER BY cos_bp DESC, c.doc_id LIMIT $FuseDepth)),
      fused AS (
        SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
               coalesce(lex_rank, 0) AS lex_rank,
               coalesce(sem_rank, 0) AS sem_rank,
               (CASE WHEN lex_rank IS NULL THEN 0
                     ELSE 1000000 // ($RrfK + lex_rank) END
                + CASE WHEN sem_rank IS NULL THEN 0
                       ELSE 1000000 // ($RrfK + sem_rank) END) AS rrf_x1e6
        FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id),
      top AS (SELECT * FROM fused ORDER BY rrf_x1e6 DESC, doc_id LIMIT $TopK)
      SELECT row_number() OVER (ORDER BY rrf_x1e6 DESC, doc_id) AS rank, doc_id,
             CAST(lex_rank AS BIGINT) AS lex_rank,
             CAST(sem_rank AS BIGINT) AS sem_rank,
             CAST(rrf_x1e6 AS BIGINT) AS rrf_x1e6
      FROM top ORDER BY rank""")

  /** [[hybridMaintainedOracle]] generalized to the query panel: per-qid
    * 3-term formulation, per-qid lexical/semantic rankings (the sqp
    * probe keeps the crank ≤ 2 pruned-cell mirror — candidates live in
    * exactly one cell, so no per-query dedup is needed), per-qid RRF.
    */
  private def hybridMultiOracle: Option[String] = Some(
    TextEmbed.duckEmbedCtes + s"""
      , dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      ldf AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      stats AS (SELECT count(*) AS n_docs, sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
      qp AS (
        SELECT doc_id AS qid, token FROM (
          SELECT doc_id, token, row_number() OVER (PARTITION BY doc_id
                   ORDER BY tf DESC, token) AS qr
          FROM tf WHERE doc_id < $HybridQ) WHERE qr <= 3),
      qterms AS (SELECT qp.qid, qp.token, ldf.df FROM qp JOIN ldf USING (token)),
      lscored AS (
        SELECT qterms.qid, tf.doc_id,
               CAST(floor(
                 ln((stats.n_docs - qterms.df + 0.5) / (qterms.df + 0.5) + 1.0)
                 * (tf.tf * CAST(${K1 + 1.0} AS DOUBLE) /
                    (tf.tf + $K1 * (${1.0 - B} + $B * dl.dl / stats.avgdl)))
                 * 1000.0) AS BIGINT) AS term_score_x1000
        FROM tf JOIN qterms USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
        WHERE tf.doc_id <> qterms.qid),
      lex AS (
        SELECT qid, doc_id, lex_rank FROM (
          SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
                   ORDER BY s DESC, doc_id) AS lex_rank
          FROM (SELECT qid, doc_id, sum(term_score_x1000) AS s
                FROM lscored GROUP BY 1, 2))
        WHERE lex_rank <= $FuseDepth),
      n2 AS (
        SELECT doc_id, list_transform(e, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * x))) AS nrm
        FROM vec),
      nz AS (SELECT * FROM n2 WHERE nrm > 0),
      scents AS (
        SELECT doc_id AS cid, v AS cv, nrm AS cnrm
        FROM nz ORDER BY doc_id LIMIT 16),
      sassign AS (
        SELECT nz.doc_id, nz.v, nz.nrm, c.cid,
               CAST(floor(list_sum(list_transform(generate_series(1, len(nz.v)),
                      i -> nz.v[i] * c.cv[i])) * 10000.0 / (nz.nrm * c.cnrm)) AS BIGINT) AS ccos_bp
        FROM nz CROSS JOIN scents c),
      sranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY ccos_bp DESC, cid) AS crank
        FROM sassign),
      scorpus AS (SELECT doc_id, v, nrm, cid AS cell FROM sranked WHERE crank = 1),
      sqp AS (SELECT doc_id AS qid, v, nrm, cid AS cell FROM sranked
              WHERE crank <= 2 AND doc_id < $HybridQ),
      sem AS (
        SELECT qid, doc_id, sem_rank FROM (
          SELECT q.qid, c.doc_id,
                 row_number() OVER (PARTITION BY q.qid ORDER BY
                   CAST(floor(list_sum(list_transform(generate_series(1, len(q.v)),
                          i -> q.v[i] * c.v[i])) * 10000.0 / (q.nrm * c.nrm)) AS BIGINT) DESC,
                   c.doc_id) AS sem_rank
          FROM sqp q JOIN scorpus c ON q.cell = c.cell AND q.qid <> c.doc_id)
        WHERE sem_rank <= $FuseDepth),
      fused AS (
        SELECT coalesce(lex.qid, sem.qid) AS qid,
               coalesce(lex.doc_id, sem.doc_id) AS doc_id,
               coalesce(lex_rank, 0) AS lex_rank,
               coalesce(sem_rank, 0) AS sem_rank,
               (CASE WHEN lex_rank IS NULL THEN 0
                     ELSE 1000000 // ($RrfK + lex_rank) END
                + CASE WHEN sem_rank IS NULL THEN 0
                       ELSE 1000000 // ($RrfK + sem_rank) END) AS rrf_x1e6
        FROM lex FULL OUTER JOIN sem
          ON lex.qid = sem.qid AND lex.doc_id = sem.doc_id),
      franked AS (
        SELECT *, row_number() OVER (PARTITION BY qid
                    ORDER BY rrf_x1e6 DESC, doc_id) AS rank
        FROM fused)
      SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
             doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
             CAST(sem_rank AS BIGINT) AS sem_rank,
             CAST(rrf_x1e6 AS BIGINT) AS rrf_x1e6
      FROM franked WHERE rank <= $TopK ORDER BY qid, rank""")

  /** Per-doc occurrence counts of doc 0's opening 2-token phrase over any
    * (doc_id, text) frame — fixture-testable body of [[phrase]].
    */
  private[graft] def phraseHits(docs: DataFrame): DataFrame = {
    val pos = graft.CacheRegistry.persist(docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "token"))))
    val q0 = pos.filter(col("doc_id") === 0 && col("pos") < 2)
      .groupBy()
      .agg(max(when(col("pos") === 0, col("token"))).as("w1"),
        max(when(col("pos") === 1, col("token"))).as("w2"))
    val withQ = pos.crossJoin(broadcast(q0))
    val lhs = withQ.filter(col("token") === col("w1"))
      .select(col("doc_id"), col("pos"))
    val rhs = withQ.filter(col("token") === col("w2"))
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    lhs.join(rhs, Seq("doc_id", "pos"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_occurrences"))
  }

  /** Exact phrase search: documents containing the 2-token phrase that
    * OPENS document 0 (deterministic, corpus-derived — a literal would be
    * fixture-fragile), ranked by occurrence count. Positional adjacency
    * the BM25 bag-of-words scorer cannot express: an occurrence is
    * token w1 at position p AND token w2 at p+1 in the same document.
    *
    * Scale shape: the position table filters to EACH phrase term first
    * (map-side against the one broadcast query row — candidate mass ∝ the
    * terms' frequency, never the corpus), then the adjacency join runs on
    * the fine (doc_id, pos) key. A positional INDEX layout would serve
    * the same two posting streams straight off term tiles
    * ([[InvertedIndex.termLookup]] with positions carried — the tf-only
    * postings keep today's index lean; carrying a positions array is the
    * documented extension point).
    */
  val phrase: GraftQuery = new GraftQuery {
    val name = "search_phrase"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val hits = phraseHits(Tables.load(spark, sfDir, "documents"))
        .orderBy(col("n_occurrences").desc, col("doc_id")).limit(TopK)
      hits.withColumn("rank",
          row_number().over(Window.orderBy(col("n_occurrences").desc, col("doc_id")))
            .cast("long"))
        .select(col("rank"), col("doc_id"), col("n_occurrences"))
    }

    def oracle: Option[String] = Some(duckToksCte + s"""
      , pos AS (
        SELECT doc_id,
               unnest(generate_series(1, len(ws))) - 1 AS pos,
               unnest(list_transform(generate_series(1, len(ws)), d -> ws[d])) AS token
        FROM toks),
      q0 AS (
        SELECT max(CASE WHEN pos = 0 THEN token END) AS w1,
               max(CASE WHEN pos = 1 THEN token END) AS w2
        FROM pos WHERE doc_id = 0),
      lhs AS (SELECT doc_id, pos FROM pos CROSS JOIN q0 WHERE token = w1),
      rhs AS (SELECT doc_id, pos - 1 AS pos FROM pos CROSS JOIN q0 WHERE token = w2),
      hits AS (
        SELECT doc_id, count(*) AS n_occurrences
        FROM lhs JOIN rhs USING (doc_id, pos) GROUP BY 1
        ORDER BY n_occurrences DESC, doc_id LIMIT $TopK)
      SELECT row_number() OVER (ORDER BY n_occurrences DESC, doc_id) AS rank,
             doc_id, n_occurrences
      FROM hits ORDER BY rank""")
  }

  /** Batched-query panel: [[MultiQ]] queries of three df-ranked terms
    * each, base ranks shifted by query id. Base spacing (3) is SMALLER
    * than [[MultiQ]], so term sets genuinely overlap across queries
    * (rank 11 serves query 0's second slot AND query 3's first) — the
    * one-posting-row-feeds-many-queries fan-out is exercised, not just
    * plumbed. Top-[[MultiTopK]] documents per query.
    */
  private val MultiQ = 5
  private val MultiBaseRanks = Seq(8, 11, 14)
  private val MultiTopK = 10
  private val MultiSalt = 16

  /** Batched multi-query BM25 — the OFFLINE shape of retrieval: a
    * training pipeline scores a whole query panel in one pass over the
    * postings (hard-negative mining for retriever training, relevance
    * labeling, eval-set construction), not one query at a time. All
    * [[MultiQ]] queries ride ONE broadcast (qid, token, df) frame into
    * the same single postings join — a posting row fans out only to the
    * queries containing its term — and the per-query top-k is the EXACT
    * two-phase form: a (qid, doc_id-salt) local top-[[MultiTopK]] bounds
    * every final window partition to salt·k rows BEFORE the per-qid
    * ranking (a global-top-k member is top-k within its salt bucket, so
    * the prune is lossless), which is what keeps a query whose terms
    * match half the corpus from funnelling its whole candidate set
    * through one window partition at 100 TB.
    */
  /** Exact two-phase per-query top-k over (qid, doc_id, ..., score)
    * rows: a (qid, doc_id-salt-bucket) local top-k bounds every final
    * window partition to salt·k rows before the per-qid ranking. The
    * prune is lossless — a global top-k member is top-k within its own
    * salt bucket — so `salt = 1` (the plain single-window form) returns
    * the identical frame; the spec pins that equality.
    */
  private[graft] def topKPerQuery(perDoc: DataFrame, k: Int,
      salt: Int): DataFrame = {
    val w1 = Window.partitionBy(col("qid"), pmod(col("doc_id"), lit(salt)))
      .orderBy(col("score_x1000").desc, col("doc_id"))
    val pruned = perDoc.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= k).drop("r1")
    val w2 = Window.partitionBy(col("qid"))
      .orderBy(col("score_x1000").desc, col("doc_id"))
    pruned.withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid") +: col("rank") +:
        perDoc.columns.filter(c => c != "qid").map(col).toIndexedSeq: _*)
  }

  val bm25Multi: GraftQuery = new GraftQuery {
    val name = "search_bm25_multi"

    private val maxRank = MultiBaseRanks.max + MultiQ - 1
    private val wantedPairs =
      for { q <- 0 until MultiQ; r <- MultiBaseRanks } yield (q, r + q)

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      val p = parts(spark, sfDir)
      val wq = Window.orderBy(col("df").desc, col("token"))
      val ranked = p.df.orderBy(col("df").desc, col("token")).limit(maxRank)
        .withColumn("qrank", row_number().over(wq))
      val wanted = wantedPairs.map { case (q, r) => (q.toLong, r) }
        .toDF("qid", "qrank")
      val qterms = ranked.join(broadcast(wanted), "qrank")
        .select(col("qid"), col("token"), col("df"))
      val perDoc = bm25Scores(p.tf, qterms, p.dl, p.stats)
        .groupBy(col("qid"), col("doc_id"))
        .agg(count(lit(1)).as("terms_hit"),
          sum(col("term_score_x1000")).as("score_x1000"))
      topKPerQuery(perDoc, MultiTopK, MultiSalt)
        .orderBy(col("qid"), col("rank"))
    }

    def oracle: Option[String] = Some(duckToksCte + s"""
      , ex AS (SELECT doc_id, unnest(ws) AS token FROM toks),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM ex GROUP BY 1, 2),
      dl AS (SELECT doc_id, count(*) AS dl FROM ex GROUP BY 1),
      df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      stats AS (SELECT count(*) AS n_docs, sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
      ranked AS (
        SELECT token, df, row_number() OVER (ORDER BY df DESC, token) AS qrank
        FROM (SELECT token, df FROM df ORDER BY df DESC, token LIMIT $maxRank)),
      wanted AS (
        SELECT * FROM (VALUES ${wantedPairs.map { case (q, r) => s"($q, $r)" }
          .mkString(", ")}) t(qid, qrank)),
      qterms AS (
        SELECT wanted.qid, ranked.token, ranked.df
        FROM ranked JOIN wanted USING (qrank)),
      scored AS (
        SELECT qterms.qid, tf.doc_id,
               CAST(floor(
                 ln((stats.n_docs - qterms.df + 0.5) / (qterms.df + 0.5) + 1.0)
                 * (tf.tf * CAST(${K1 + 1.0} AS DOUBLE) /
                    (tf.tf + $K1 * (${1.0 - B} + $B * dl.dl / stats.avgdl)))
                 * 1000.0) AS BIGINT) AS term_score_x1000
        FROM tf JOIN qterms USING (token) JOIN dl USING (doc_id) CROSS JOIN stats),
      perdoc AS (
        SELECT qid, doc_id, count(*) AS terms_hit,
               sum(term_score_x1000) AS score_x1000
        FROM scored GROUP BY 1, 2),
      rnk AS (
        SELECT qid, doc_id, terms_hit, score_x1000,
               row_number() OVER (PARTITION BY qid
                 ORDER BY score_x1000 DESC, doc_id) AS rank
        FROM perdoc)
      SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
             doc_id, CAST(terms_hit AS BIGINT) AS terms_hit,
             CAST(score_x1000 AS BIGINT) AS score_x1000
      FROM rnk WHERE rank <= $MultiTopK ORDER BY qid, rank""")
  }

  /** Snippet half-width in tokens and how many hits get one. */
  private val SnipW = 3
  private val SnipDocs = 5

  /** KWIC (keyword-in-context) snippet extraction — the result-page step
    * after ranking: for the top-[[SnipDocs]] BM25 documents, the
    * ±[[SnipW]]-token window around the document's EARLIEST query-term
    * occurrence (min position over all three query terms — deterministic,
    * and every ranked document has one by construction of the ranking).
    *
    * Scale shape: only the ≤[[SnipDocs]] winning documents are ever
    * re-tokenized — the position pass runs behind a BROADCAST semi-join
    * on the winner ids (at 100 TB the same five lookups ride the
    * positional index / doc store instead of a pruned scan); anchors and
    * windows are then candidate-sized joins. The window reassembles with
    * sort_array over ≤2·[[SnipW]]+1 collected (pos, token) structs per
    * doc — bounded, never corpus-sized; the lambda touches only its
    * bound variable (the PLANS.md lambda-capture rule).
    */
  /** [[snippets]]' windowing body over any (doc_id, text) frame, a
    * (doc_id, rank) winner frame and a query-term frame —
    * fixture-testable (window clipping at document edges).
    */
  private[graft] def snippetsFor(docs: DataFrame, top: DataFrame,
      qterms: DataFrame): DataFrame = {
    val pos = docs.join(broadcast(top.select(col("doc_id"), col("rank"))),
        "doc_id")
      .select(col("doc_id"), col("rank"),
        posexplode(tokens(col("text"))).as(Seq("pos", "token")))
    val anchors = pos
      .join(broadcast(qterms.select(col("token"))), "token")
      .groupBy(col("doc_id")).agg(min(col("pos")).as("anchor_pos"))
    pos.join(broadcast(anchors), "doc_id")
      .filter(col("pos").between(
        col("anchor_pos") - SnipW, col("anchor_pos") + SnipW))
      .groupBy(col("doc_id"), col("rank"), col("anchor_pos"))
      .agg(concat_ws(" ",
        transform(sort_array(collect_list(struct(col("pos"), col("token")))),
          x => x.getField("token"))).as("snippet"))
      .select(col("rank"), col("doc_id"),
        col("anchor_pos").cast("long").as("anchor_pos"), col("snippet"))
      .orderBy(col("rank"))
  }

  val snippets: GraftQuery = new GraftQuery {
    val name = "search_snippets"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val p = parts(spark, sfDir)
      val top = topDocs(bm25Scores(p.tf, p.qterms, p.dl, p.stats))
        .filter(col("rank") <= SnipDocs)
      snippetsFor(Tables.load(spark, sfDir, "documents"), top, p.qterms)
    }

    def oracle: Option[String] = Some(duckToksCte + s"""
      , ex AS (SELECT doc_id, unnest(ws) AS token FROM toks),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM ex GROUP BY 1, 2),
      dl AS (SELECT doc_id, count(*) AS dl FROM ex GROUP BY 1),
      df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      stats AS (SELECT count(*) AS n_docs, sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
      qterms AS (
        SELECT token, df FROM (
          SELECT token, df, row_number() OVER (ORDER BY df DESC, token) AS qrank
          FROM df) WHERE qrank IN (${QueryRanks.mkString(", ")})),
      scored AS (
        SELECT tf.doc_id,
               CAST(floor(
                 ln((stats.n_docs - qterms.df + 0.5) / (qterms.df + 0.5) + 1.0)
                 * (tf.tf * CAST(${K1 + 1.0} AS DOUBLE) /
                    (tf.tf + $K1 * (${1.0 - B} + $B * dl.dl / stats.avgdl)))
                 * 1000.0) AS BIGINT) AS term_score_x1000
        FROM tf JOIN qterms USING (token) JOIN dl USING (doc_id) CROSS JOIN stats),
      perdoc AS (
        SELECT doc_id, sum(term_score_x1000) AS score_x1000
        FROM scored GROUP BY 1
        ORDER BY score_x1000 DESC, doc_id LIMIT $TopK),
      top AS (
        SELECT * FROM (
          SELECT row_number() OVER (ORDER BY score_x1000 DESC, doc_id) AS rank,
                 doc_id
          FROM perdoc) WHERE rank <= $SnipDocs),
      pos AS (
        SELECT doc_id,
               unnest(generate_series(1, len(ws))) - 1 AS pos,
               unnest(list_transform(generate_series(1, len(ws)), d -> ws[d])) AS token
        FROM toks WHERE doc_id IN (SELECT doc_id FROM top)),
      anchors AS (
        SELECT doc_id, min(pos) AS anchor_pos
        FROM pos JOIN qterms USING (token) GROUP BY 1),
      snips AS (
        SELECT p.doc_id, string_agg(p.token, ' ' ORDER BY p.pos) AS snippet
        FROM pos p JOIN anchors a
          ON p.doc_id = a.doc_id
         AND p.pos BETWEEN a.anchor_pos - $SnipW AND a.anchor_pos + $SnipW
        GROUP BY 1)
      SELECT t.rank, t.doc_id, CAST(a.anchor_pos AS BIGINT) AS anchor_pos,
             s.snippet
      FROM top t
      JOIN anchors a USING (doc_id)
      JOIN snips s USING (doc_id)
      ORDER BY t.rank""")
  }

  val all: Seq[GraftQuery] =
    Seq(bm25, bm25Maintained, bm25Multi, hybridRrf, hybridMaintained,
      hybridMulti, phrase, snippets)
}

