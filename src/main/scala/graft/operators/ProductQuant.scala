package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** IVF-PQ compressed ANN — the storage lever for 10⁹+-vector corpora: a
  * 64-dim double vector (512 B) is stored as 8 four-bit codes (4 B, 128x),
  * and search scores candidates WITHOUT decompressing, by table lookup.
  *
  *  - PRODUCT QUANTIZATION: the L2-normalized vector is split into M=8
  *    subspaces of 8 dims; each subspace has its own 16-codeword codebook
  *    (seeded from the sub-vectors of the 16 lowest vec_ids — the same
  *    no-shipped-model determinism as [[Similarity.annIvf]] — then ONE
  *    exact L2-Lloyd refinement: per-dimension DECIMAL sums divided by
  *    member count in double, so every engine computes bit-identical
  *    codewords). A vector's code is its nearest codeword per subspace
  *    (floor-scaled L2, ties to the lower codeword id).
  *  - IVF: candidate generation is [[Similarity.annIvf]]'s cell probe —
  *    queries probe their top-2 of 16 cosine cells; only the probed cells'
  *    codes are ever scored.
  *  - ASYMMETRIC DISTANCE (ADC): score(q, c) = Σ_m dot(q̂_m, cw_m(code_m)) —
  *    the query stays full-precision, candidates stay compressed. The
  *    per-query partials dot(q̂_m, cw_m(k)) form a 8x16-entry LUT
  *    (broadcast); a candidate costs 8 lookups + a sum, never a 64-dim
  *    dot. The sum of partials is pinned through DECIMAL so the score is
  *    partition-order-independent. (This implementation joins the
  *    candidate's exploded codes to the LUT rows on the fine (m, k) key —
  *    the join-form of the lookup; a production variant would pack the LUT
  *    into a flat array column and do positional `element_at`, saving the
  *    8-row explode, at the cost of assuming a dense surviving codebook.)
  *
  * Recall/compression tradeoff (measured by [[pqRecall]] against brute
  * force, exactly as `ann_recall_ivf`): ADC ranking adds quantization
  * error on top of IVF's cell pruning, so recall@3 ≤ the uncompressed IVF
  * path's — the price of 128x smaller candidate storage. More codewords
  * buy recall back with bits: the SAME chain at K=256 (8-bit codes, 8
  * B/vector = 64x) is the `ann_ivf_pq8` / `ann_pq8_recall` pair — the
  * storage/recall curve's point between int8's 8x and 4-bit PQ's 128x.
  */
object ProductQuant {

  private val Dims = 64  // Similarity vector width (M * Dsub = Dims)
  private val M = 8      // default subspace count
  private val SeedK = 16 // codewords per subspace (4-bit codes)
  private val SeedK8 = 256 // codewords per subspace (8-bit codes)
  private val M16 = 16   // the subspace LEVER: 16 x 4-dim subspaces

  /** Normalized sub-vector table (vec_id, m, s): m 0-based, s = the unit
    * vector's dims [m*dsub+1, (m+1)*dsub] for dsub = Dims / mCount.
    */
  private def subVectors(e: DataFrame, mCount: Int): DataFrame = {
    val dsub = Dims / mCount
    e.select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("u"))
      .select(col("vec_id"), posexplode(array((0 until mCount).map(m =>
        slice(col("u"), m * dsub + 1, dsub)): _*)).as(Seq("m", "s")))
  }

  /** Floor-scaled squared L2 distance ||s − cw||² between column pairs —
    * expanded as dot(s,s) − 2·dot(s,cw) + dot(cw,cw) so both engines fold
    * left-to-right identically; scaled by 1e8 before floor so compares are
    * integer-exact. The two self-dots are INVARIANTS of their own sides
    * (per sub-vector / per codeword) and arrive precomputed as `s2`/`cw2`
    * — recomputing them per CANDIDATE was K× wasted work per sub-vector;
    * the double arithmetic is the same values in the same order, so the
    * scores are bit-identical to the inline form.
    */
  private def d2Scaled: org.apache.spark.sql.Column =
    floor((col("s2") - lit(2.0) * expr("dot_double(s, cw)") + col("cw2")) *
      lit(1e8)).cast("long")

  /** Nearest codeword per (vec_id, m): broadcast the codebook, pick the
    * min (scaled d2, codeword id) pair per sub-vector with `min_by` — a
    * hash aggregation with map-side partials, so the corpus × K candidate
    * rows collapse per partition BEFORE any exchange (ties impossible: k
    * breaks them). The earlier row_number window shuffled and sorted the
    * full candidate table — at K=256 that was 4M sorted rows per assign
    * and the dominant cost of the 8-bit point.
    */
  private def assign(sub: DataFrame, cb: DataFrame): DataFrame = {
    // the (d2, k) lexicographic argmin rides ONE primitive long through
    // the corpus × K aggregation: d2_sc ≥ 0 and k < 1024, so
    // d2_sc * 1024 + k orders exactly like (d2_sc, k) and min() stays a
    // codegen'd long comparison with map-side partials (a struct-ordered
    // min_by, and before it a row_number window over the sorted candidate
    // table, both measured slower at K=256 — the buffer carried arrays /
    // interpreted struct compares through 4M rows). The winners then pick
    // their sub-vector back up via a broadcast of the tiny result.
    val best = sub.withColumn("s2", expr("dot_double(s, s)"))
      .join(broadcast(cb.withColumn("cw2", expr("dot_double(cw, cw)"))), "m")
      .groupBy("vec_id", "m")
      .agg(min(d2Scaled * lit(1024L) + col("k")).as("ord"))
      // pmod, not %: d2_sc can be −1 when a codeword nearly equals its
      // member (the expanded form s2−2s·cw+cw2 of a ~0 distance floors
      // to −1 under fp rounding), and Java % of the then-negative packed
      // value would corrupt the decoded k (ordering is unaffected — the
      // packing is monotone for negative d2 too)
      .select(col("vec_id"), col("m"), pmod(col("ord"), lit(1024L)).as("k"))
    sub.join(broadcast(best), Seq("vec_id", "m"))
      .select(col("vec_id"), col("m"), col("k"), col("s"))
  }

  /** One exact L2-Lloyd step: codeword = per-dimension mean of its members
    * (DECIMAL sum → double ÷ count, engine-independent); codewords that
    * lose every member drop out, as in k-means.
    */
  private def refine(assigned: DataFrame): DataFrame =
    assigned.select(col("m"), col("k"), posexplode(col("s")).as(Seq("pos", "x")))
      .groupBy("m", "k", "pos")
      .agg(sum(col("x").cast(DecimalType(27, 10))).as("sx"), count(lit(1)).as("cnt"))
      .groupBy("m", "k")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("sx"), col("cnt")))),
        p => p.getField("sx").cast("double") / p.getField("cnt")).as("cw"))

  /** The shared IVF-PQ chain: (pairs, codes, lut) — candidate (query,
    * corpus) id pairs from the cosine cell probe, `seedK`-codeword codes
    * per corpus vector/subspace, and the per-query ADC partials. The IVF
    * probe and the sub-vector table are seedK-independent and session-
    * shared, so the 4-bit and 8-bit points pay for them once.
    */
  /** A pluggable vector source for the PQ chain: the default embeddings
    * table (near-orthogonal — the worst-case regime every recall number
    * was historically measured on) or the mixed-radii planted-cluster
    * fixture ([[Similarity.mixedVecs]] — the realistic-manifold regime).
    * `tag` keys the session-shared caches; `duckE` is the oracle's
    * `e(vec_id, v)` CTE body.
    */
  private[graft] final case class VecSrc(tag: String, duckE: String,
      frame: (SparkSession, String) => DataFrame)

  private[graft] val SrcEmb = VecSrc("emb",
    """
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings""",
    Similarity.vecs)

  private[graft] val SrcClu =
    VecSrc("clu", Similarity.duckMixedVecs, Similarity.mixedVecs)

  /** The session-shared IVF cell ranking (pq_ranked) — exposed for
    * [[Warmup]] so the first ann_ivf_pq* query is not charged the build.
    */
  private[graft] def sharedRanked(spark: SparkSession, sfDir: String,
      src: VecSrc = SrcEmb): DataFrame = {
    val e = src.frame(spark, sfDir)
    // IVF candidate generation — identical cell machinery to ann_ivf
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    graft.CacheRegistry.shared(s"pq_ranked:${src.tag}:$sfDir") {
      Similarity.cellRanked(e, cents).select("vec_id", "cid", "crank")
    }
  }

  /** The session-shared sub-vector table (pq_sub) for `mCount` subspaces
    * — [[Warmup]]-visible for the same reason.
    */
  private[graft] def sharedSub(spark: SparkSession, sfDir: String,
      mCount: Int, src: VecSrc = SrcEmb): DataFrame = {
    val e = src.frame(spark, sfDir)
    graft.CacheRegistry.shared(s"pq_sub:$mCount:${src.tag}:$sfDir")(
      subVectors(e, mCount))
  }

  private[operators] def pqChain(spark: SparkSession, sfDir: String,
      seedK: Int, mCount: Int,
      src: VecSrc = SrcEmb): (DataFrame, DataFrame, DataFrame) = {
    val ranked = sharedRanked(spark, sfDir, src)
    val pairs = ranked.filter(col("crank") <= 2 && col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("cid").as("cell"))
      .join(ranked.filter(col("crank") === 1)
        .select(col("vec_id"), col("cid").as("cell")), "cell")
      .filter(col("qid") =!= col("vec_id"))
      .select("qid", "vec_id")
    // PQ codebook: deterministic seeds + one exact Lloyd step
    val sub = sharedSub(spark, sfDir, mCount, src)
    val seeds = sub.filter(col("vec_id") < seedK)
      .select(col("m"), col("vec_id").as("k"), col("s").as("cw"))
    val cb = graft.CacheRegistry.persist(refine(assign(sub, seeds)))
    val codes = assign(sub, cb).select(col("vec_id"), col("m"), col("k").as("code"))
    val lut = sub.filter(col("vec_id") < 10).join(broadcast(cb), "m")
      .select(col("vec_id").as("qid"), col("m"), col("k"),
        expr("dot_double(s, cw)").as("part"))
    (pairs, codes, lut)
  }

  /** ADC-scored, rank-windowed candidates (query_id, neighbor_id,
    * adc_bp, rank) — the shared first stage of the top-k and the
    * rerank queries.
    */
  private[operators] def adcRanked(pairs: DataFrame, codes: DataFrame,
      lut: DataFrame): DataFrame = {
    val scored = pairs
      .join(codes, "vec_id")
      .join(broadcast(lut),
        pairs("qid") === lut("qid") && codes("m") === lut("m") &&
          codes("code") === lut("k"))
      .groupBy(pairs("qid").as("query_id"), col("vec_id").as("neighbor_id"))
      .agg(floor(sum(col("part").cast(DecimalType(27, 10))) * lit(10000))
        .cast("long").as("adc_bp"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_bp").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
  }

  /** ADC-scored top-3 per query over the probed cells, at `seedK`
    * codewords per subspace.
    */
  private def pqTopK(qName: String, seedK: Int,
      mCount: Int = M): GraftQuery = new GraftQuery {
    val name = qName

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val (pairs, codes, lut) = pqChain(spark, sfDir, seedK, mCount)
      adcRanked(pairs, codes, lut)
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"), col("adc_bp"))
        .orderBy("query_id", "rank")
    }

    def oracle: Option[String] = Some(duckPqCtes(seedK, mCount) + """
      SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, adc_bp
      FROM pq_ranked WHERE rank <= 3 ORDER BY query_id, rank
    """)
  }

  /** Flat-array ADC — the production form of the lookup the join-form
    * doc comment names: per-vector codes pack into ONE `array<int>` of
    * length M, the per-query LUT into ONE `array<double>` of length
    * M·K (position m·K + k), and a candidate is scored by a single
    * codegen'd `aggregate` over m — M positional `element_at`s and a
    * DECIMAL fold. vs the join form this removes the M-row explode per
    * candidate, the (m, k) lookup join AND the per-candidate groupBy:
    * the candidate frame stays ONE row wide end to end, so the only
    * per-candidate shuffle left is the final rank window's skinny
    * triple. The dense-array positions are filled through a map
    * (absent = dropped codeword → 0.0, never referenced by any code),
    * so a sparse surviving codebook cannot shift positions — the
    * correctness caveat that kept the join form as the oracled
    * default. Scores are bit-identical to [[annIvfPq]] (same partials,
    * DECIMAL addition is exact so fold order is irrelevant) — proven
    * by sharing its oracle verbatim and by PqFlatSpec's frame-equality
    * check against the join form.
    */
  private def pqTopKFlat(qName: String, seedK: Int,
      mCount: Int = M): GraftQuery = new GraftQuery {
    val name = qName

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val (pairs, codes, lut) = pqChain(spark, sfDir, seedK, mCount)
      val codesArr = codes.groupBy("vec_id")
        .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
          p => p.getField("code").cast("int")).as("codes"))
      val lutArr = lut
        .groupBy("qid")
        .agg(map_from_entries(collect_list(struct(
          (col("m") * seedK + col("k")).cast("int"), col("part")))).as("mm"))
        .select(col("qid"), expr(
          s"transform(sequence(0, ${mCount * seedK - 1}), " +
            "i -> coalesce(element_at(mm, int(i)), cast(0.0 as double)))")
          .as("lut"))
      val adc = expr(
        s"aggregate(sequence(0, ${mCount - 1}), cast(0.0 as decimal(27,10)), " +
          s"(acc, m) -> cast(acc + cast(element_at(lut, " +
          s"int(m) * $seedK + element_at(codes, int(m) + 1) + 1) " +
          "as decimal(27,10)) as decimal(27,10)))")
      val scored = pairs.join(codesArr, "vec_id").join(broadcast(lutArr), "qid")
        .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
          floor(adc * lit(10000)).cast("long").as("adc_bp"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("adc_bp").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"), col("adc_bp"))
        .orderBy("query_id", "rank")
    }

    def oracle: Option[String] = Some(duckPqCtes(seedK, mCount) + """
      SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, adc_bp
      FROM pq_ranked WHERE rank <= 3 ORDER BY query_id, rank
    """)
  }

  /** ADC top-3 at 16 codewords (4-bit codes, 128x). */
  val annIvfPq: GraftQuery = pqTopK("ann_ivf_pq", SeedK)

  /** Flat-array ADC at the same 16 codewords — identical results to
    * [[annIvfPq]] through the packed-array scorer.
    */
  val annIvfPqFlat: GraftQuery = pqTopKFlat("ann_ivf_pq_flat", SeedK)

  /** ADC top-3 at 256 codewords (8-bit codes, 64x). */
  val annIvfPq8: GraftQuery = pqTopK("ann_ivf_pq8", SeedK8)

  /** ADC top-3 at 16 subspaces of 4 dims, 16 codewords (64x) — the
    * SUBSPACE lever at the same 8 B/vec budget as [[annIvfPq8]], so the
    * two answer "spend the byte on codewords or on subspaces?" directly.
    */
  val annIvfPqM16: GraftQuery = pqTopK("ann_ivf_pq_m16", SeedK, M16)

  /** recall@3 of the compressed search vs full-precision brute force —
    * the tradeoff number for the storage saving at `seedK` codewords.
    */
  private def pqRecallOf(qName: String, seedK: Int,
      topk: GraftQuery, mCount: Int = M): GraftQuery = new GraftQuery {
    val name = qName

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val truth = Similarity.annTopK.run(spark, sfDir).filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"))
      val got = topk.run(spark, sfDir)
        .select(col("query_id").as("g_query"), col("neighbor_id").as("g_neighbor"))
      truth
        .join(got, col("query_id") === col("g_query") &&
          col("neighbor_id") === col("g_neighbor"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("truth_k"), count(col("g_neighbor")).as("hits"))
        .withColumn("recall_bp",
          floor(col("hits") * lit(10000.0) / col("truth_k")).cast("long"))
        .orderBy("query_id")
    }

    def oracle: Option[String] = Some(duckPqCtes(seedK, mCount) + """
      , brute AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   CAST(floor(list_sum(list_transform(generate_series(1, len(q.v)),
                        i -> q.v[i] * c.v[i])) * 10000.0 / (q.nrm * c.nrm)) AS BIGINT) DESC,
                   c.vec_id) AS rank
          FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
        WHERE rank <= 3),
      pq3 AS (SELECT query_id, neighbor_id FROM pq_ranked WHERE rank <= 3)
      SELECT b.query_id,
             count(*) AS truth_k,
             count(l.neighbor_id) AS hits,
             CAST(floor(count(l.neighbor_id) * 10000.0 / count(*)) AS BIGINT) AS recall_bp
      FROM brute b LEFT JOIN pq3 l
        ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
      GROUP BY 1 ORDER BY b.query_id
    """)
  }

  /** Rerank candidate depth: top-C ADC candidates per query go to the
    * exact int8 second stage. C ≫ k(=3) is the standard two-stage
    * contract: stage 1 only needs the true neighbors SOMEWHERE in its
    * top C, stage 2 restores their order.
    */
  private val RerankC = 32

  /** TWO-STAGE retrieval — the standard fix for PQ's recall ceiling
    * (measured 0.40-0.63 recall@3 at 8 B/vec): 8-bit IVF-PQ ADC
    * generates top-[[RerankC]] candidates per query, then an int8
    * asymmetric rerank (recall ≈ 1.0 per the measured int8 curve)
    * re-scores JUST those candidates at full 1-byte-per-dim resolution
    * and keeps top-3.
    *
    * Storage accounting: the hot tier (scanned per query) stays the 8
    * B/vec PQ codes; the int8 tier (64 B/vec) is touched only for the
    * C · queries candidate rows — an equi-join on vec id against a
    * BROADCAST candidate list, i.e. per-query cost C int8 fetches, so
    * the effective per-vector read budget is ~8 B + C·64/n → ~9 B/vec
    * at production corpus sizes (the cold tier can live on disk/object
    * storage; only point reads hit it). Plan shape stays
    * broadcast-codebook + equi-join only: no all-pairs stage anywhere.
    */
  val annIvfPqRerank: GraftQuery = new GraftQuery {
    val name = "ann_ivf_pq_rerank"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val (pairs, codes, lut) = pqChain(spark, sfDir, SeedK8, M)
      val cand = adcRanked(pairs, codes, lut)
        .filter(col("rank") <= RerankC)
        .select(col("query_id"), col("neighbor_id"))
      val e = Similarity.vecs(spark, sfDir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qnrm"))
      // the int8 corpus is the probe side; the C·queries candidate list
      // (with its full-precision query vectors) broadcasts
      val rr = int8Recon(e).withColumnRenamed("vec_id", "neighbor_id")
        .join(broadcast(cand.join(broadcast(q), "query_id")), "neighbor_id")
        .withColumn("cos_bp",
          floor(expr("dot_double(qv, rv)") * lit(10000.0) /
            (col("qnrm") * col("rnrm"))).cast("long"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_bp").desc, col("neighbor_id"))
      rr.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"), col("cos_bp"))
        .orderBy("query_id", "rank")
    }

    def oracle: Option[String] = Some(duckRerankCtes + """
      SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_bp
      FROM rr_ranked WHERE rank <= 3 ORDER BY query_id, rank
    """)
  }

  /** recall@3 of the two-stage path vs full-precision brute force — the
    * number that shows the rerank buying back what PQ quantization lost.
    */
  val pqRerankRecall: GraftQuery = new GraftQuery {
    val name = "ann_pq_rerank_recall"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val truth = Similarity.annTopK.run(spark, sfDir).filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"))
      val got = annIvfPqRerank.run(spark, sfDir)
        .select(col("query_id").as("g_query"), col("neighbor_id").as("g_neighbor"))
      truth
        .join(got, col("query_id") === col("g_query") &&
          col("neighbor_id") === col("g_neighbor"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("truth_k"), count(col("g_neighbor")).as("hits"))
        .withColumn("recall_bp",
          floor(col("hits") * lit(10000.0) / col("truth_k")).cast("long"))
        .orderBy("query_id")
    }

    def oracle: Option[String] = Some(duckRerankCtes + """
      , brute AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   CAST(floor(list_sum(list_transform(generate_series(1, len(q.v)),
                        i -> q.v[i] * c.v[i])) * 10000.0 / (q.nrm * c.nrm)) AS BIGINT) DESC,
                   c.vec_id) AS rank
          FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
        WHERE rank <= 3),
      got3 AS (SELECT query_id, neighbor_id FROM rr_ranked WHERE rank <= 3)
      SELECT b.query_id,
             count(*) AS truth_k,
             count(l.neighbor_id) AS hits,
             CAST(floor(count(l.neighbor_id) * 10000.0 / count(*)) AS BIGINT) AS recall_bp
      FROM brute b LEFT JOIN got3 l
        ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
      GROUP BY 1 ORDER BY b.query_id
    """)
  }

  /** DuckDB mirror of the full two-stage chain: the 8-bit PQ CTEs up to
    * `pq_ranked`, the int8 reconstruction (over the PQ CTEs' own `e`),
    * and the reranked `rr_ranked`.
    */
  private def duckRerankCtes: String = duckPqCtes(SeedK8, M) + s"""
      , sc AS (
        SELECT vec_id, v, list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
        FROM e),
      rq AS (
        SELECT vec_id,
               list_transform(v, x -> floor(x * 127.0 / scale) * scale / 127.0) AS rv
        FROM sc WHERE scale > 0),
      rn8 AS (
        SELECT vec_id, rv, sqrt(list_sum(list_transform(rv, x -> x * x))) AS rnrm
        FROM rq),
      cand AS (SELECT query_id, neighbor_id FROM pq_ranked WHERE rank <= $RerankC),
      rr AS (
        SELECT cand.query_id, cand.neighbor_id,
               CAST(floor(list_sum(list_transform(generate_series(1, len(q.v)),
                      i -> q.v[i] * c.rv[i])) * 10000.0 / (q.nrm * c.rnrm)) AS BIGINT) AS cos_bp
        FROM cand
        JOIN n q ON q.vec_id = cand.query_id
        JOIN rn8 c ON c.vec_id = cand.neighbor_id),
      rr_ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_bp DESC, neighbor_id) AS rank
        FROM rr)"""

  /** recall@3 at 16 codewords (4-bit, 128x). */
  val pqRecall: GraftQuery = pqRecallOf("ann_pq_recall", SeedK, annIvfPq)

  /** recall@3 at 256 codewords (8-bit, 64x). */
  val pq8Recall: GraftQuery = pqRecallOf("ann_pq8_recall", SeedK8, annIvfPq8)

  /** recall@3 at 16 x 4-dim subspaces (64x via subspace count). */
  val pqM16Recall: GraftQuery =
    pqRecallOf("ann_pq_m16_recall", SeedK, annIvfPqM16, M16)

  /** CLUSTERED-regime recall twin: the identical IVF-PQ chain run over
    * the mixed-radii planted-cluster fixture, so each compression point
    * states its recall in BOTH regimes — worst-case near-orthogonal
    * (the base `ann_pq*_recall` numbers) and realistic clustered
    * manifold (these). BASELINE.md's storage-for-recall table carries
    * both columns; config guidance reads the clustered column first.
    */
  private def pqRecallClustered(qName: String, seedK: Int,
      mCount: Int = M): GraftQuery = new GraftQuery {
    val name = qName

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val e = Similarity.mixedVecs(spark, sfDir)
      val (pairs, codes, lut) = pqChain(spark, sfDir, seedK, mCount, SrcClu)
      val got = adcRanked(pairs, codes, lut).filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"))
      Similarity.recallOf(Similarity.bruteTop3(e), got)
    }

    def oracle: Option[String] =
      Some(duckPqCtes(seedK, mCount, SrcClu.duckE) + """
      , brute AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   CAST(floor(list_sum(list_transform(generate_series(1, len(q.v)),
                        i -> q.v[i] * c.v[i])) * 10000.0 / (q.nrm * c.nrm)) AS BIGINT) DESC,
                   c.vec_id) AS rank
          FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
        WHERE rank <= 3),
      pq3 AS (SELECT query_id, neighbor_id FROM pq_ranked WHERE rank <= 3)
      SELECT b.query_id,
             count(*) AS truth_k,
             count(l.neighbor_id) AS hits,
             CAST(floor(count(l.neighbor_id) * 10000.0 / count(*)) AS BIGINT) AS recall_bp
      FROM brute b LEFT JOIN pq3 l
        ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
      GROUP BY 1 ORDER BY b.query_id
    """)
  }

  /** recall@3 at 4-bit/128x on the clustered fixture. */
  val pqRecallClu: GraftQuery =
    pqRecallClustered("ann_pq_recall_clustered", SeedK)

  /** recall@3 at 8-bit/64x on the clustered fixture. */
  val pq8RecallClu: GraftQuery =
    pqRecallClustered("ann_pq8_recall_clustered", SeedK8)

  /** recall@3 at 16 subspaces/64x on the clustered fixture. */
  val pqM16RecallClu: GraftQuery =
    pqRecallClustered("ann_pq_m16_recall_clustered", SeedK, M16)

  /** DuckDB mirror of the whole IVF-PQ chain up to
    * `pq_ranked(query_id, neighbor_id, adc_bp, rank)`.
    */
  private[operators] def duckPqCtes(seedK: Int, mCount: Int,
      eBody: String = SrcEmb.duckE, pre: String = ""): String = {
    val dsub = Dims / mCount
    def dot(a: String, b: String, len: String) =
      s"list_sum(list_transform(generate_series(1, $len), i -> $a[i] * $b[i]))"
    val d2 = s"floor((${dot("s", "s", "len(s)")} - 2.0 * ${dot("s", "cw", "len(s)")} + " +
      s"${dot("cw", "cw", "len(cw)")}) * 100000000.0)"
    s"""
      WITH ${if (pre.nonEmpty) pre + "," else ""}
      e AS ($eBody),
      n AS (
        SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 16),
      cassign AS (
        SELECT n.vec_id, cents.cid,
               CAST(floor(${dot("n.v", "cents.cv", "len(n.v)")} * 10000.0 /
                 (n.nrm * cents.cnrm)) AS BIGINT) AS ccos_bp
        FROM n CROSS JOIN cents),
      cranked AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY ccos_bp DESC, cid) AS crank
        FROM cassign),
      pairs AS (
        SELECT q.vec_id AS qid, c.vec_id
        FROM (SELECT vec_id, cid AS cell FROM cranked WHERE crank <= 2 AND vec_id < 10) q
        JOIN (SELECT vec_id, cid AS cell FROM cranked WHERE crank = 1) c USING (cell)
        WHERE q.vec_id <> c.vec_id),
      u AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS u FROM n),
      sub AS (
        SELECT vec_id, m, u[m*$dsub+1 : m*$dsub+$dsub] AS s
        FROM u CROSS JOIN (SELECT unnest(generate_series(0, ${mCount - 1})) AS m)),
      cb0 AS (SELECT m, vec_id AS k, s AS cw FROM sub WHERE vec_id < $seedK),
      asg0 AS (
        SELECT sub.vec_id, sub.m, sub.s, cb0.k, $d2 AS d2_sc
        FROM sub JOIN cb0 ON sub.m = cb0.m),
      best0 AS (
        SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, m
                         ORDER BY d2_sc, k) AS rn FROM asg0) WHERE rn = 1),
      sums AS (
        SELECT m, k, pos, sum(CAST(x AS DECIMAL(27,10))) AS sx, count(*) AS cnt
        FROM (SELECT m, k, unnest(s) AS x,
                     unnest(generate_series(1, len(s))) AS pos FROM best0)
        GROUP BY 1, 2, 3),
      cb AS (SELECT m, k, list(CAST(sx AS DOUBLE) / cnt ORDER BY pos) AS cw
             FROM sums GROUP BY m, k),
      asg1 AS (
        SELECT sub.vec_id, sub.m, sub.s, cb.k, $d2 AS d2_sc
        FROM sub JOIN cb ON sub.m = cb.m),
      codes AS (
        SELECT vec_id, m, k AS code FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, m
                      ORDER BY d2_sc, k) AS rn FROM asg1) WHERE rn = 1),
      lut AS (
        SELECT sub.vec_id AS qid, sub.m, cb.k,
               ${dot("sub.s", "cb.cw", "len(sub.s)")} AS part
        FROM sub JOIN cb ON sub.m = cb.m WHERE sub.vec_id < 10),
      pq_scored AS (
        SELECT p.qid AS query_id, p.vec_id AS neighbor_id,
               CAST(floor(sum(CAST(part AS DECIMAL(27,10))) * 10000) AS BIGINT) AS adc_bp
        FROM pairs p
        JOIN codes c ON p.vec_id = c.vec_id
        JOIN lut ON lut.qid = p.qid AND lut.m = c.m AND lut.k = c.code
        GROUP BY 1, 2),
      pq_ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY adc_bp DESC, neighbor_id) AS rank
        FROM pq_scored)"""
  }

  /** Int8 reconstruction of every vector: per-vector max-abs scale,
    * code_i = floor(x_i·127/scale), reconstructed value code_i·scale/127.
    * The expression shapes are mirrored verbatim in the oracle so both
    * engines produce bit-identical doubles. Zero vectors (scale = 0) are
    * excluded — they have no cosine direction to preserve.
    */
  private def int8Recon(e: DataFrame): DataFrame =
    e.withColumn("scale", array_max(transform(col("v"), x => abs(x))))
      .filter(col("scale") > 0)
      .withColumn("rv", transform(col("v"),
        x => floor(x * lit(127.0) / col("scale")) * col("scale") / lit(127.0)))
      .withColumn("rnrm", sqrt(expr("dot_double(rv, rv)")))
      .select("vec_id", "rv", "rnrm")

  private val duckInt8Ctes: String = """
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      n AS (
        SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      sc AS (
        SELECT vec_id, v, list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
        FROM e),
      rq AS (
        SELECT vec_id,
               list_transform(v, x -> floor(x * 127.0 / scale) * scale / 127.0) AS rv
        FROM sc WHERE scale > 0),
      rn AS (
        SELECT vec_id, rv, sqrt(list_sum(list_transform(rv, x -> x * x))) AS rnrm
        FROM rq)"""

  /** Int8 SCALAR quantization ANN — the other point on the
    * storage/recall curve: 8 bytes/dim → 1 byte/dim (8x; PQ above is
    * 128x), with near-full recall because each dimension keeps its own
    * 127-step resolution instead of sharing a 16-codeword subspace
    * vocabulary. Asymmetric search: queries stay full precision, the
    * corpus is scored on its reconstructed int8 vectors. Top-3 per query
    * over the whole corpus — the compressed-storage BRUTE path; at 10⁹+
    * vectors the same reconstruction rides the IVF probe instead (the
    * cell structure is orthogonal to how candidates are stored).
    */
  val annInt8: GraftQuery = new GraftQuery {
    val name = "ann_int8"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val e = Similarity.vecs(spark, sfDir)
      val q = e.filter(col("vec_id") < 10)
      val c = int8Recon(e)
      val scored = q.as("q")
        .join(c.as("c"), col("q.vec_id") =!= col("c.vec_id"))
        .withColumn("cos_bp",
          floor(expr("dot_double(q.v, c.rv)") * lit(10000.0) /
            (col("q.nrm") * col("c.rnrm"))).cast("long"))
      val w = Window.partitionBy(col("q.vec_id"))
        .orderBy(col("cos_bp").desc, col("c.vec_id"))
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
          col("rank").cast("long").as("rank"), col("cos_bp"))
        .orderBy("query_id", "rank")
    }

    def oracle: Option[String] = Some(duckInt8Ctes + """
      , scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(floor(list_sum(list_transform(generate_series(1, len(q.v)),
                      i -> q.v[i] * c.rv[i])) * 10000.0 / (q.nrm * c.rnrm)) AS BIGINT) AS cos_bp
        FROM n q JOIN rn c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_bp DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_bp
      FROM ranked WHERE rank <= 3 ORDER BY query_id, rank
    """)
  }

  /** recall@3 of the int8 path against full-precision brute force — same
    * first-class metric as `ann_recall`/`ann_pq_recall`, so all four
    * storage points (full, int8, IVF, IVF-PQ) are directly comparable.
    */
  val int8Recall: GraftQuery = new GraftQuery {
    val name = "ann_int8_recall"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val truth = Similarity.annTopK.run(spark, sfDir).filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"))
      val got = annInt8.run(spark, sfDir)
        .select(col("query_id").as("g_query"), col("neighbor_id").as("g_neighbor"))
      truth
        .join(got, col("query_id") === col("g_query") &&
          col("neighbor_id") === col("g_neighbor"), "left")
        .groupBy(col("query_id"))
        .agg(
          count(lit(1)).as("truth_k"),
          count(col("g_neighbor")).as("hits"))
        .withColumn("recall_bp", floor(col("hits") * lit(10000.0) / col("truth_k")).cast("long"))
        .orderBy("query_id")
    }

    def oracle: Option[String] = Some(duckInt8Ctes + """
      , brute AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   CAST(floor(list_sum(list_transform(generate_series(1, len(q.v)),
                        i -> q.v[i] * c.v[i])) * 10000.0 / (q.nrm * c.nrm)) AS BIGINT) DESC,
                   c.vec_id) AS rank
          FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
        WHERE rank <= 3),
      i8 AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   CAST(floor(list_sum(list_transform(generate_series(1, len(q.v)),
                        i -> q.v[i] * c.rv[i])) * 10000.0 / (q.nrm * c.rnrm)) AS BIGINT) DESC,
                   c.vec_id) AS rank
          FROM n q JOIN rn c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
        WHERE rank <= 3)
      SELECT b.query_id,
             count(*) AS truth_k,
             count(l.neighbor_id) AS hits,
             CAST(floor(count(l.neighbor_id) * 10000.0 / count(*)) AS BIGINT) AS recall_bp
      FROM brute b LEFT JOIN i8 l
        ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
      GROUP BY 1 ORDER BY b.query_id
    """)
  }

  val all: Seq[GraftQuery] = Seq(annIvfPq, annIvfPqFlat, pqRecall, annIvfPq8,
    pq8Recall, annIvfPqM16, pqM16Recall, annInt8, int8Recall,
    annIvfPqRerank, pqRerankRecall,
    pqRecallClu, pq8RecallClu, pqM16RecallClu)
}
