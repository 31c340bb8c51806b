package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph analytics over the page-visit stream: PageRank in EXACT
  * fixed-point arithmetic, unrolled power iteration.
  *
  * Domain: the reference's page stream keys every dashboard on visit
  * counts (`RT/app/dws/VisitorStatsApp.java`); ranking pages by the
  * stationary visit distribution is the canonical step past raw counts
  * (Page/Brin 1999 — public algorithm), and a training-data pipeline
  * uses the same computation for source/domain authority weighting.
  *
  * Exactness contract: rank mass is a BIGINT in 10^-12 units of 1; edge
  * probabilities are BIGINT ppm (`(n * 10^6) div out_n`); every division
  * in the update is an INTEGER division mirrored verbatim in the oracle
  * (the [[Relevance.trainPerceptron]] pattern), so the full trajectory is
  * hash-exact cross-engine — no float drift, no iteration-order
  * dependence (per-edge floors, then exact integer sums).
  *
  * Execution shape: edges and the node frame materialize ONCE (lineage
  * leaves); each iteration is one co-partitionable join
  * (ranks ⨝ edges on src) + one aggregation by dst — the rank vector
  * stays IN THE CLUSTER, node-partitioned, because unlike a trained
  * weight vector (68 longs → driver model) a web-scale rank vector is
  * O(nodes). The dangling-mass term and 1/N base ride as 1-row broadcast
  * scalars (the Lloyd-centers pattern). At 100 TB: edges partition by
  * src, ranks by node; AQE picks broadcast while ranks fit, shuffle
  * joins after — no plan change in this code.
  */
object Graph {

  private val Iterations = 5
  private val Mass = 1000000000000L // 10^12 — total rank mass, fixed-point
  private[graft] val Damp = 85 // damping factor, percent

  /** Page-transition edges (src, dst, n): [[Behavior.sessionPairs]] (the
    * shared sessionized-pair rule) with pages as nodes, counted.
    */
  private[graft] def pageEdges(ev: DataFrame): DataFrame =
    Behavior.sessionPairs(ev, "page")
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))

  /** [[pageEdges]] off the session-shared [[pagePairs]] frame — the form
    * every rank QUERY uses, so the window pass runs once per session.
    */
  private[graft] def pageEdges(spark: SparkSession, sfDir: String): DataFrame =
    pagePairs(spark, sfDir)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))

  /** The sessionized page-transition pairs (src, dst), SHARED across the
    * whole PageRank family (the `enriched` DWD-frame discipline): all six
    * rank queries derive from this one window pass, so a harness session
    * pays the events scan + window once instead of once per query per
    * run. The first consumer pays the build inside its own timed region
    * (the hybrid-ingest memo precedent); Bench releases the family after
    * its last consumer in sorted order.
    */
  private[graft] def pagePairs(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.shared(s"pagepairs:$sfDir") {
      Behavior.sessionPairs(pageEvents(spark, sfDir), "page")
        .select("src", "dst")
    }

  /** `iters` exact power iterations over (node) nodes and (src, dst, n)
    * edges; returns (node, out_n, is_seed, r) with r the final
    * fixed-point rank. `seeds` personalizes the teleport (topic-
    * sensitive PageRank, Haveliwala 2002 — public algorithm): the
    * (100−d)% restart mass AND the dangling mass redistribute over the
    * SEED set instead of all nodes. `None` = every node is a seed, which
    * reduces the update to classic uniform PageRank term for term.
    *
    * Update (all integer ops, everything nonnegative; s(v) ∈ {0,1},
    * S = Σ s, d = Damp):
    * {{{
    *   p_ppm(u,v) = (n(u,v) * 10^6) div out(u)
    *   contrib(v) = Σ_u (r(u) * p_ppm(u,v)) div 10^6
    *   dang       = Σ_{out(u)=0} r(u)
    *   r'(v)      = s(v) · ((100−d)·M) div (100·S)
    *              + (d · (contrib(v) + s(v) · (dang div S))) div 100
    * }}}
    * Floors leak a little mass per iteration — deterministic and
    * identical on both engines, which is the point.
    */
  private[graft] def pagerank(nodes: DataFrame, edges: DataFrame,
      iters: Int, seeds: Option[DataFrame] = None): DataFrame =
    pagerankWithFrames(nodes, edges, iters, seeds)._1

  /** [[pagerank]] that also exposes its materialized transition frame
    * (src, dst, p_ppm) and node frame (node, out_n, is_seed) — consumers
    * that run a SECOND trajectory over the same graph
    * ([[pageRankPushDivergence]]) reuse these leaves instead of
    * re-materializing identical content.
    */
  private[graft] def pagerankWithFrames(nodes: DataFrame, edges: DataFrame,
      iters: Int, seeds: Option[DataFrame] = None)
      : (DataFrame, DataFrame, DataFrame) = {
    // edges feed two derivations (p and the out-degree side of nodeF) —
    // cache so the sessionized-window pass runs once; p and nodeF become
    // lineage LEAVES (each iteration's plan references them 2^k times
    // through the rank chain — tiny leaves keep Catalyst analysis flat)
    val ed = graft.CacheRegistry.persist(edges)
    val outDeg = ed.groupBy(col("src")).agg(sum(col("n")).as("out_n"))
    val p = graft.CacheRegistry.materialize(
      ed.join(outDeg, "src")
        .withColumn("p_ppm", expr("(n * 1000000) div out_n"))
        .select("src", "dst", "p_ppm"))
    val seedFlag = seeds match {
      case None => (df: DataFrame) => df.withColumn("is_seed", lit(1L))
      case Some(s) => (df: DataFrame) =>
        // distinct: a duplicated seed row would fan nodeF out and corrupt
        // both counts and the per-node output
        df.join(s.select(col("node")).distinct().withColumn("is_seed", lit(1L)),
            Seq("node"), "left")
          .withColumn("is_seed", coalesce(col("is_seed"), lit(0L)))
    }
    val nodeF = graft.CacheRegistry.materialize(seedFlag(
      nodes.join(outDeg.withColumnRenamed("src", "node"), Seq("node"), "left")
        .select(col("node"), coalesce(col("out_n"), lit(0L)).as("out_n"))))
    // an empty effective seed set (empty frame, or disjoint from the
    // nodes) has no stationary distribution: ns=0 would NULL every rank
    // through `div 0` — fail loudly instead (one tiny agg on the
    // already-materialized node frame)
    if (seeds.isDefined)
      require(nodeF.agg(coalesce(sum(col("is_seed")), lit(0L)))
          .first().getLong(0) > 0,
        "pagerank seeds must intersect the node set (empty teleport set)")
    val nRow = broadcast(nodeF.agg(count(lit(1)).as("nn"),
      sum(col("is_seed")).as("ns")))
    val r0 =
      nodeF.crossJoin(nRow).select(col("node"), expr(s"$Mass div nn").as("r"))
    // iterations chain LAZY persists: the single downstream action
    // evaluates each level exactly once (first use populates the cache,
    // the level's second reference — the dangling-mass aggregate — reads
    // it back), so the whole trajectory is ONE job instead of one
    // materialize round-trip per iteration
    val rFinal = (1 to iters).foldLeft(r0) { case (ranks, _) =>
      val rc = graft.CacheRegistry.persist(ranks)
      val contrib = p.join(rc, p("src") === rc("node"))
        .withColumn("part", expr("(r * p_ppm) div 1000000"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("part")).as("c"))
      val dang = broadcast(
        rc.join(nodeF.filter(col("out_n") === 0), "node")
          .agg(coalesce(sum(col("r")), lit(0L)).as("dang")))
      nodeF.join(contrib, Seq("node"), "left")
        .crossJoin(nRow).crossJoin(dang)
        .select(col("node"), col("is_seed"),
          expr(s"is_seed * ((${100 - Damp} * $Mass) div (100 * ns))" +
            s" + ($Damp * (coalesce(c, 0) + is_seed * (dang div ns))) div 100")
            .as("r"))
        .drop("is_seed")
    }
    (nodeF.join(rFinal, "node"), p, nodeF)
  }

  /** The parsed (user_id, event_id, tsn, page) projection, cached: it
    * feeds both the edge window and the node set — one events scan + one
    * JSON parse, shared ACROSS the rank family's queries (one extraction
    * rule, not copies that can drift; session-shared like [[pagePairs]]).
    */
  private[graft] def pageEvents(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.shared(s"pageevents:$sfDir")(
      Tables.load(spark, sfDir, "events")
      .withColumn("page",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType))))("k"))
      .filter(col("page").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts_ns").as("tsn"),
        col("page")))

  /** Shared oracle: graph CTEs + the unrolled seeded-form iteration,
    * parameterized by the is_seed SQL expression — uniform PageRank is
    * `seedExpr = "1"` (then ns = nn and the update reduces term for term
    * to the classic form). Ends after r$Iterations; the caller appends
    * its final SELECT.
    */
  private def duckRankCtes(seedExpr: String,
      nodesFromEdges: Boolean = false, edgeWhere: String = ""): String = {
    val nodesCte =
      if (nodesFromEdges)
        "nodes AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed)"
      else "nodes AS (SELECT DISTINCT page AS node FROM ev)"
    val iter = (1 to Iterations).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""
      d$i AS (SELECT CAST(COALESCE(sum(r), 0) AS BIGINT) AS dang
              FROM $prev JOIN nf USING (node) WHERE nf.out_n = 0),
      c$i AS (SELECT dst AS node,
                     CAST(sum((r * p_ppm) // 1000000) AS BIGINT) AS c
              FROM p JOIN $prev ON p.src = $prev.node GROUP BY 1),
      r$i AS MATERIALIZED (SELECT nf.node, CAST(
              nf.is_seed * ((${100 - Damp} * $Mass) // (100 * (SELECT ns FROM nc)))
            + ($Damp * (COALESCE(c.c, 0)
                        + nf.is_seed * ((SELECT dang FROM d$i)
                                        // (SELECT ns FROM nc)))) // 100
            AS BIGINT) AS r
            FROM nf LEFT JOIN c$i c USING (node))"""
    }.mkString(",")
    s"""
      WITH ev AS (
        SELECT user_id, event_id, epoch_ns(ts) AS tsn,
               TRY_CAST(json_extract(props, '$$.k') AS BIGINT) AS page
        FROM events
        WHERE TRY_CAST(json_extract(props, '$$.k') AS BIGINT) IS NOT NULL),
      pairs AS (SELECT page AS src, lead(page) OVER w AS dst,
                       lead(tsn) OVER w - tsn AS gap_ns
                FROM ev
                WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
      ed AS (SELECT src, dst, count(*) AS n FROM pairs
             WHERE dst IS NOT NULL AND gap_ns <= ${Behavior.GapNs} $edgeWhere
             GROUP BY 1, 2),
      outdeg AS (SELECT src, CAST(sum(n) AS BIGINT) AS out_n FROM ed GROUP BY 1),
      $nodesCte,
      nf AS MATERIALIZED (
        SELECT node, COALESCE(out_n, 0) AS out_n, $seedExpr AS is_seed
        FROM nodes LEFT JOIN outdeg ON nodes.node = outdeg.src),
      p AS MATERIALIZED (
        SELECT src, dst, (n * 1000000) // out_n AS p_ppm
        FROM ed JOIN outdeg USING (src)),
      nc AS (SELECT count(*) AS nn, CAST(sum(is_seed) AS BIGINT) AS ns FROM nf),
      r0 AS (SELECT node, $Mass // (SELECT nn FROM nc) AS r FROM nf),$iter"""
  }

  /** PageRank over the page graph (page = the `props.k` payload —
    * the [[Behavior.propsStats]] extraction), 5 exact iterations.
    */
  val pageRank: GraftQuery = new GraftQuery {
    val name = "pagerank_pages"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ev = pageEvents(spark, sfDir)
      val edges = pageEdges(spark, sfDir)
      val nodes = ev.select(col("page").as("node")).distinct()
      pagerank(nodes, edges, Iterations)
        .select(col("node").as("page"), col("out_n"), col("r").as("rank_fp"))
        .orderBy("page")
    }

    def oracle: Option[String] = Some(duckRankCtes("1") + s"""
      SELECT nf.node AS page, nf.out_n, r$Iterations.r AS rank_fp
      FROM nf JOIN r$Iterations USING (node) ORDER BY page
      """)
  }

  /** PERSONALIZED PageRank: restart + dangling mass teleport to the seed
    * pages (k < 10) only — authority RELATIVE to a topic set, the form a
    * source-weighting pipeline actually runs (seed = trusted domains).
    * Same fixed-point machinery; the oracle is the SAME CTE builder with
    * the seed expression swapped in.
    */
  val pageRankSeeded: GraftQuery = new GraftQuery {
    val name = "pagerank_seeded"
    private val SeedBelow = 10L

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ev = pageEvents(spark, sfDir)
      val edges = pageEdges(spark, sfDir)
      val nodes = ev.select(col("page").as("node")).distinct()
      val seeds = nodes.filter(col("node") < SeedBelow)
      pagerank(nodes, edges, Iterations, Some(seeds))
        .select(col("node").as("page"), col("is_seed"),
          col("r").as("rank_fp"))
        .orderBy("page")
    }

    def oracle: Option[String] = Some(
      duckRankCtes(s"CASE WHEN node < $SeedBelow THEN 1 ELSE 0 END") + s"""
      SELECT nf.node AS page, CAST(nf.is_seed AS BIGINT) AS is_seed,
             r$Iterations.r AS rank_fp
      FROM nf JOIN r$Iterations USING (node) ORDER BY page
      """)
  }

  /** The streaming twin ([[graft.streaming.RankStream]]) under the
    * CORRECTNESS gate: page-transition pairs arrive as two micro-batches
    * (split by src+dst parity — deterministic, overlapping edge keys
    * across batches so the additive count fold is exercised), the edge
    * table maintains incrementally, and the published rank vector after
    * the last batch must hash-match the DuckDB power iteration over ALL
    * edges. Node set is src ∪ dst of the edge table (the streamed form
    * never sees isolated pages — mirrored in the oracle CTE), which is
    * the one semantic delta vs [[pageRank]].
    */
  val pageRankStream: GraftQuery = new GraftQuery {
    val name = "pagerank_stream_maintained"

    private def root(sfDir: String): String =
      SnapshotDiff.scratchRoot("rankstream", sfDir)

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // the window pass runs ONCE per session (pagePairs is the rank
      // family's shared frame): each micro-batch is a filter of it
      val pairs = pagePairs(spark, sfDir)
      val (edgeRoot, rankRoot) = (root(sfDir) + "_edges", root(sfDir) + "_ranks")
      SnapshotDiff.rmTree(edgeRoot); SnapshotDiff.rmTree(rankRoot)
      graft.streaming.RankStream.applyBatch(
        pairs.filter(pmod(col("src") + col("dst"), lit(2)) === 0),
        1L, edgeRoot, rankRoot, Iterations)
      graft.streaming.RankStream.applyBatch(
        pairs.filter(pmod(col("src") + col("dst"), lit(2)) === 1),
        2L, edgeRoot, rankRoot, Iterations)
      graft.streaming.RankStream.liveRanks(spark, rankRoot).get
        .select(col("node").as("page"), col("out_n"), col("r").as("rank_fp"))
        .orderBy("page")
    }

    def oracle: Option[String] = Some(
      duckRankCtes("1", nodesFromEdges = true) + s"""
      SELECT nf.node AS page, nf.out_n, r$Iterations.r AS rank_fp
      FROM nf JOIN r$Iterations USING (node) ORDER BY page
      """)
  }

  /** The PERIODIC-publication streaming contract under the gate
    * ([[graft.streaming.RankStream]] with `rankEveryK = 3`): four edge
    * micro-batches (deterministic src+dst mod-4 split) fold into the
    * edge table every batch — per-batch cost ∝ batch — but the rank
    * vector republishes only at batch 3, so the published ranks reflect
    * the batch-1..3 edge PREFIX and carry an explicit staleness of 1
    * batch. This is the honest 100 TB streaming-rank story: the exact
    * rebuild (whose cost is ∝ corpus by contract) amortizes to
    * corpus/K per batch, while staleness stays bounded, recorded in the
    * version ids, and pinned here by the oracle (which recomputes the
    * SAME prefix ranks and the constant staleness).
    */
  val pageRankStreamPeriodic: GraftQuery = new GraftQuery {
    val name = "pagerank_stream_periodic"

    private def root(sfDir: String): String =
      SnapshotDiff.scratchRoot("rankperiodic", sfDir)

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val pairs = pagePairs(spark, sfDir)
      val (edgeRoot, rankRoot) = (root(sfDir) + "_edges", root(sfDir) + "_ranks")
      SnapshotDiff.rmTree(edgeRoot); SnapshotDiff.rmTree(rankRoot)
      (1 to 4).foreach { b =>
        graft.streaming.RankStream.applyBatch(
          pairs.filter(pmod(col("src") + col("dst"), lit(4)) === (b - 1)),
          b.toLong, edgeRoot, rankRoot, Iterations, rankEveryK = 3)
      }
      val stale = graft.streaming.RankStream
        .rankStaleness(edgeRoot, rankRoot).get
      graft.streaming.RankStream.liveRanks(spark, rankRoot).get
        .select(col("node").as("page"), col("out_n"), col("r").as("rank_fp"))
        .withColumn("stale_batches", lit(stale))
        .orderBy("page")
    }

    // ranks over the batch-1..3 edge prefix (mod-4 split mirrored), plus
    // the staleness the version ids record (edge head v4 − rank head v3)
    def oracle: Option[String] = Some(
      duckRankCtes("1", nodesFromEdges = true,
        edgeWhere = "AND (src + dst) % 4 <> 3") + s"""
      SELECT nf.node AS page, nf.out_n, r$Iterations.r AS rank_fp,
             CAST(1 AS BIGINT) AS stale_batches
      FROM nf JOIN r$Iterations USING (node) ORDER BY page
      """)
  }

  /** RESIDUAL-PUSH PageRank (Berkhin 2006's bookmark-coloring /
    * Gauss-Southwell family, public) against the exact power iteration,
    * as ONE divergence-report query — the foundation for incremental
    * rank repair: push maintains a VALUE vector p and a RESIDUAL vector
    * r (p grows by the teleport share of r each round, r re-propagates
    * through the damped transition operator), and the residual is the
    * LIVE error certificate: because the engine's exact iteration starts
    * from the uniform vector — which IS the teleport vector — the
    * algebraic identity `exact_R = p_R + r_R` holds term for term, up to
    * integer-floor noise of a few 10⁻¹² units per node.
    *
    * The report states, in exact integers both engines reproduce:
    * the L1 and max-node divergence |exact − (p + r)|, the residual
    * mass (measured ≈ d^R·M — the geometric tail), and two asserted
    * bounds: `bound_ok` (L1 ≤ R·(E + 3n) floor-noise slack — noise
    * propagates per EDGE once the trajectories' residuals diverge) and
    * `tail_bound_ok` (residual mass ≤ (d^R·M) div 100^R). A violated
    * bound fails BOTH as a driver-side require and as a hash mismatch.
    *
    * Why it matters at 100 TB: push generalizes to THRESHOLDED and
    * DELTA-SEEDED forms (only nodes with |r| > ε push; a batch of new
    * edges seeds r only at touched sources), making per-batch repair
    * cost ∝ batch neighborhood instead of ∝ corpus — with r's mass as
    * the queryable staleness certificate, strictly stronger than the
    * periodic contract's batch-count staleness.
    */
  val pageRankPushDivergence: GraftQuery = new GraftQuery {
    val name = "pagerank_push_divergence"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ev = pageEvents(spark, sfDir)
      val edges = pageEdges(spark, sfDir)
      val nodes = ev.select(col("page").as("node")).distinct()
      // the push trajectory runs over the SAME materialized graph frames
      // the exact iteration just built (pagerankWithFrames exposes its
      // p/nodeF leaves) — previously this query re-materialized
      // identical pM/nodeF content as two extra jobs
      val (exactFull, pM, nodeFS) =
        pagerankWithFrames(nodes, edges, Iterations)
      val exact = exactFull.select(col("node"), col("r"))
      val nodeF = nodeFS.select(col("node"), col("out_n"))
      val nRow = broadcast(nodeF.agg(count(lit(1)).as("nn")))
      val state0 = nodeF.crossJoin(nRow)
        .select(col("node"), lit(0L).as("pv"), expr(s"$Mass div nn").as("rv"))
      val stateR = (1 to Iterations).foldLeft(state0) { case (st, _) =>
        val sc = graft.CacheRegistry.persist(st)
        val contrib = pM.join(sc, pM("src") === sc("node"))
          .withColumn("part", expr("(rv * p_ppm) div 1000000"))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("part")).as("c"))
        val dang = broadcast(
          sc.join(nodeF.filter(col("out_n") === 0), "node")
            .agg(coalesce(sum(col("rv")), lit(0L)).as("dang")))
        sc.select(col("node"),
            (col("pv") + expr(s"((${100 - Damp}) * rv) div 100")).as("pv"))
          .join(contrib, Seq("node"), "left")
          .crossJoin(nRow).crossJoin(dang)
          .select(col("node"), col("pv"),
            expr(s"($Damp * (coalesce(c, 0) + (dang div nn))) div 100")
              .as("rv"))
      }
      val joined = exact.join(stateR, "node")
        .select(col("node"), col("r"), col("pv"), col("rv"))
      val tailBound = {
        // (Damp^R · Mass) div 100^R as exact integers
        val num = BigInt(Damp).pow(Iterations) * BigInt(Mass)
        (num / BigInt(100).pow(Iterations)).toLong
      }
      // floor-noise slack: each round every node floors its own
      // p-accumulate and damping terms (≤ 3 units) and every EDGE can
      // contribute one more floor-unit difference when the two
      // trajectories' r values diverge — so the sound per-suite bound
      // is (edges + 3·nodes)·rounds, not 3·nodes·rounds (measured:
      // 131/1770 at 54 edges, 1558/19800 at 3660 edges)
      val edgeKeys = pM.count()
      val out = joined.agg(
          count(lit(1)).as("nodes"),
          sum(abs(col("r") - (col("pv") + col("rv")))).as("l1_div_fp"),
          max(abs(col("r") - (col("pv") + col("rv")))).as("max_node_div_fp"),
          sum(col("rv")).as("residual_mass_fp"))
        .select(col("nodes"), lit(edgeKeys).as("edge_keys"),
          col("l1_div_fp"), col("max_node_div_fp"),
          col("residual_mass_fp"),
          (lit(Iterations.toLong) * (lit(edgeKeys) + lit(3L) * col("nodes")))
            .as("slack_fp"),
          (col("l1_div_fp") <=
            lit(Iterations.toLong) * (lit(edgeKeys) + lit(3L) * col("nodes")))
            .as("bound_ok"),
          (col("residual_mass_fp") <= lit(tailBound)).as("tail_bound_ok"))
      // loud in-engine: a violated certificate is a bug, not a report
      // row. Materialize the 1-row report FIRST so the driver check and
      // the harness's downstream count/hash share one execution — a bare
      // collect-then-return would re-run the 5-round push chain whenever
      // the per-round persists were evicted under suite memory pressure
      val outM = graft.CacheRegistry.materialize(out)
      val row = outM.collect().head
      require(row.getBoolean(6) && row.getBoolean(7),
        s"pagerank_push_divergence: certificate violated — $row")
      outM
    }

    def oracle: Option[String] = {
      val pushCtes = (1 to Iterations).map { i =>
        val prev = if (i == 1) "rr0" else s"rr${i - 1}"
        val pprev = if (i == 1) "pp0" else s"pp${i - 1}"
        s"""
      pd$i AS (SELECT CAST(COALESCE(sum(rv), 0) AS BIGINT) AS dang
               FROM $prev JOIN nf USING (node) WHERE nf.out_n = 0),
      pc$i AS (SELECT dst AS node,
                      CAST(sum((rv * p_ppm) // 1000000) AS BIGINT) AS c
               FROM p JOIN $prev ON p.src = $prev.node GROUP BY 1),
      pp$i AS MATERIALIZED (
        SELECT pp.node, CAST(pp.pv + ((${100 - Damp} * rr.rv) // 100) AS BIGINT) AS pv
        FROM $pprev pp JOIN $prev rr USING (node)),
      rr$i AS MATERIALIZED (
        SELECT nf.node, CAST(
            ($Damp * (COALESCE(c.c, 0)
                      + ((SELECT dang FROM pd$i) // (SELECT nn FROM nc)))) // 100
          AS BIGINT) AS rv
        FROM nf LEFT JOIN pc$i c USING (node))"""
      }.mkString(",")
      val tailBound =
        (BigInt(Damp).pow(Iterations) * BigInt(Mass) /
          BigInt(100).pow(Iterations)).toLong
      Some(duckRankCtes("1") + s""",
      pp0 AS (SELECT node, CAST(0 AS BIGINT) AS pv FROM nf),
      rr0 AS (SELECT node, r AS rv FROM r0),$pushCtes
      SELECT (SELECT nn FROM nc) AS nodes,
             (SELECT count(*) FROM p) AS edge_keys,
             CAST(sum(abs(r$Iterations.r - (pp$Iterations.pv + rr$Iterations.rv))) AS BIGINT) AS l1_div_fp,
             CAST(max(abs(r$Iterations.r - (pp$Iterations.pv + rr$Iterations.rv))) AS BIGINT) AS max_node_div_fp,
             CAST(sum(rr$Iterations.rv) AS BIGINT) AS residual_mass_fp,
             CAST($Iterations * ((SELECT count(*) FROM p)
                                 + 3 * (SELECT nn FROM nc)) AS BIGINT) AS slack_fp,
             sum(abs(r$Iterations.r - (pp$Iterations.pv + rr$Iterations.rv)))
               <= $Iterations * ((SELECT count(*) FROM p)
                                 + 3 * (SELECT nn FROM nc)) AS bound_ok,
             sum(rr$Iterations.rv) <= $tailBound AS tail_bound_ok
      FROM r$Iterations JOIN pp$Iterations USING (node)
      JOIN rr$Iterations USING (node)
      """)
    }
  }

  /** The INCREMENTAL residual-push streaming twin under the gate
    * ([[graft.streaming.PushStream]]): three insertion batches
    * (deterministic src+dst mod-3 split) fold into the edge table and
    * REPAIR the maintained (p, r) state with delta-seeded threshold
    * pushes; a fourth batch RETRACTS every edge with (src+dst) % 5 = 0
    * in full — the signed dynamic case (edge deletions seed negative
    * residuals; Zhang/Ohsaka-style dynamic PageRank, public). The serve
    * is the state head with TRUE residuals plus the live certificate
    * columns: ‖r‖₁ and the implied L1 distance bound to the exact
    * fixpoint, ‖p* − p‖₁ ≤ ‖r‖₁·100/(100−d).
    *
    * The oracle never sees the delta algebra: because the maintained
    * residual preserves the Bellman invariant r = b + T(p) − p
    * BIT-FOR-BIT through seeding and every push round (the
    * [[PushRank]] law, spec-proven), DuckDB recomputes each round's
    * residual FROM SCRATCH over the stage's full edge set and must land
    * on the identical integers — the strongest cross-engine check the
    * wrapper's incrementality can get. Nodes are never retired (a
    * fully-disconnected node keeps its state row and decays toward the
    * teleport share), so the node set is the endpoints of every edge
    * key EVER folded, mirrored in the oracle's per-stage node CTEs.
    */
  val pageRankPushMaintained: GraftQuery = new GraftQuery {
    val name = "pagerank_push_maintained"
    private val Eps = 1000000L
    private val Rounds = 3

    private def root(sfDir: String): String =
      SnapshotDiff.scratchRoot("pushstream", sfDir)

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val pairs = pagePairs(spark, sfDir)
      val rt = graft.streaming.PushStream.roots(root(sfDir))
      Seq(rt.edges, rt.state, rt.scalars).foreach(SnapshotDiff.rmTree)
      (1 to 3).foreach { b =>
        graft.streaming.PushStream.applyBatch(
          pairs.filter(pmod(col("src") + col("dst"), lit(3)) === (b - 1))
            .withColumn("n_d", lit(1L)),
          b.toLong, rt, Eps, Rounds)
      }
      // the deletion batch: full retraction of the mod-5 edge class,
      // derived from the committed edge head (pinned at read time)
      val retract = graft.sources.SnapshotTable.read(spark, rt.edges).get
        .filter(pmod(col("src") + col("dst"), lit(5)) === 0 && col("n") > 0)
        .select(col("src"), col("dst"), (-col("n")).as("n_d"))
      graft.streaming.PushStream.applyBatch(retract, 4L, rt, Eps, Rounds)
      val served = graft.CacheRegistry.materialize(
        graft.streaming.PushStream.liveState(spark, rt).get)
      val mass = broadcast(served.agg(
        coalesce(sum(abs(col("r"))), lit(0L)).as("residual_mass_fp")))
      served.crossJoin(mass)
        .select(col("node").as("page"), col("out_n"),
          col("p").as("p_fp"), col("r").as("r_fp"),
          col("residual_mass_fp"),
          expr(s"(residual_mass_fp * 100) div ${100 - Damp}")
            .as("l1_bound_fp"))
        .orderBy("page")
    }

    // stage s edge sets are CUMULATIVE (mod-3 prefixes, then the mod-5
    // deletion); each stage = 1 seed + Rounds bellman/advance blocks,
    // every residual a FROM-SCRATCH recompute (see the class scaladoc)
    def oracle: Option[String] = {
      val edgePred = Map(1 -> "(src + dst) % 3 = 0",
        2 -> "(src + dst) % 3 <= 1", 3 -> "TRUE",
        4 -> "(src + dst) % 5 <> 0")
      val nodePred = Map(1 -> "(src + dst) % 3 = 0",
        2 -> "(src + dst) % 3 <= 1", 3 -> "TRUE", 4 -> "TRUE")
      def bellman(s: Int, k: Int): String = {
        val tag = s"${s}_$k"
        s"""
      dg_$tag AS (SELECT CAST(COALESCE(sum(p.p), 0) AS BIGINT) AS dang
                  FROM p_$tag p JOIN nf$s USING (node)
                  WHERE nf$s.out_n = 0),
      c_$tag AS (SELECT t.dst AS node,
                   CAST(sum(($Damp * ((p.p * t.p_ppm) // 1000000)) // 100)
                     AS BIGINT) AS c
                 FROM t$s t JOIN p_$tag p ON t.src = p.node GROUP BY 1),
      r_$tag AS MATERIALIZED (
        SELECT nf.node, CAST((SELECT b FROM b$s) + COALESCE(c.c, 0)
            + ($Damp * ((SELECT dang FROM dg_$tag)
                        // (SELECT nn FROM nn$s))) // 100
            - p.p AS BIGINT) AS r
        FROM nf$s nf LEFT JOIN c_$tag c USING (node)
        JOIN p_$tag p USING (node))"""
      }
      def advance(s: Int, k: Int): String = s"""
      p_${s}_${k + 1} AS MATERIALIZED (
        SELECT p.node, CAST(p.p + CASE WHEN abs(r.r) > $Eps
                                       THEN r.r ELSE 0 END AS BIGINT) AS p
        FROM p_${s}_$k p JOIN r_${s}_$k r USING (node))"""
      def stage(s: Int): String = {
        val carry =
          if (s == 1) s"""
      p_1_0 AS (SELECT node, CAST(0 AS BIGINT) AS p FROM nodes1)"""
          else s"""
      p_${s}_0 AS (SELECT n.node, CAST(COALESCE(pp.p, 0) AS BIGINT) AS p
                   FROM nodes$s n LEFT JOIN p_${s - 1}_$Rounds pp
                   USING (node))"""
        s"""
      ed$s AS (SELECT src, dst, count(*) AS n FROM fp
               WHERE ${edgePred(s)} GROUP BY 1, 2),
      out$s AS (SELECT src, CAST(sum(n) AS BIGINT) AS o
                FROM ed$s GROUP BY 1),
      t$s AS MATERIALIZED (
        SELECT src, dst, (n * 1000000) // o AS p_ppm
        FROM ed$s JOIN out$s USING (src)),
      nodes$s AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM fp WHERE ${nodePred(s)}
        UNION ALL SELECT dst FROM fp WHERE ${nodePred(s)})),
      nf$s AS MATERIALIZED (
        SELECT node, COALESCE(o, 0) AS out_n
        FROM nodes$s LEFT JOIN out$s ON nodes$s.node = out$s.src),
      nn$s AS (SELECT count(*) AS nn FROM nodes$s),
      b$s AS (SELECT CAST(((${100 - Damp}) * $Mass) // (100 * nn)
                AS BIGINT) AS b FROM nn$s),$carry,""" +
          (0 until Rounds).map(k => bellman(s, k) + "," + advance(s, k))
            .mkString(",")
      }
      Some(s"""
      WITH ev AS (
        SELECT user_id, event_id, epoch_ns(ts) AS tsn,
               TRY_CAST(json_extract(props, '$$.k') AS BIGINT) AS page
        FROM events
        WHERE TRY_CAST(json_extract(props, '$$.k') AS BIGINT) IS NOT NULL),
      prs AS (SELECT page AS src, lead(page) OVER w AS dst,
                     lead(tsn) OVER w - tsn AS gap_ns
              FROM ev
              WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
      fp AS (SELECT src, dst FROM prs
             WHERE dst IS NOT NULL AND gap_ns <= ${Behavior.GapNs}),""" +
        (1 to 4).map(stage).mkString(",") + "," +
        bellman(4, Rounds) + s"""
      SELECT nf4.node AS page, nf4.out_n, p.p AS p_fp, r.r AS r_fp,
             (SELECT CAST(sum(abs(r)) AS BIGINT) FROM r_4_$Rounds)
               AS residual_mass_fp,
             (SELECT CAST((sum(abs(r)) * 100) // ${100 - Damp} AS BIGINT)
              FROM r_4_$Rounds) AS l1_bound_fp
      FROM nf4 JOIN p_4_$Rounds p USING (node)
      JOIN r_4_$Rounds r USING (node)
      ORDER BY page
      """)
    }
  }

  val all: Seq[GraftQuery] = Seq(pageRank, pageRankSeeded, pageRankStream,
    pageRankStreamPeriodic, pageRankPushDivergence, pageRankPushMaintained)
}
