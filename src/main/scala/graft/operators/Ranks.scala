package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact ranking helpers.
  *
  * `ntile(k) OVER (ORDER BY ...)` with no PARTITION BY funnels the whole
  * input through ONE task (Catalyst plans a SinglePartition exchange) —
  * correct, but a serial bottleneck once the ranked set is itself large
  * (a per-customer rollup at 100 TB is billions of rows). The two-pass
  * form here keeps the exact SQL-standard ntile semantics (first n%k
  * buckets get one extra row) with no all-rows-on-one-task stage:
  *
  *   1. range-repartition by the sort key and PERSIST the result (via
  *      [[graft.CacheRegistry]], so harnesses release it per-query).
  *      The persist is load-bearing for correctness, not a perf knob:
  *      range boundaries come from runtime SAMPLING, and the offsets
  *      branch below is column-pruned differently from the data branch,
  *      so Catalyst plans TWO non-canonically-equal range exchanges that
  *      ReuseExchange cannot dedupe — each would sample its own
  *      boundaries and the per-range offsets would misalign (observed:
  *      11 "deciles" from ntile(10)). Caching pins one materialized
  *      partition assignment that both consumers read;
  *   2. a P-row side frame (P = shuffle partitions) of per-range counts
  *      → exclusive prefix offsets; the only single-partition window
  *      runs over those P rows, never the data;
  *   3. broadcast the offsets back; per-range row_number + offset =
  *      exact global rank; then the closed-form ntile bucket from
  *      (rank, N, k).
  *
  * One range exchange + one cache materialization + one hash exchange on
  * the range id replace the serial single-partition sort — every
  * data-bearing stage stays parallel at any scale. At 100 TB the cache
  * is a deliberate MEMORY_AND_DISK staging of the ranked set (the same
  * materialize-at-the-boundary lever the composed pipeline uses), priced
  * far below the single-task sort it removes.
  */
object Ranks {

  /** Adds `out` = exact ntile(k) under the total order `sort` (callers
    * must include a unique tiebreaker so the order is total). Matches
    * `ntile(k).over(Window.orderBy(sort: _*))` row-for-row.
    */
  def distNtile(df: DataFrame, k: Int, out: String, sort: Column*): DataFrame = {
    require(k > 0, "ntile bucket count must be positive")
    // no explicit partition count: an explicit N exempts the exchange
    // from AQE, pinning e.g. 2048 near-empty ranges over a rollup in the
    // production-partition rehearsal (measured 16.9 s for
    // customer_deciles at sf0.1/2048). Without it AQE coalesces ADJACENT
    // range partitions to data-proportional sizes — adjacency keeps
    // pid order ≡ range order, which is all the prefix-offset pass needs,
    // and the persist still pins ONE materialized assignment for both
    // consumers.
    val ranged = graft.CacheRegistry.persist(
      df.repartitionByRange(sort: _*)
        .withColumn("__nt_pid", spark_partition_id()))
    val offs = ranged.groupBy(col("__nt_pid"))
      .agg(count(lit(1)).as("__nt_cnt"))
      .withColumn("__nt_off", coalesce(
        sum(col("__nt_cnt")).over(Window.orderBy(col("__nt_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__nt_n",
        sum(col("__nt_cnt")).over(Window.orderBy(col("__nt_pid"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__nt_pid"), col("__nt_off"), col("__nt_n"))
    ranged
      .join(broadcast(offs), "__nt_pid")
      .withColumn("__nt_rn",
        row_number().over(
          Window.partitionBy(col("__nt_pid")).orderBy(sort: _*))
          .cast("long") + col("__nt_off"))
      .withColumn(out, ntileBucket(k))
      .drop("__nt_pid", "__nt_off", "__nt_n", "__nt_rn")
  }

  /** Multi-score composition: one exact ntile column per spec, ALL
    * computed in a single range exchange instead of one [[distNtile]]
    * pass per score.
    *
    * Chaining distNtile passes multiplies the per-pass fixed cost (range
    * exchange + pinning persist + offsets round) by the score count —
    * the rfm_segments 0.49 → 1.37 s regression was exactly three such
    * passes, each re-ranking (and re-persisting) the previous pass's
    * joined output. Here the scores share everything:
    *
    *   1. union the N slim `(tag, value, key)` projections of ONE
    *      persisted base — `tag` identifies the score, `value` is the
    *      sort key as a long, negated for descending order (so every
    *      score sorts ascending; callers' values must be >
    *      Long.MinValue, which negates to itself);
    *   2. ONE `repartitionByRange(tag, value, key)` + pinning persist:
    *      tag-ness is contiguous under the range order, so per-tag rank
    *      = per-(pid, tag) row_number + the tag's exclusive prefix of
    *      per-(pid, tag) counts — the same offsets trick as
    *      [[distNtile]], with the offsets window now PARTITIONED BY tag
    *      (≤ N·P rows, never single-partition);
    *   3. the closed-form ntile bucket per tag from (rank, N_tag, k),
    *      pivoted back to one row per key (max-of-when over N tags).
    *
    * Two persists (base + tagged ranging) and three data-bearing
    * exchanges (range, pid/tag window+join, key pivot) replace the
    * N·(exchange + persist + offsets + join) of the chained form, and
    * every data-bearing stage stays parallel at any scale — the range
    * exchange balances (tag, value) jointly, so N scores of n rows
    * spread over all partitions just like one score of N·n rows would.
    *
    * The result carries ONLY `key`, the score columns, and any
    * `carryAs` value columns (recovered from the tagged rows, so a
    * downstream aggregation over scores+value needs no join back to the
    * base at all — the rfm rollup pattern). Callers that need the full
    * base join on `key` themselves.
    *
    * `key` must be unique per row; it is also the tiebreaker (ascending)
    * within equal values, matching `ntile(k) OVER (ORDER BY v [DESC],
    * key)`.
    */
  final case class NtileSpec(out: String, value: Column, asc: Boolean,
      carryAs: Option[String] = None)

  def distNtileScores(df: DataFrame, key: String, k: Int,
      specs: Seq[NtileSpec]): DataFrame = {
    require(k > 0, "ntile bucket count must be positive")
    require(specs.nonEmpty, "at least one score spec required")
    val base = graft.CacheRegistry.persist(df)
    val tagged = specs.zipWithIndex.map { case (s, i) =>
      base.select(lit(i).as("__nt_tag"),
        (if (s.asc) s.value.cast("long") else -s.value.cast("long"))
          .as("__nt_v"),
        col(key).as("__nt_key"))
    }.reduce(_ unionAll _)
    val ranged = graft.CacheRegistry.persist(
      tagged.repartitionByRange(col("__nt_tag"), col("__nt_v"), col("__nt_key"))
        .withColumn("__nt_pid", spark_partition_id()))
    val offs = ranged.groupBy(col("__nt_pid"), col("__nt_tag"))
      .agg(count(lit(1)).as("__nt_cnt"))
      .withColumn("__nt_off", coalesce(
        sum(col("__nt_cnt")).over(Window.partitionBy(col("__nt_tag"))
          .orderBy(col("__nt_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__nt_n",
        sum(col("__nt_cnt")).over(Window.partitionBy(col("__nt_tag"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__nt_pid"), col("__nt_tag"), col("__nt_off"), col("__nt_n"))
    // pivot columns: one score per spec, plus carried raw values (undo
    // the descending negation — exact for longs above Long.MinValue)
    val pivotCols = specs.zipWithIndex.map { case (s, i) =>
      max(when(col("__nt_tag") === i, col("__nt_b"))).as(s.out)
    } ++ specs.zipWithIndex.collect { case (s, i) if s.carryAs.isDefined =>
      max(when(col("__nt_tag") === i,
        if (s.asc) col("__nt_v") else -col("__nt_v"))).as(s.carryAs.get)
    }
    ranged
      .join(broadcast(offs), Seq("__nt_pid", "__nt_tag"))
      .withColumn("__nt_rn",
        row_number().over(
          Window.partitionBy(col("__nt_pid"), col("__nt_tag"))
            .orderBy(col("__nt_v"), col("__nt_key")))
          .cast("long") + col("__nt_off"))
      .withColumn("__nt_b", ntileBucket(k))
      .groupBy(col("__nt_key").as(key))
      .agg(pivotCols.head, pivotCols.tail: _*)
  }

  /** SQL ntile closed form from (`__nt_rn`, `__nt_n`, k) — see the note
    * in [[distNtile]]: q = N DIV k, r = N % k, first r buckets get q+1
    * rows; greatest(q,1) guards the unreachable q=0 ELSE branch.
    */
  private def ntileBucket(k: Int): Column = expr(
    s"""CAST(CASE
       |  WHEN __nt_rn <= (__nt_n % $k) * (__nt_n DIV $k + 1)
       |    THEN (__nt_rn + __nt_n DIV $k) DIV (__nt_n DIV $k + 1)
       |  ELSE (__nt_n % $k)
       |    + (__nt_rn - (__nt_n % $k) * (__nt_n DIV $k + 1)
       |       + __nt_n DIV $k - 1) DIV greatest(__nt_n DIV $k, 1)
       |END AS INT)""".stripMargin)
}
