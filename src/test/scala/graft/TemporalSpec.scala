package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._

/** Semantics of the union-merge as-of join and its SCD2 interval twin. */
class TemporalSpec extends SparkSpec {

  private def versionsOf(rows: Seq[(Long, Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "tsu", "touch_type", "touch_props")
  }

  private def factsOf(rows: Seq[(Long, Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "tsu", "event_id", "value")
  }

  test("as-of: equal timestamps match, earlier versions lose, no-match is null") {
    val v = versionsOf(Seq(
      (1L, 100L, "view", "a"),
      (1L, 200L, "click", "b"),
      (2L, 500L, "view", "c")))
    val f = factsOf(Seq(
      (1L, 200L, 10L, 1.0),  // equal ts -> the 200 click, not the 100 view
      (1L, 150L, 11L, 1.0),  // between -> the 100 view
      (1L, 99L, 12L, 1.0),   // before everything -> none
      (2L, 9999L, 13L, 1.0), // long after -> the 500 view
      (3L, 100L, 14L, 1.0))) // user with no versions at all -> none
    val got = Temporal.asofMatch(v, f)
      .select("event_id", "m_type", "m_tsu", "gap_us")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(10L) == (Some("click"), Some(200L), Some(0L)))
    assert(got(11L) == (Some("view"), Some(100L), Some(50L)))
    assert(got(12L) == (None, None, None))
    assert(got(13L) == (Some("view"), Some(500L), Some(9499L)))
    assert(got(14L) == (None, None, None))
  }

  test("as-of: every fact emits exactly one row (left semantics)") {
    val v = versionsOf(Seq((1L, 100L, "view", "a"), (1L, 300L, "click", "b")))
    val f = factsOf(Seq.tabulate(10)(i => (1L, 50L + i * 40L, i.toLong, 1.0)))
    val out = Temporal.asofMatch(v, f)
    assert(out.count() == 10)
    assert(out.select("event_id").distinct().count() == 10)
  }

  test("same-timestamp duplicate versions resolve to the max id (oracle's dedupe rule)") {
    import spark.implicits._
    val v = Seq(
      (1L, 100L, 5L, "view", "a"),
      (1L, 100L, 9L, "click", "b"), // max touch_id at the tied microsecond
      (1L, 100L, 7L, "view", "c"))
      .toDF("user_id", "tsu", "touch_id", "touch_type", "touch_props")
    val f = factsOf(Seq((1L, 100L, 50L, 1.0)))
    val got = Temporal.asofMatch(v, f).select("m_type", "m_props").collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("click", "b")))
  }

  test("scd2 interval join assigns the same version as the as-of join") {
    // The two plan shapes (union-merge window over RAW touches vs dedupe +
    // equi+range interval join) must agree fact-by-fact; compare at
    // (fact -> matched version time).
    val viaAsof = Temporal.asofMatch(
      Temporal.rawTouchPoints(spark, sf), Temporal.purchases(spark, sf))
      .select(col("event_id"), col("m_tsu"))
    val v = Temporal.scd2Versions(spark, sf)
    val p = Temporal.purchases(spark, sf)
    val naive = p.join(v,
        p("user_id") === v("user_id") &&
          p("tsu") >= v("valid_from_us") &&
          (v("valid_to_us").isNull || p("tsu") < v("valid_to_us")),
        "left")
      .select(p("event_id"), v("valid_from_us").as("m_tsu"))
    val bucketed = Temporal.intervalJoin(v, p)
      .select(col("event_id"), col("m_valid_from_us").as("m_tsu"))
    assert(viaAsof.exceptAll(naive).isEmpty && naive.exceptAll(viaAsof).isEmpty)
    assert(viaAsof.exceptAll(bucketed).isEmpty &&
      bucketed.exceptAll(viaAsof).isEmpty,
      "chunk-bucketed interval join must equal the naive and as-of forms")
  }

  test("randomized as-of fixtures match a brute-force reference (fixed seed)") {
    // dense timestamp range forces equal-ts collisions between versions
    // and facts AND duplicate version timestamps — every tie rule fires
    val rnd = new scala.util.Random(7)
    val versions = Seq.tabulate(120) { i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, 1000L + i,
        if (rnd.nextBoolean()) "view" else "click", s"p${rnd.nextInt(8)}")
    }
    val facts = Seq.tabulate(80) { i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(45).toLong, i.toLong, 1.0)
    }
    import spark.implicits._
    val got = Temporal.asofMatch(
      versions.toDF("user_id", "tsu", "touch_id", "touch_type", "touch_props"),
      factsOf(facts))
      .select("event_id", "m_tsu", "m_type", "m_props").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
      .toMap
    for ((u, t, id, _) <- facts) {
      // reference rule: latest version at or before t; ties on tsu to max id
      val best = versions.filter(v => v._1 == u && v._2 <= t)
        .sortBy(v => (v._2, v._3)).lastOption
      assert(got(id) == (best.map(_._2), best.map(_._4), best.map(_._5)),
        s"fact $id (user $u, t $t): expected $best")
    }
  }

  test("the exploded closed-version side joins shuffled, never broadcast") {
    // Catalyst sizes the exploded frame on PRE-explode stats; without the
    // shuffle_hash hint AQE shipped a ~10M-row broadcast hash relation on
    // the 10x blowup (BASELINE.md) — pin the plan shape
    val df = Temporal.scd2Enrich.run(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      "closed interval join must stay a shuffled hash join")
    CacheRegistry.clear()
  }

  test("linear and decay attribution both conserve credit: total bp = 10000 x purchases") {
    val expected = 10000L * Temporal.purchases(spark, sf).count()
    for (q <- Seq(Temporal.attributionLinear, Temporal.attributionDecay)) {
      val total = q.run(spark, sf)
        .agg(sum(col("credit_bp_sum"))).head.getLong(0)
      assert(total == expected, s"${q.name} leaked credit")
    }
  }

  test("tolerance variant only ever moves credit to none, never between touches") {
    val strict = Temporal.asofTolerance.run(spark, sf)
      .select("touch_type", "purchase_ct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val loose = Temporal.asofAttribution.run(spark, sf)
      .select("touch_type", "purchase_ct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (t <- Seq("view", "click"))
      assert(strict.getOrElse(t, 0L) <= loose.getOrElse(t, 0L))
    assert(strict.values.sum == loose.values.sum)
  }
}
