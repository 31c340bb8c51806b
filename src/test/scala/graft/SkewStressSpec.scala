package graft

import org.apache.spark.sql.functions._

/** Hot-key stress: the two documented skew levers ENGAGE on planted skew —
  * AQE splits a skewed shuffle-join partition (the "one whale user" join
  * and the "one hot band signature" dedup self-join), and the salted
  * aggregation spreads the hot key across partial groups. These are the
  * shapes one dominant key at 100 TB produces; ScaleFixture plants the
  * same skew into a full blown-up sf dir for the BASELINE.md capture.
  *
  * Fixture calibration (found empirically, worth keeping): AQE's skew
  * detector works off COMPRESSED per-partition shuffle bytes, so planted
  * skew must carry incompressible payload (md5 hex here) and enough
  * uniform-key cardinality (~5000+) that the non-hot partitions form a
  * stable median — with only ~2000 uniform keys at this scale the rule
  * measured no skew even at 9x the median row count.
  */
class SkewStressSpec extends SparkSpec {

  private val HotUser = 7L

  private val skewConfs = Seq(
    // lowered thresholds so test-sized partitions qualify as "skewed"
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.shuffle.partitions" -> "32")

  private def withSkewConfs[T](body: => T): T = {
    val prev = skewConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    skewConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** 20% of rows on one hot user, the rest over ~5000 uniform users; an
    * incompressible payload rides the shuffle so partition bytes track
    * row counts.
    */
  private def skewedEvents(n: Int) = {
    spark.range(n.toLong).select(
      col("id").as("event_id"),
      when(pmod(col("id"), lit(5)) === 0, lit(HotUser))
        .otherwise(pmod(col("id") * 2654435761L, lit(5000)) + 10).as("user_id"),
      (pmod(col("id") * 40503L, lit(1000)) / lit(100.0)).as("value"),
      md5(col("id").cast("string")).as("props"))
  }

  test("AQE splits the hot-user join partition; result matches the direct plan") {
    val ev = skewedEvents(400000)
    val users = spark.range(6000L).select(col("id").as("user_id"),
      pmod(col("id"), lit(7)).as("segment"))
    // max(props) keeps the payload alive through the join shuffle (column
    // pruning would otherwise shrink partitions below the thresholds)
    val joined = ev.join(users, "user_id")
      .groupBy("segment")
      .agg(count(lit(1)).as("ct"),
        sum(col("value").cast("decimal(18,2)")).as("v"),
        max(col("props")).as("mx"))
    val (skewRows, plan) = withSkewConfs {
      val rows = joined.collect()
      (rows.map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).toString)).toSet,
        joined.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("skew=true"),
      s"AQE skew handling must engage on the hot-user join; plan:\n${plan.take(2000)}")
    val direct = joined.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).toString)).toSet
    assert(skewRows == direct, "skew-split plan must not change results")
  }

  test("AQE splits a hot band-signature dedup self-join partition") {
    // one signature shared by 3000 docs (a boilerplate page), the rest
    // unique — the LSH candidate join's worst key
    val bands = spark.range(20000).select(
      col("id").as("doc_id"),
      lit(1).as("band"),
      when(col("id") < 3000, lit("hotsig0000000"))
        .otherwise(md5(col("id").cast("string"))).as("sig"),
      md5(concat(lit("pay"), col("id"))).as("pay"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pay").as("pay"))
      .groupBy()
      .agg(count(lit(1)).as("pairs"), max(col("pay")).as("mx"))
    val (ct, plan) = withSkewConfs {
      val row = cand.collect().head
      (row.getLong(0), cand.queryExecution.executedPlan.toString)
    }
    assert(ct == 3000L * 2999 / 2,
      "candidate pairs must be exactly the hot bucket's pair count")
    assert(plan.contains("skew=true"),
      s"AQE skew handling must engage on the band self-join; plan:\n${plan.take(2000)}")
  }

  test("explicit salted join spreads the whale key across shuffle partitions") {
    // skew-split OFF and broadcast OFF: the comparison isolates what the
    // SALT does to the plain shuffle-join layout
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      // coalescing would merge the small test partitions back into one
      // and mask the layout under measurement
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val ev = skewedEvents(100000)
      val users = spark.range(6000L).select(col("id").as("user_id"),
        pmod(col("id"), lit(7)).as("segment"))
      def hotPartitions(df: org.apache.spark.sql.DataFrame): Long = df
        .filter(col("user_id") === HotUser)
        .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"))
        .distinct().count()
      val plain = hotPartitions(ev.join(users, "user_id"))
      val salted = hotPartitions(operators.SaltedJoin.saltedJoin(
        ev, users, "user_id", 8, pmod(col("event_id"), lit(8))))
      assert(plain === 1L, s"unsalted hot key must land in one partition, got $plain")
      assert(salted > 1L, s"salted hot key must spread, got $salted partition(s)")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted aggregation keeps the hot key flat and exact") {
    val ev = operators.Salted.saltedSumCount(
      skewedEvents(60000).drop("props"), Seq("user_id"), "value", salts = 16)
    val got = ev.filter(col("user_id") === HotUser).collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 12000L, "hot user must keep every row")
    // the partial stage actually spreads the hot key: >1 salt group
    val spread = skewedEvents(60000).drop("props")
      .filter(col("user_id") === HotUser)
      .select(pmod(hash(col("event_id"), col("user_id"), col("value")), lit(16)).as("s"))
      .distinct().count()
    assert(spread > 8, s"hot key must spread across salts, got $spread of 16")
  }
}
