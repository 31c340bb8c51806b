package graft

import graft.operators.TextAnalysis

/** The Gopher repetition battery's duplicate-n-gram branch never fires on
  * the synthetic corpus (zero repeated ≥5-grams at every sf), so the
  * oracle alone cannot witness it. This spec plants a boilerplate
  * document (a 7-word phrase repeated 6x) and checks EVERY emitted
  * column against independent brute-force arithmetic over the same
  * integer contract — including the 10000 bp cap, which overlapping
  * duplicate grams push past on the planted doc.
  */
class GopherRepSpec extends SparkSpec {

  private def brute(text: String): (Long, Map[Int, Long], Map[Int, Long]) = {
    val ws = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val charTotal = ws.mkString(" ").length.toLong
    def counts(n: Int): Map[String, Int] =
      ws.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, o) => g -> o.size }
    val top = (2 to 4).map { n =>
      val c = counts(n)
      val bp = if (c.isEmpty) 0L else {
        val (g, k) = c.toSeq.minBy { case (g, k) => (-k, g) }
        math.floor(k.toLong * g.length * 10000.0 / charTotal).toLong
      }
      n -> bp
    }.toMap
    val dup = (5 to 10).map { n =>
      val s = counts(n).collect { case (g, k) if k >= 2 => k.toLong * g.length }.sum
      n -> math.min(10000L, math.floor(s * 10000.0 / charTotal).toLong)
    }.toMap
    (charTotal, top, dup)
  }

  test("duplicate-n-gram coverage fires on planted boilerplate, brute-force exact") {
    import spark.implicits._
    val boiler = Array.fill(6)("spark makes big data feel small today").mkString(" ")
    val fresh = (1 to 30).map(i => s"w$i word$i").mkString(" ")
    // a 1-token doc has NO n-grams at any n but must still emit a row
    // of zeros (it is a document with no repetition, not a missing doc)
    val single = "hello"
    val docs = Seq((1L, boiler), (2L, fresh), (3L, single)).toDF("doc_id", "text")

    val got = TextAnalysis.gopherRepOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L), s"every doc must emit a row: ${got.keySet}")
    for ((id, text) <- Seq(1L -> boiler, 2L -> fresh, 3L -> single)) {
      val (charTotal, top, dup) = brute(text)
      val r = got(id)
      assert(r.getLong(r.fieldIndex("char_total")) == charTotal, s"doc $id char_total")
      for (n <- 2 to 4)
        assert(r.getLong(r.fieldIndex(s"top${n}_bp")) == top(n),
          s"doc $id top${n}_bp: got ${r.getLong(r.fieldIndex(s"top${n}_bp"))}, want ${top(n)}")
      for (n <- 5 to 10)
        assert(r.getLong(r.fieldIndex(s"dup${n}_bp")) == dup(n),
          s"doc $id dup${n}_bp: got ${r.getLong(r.fieldIndex(s"dup${n}_bp"))}, want ${dup(n)}")
    }
    // the planted doc actually exercises the branch — and hits the cap
    val b = got(1L)
    assert((5 to 10).forall(n => b.getLong(b.fieldIndex(s"dup${n}_bp")) > 0),
      "boilerplate doc must have nonzero duplicate coverage at every n")
    assert(b.getLong(b.fieldIndex("dup5_bp")) == 10000L,
      "overlapping duplicate 5-grams must saturate the bp cap on the planted doc")
    val f = got(2L)
    assert((5 to 10).forall(n => f.getLong(f.fieldIndex(s"dup${n}_bp")) == 0L),
      "all-distinct doc must have zero duplicate coverage")
  }

  test("one data exchange: the doc_id repartition carries every downstream stage") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = SparkEntry.queries("doc_gopher_rep")(spark, "/root/testdata/sf0.001")
    df.count()
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] =
      p.collect {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case e: ShuffleExchangeExec => Seq(e)
      }.flatten
    val n = unwrap(df.queryExecution.executedPlan).size
    CacheRegistry.clear()
    // doc_id repartition + the deterministic output sort; gram counts,
    // the (doc_id, n) window, the per-n rollup and the doc pivot must
    // all ride the first under the subset rule
    assert(n <= 2, s"expected <= 2 exchanges (repartition + sort), got $n")
  }
}
