package graft

import org.apache.spark.sql.functions._

/** Planted-fixture proof for span-level contamination/dedup: the oracle
  * checks the real tables; this spec proves the DETECTION semantics on
  * constructed cases — a long verbatim span inside otherwise-unique
  * documents is found with exact boundaries, a sub-threshold span is not,
  * and the df-cap drops boilerplate-only spans without touching real ones.
  */
class SpanDedupSpec extends SparkSpec {

  // deterministic unique filler: doc-tagged token streams share no grams
  private def filler(tag: String, k: Int): Seq[String] =
    (1 to k).map(i => s"${tag}tok$i")

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("a 300-token planted span is found with exact boundaries; 8-token span is not") {
    val shared = filler("shared", 300)
    val small = filler("tiny", 8)
    // bench doc 5: 40 unique + shared300 + 30 unique; span at bench pos 41
    val bench = (filler("b", 40) ++ shared ++ filler("bb", 30)).mkString(" ")
    // corpus doc 100: 70 unique + shared300 + 10 unique; span at pos 71
    val hit = (filler("c", 70) ++ shared ++ filler("cc", 10)).mkString(" ")
    // corpus doc 101 shares only the 8-token run with bench doc 6
    val benchSmall = (filler("d", 20) ++ small ++ filler("dd", 20)).mkString(" ")
    val miss = (filler("e", 30) ++ small ++ filler("ee", 30)).mkString(" ")
    val docs = docsDf(Seq(5L -> bench, 6L -> benchSmall, 100L -> hit, 101L -> miss))
    try {
      val g = operators.SpanDedup.gramTableOf(docs, 5)
      val out = operators.SpanDedup.contaminationSpansOf(g, 5, 12).collect()
      assert(out.length == 1, s"expected exactly the planted span, got ${out.toSeq}")
      val r = out.head
      assert(r.getLong(0) == 100L && r.getLong(1) == 5L)
      assert(r.getLong(2) == 71L, "corpus start position")
      assert(r.getLong(3) == 41L, "bench start position")
      assert(r.getLong(4) == 300L, "span length is the full planted run")
    } finally CacheRegistry.clear()
  }

  test("corpus-corpus span found between two docs; df-capped boilerplate span dropped") {
    val shared = filler("dup", 60)
    // a 20-token boilerplate run present in 70 docs: every one of its
    // 8-grams has df 70 > 64 → capped, no span reported among them
    val boiler = filler("boil", 20)
    val base = Seq(
      200L -> (filler("p", 30) ++ shared ++ filler("pp", 5)).mkString(" "),
      201L -> (filler("q", 50) ++ shared ++ filler("qq", 9)).mkString(" "))
    val noise = (300L until 370L).map(i =>
      i -> (filler(s"n$i", 10) ++ boiler ++ filler(s"m$i", 7)).mkString(" "))
    val docs = docsDf(base ++ noise)
    try {
      val g = operators.SpanDedup.gramTableOf(docs, 8)
      val out = operators.SpanDedup.spanPairsOf(g, 8, 16, 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(out.toSeq == Seq((200L, 201L, 31L, 51L, 60L)),
        s"expected only the planted 60-token pair span, got ${out.toSeq}")
    } finally CacheRegistry.clear()
  }

  test("two disjoint spans between the same pair are reported separately") {
    val s1 = filler("one", 20)
    val s2 = filler("two", 25)
    val docs = docsDf(Seq(
      400L -> (filler("x", 10) ++ s1 ++ filler("xx", 15) ++ s2).mkString(" "),
      401L -> (s1 ++ filler("y", 40) ++ s2 ++ filler("yy", 5)).mkString(" ")))
    try {
      val g = operators.SpanDedup.gramTableOf(docs, 8)
      val out = operators.SpanDedup.spanPairsOf(g, 8, 16, 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(out.toSeq == Seq((400L, 401L, 11L, 1L, 20L), (400L, 401L, 46L, 61L, 25L)),
        s"got ${out.toSeq}")
    } finally CacheRegistry.clear()
  }
}
