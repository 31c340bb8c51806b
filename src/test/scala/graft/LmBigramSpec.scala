package graft

import graft.operators.Relevance
import org.apache.spark.sql.functions._

/** The bigram LM must catch what the unigram LM provably cannot: word
  * salad. A scrambled document has EXACTLY the clean document's unigram
  * distribution (same token multiset, same corpus), so `doc_lm_score`
  * assigns it the identical average log-prob — while almost every one of
  * its bigrams misses the singleton-pruned model and pays the stupid-
  * backoff penalty. This spec plants both kinds and measures the ranking
  * delta the round's directive asks for.
  */
class LmBigramSpec extends SparkSpec {

  private val words =
    Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")

  private def corpus() = {
    import spark.implicits._
    val sentence = (0 until 4).flatMap(_ => words) // 32 tokens, repeating order
    val clean = (0 until 6).map(i => (i.toLong, sentence.mkString(" ")))
    val salad = (0 until 4).map { i =>
      val rnd = new scala.util.Random(1000 + i) // per-doc shuffle: its bigrams are singletons
      (100L + i, rnd.shuffle(sentence).mkString(" "))
    }
    (clean ++ salad).toDF("doc_id", "text")
  }

  test("word salad: unigram score is blind, bigram backoff sinks it (measured delta)") {
    val docs = corpus()
    try {
      val uni = Relevance.lmScores(docs)
        .select(col("doc_id"), col("avg_lp_x1m").as("uni")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      CacheRegistry.clear()
      val bi = Relevance.lmBigramScores(docs)
        .select(col("doc_id"), col("avg_lp_x1m").as("bi")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val cleanIds = (0 until 6).map(_.toLong)
      val saladIds = (0 until 4).map(100L + _)
      // unigram blindness: EXACT equality — scrambling does not move the
      // token multiset, so every doc gets the same unigram average
      val uniVals = (cleanIds ++ saladIds).map(uni)
      assert(uniVals.distinct.size == 1,
        s"unigram should be identical across clean and salad docs: $uni")
      // bigram separation: every salad doc ranks strictly below every
      // clean doc, by a wide margin (the backoff penalty)
      val worstClean = cleanIds.map(bi).min
      val bestSalad = saladIds.map(bi).max
      assert(bestSalad < worstClean,
        s"salad docs must rank below clean docs under the bigram LM: $bi")
      val deltaX1m = worstClean - bestSalad
      // the penalty is the point: require at least 1.0 nat per token
      assert(deltaX1m > 1000000L,
        s"expected a decisive ranking delta, got ${deltaX1m / 1e6} nats/token")
      info(s"bigram ranking delta: ${deltaX1m / 1e6} nats/token " +
        s"(clean ≥ ${worstClean / 1e6}, salad ≤ ${bestSalad / 1e6}); " +
        s"unigram delta: 0.0 (identical scores)")
    } finally CacheRegistry.clear()
  }

  test("singleton pruning makes the backoff real on the fixture corpus") {
    // a bigram seen ONCE (inside one salad doc) must score via backoff,
    // not via its own trivial count: remove the pruning and the salad
    // docs would score their own scrambles as fluent. Proxy assertion:
    // a corpus of ONE doc (every bigram count = 1 → all pruned) scores
    // every non-initial position with the backoff formula exactly.
    import spark.implicits._
    val one = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    try {
      val row = Relevance.lmBigramScores(one).collect().head
      val n = 3.0
      def lp(word: Double) = math.floor(math.log(word / n) * 1e6)
      def lpBack(word: Double) = math.floor(math.log(0.4 * word / n) * 1e6)
      // first token: unigram ln(1/3); two others: backoff ln(0.4 * 1/3)
      val expect = (lp(1.0) + 2 * lpBack(1.0)).toLong
      assert(row.getAs[Long]("sum_lp_x1m") == expect,
        s"expected pure unigram+backoff scoring, got $row")
    } finally CacheRegistry.clear()
  }
}
