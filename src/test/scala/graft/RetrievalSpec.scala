package graft

import graft.operators.{InvertedIndex, Retrieval}
import org.apache.spark.sql.functions._

/** What the DuckDB oracle can't say about BM25 search: that the SAME
  * ranking is served off the inverted index (termLookup postings ≡
  * relational postings through the shared scorer), and that the ranking
  * actually behaves like BM25.
  */
class RetrievalSpec extends SparkSpec {

  test("index-served BM25 equals the relational search exactly") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    try {
      val docs = Tables.load(spark, sf, "documents")
      InvertedIndex.publishIndex(docs, dir)
      val p = Retrieval.parts(spark, sf)
      val terms = p.qterms.select(col("token")).collect().map(_.getString(0))
      assert(terms.length == 3)
      val indexPostings = terms.map(InvertedIndex.termLookup(spark, dir, _))
        .reduce(_.unionByName(_))
      val viaIndex = Retrieval.topDocs(
        Retrieval.bm25Scores(indexPostings, p.qterms, p.dl, p.stats))
        .collect().map(_.toString)
      val relational = Retrieval.bm25.run(spark, sf).collect().map(_.toString)
      assert(viaIndex.sameElements(relational))
    } finally {
      CacheRegistry.clear()
      graft.operators.SnapshotDiff.rmTree(dir)
    }
  }

  test("hybrid RRF fuses both branches and the score is the pure rank formula") {
    try {
      val out = Retrieval.hybridRrf.run(spark, sf).collect()
      assert(out.nonEmpty && out.length <= 20)
      out.foreach { r =>
        val (lex, sem, rrf) = (r.getAs[Long]("lex_rank"),
          r.getAs[Long]("sem_rank"), r.getAs[Long]("rrf_x1e6"))
        assert(lex >= 0 && lex <= 50 && sem >= 0 && sem <= 50)
        val expected = (if (lex > 0) 1000000L / (60 + lex) else 0L) +
          (if (sem > 0) 1000000L / (60 + sem) else 0L)
        assert(rrf == expected, s"rrf mismatch: $r")
      }
      // fusion is real: some doc scores through BOTH lists, and each
      // branch contributes at least one doc the other ranked lower/missed
      assert(out.exists(r => r.getAs[Long]("lex_rank") > 0 && r.getAs[Long]("sem_rank") > 0))
      assert(out.exists(_.getAs[Long]("lex_rank") > 0))
      assert(out.exists(_.getAs[Long]("sem_rank") > 0))
    } finally CacheRegistry.clear()
  }

  test("phrase search counts true adjacent occurrences, not bag-of-words co-occurrence") {
    import spark.implicits._
    try {
      // query phrase = doc 0's opening bigram: "alpha beta"
      val docs = Seq(
        (0L, "alpha beta x alpha beta"), // 2 adjacent occurrences
        (1L, "y alpha beta z"),          // 1
        (2L, "beta alpha"),              // reversed — NOT a match
        (3L, "alpha x beta")             // co-occurring, not adjacent — NOT a match
      ).toDF("doc_id", "text")
      val out = Retrieval.phraseHits(docs).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_occurrences")).toMap
      assert(out == Map(0L -> 2L, 1L -> 1L), s"$out")
    } finally CacheRegistry.clear()
  }

  test("phrase counts served off the positional index equal the relational search") {
    val dir = java.nio.file.Files.createTempDirectory("posidx").toString
    try {
      val docs = Tables.load(spark, sf, "documents")
      InvertedIndex.publishPositionalIndex(docs, dir)
      // the query phrase: doc 0's opening bigram, resolved test-side
      val Array(w1, w2) = docs.filter(col("doc_id") === 0)
        .select(graft.functions.TextFunctions.tokens(col("text")).as("ws"))
        .collect()(0).getSeq[String](0).take(2).toArray
      def posOf(term: String) = graft.sources.SnapshotTable
        .pointLookup(spark, dir, "token", term).get
        .select(col("doc_id"), explode(col("positions")).as("pos"))
      val viaIndex = posOf(w1).as("a")
        .join(posOf(w2).withColumn("pos", col("pos") - 1).as("b"),
          Seq("doc_id", "pos"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_occurrences"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val relational = Retrieval.phraseHits(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(viaIndex == relational)
      assert(relational.nonEmpty, "fixture phrase should occur somewhere")
    } finally {
      CacheRegistry.clear()
      graft.operators.SnapshotDiff.rmTree(dir)
    }
  }

  test("snippets: earliest query-term anchor, edge-clipped windows, exact text") {
    import spark.implicits._
    val docs = Seq(
      // anchor at pos 1 -> left edge clips the window to [0, 4]
      0L -> "alpha hit one two three four five six",
      // two query terms; the EARLIEST (pos 2, 'hit') anchors, full window
      1L -> "pad pad hit mid aim end seven eight nine",
      // anchor at the last position -> right edge clips to [4, 7]
      2L -> "a b c d e f g aim").toDF("doc_id", "text")
    val top = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("doc_id", "rank")
    val qterms = Seq("hit", "aim").toDF("token")
    val out = Retrieval.snippetsFor(docs, top, qterms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 1L, "alpha hit one two three"),
      (2L, 1L, 2L, "pad pad hit mid aim end"),
      (3L, 2L, 7L, "e f g aim")), s"${out.toSeq}")
    CacheRegistry.clear()
  }

  test("two-phase salted per-query top-k is lossless vs the single-window form") {
    import spark.implicits._
    // scores engineered so every query's global top-3 is concentrated in
    // ONE salt bucket (doc_id ≡ 0 mod 16 for qid 0, ≡ 1 for qid 1): the
    // local phase must keep them all, not k-per-bucket-starve them
    val rows = for {
      q <- 0L until 2L; d <- 0L until 64L
    } yield (q, d, 1L, if (d % 16 == q) 1000L + d else d)
    val perDoc = rows.toDF("qid", "doc_id", "terms_hit", "score_x1000")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val salted = Retrieval.topKPerQuery(perDoc, 3, 16)
    val plain = Retrieval.topKPerQuery(perDoc, 3, 1)
    assert(collect(salted) == collect(plain), "salted prune must be lossless")
    assert(salted.count() == 6, "3 per query, 2 queries")
    // and the winners are the planted hot bucket's top ids
    val top0 = collect(salted).filter(_._1 == 0L).map(_._3)
    assert(top0 == Set(48L, 32L, 16L), s"$top0")
    CacheRegistry.clear()
  }

  test("bm25 ranking is well-formed: dense ranks, descending scores, hits bounded") {
    try {
      val out = Retrieval.bm25.run(spark, sf).collect()
      assert(out.nonEmpty && out.length <= 20)
      assert(out.map(_.getAs[Long]("rank")).sameElements(1L to out.length))
      val scores = out.map(_.getAs[Long]("score_x1000"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(out.forall { r =>
        val h = r.getAs[Long]("terms_hit"); h >= 1 && h <= 3 })
    } finally CacheRegistry.clear()
  }
}
