package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions makes the native expressions resolvable in a fresh
  * session without explicit registration.
  */
class ExtensionsSpec extends SparkSpec {

  test("withExtensions exposes native functions to SQL") {
    // getOrCreate() returns any already-active session (silently ignoring
    // extensions), so clear the active/default sessions first — and restore
    // them after — to deterministically exercise the extensions path. The
    // derived session shares the JVM-wide SparkContext, so it must NOT be
    // stopped (that would kill the context for the remaining suites).
    spark.sparkContext // ensure the shared session/context exists first
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.expressions.GraftExtensions)
        .getOrCreate()
      val dot = s2.sql(
        "SELECT dot_double(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head.getDouble(0)
      assert(dot == 11.0)
      val inter = s2.sql(
        "SELECT sorted_int_intersect_size(array(1, 3, 5), array(3, 4, 5)) AS n").head.getInt(0)
      assert(inter == 2)
      val ss = s2.sql(
        "SELECT search_sorted(5L, array(1L, 4L, 9L)) AS t").head.getInt(0)
      assert(ss == 2)
      val bigrams = s2.sql(
        "SELECT word_bigrams('one two three') AS b").head.getSeq[String](0)
      assert(bigrams == Seq("one two", "two three"))
      val sig = s2.sql(
        "SELECT minhash9(word_bigrams('one two three')) AS s").head.getSeq[String](0)
      assert(sig.length == 9 && sig.forall(_.length == 7))
      // prefix property: widening the signature never changes the shared
      // windows, so previously banded data stays valid
      val sig18 = s2.sql(
        "SELECT minhash18(word_bigrams('one two three')) AS s").head.getSeq[String](0)
      assert(sig18.length == 18 && sig18.take(9) == sig)
      val sk = s2.sql(
        "SELECT ngram_sketch_hash('hello world hello') AS k").head.getSeq[Int](0)
      assert(sk == sk.sorted && sk.forall(h => h % 4 == 0))
      val dq = s2.sql(
        "SELECT doc_quality('a plain readable sentence about gardening') AS q,"
          + " doc_quality('zxq vvkw qqj9 zzt') AS q0").head
      assert(!dq.isNullAt(0) && dq.getLong(0) != dq.getLong(1))
      // v=(9,9) against axis center 0 and diagonal center 1: best cell is
      // 1 (cos 1.0) then 0 (cos ~0.707) — decode cid from the packed long
      val tc = s2.sql(
        """SELECT top_cells(array(9.0d, 9.0d), 12.727922061357855d, array(
             named_struct('cid', 0L, 'cv', array(1.0d, 0.0d), 'cnrm', 1.0d),
             named_struct('cid', 1L, 'cv', array(1.0d, 1.0d),
                          'cnrm', 1.4142135623730951d)), 2) AS c""")
        .head.getSeq[Long](0)
      assert(tc.map(_ % 4294967296L) == Seq(1L, 0L))
      // 3-word filter (192 bits): h=0 probes bits 0 and 7 (word 0),
      // h=64 probes bit 64 and (31*64+7) mod 192 = 71 (word 1) — setting
      // bits {0,7} in both words makes both grams hit
      val bh = s2.sql(
        "SELECT bloom_hits(array(0, 64), array(129L, 129L, 0L)) AS h")
        .head.getLong(0)
      assert(bh == 2L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
