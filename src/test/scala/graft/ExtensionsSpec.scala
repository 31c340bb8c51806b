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
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
