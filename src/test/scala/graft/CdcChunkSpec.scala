package graft

import graft.operators.Packing

/** The property content-defined chunking exists for: an INSERTION at the
  * head of a document shifts every fixed-stride chunk (all hashes
  * change), while content-defined boundaries re-synchronize at the next
  * boundary token — every chunk after it keeps an identical hash, so
  * chunk-level dedup still matches the unedited remainder.
  */
class CdcChunkSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("an inserted token re-synchronizes at the next boundary; fixed stride never does") {
    import spark.implicits._
    val baseToks = (0 until 120).map(i => s"tok$i")
    val base = baseToks.mkString(" ")
    val edited = ("inserted" +: baseToks).mkString(" ")
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")

    val rows = Packing.cdcChunksOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4)))
    val h1 = rows.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val h2 = rows.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    assert(h1.length >= 4, s"fixture must produce several chunks, got ${h1.length}")
    // all chunks after the first boundary are hash-identical: doc 2 is
    // doc 1 with one token prepended, so only the FIRST chunk differs
    assert(h2.drop(1).toSeq == h1.drop(1).toSeq && h2.head != h1.head,
      s"CDC must re-sync after the first boundary (doc1 ${h1.length} chunks, doc2 ${h2.length})")

    // fixed-stride chunking of the same pair shares (almost) nothing:
    // every window shifts by one token
    val stride = 16
    def fixedHashes(toks: Seq[String]): Seq[String] =
      toks.grouped(stride).map(w => md5hex(w.mkString(" "))).toSeq
    val shared = fixedHashes(baseToks).toSet
      .intersect(fixedHashes("inserted" +: baseToks).toSet)
    assert(shared.isEmpty,
      s"fixed-stride chunks should all shift under the insertion, shared $shared")
  }
}
