package graft

/** The release/rebuild bookkeeping Bench's noise-control rests on:
  * releaseShared matches whole key segments (never substring prefixes),
  * a key rebuilt after release is recorded (the stale-schedule
  * self-flag), and clearAll resets the bookkeeping so a second harness
  * run in the same JVM starts clean.
  */
class CacheRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(1, 2, 3).toDF("x")

  test("releaseShared matches exact keys and ':'-qualified prefixes only") {
    CacheRegistry.clearAll()
    CacheRegistry.shared("pq_sub:8:/tmp/a")(frame)
    CacheRegistry.shared("pq_sub:16:/tmp/a")(frame)
    CacheRegistry.shared("pq_subx:/tmp/a")(frame)
    val hit = CacheRegistry.releaseShared(Seq("pq_sub:8"))
    assert(hit == Seq("pq_sub:8:/tmp/a"), hit)
    // "pq_sub" must NOT match "pq_subx:..." (segment, not substring)
    val hit2 = CacheRegistry.releaseShared(Seq("pq_sub"))
    assert(hit2 == Seq("pq_sub:16:/tmp/a"), hit2)
    CacheRegistry.clearAll()
  }

  test("a rebuild after release is recorded and attributed; clearAll resets") {
    CacheRegistry.clearAll()
    CacheRegistry.beginQuery("q1")
    CacheRegistry.shared("vecs:/tmp/b")(frame)
    CacheRegistry.endQuery()
    CacheRegistry.releaseShared(Seq("vecs"))
    assert(CacheRegistry.rebuiltAfterRelease.isEmpty)
    // a later consumer the schedule missed: rebuilds lazily, flagged
    CacheRegistry.beginQuery("q2")
    CacheRegistry.shared("vecs:/tmp/b")(frame)
    CacheRegistry.endQuery()
    assert(CacheRegistry.rebuiltAfterRelease == Seq("vecs:/tmp/b"))
    assert(CacheRegistry.sharedAccesses("vecs:/tmp/b") == Set("q1", "q2"))
    // clearAll: a fresh harness run must not inherit release state
    CacheRegistry.clearAll()
    assert(CacheRegistry.rebuiltAfterRelease.isEmpty)
    CacheRegistry.shared("vecs:/tmp/b")(frame)
    assert(CacheRegistry.rebuiltAfterRelease.isEmpty,
      "a key released in a PREVIOUS run must not count as rebuilt")
    CacheRegistry.clearAll()
  }
}
