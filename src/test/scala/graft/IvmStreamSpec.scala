package graft

import graft.sources.SnapshotTable
import graft.streaming.IvmStream
import org.apache.spark.sql.functions._

/** The streaming IVM component: dim micro-batches merge tile-locally and
  * a downstream grouped view applies only the change feed. Every check
  * compares the MAINTAINED view against a direct aggregate over the dim's
  * current state — the maintenance law, per batch.
  */
class IvmStreamSpec extends SparkSpec {

  private def bucketOf = pmod(col("id"), lit(10L))

  private def direct(dimRoot: String) =
    SnapshotTable.read(spark, dimRoot).get
      .groupBy(bucketOf.as("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("amt")).as("amt"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("bucket", "n_rows", "amt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("view tracks the dim through insert/update/delete batches; replay exact") {
    val dir = java.nio.file.Files.createTempDirectory("ivm").toString
    val (dimRoot, viewRoot) = (s"$dir/dim", s"$dir/view")
    def check(): Unit =
      assert(rows(IvmStream.liveView(spark, viewRoot).get) == rows(direct(dimRoot)),
        "maintained view must equal the direct aggregate")

    val b1 = spark.range(500L).select(col("id"), (col("id") % 7).as("amt"))
    IvmStream.applyBatch(b1, 1L, dimRoot, viewRoot, "id", bucketOf,
      Seq("amt"), clusterFiles = 8)
    check()

    // updates inside one tile + appended keys: the dim side must take the
    // tile-local path (carried files), the view side must see both the
    // update pre/post pair and the inserts
    val b2 = spark.range(100L, 120L).select(col("id"), lit(100L).as("amt"))
      .unionByName(spark.range(500L, 520L).select(col("id"), lit(1L).as("amt")))
    IvmStream.applyBatch(b2, 2L, dimRoot, viewRoot, "id", bucketOf,
      Seq("amt"), clusterFiles = 8)
    check()
    def names(v: String) = new java.io.File(s"$dimRoot/$v").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert((names("v1") intersect names("v2")).size >= 5,
      "second batch should merge tile-locally and carry untouched files")

    // deletes shrink groups; a group emptied entirely must drop out
    val b3 = spark.range(200L, 260L).select(col("id"), lit(-1L).as("amt"))
    IvmStream.applyBatch(b3, 3L, dimRoot, viewRoot, "id", bucketOf,
      Seq("amt"), deleteWhen = Some(col("amt") < 0), clusterFiles = 8)
    check()
    assert(SnapshotTable.read(spark, dimRoot).get.count() == 500L + 20L - 60L)

    // at-least-once replay of the last batch republishes the identical view
    val before = rows(IvmStream.liveView(spark, viewRoot).get)
    IvmStream.applyBatch(b3, 3L, dimRoot, viewRoot, "id", bucketOf,
      Seq("amt"), deleteWhen = Some(col("amt") < 0), clusterFiles = 8)
    assert(rows(IvmStream.liveView(spark, viewRoot).get) == before,
      "replayed batch must not double-apply the delta")
  }

  test("runs as a stream over a file source") {
    val dir = java.nio.file.Files.createTempDirectory("ivmstream")
    val stage = dir.resolve("in").toString
    val (dimRoot, viewRoot) = (s"$dir/dim", s"$dir/view")
    new java.io.File(stage).mkdirs()
    spark.range(300L).select(col("id"), (col("id") % 5).as("amt"))
      .write.mode("append").parquet(stage)
    val updates = spark.readStream
      .schema("id LONG, amt LONG").parquet(stage)
    val q = IvmStream.start(updates, dimRoot, viewRoot, "id", bucketOf,
      Seq("amt"), dir.resolve("ck").toString, clusterFiles = 8)
    try {
      q.processAllAvailable()
      spark.range(250L, 320L).select(col("id"), lit(9L).as("amt"))
        .write.mode("append").parquet(stage)
      q.processAllAvailable()
      assert(rows(IvmStream.liveView(spark, viewRoot).get) == rows(direct(dimRoot)))
      assert(SnapshotTable.read(spark, dimRoot).get.count() == 320L)
    } finally q.stop()
  }

  test("a fresh checkpoint against an existing dim fails naming the stale-checkpoint cause") {
    val dir = java.nio.file.Files.createTempDirectory("ivmstale").toString
    val (dimRoot, viewRoot) = (s"$dir/dim", s"$dir/view")
    val b = spark.range(100L).select(col("id"), (col("id") % 7).as("amt"))
    IvmStream.applyBatch(b, 5L, dimRoot, viewRoot, "id", bucketOf,
      Seq("amt"), clusterFiles = 4)
    // a restarted stream on a WIPED checkpoint re-numbers batches from 0:
    // the guard must fail with the cause, not merge's version arithmetic
    val e = intercept[IllegalArgumentException] {
      IvmStream.applyBatch(b, 0L, dimRoot, viewRoot, "id", bucketOf,
        Seq("amt"), clusterFiles = 4)
    }
    assert(e.getMessage.contains("fresh checkpoint"),
      s"error must name the stale-checkpoint cause, got: ${e.getMessage}")
    // a genuine replay of the committed batch id still passes (idempotent)
    IvmStream.applyBatch(b, 5L, dimRoot, viewRoot, "id", bucketOf,
      Seq("amt"), clusterFiles = 4)
    assert(rows(IvmStream.liveView(spark, viewRoot).get) == rows(direct(dimRoot)))
  }
}
