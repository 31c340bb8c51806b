package graft.tools

import graft.GraftSession
import graft.sources.SnapshotTable
import org.apache.spark.sql.functions._

/** Measures what file-level data skipping buys on a SnapshotTable dim:
  * publishes a blown-up orders dim twice — pk-clustered WITH per-file
  * stats, and unclustered WITHOUT — then times the reference's two dim
  * access shapes (`RT/utils/DimUtil.java:22-27` point lookup; a 1%
  * selective range scan) against both. Prints one JSON line; BASELINE.md
  * records the capture.
  *
  * Usage: `sbt "runMain graft.tools.SnapshotProbe <srcSfDir> <factor> <workDir>"`
  */
object SnapshotProbe {

  def main(args: Array[String]): Unit = {
    val Array(srcDir, factorS, workDir) = args
    val factor = factorS.toLong
    val files = 64
    val spark = GraftSession.getOrCreate("snapshot-probe")
    spark.sparkContext.setLogLevel("WARN")

    // a dim-sized table: orders x factor with remapped-unique pk
    val dim = spark.read.parquet(s"$srcDir/orders.parquet")
      .select(col("*"), explode(sequence(lit(0L), lit(factor - 1))).as("c"))
      .withColumn("o_orderkey", col("o_orderkey") * factor + col("c"))
      .drop("c")
    val statsRoot = s"$workDir/dim_stats"
    val plainRoot = s"$workDir/dim_plain"
    val t0 = System.nanoTime()
    // custkey stats recorded too: the z-order probe below compares
    // "has stats but linear layout can't use them" fairly
    SnapshotTable.publish(dim, statsRoot, "v1",
      statsCols = Seq("o_orderkey", "o_custkey"), clusterFiles = Some(files))
    val publishStats = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    SnapshotTable.publish(dim.repartition(files), plainRoot, "v1")
    val publishPlain = (System.nanoTime() - t1) / 1e9

    val n = spark.read.parquet(s"$statsRoot/v1").agg(max("o_orderkey"))
      .head().getLong(0)
    val keys = Seq(n / 7, n / 3, n / 2, 2 * n / 3, 9 * n / 10)

    def time(f: => Long): (Double, Long) = {
      val s = System.nanoTime(); val r = f; ((System.nanoTime() - s) / 1e9, r)
    }
    // point lookups: pruned vs full-scan filter (5 keys, report totals)
    val (prunedSec, prunedRows) = time {
      keys.map(k => SnapshotTable.pointLookup(spark, statsRoot, "o_orderkey", k)
        .get.count()).sum
    }
    val (fullSec, fullRows) = time {
      keys.map(k => SnapshotTable.read(spark, plainRoot).get
        .filter(col("o_orderkey") === k).count()).sum
    }
    val prunedFiles = SnapshotTable
      .pointLookup(spark, statsRoot, "o_orderkey", keys.head).get.inputFiles.length
    // 1% selective range scan (an aggregate over the matching slice)
    val lo = n / 2; val hi = lo + n / 100
    val (rPrunedSec, _) = time {
      SnapshotTable.readPruned(spark, statsRoot, "o_orderkey", lo, hi).get
        .filter(col("o_orderkey").between(lo, hi))
        .agg(count(lit(1))).head().getLong(0)
    }
    val (rFullSec, _) = time {
      SnapshotTable.read(spark, plainRoot).get
        .filter(col("o_orderkey").between(lo, hi))
        .agg(count(lit(1))).head().getLong(0)
    }
    println(s"""{"rows":${(n + 1)},"files":$files,"publish_stats_sec":$publishStats,"publish_plain_sec":$publishPlain,"point_pruned_sec":$prunedSec,"point_full_sec":$fullSec,"point_pruned_files":$prunedFiles,"point_rows":[$prunedRows,$fullRows],"range_pruned_sec":$rPrunedSec,"range_full_sec":$rFullSec}""")

    // z-order: the SECOND key column (o_custkey) is where linear
    // clustering prunes nothing — measure both layouts on a selective
    // custkey range (the "find this customer's dim rows" shape)
    val zRoot = s"$workDir/dim_z"
    val tz = System.nanoTime()
    SnapshotTable.publishZOrdered(dim, zRoot, "v1",
      pk = "o_orderkey", zCols = Seq("o_orderkey", "o_custkey"), nFiles = files)
    val publishZ = (System.nanoTime() - tz) / 1e9
    val cMax = spark.read.parquet(s"$zRoot/v1").agg(max("o_custkey"))
      .head().getLong(0)
    val cLo = cMax / 2; val cHi = cLo + cMax / 100
    def custCount(root: String): Long =
      SnapshotTable.readPruned(spark, root, "o_custkey", cLo, cHi).get
        .filter(col("o_custkey").between(cLo, cHi))
        .agg(count(lit(1))).head().getLong(0)
    val (zCustSec, zCustRows) = time(custCount(zRoot))
    val (linCustSec, linCustRows) = time(custCount(statsRoot))
    assert(zCustRows == linCustRows, s"z/linear row mismatch: $zCustRows vs $linCustRows")
    val zKeptCust = SnapshotTable
      .readPruned(spark, zRoot, "o_custkey", cLo, cHi).get.inputFiles.length
    val linKeptCust = SnapshotTable
      .readPruned(spark, statsRoot, "o_custkey", cLo, cHi).get.inputFiles.length
    val zKeptPk = SnapshotTable
      .readPruned(spark, zRoot, "o_orderkey", lo, hi).get.inputFiles.length
    println(s"""{"zorder":true,"files":$files,"publish_z_sec":$publishZ,"cust_range_z_sec":$zCustSec,"cust_range_linear_sec":$linCustSec,"cust_kept_files_z":$zKeptCust,"cust_kept_files_linear":$linKeptCust,"pk_kept_files_z":$zKeptPk,"cust_rows":$zCustRows}""")

    // version diff: a dim update touching ~0.4% of rows in one key run
    // plus a small append — the common micro-batch shape. Fingerprinted
    // + aligned publishes let the diff scan only the changed tiles; the
    // stats-less publishes force the full-table fallback diff.
    val updLo = n / 2; val updHi = updLo + n / 250
    val dim2 = dim
      .withColumn("o_orderstatus",
        when(col("o_orderkey").between(updLo, updHi), lit("U"))
          .otherwise(col("o_orderstatus")))
      .unionByName(dim.filter(col("o_orderkey") < 1000)
        .withColumn("o_orderkey", col("o_orderkey") + n + 1))
    val bounds = SnapshotTable
      .keyBoundaries(statsRoot, "v1", "o_orderkey").get
    val ta = System.nanoTime()
    // stats columns must match v1's for tiles to fingerprint-pair
    SnapshotTable.publishAligned(dim2, statsRoot, "v2", "o_orderkey",
      bounds, retain = 3, statsCols = Seq("o_orderkey", "o_custkey"))
    val publishAligned = (System.nanoTime() - ta) / 1e9
    SnapshotTable.publish(dim2.repartition(files), plainRoot, "v2", retain = 3)
    val (keptOld, keptNew) =
      SnapshotTable.diffFiles(statsRoot, "v1", "v2").get
    val (dPrunedSec, dPrunedRows) = time(
      SnapshotTable.diff(spark, statsRoot, "v1", "v2", "o_orderkey").count())
    val (dFullSec, dFullRows) = time(
      SnapshotTable.diff(spark, plainRoot, "v1", "v2", "o_orderkey").count())
    assert(dPrunedRows == dFullRows,
      s"diff row mismatch: $dPrunedRows vs $dFullRows")
    println(s"""{"diff":true,"files":$files,"publish_aligned_sec":$publishAligned,"diff_pruned_sec":$dPrunedSec,"diff_full_sec":$dFullSec,"diff_files_scanned":${keptOld.size + keptNew.size},"diff_rows":$dPrunedRows}""")

    // bloom skipping: point lookups on a SCATTERED secondary key (a
    // natural key the table is not clustered by) — min/max keeps every
    // file; the per-file bloom sidecar keeps ~1
    val bRoot = s"$workDir/dim_bloom"
    val natMod = 16777259L // prime > max pk: the permutation is injective
    val dimN = dim.withColumn("o_nat",
      format_string("n%09d", (col("o_orderkey") * 7919L) % natMod))
    val tb = System.nanoTime()
    SnapshotTable.publish(dimN, bRoot, "v1", retain = 2,
      statsCols = Seq("o_orderkey"), clusterFiles = Some(files),
      bloomCols = Seq("o_nat"), bloomBits = 1 << 21)
    val publishBloomSec = (System.nanoTime() - tb) / 1e9
    val natKeys = keys.map(k => f"n${(k * 7919L) % natMod}%09d")
    val (bPruneSec, bPruneRows) = time {
      natKeys.map(kk =>
        SnapshotTable.pointLookup(spark, bRoot, "o_nat", kk).get.count()).sum
    }
    val bKept = SnapshotTable
      .pointLookup(spark, bRoot, "o_nat", natKeys.head).get.inputFiles.length
    val (bFullSec, bFullRows) = time {
      natKeys.map(kk => SnapshotTable.read(spark, bRoot).get
        .filter(col("o_nat") === kk).count()).sum
    }
    assert(bPruneRows == bFullRows,
      s"bloom lookup row mismatch: $bPruneRows vs $bFullRows")
    println(s"""{"bloom":true,"files":$files,"publish_bloom_sec":$publishBloomSec,"nat_pruned_sec":$bPruneSec,"nat_full_sec":$bFullSec,"nat_kept_files":$bKept,"nat_rows":$bPruneRows}""")
    spark.stop()
  }
}
