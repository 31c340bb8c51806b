package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A minimal versioned-snapshot TABLE FORMAT — the engine's stand-in for
  * Delta/Iceberg dim-table maintenance in this zero-egress environment
  * (BASELINE names Delta Lake as the production approach; no delta jar
  * exists here, so the format's three load-bearing guarantees are
  * implemented directly over parquet + an atomic marker file):
  *
  *  - ATOMIC PUBLISH: a version is a complete parquet directory
  *    `<root>/v<n>`. Writers never write that path directly — data and
  *    sidecars go to a writer-unique staging directory
  *    (`.stage_v<n>_<nonce>`), and the commit atomically renames it to
  *    `<root>/v<n>` and moves the `_LATEST` marker onto it (write-temp +
  *    ATOMIC_MOVE — readers see the old version or the new one, never a
  *    torn one). A writer crash before the rename leaves an invisible
  *    staging directory (GC'd by the retention sweep once the head
  *    passes it); a replayed batch of a committed version short-circuits
  *    (idempotent replay).
  *  - READER ISOLATION: a reader resolves `_LATEST` once and then reads a
  *    version directory that no concurrent publish mutates (publishes go
  *    to NEW directories). Retention keeps the previous `retain − 1`
  *    versions on disk, so a reader holding yesterday's resolution keeps
  *    working through a publish — and `readVersion` gives bounded time
  *    travel over the retained window.
  *  - RETENTION: versions beyond `retain` are pruned oldest-first
  *    (numeric `v<n>` order), bounding storage like Delta VACUUM.
  *
  * FILE-LEVEL DATA SKIPPING (the Delta/Iceberg stats half): [[publish]]
  * can record per-file min/max for chosen columns into a `_STATS` file
  * inside the version directory (written BEFORE the marker move, so a
  * published version always has its stats). [[readPruned]] /
  * [[pointLookup]] consult the stats and hand Spark only the files whose
  * [min, max] intersects the predicate — a dim point-lookup (the
  * reference reads one HBase row by pk, `RT/utils/DimUtil.java:22-27`)
  * touches ONE file of a pk-clustered snapshot instead of scanning the
  * table. Skipping composes with, not replaces, parquet row-group
  * pruning: at 100 TB the win is in the task LIST (a 10k-file dim scan
  * becomes a 1-file task), before any scan is scheduled. Stats cover
  * integral, floating and string columns; other types mark the file
  * non-prunable on that column (kept, never wrongly skipped).
  *
  * MULTI-WRITER CONCURRENCY (optimistic, Delta-style): every write path
  * captures the head version its content DERIVED from (the published
  * `_LATEST` at read time — `None` for an empty table) and commits with
  * a compare-and-swap: under a per-root lock (JVM monitor + an OS file
  * lock on `._COMMITLOCK`, so two processes on a shared filesystem
  * arbitrate too), the marker moves only if the head still equals that
  * base. A writer that lost the race gets a [[SnapshotConflictException]]
  * — never a lost update: the winner's committed version stays readable
  * and the loser's data directory stays invisible (the marker never
  * moved onto it). The loser retries by re-reading the new head and
  * re-deriving with a version id past it (see `SnapshotTableSpec`'s
  * two-writer case). Replay is still idempotent: a replay re-captures
  * `base` at call entry, so it commits with base == head and passes.
  *
  * Version-id CONTENTION is safe (not just detected): because every
  * writer stages under a unique nonce, two writers racing to the SAME
  * `v<n>` — the natural head+1 both CAS losers are told to retry with —
  * can never stomp each other's data files. The winner's staging
  * directory is renamed whole under the lock; the loser's is deleted at
  * its failed CAS. The committed version's content is exactly one
  * writer's output, always (Delta's unique-data-file-names +
  * put-if-absent-commit discipline, at directory granularity).
  *
  * Reference semantic anchor: the Phoenix dim upsert
  * (`RT/app/function/DimSinkFunction.java:22-76`) — [[upsert]] is its
  * keep-latest merge, published as a snapshot version.
  */
object SnapshotTable {

  /** Roots already warned about a legacy (pre-family-tag) `_BLOOM`
    * sidecar — the bypass is logged once per table, not per lookup.
    */
  private val legacyBloomWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Per-root commit monitors — same-JVM writers serialize here; the
    * `._COMMITLOCK` file lock inside extends the exclusion to writers in
    * other processes on a shared filesystem.
    */
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Test seam: runs before a commit takes the per-root lock, with
    * (root, version). The two-writer spec uses it to interleave a full
    * competing write at the exact moment the CAS must catch — production
    * code never sets it.
    */
  private[graft] var onBeforeCommit: (String, String) => Unit = (_, _) => ()

  /** One canonical spelling per table root for the same-JVM monitor key
    * and the lock-file path: two writers addressing one table via
    * different spellings (trailing slash, relative path, symlink) must
    * land on the SAME monitor, or the second `FileChannel.lock` on the
    * shared `._COMMITLOCK` throws OverlappingFileLockException instead
    * of serializing. `toRealPath` resolves symlinks once the directory
    * exists; before it does (first publish creates it) the normalized
    * absolute path is the best available key.
    */
  private def canonicalRoot(root: String): String = {
    val p = java.nio.file.Paths.get(root).toAbsolutePath.normalize
    try p.toRealPath().toString
    catch { case _: java.io.IOException => p.toString }
  }

  /** Per-root exclusive section for COMPOSITE formats built on snapshot
    * tables (e.g. the LSM index's segment manifest): the same JVM
    * monitor + OS file lock as version commits, so a manifest
    * read-modify-write serializes against every writer of the same root
    * across processes — the lost-update class [[finishCommit]]'s CAS
    * refuses one level down.
    */
  private[graft] def withRootLock[T](root: String)(f: => T): T =
    withCommitLock[T](root)(f)

  private def withCommitLock[T](root: String)(f: => T): T = {
    val canon = canonicalRoot(root)
    val monitor = commitLocks.computeIfAbsent(canon, _ => new Object)
    monitor.synchronized {
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(canon, "._COMMITLOCK"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try { val l = ch.lock(); try f finally l.release() }
      finally ch.close()
    }
  }

  /** Unique per-attempt staging directory for `version` under `root`.
    * Every writer writes its data and sidecars HERE — invisible to
    * readers and to competing writers — and the commit (under the
    * per-root lock, after the CAS base check) atomically renames the
    * staging directory to `$root/$version`. Unique attempt names are
    * what make the version id safe to contend for: two writers that
    * both target head+1 can no longer stomp each other's files with
    * mode-overwrite, because neither ever writes to the shared path;
    * the CAS loser's staging directory is deleted, the winner's is
    * renamed (the Delta discipline — unique data-file names plus
    * put-if-absent commits — applied at directory granularity).
    */
  private def stagePath(root: String, version: String): String =
    s"$root/.stage_${version}_${java.util.UUID.randomUUID().toString.take(8)}"

  /** Run a staged write: `body` receives the staging path and must end
    * in a commit that renames it away. ANY failure — a write error, a
    * stats pass, a CAS conflict — deletes the stage on the way out, so
    * a failed attempt never leaks a data-sized orphan (each retry would
    * otherwise stage under a fresh nonce and accumulate copies that the
    * sweep can't reclaim on tables whose head never passes the version,
    * e.g. the LSM segment roots that only ever publish v1).
    */
  private def withStage[T](root: String, version: String)(
      body: String => T): T = {
    val stage = stagePath(root, version)
    try body(stage)
    catch {
      case e: Throwable =>
        rmTree(new java.io.File(stage)) // idempotent if already cleaned
        throw e
    }
  }

  private def rmTree(f: java.io.File): Unit =
    graft.operators.SnapshotDiff.rmTree(f.getPath)

  /** Write `df` as version `version` (must be `v<digits>`) under `root`
    * and atomically publish it as latest; prune beyond `retain`.
    *
    * `statsCols` turns on per-file min/max stats for those columns.
    * `clusterFiles = Some(n)` range-partitions the write by the FIRST
    * stats column into n files — skipping only pays when the key is
    * clustered across files (random placement gives every file the full
    * key range and nothing prunes). `bloomCols` additionally records a
    * per-file Bloom filter sidecar for those columns (`bloomBits` bits
    * per file, ≈ 10 per distinct value for ~1% false keeps) — what lets
    * [[pointLookup]] prune on a column the table is NOT clustered by.
    */
  def publish(df: DataFrame, root: String, version: String, retain: Int = 2,
      statsCols: Seq[String] = Nil, clusterFiles: Option[Int] = None,
      bloomCols: Seq[String] = Nil, bloomBits: Int = 1 << 17,
      rowFingerprints: Boolean = true): Unit = {
    val head = latestVersion(root)
    // replay short-circuit (merge's discipline, generalized to every
    // public publish entry): re-publishing the committed head would
    // mode-overwrite the LIVE directory — deleting its files under
    // concurrent readers mid-air — to reproduce content the at-least-once
    // replay contract already guarantees is there. Versions are immutable
    // once committed; a caller wanting DIFFERENT content under the head's
    // id is violating the version discipline, not replaying.
    if (head.contains(version)) return
    publishFrom(df, root, version, head, retain, statsCols,
      clusterFiles, bloomCols, bloomBits, rowFingerprints)
  }

  /** [[publish]] with an explicit CAS base: the head version this write's
    * content derived from (`None` = derived from an empty table). The
    * public overload captures the head at entry; internal callers that
    * READ the table earlier (merge, compact, upsert) pass the head they
    * actually read, so a competing commit in between conflicts instead of
    * being silently overwritten.
    */
  private[sources] def publishFrom(df: DataFrame, root: String,
      version: String, base: Option[String], retain: Int,
      statsCols: Seq[String] = Nil, clusterFiles: Option[Int] = None,
      bloomCols: Seq[String] = Nil, bloomBits: Int = 1 << 17,
      rowFingerprints: Boolean = true): Unit = {
    require(version.matches("v\\d+"), s"version must be v<digits>, got $version")
    require(clusterFiles.isEmpty || statsCols.nonEmpty,
      "clusterFiles requires at least one stats column to cluster by")
    require(bloomCols.isEmpty || statsCols.nonEmpty,
      "bloomCols requires stats (pointLookup prunes by range first)")
    // a clustered publish evaluates `df` TWICE (repartitionByRange's
    // boundary-sampling pass, then the write) — cache an uncached input
    // for the publish's duration so arbitrary caller plans (the additive
    // folds' join output, merge's fallback rewrite) compute once
    val cacheIn = clusterFiles.isDefined &&
      df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val in = if (cacheIn) df.persist() else df
    try {
      val out = clusterFiles match {
        // sortWithinPartitions tightens parquet ROW-GROUP min/max inside
        // each file — at 100 TB a file holds many row groups, and sorted
        // data lets the parquet reader prune within the files the
        // file-level stats kept (no extra shuffle; a per-partition sort
        // rides the exchange's output)
        case Some(n) => in.repartitionByRange(n, col(statsCols.head))
          .sortWithinPartitions(col(statsCols.head))
        case None => in
      }
      withStage(root, version) { stage =>
        graft.Trace(s"publish:write $root $version") {
          out.write.mode("overwrite").parquet(stage) }
        commitVersion(df.sparkSession, root, version, retain, statsCols,
          bloomCols, bloomBits, base, stage, rowFingerprints)
      }
    } finally { if (cacheIn) { in.unpersist(blocking = false); () } }
  }

  /** Z-ORDER clustered publish: multi-column data skipping. Linear
    * clustering ([[publish]] with `clusterFiles`) prunes on the lead
    * stats column only — a predicate on the SECOND key still touches
    * every file, because each file spans that column's full range. Here
    * each file covers a small hyper-rectangle of the key space instead
    * (the Delta `OPTIMIZE ZORDER BY` semantics), so a selective
    * predicate on ANY z column prunes to ~n^((d-1)/d) of n files rather
    * than all of them.
    *
    * Mechanics — all metadata-light, no single-task stage anywhere:
    *   1. each z column is rank-bucketed into 2^`bits` EXACT quantile
    *      buckets via [[graft.operators.Ranks.distNtileScores]] (all
    *      columns share ONE range exchange). Rank-, not value-space:
    *      skewed keys still spread evenly across files, which linear
    *      value binning (Delta's synthetic range_partition_id) also
    *      does — and strings ride a monotonic 7-byte big-endian
    *      surrogate, which only shapes clustering, never pruning
    *      correctness (stats are computed from the real values);
    *   2. bucket bits interleave into one z value (column i claims bit
    *      positions j·d+i); a second exact ntile cuts the z order into
    *      `nFiles` equal-count runs and pinned hashing gives each run its
    *      own file — contiguous z runs = aligned key-space tiles, and the
    *      layout is a pure function of the data (no boundary sampling);
    *   3. per-file min/max stats on every z column feed the same
    *      [[readPruned]]/[[pointLookup]] path as linear clustering.
    *
    * `pk` must be unique per row (the rank tiebreaker — dim tables have
    * one by construction). `bits` caps at 62/d so the z value fits a
    * long; 8 bits/column resolves 256 tiles per dimension, far past any
    * realistic per-table file count.
    */
  def publishZOrdered(df: DataFrame, root: String, version: String,
      pk: String, zCols: Seq[String], nFiles: Int, retain: Int = 2,
      bits: Int = 8, bloomCols: Seq[String] = Nil,
      bloomBits: Int = 1 << 17): Unit = {
    val head = latestVersion(root)
    if (head.contains(version)) return // committed-head replay (see publish)
    publishZOrderedFrom(df, root, version, head, pk, zCols,
      nFiles, retain, bits, bloomCols, bloomBits)
  }

  /** [[publishZOrdered]] with an explicit CAS base — see [[publishFrom]]. */
  private[sources] def publishZOrderedFrom(df: DataFrame, root: String,
      version: String, base: Option[String], pk: String, zCols: Seq[String],
      nFiles: Int, retain: Int = 2, bits: Int = 8,
      bloomCols: Seq[String] = Nil, bloomBits: Int = 1 << 17): Unit = {
    require(version.matches("v\\d+"), s"version must be v<digits>, got $version")
    require(zCols.size >= 2, "z-ordering needs >= 2 columns (use clusterFiles for 1)")
    require(zCols.size * bits <= 62, s"${zCols.size} cols x $bits bits overflows a long")
    val d = zCols.size
    val specs = zCols.zipWithIndex.map { case (c, i) =>
      graft.operators.Ranks.NtileSpec(s"__zb_$i",
        zSurrogate(df, c), asc = true)
    }
    val buckets = graft.operators.Ranks.distNtileScores(df, pk, 1 << bits, specs)
    val z = (for { j <- 0 until bits; i <- 0 until d } yield
      shiftleft(shiftright((col(s"__zb_$i") - 1).cast("long"), j)
        .bitwiseAND(lit(1L)), j * d + i))
      .reduce(_ bitwiseOR _)
    // file id = EXACT ntile of z (equal row counts, adapts to the joint
    // key density — correlated z columns concentrate mass on the curve's
    // diagonal, and equal-count tiling still yields equal files there),
    // placed by pinned hash. A repartitionByRange here would re-SAMPLE
    // file boundaries every run (RangePartitioner's seed rides the RDD
    // id), smearing tiles across files differently per session; exact
    // ranks + pinned placement make the layout a pure function of the
    // data, so pruning selectivity is reproducible.
    val fileOf = graft.operators.Ranks.distNtileScores(
      buckets.withColumn("__z", z), pk, nFiles,
      Seq(graft.operators.Ranks.NtileSpec("__file", col("__z"), asc = true,
        carryAs = Some("__z"))))
    withStage(root, version) { stage =>
      df.join(fileOf, pk)
        .withColumn("__pin",
          element_at(typedLit(partitionPins(nFiles)), col("__file")))
        .repartition(nFiles, col("__pin"))
        // z-sorted within each file: row groups inherit tight rectangles
        // too (same row-group rationale as the linear publish)
        .sortWithinPartitions(col("__z"), col(pk))
        .drop("__z", "__file", "__pin")
        .write.mode("overwrite").parquet(stage)
      commitVersion(df.sparkSession, root, version, retain, zCols,
        bloomCols, bloomBits, base, stage)
    }
  }

  /** For each target partition p < n, the smallest non-negative int whose
    * Murmur3 hash (seed 42 — what `repartition(n, col)`'s HashPartitioning
    * applies) lands on p: routing each file id through its pin gives every
    * tile its own output partition deterministically, with no sampling.
    * Coupon-collector cost, ~n·ln(n) driver-side hashes.
    */
  private def partitionPins(n: Int): Array[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    val pins = new Array[Int](n)
    val found = new Array[Boolean](n)
    var i = 0
    var remaining = n
    while (remaining > 0) {
      val h = Murmur3Hash(Seq(Literal(i)), 42).eval().asInstanceOf[Int]
      val p = ((h % n) + n) % n
      if (!found(p)) { found(p) = true; pins(p) = i; remaining -= 1 }
      i += 1
    }
    pins
  }

  /** Publish with EXPLICIT file boundaries on `key` — the diff-friendly
    * clustering. [[publish]]'s range clustering re-derives count-balanced
    * boundaries per version, so a single inserted row shifts the content
    * of every later file and a version diff must rescan the table even
    * when almost nothing changed. Pinning the cutpoints to VALUES
    * (typically [[keyBoundaries]] of the previous version) keeps every
    * untouched key region byte-identical across publishes, which is what
    * lets [[diffFiles]] fingerprint-skip its files. Rows past the last
    * cutpoint (monotonically growing keys) land in the last file; a
    * region that accumulates rows makes its file fat — when drift
    * accumulates, re-balance with [[compact]] (boundaries re-derive and
    * the next diff pays one full rescan: the standard cluster-maintenance
    * trade). File `i` holds rows with `boundaries(i-1) <= key <
    * boundaries(i)` (file 0 everything below, nulls included).
    */
  def publishAligned(df: DataFrame, root: String, version: String,
      key: String, boundaries: Seq[Any], retain: Int = 2,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
      bloomBits: Int = 1 << 17): Unit = {
    require(version.matches("v\\d+"), s"version must be v<digits>, got $version")
    require(boundaries.nonEmpty, "publishAligned needs at least one cutpoint")
    val base = latestVersion(root)
    if (base.contains(version)) return // committed-head replay (see publish)
    val n = boundaries.size + 1
    val fileId = tileId(df.sparkSession, col(key), boundaries,
      Some(df.schema(key).dataType))
    withStage(root, version) { stage =>
      df.withColumn("__pin",
          element_at(typedLit(partitionPins(n)), fileId + 1))
        .repartition(n, col("__pin"))
        .sortWithinPartitions(col(key))
        .drop("__pin")
        .write.mode("overwrite").parquet(stage)
      commitVersion(df.sparkSession, root, version, retain,
        if (statsCols.nonEmpty) statsCols else Seq(key), bloomCols, bloomBits,
        base, stage)
    }
  }

  /** File/tile id of `key` against value cutpoints — the count of
    * boundaries at or below the key, as one codegen'd binary-search
    * kernel ([[graft.expressions.SearchSorted]]): O(log files) per row
    * with a constant-depth plan. The per-boundary `when(...)` fold this
    * replaces was O(files) per row and overflowed the analyzer's stack
    * at the 4096-tile layouts a 100x corpus publishes.
    */
  private def tileId(spark: SparkSession, key: Column,
      boundaries: Seq[Any], keyType: Option[org.apache.spark.sql.types.DataType] = None): Column = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType, FloatType, DoubleType, StringType}
    if (boundaries.isEmpty) return lit(0)
    val longs = boundaries.collect {
      case b: Byte => b.toLong
      case s: Short => s.toLong
      case i: Int => i.toLong
      case l: Long => l
    }
    // the kernel compares within one type family; coerce the CUTPOINTS to
    // the key column's family when they differ (a double key with integer
    // cutpoints is publishAligned's public Seq[Any] contract — the legacy
    // when-fold coerced via lit(), the kernel must not regress it). Only
    // the lossless direction lifts (integral cutpoints -> double); a
    // LONG key with double cutpoints falls through to the fold, since
    // casting either side could move a boundary across a key value.
    val wantFamily: Option[Char] = keyType.collect {
      case ByteType | ShortType | IntegerType | LongType => 'L'
      case FloatType | DoubleType => 'D'
      case StringType => 'S'
    }
    // keyType ABSENT (internal callers — boundaries decoded from the
    // key's own stats, families match by construction) keeps the kernel;
    // keyType PRESENT but outside the kernel's three families (decimal,
    // date, timestamp — publishAligned's public Seq[Any] surface) must
    // fall to the coercing fold, not reach the kernel's type check
    val familyKnown = keyType.isEmpty || wantFamily.isDefined
    val arr =
      if (!familyKnown) None
      else if (longs.size == boundaries.size && wantFamily.contains('D'))
        Some(typedLit(longs.map(_.toDouble).toArray))
      else if (longs.size == boundaries.size && !wantFamily.contains('S'))
        Some(typedLit(longs.toArray))
      else if (boundaries.forall(b =>
        b.isInstanceOf[Double] || b.isInstanceOf[Float]) &&
        !wantFamily.exists(f => f == 'L' || f == 'S'))
        Some(typedLit(boundaries.map {
          case d: Double => d
          case f: Float => f.toDouble
        }.toArray))
      else if (boundaries.forall(_.isInstanceOf[String]) &&
        !wantFamily.exists(f => f == 'L' || f == 'D'))
        Some(typedLit(boundaries.map(_.asInstanceOf[String]).toArray))
      else None
    arr match {
      case Some(a) =>
        graft.expressions.SearchSorted.register(spark)
        call_function("search_sorted", key, a)
      case None =>
        // types outside the kernel's families (date/timestamp/decimal
        // cutpoints, mixed numerics — publishAligned's public Seq[Any]
        // contract) keep the legacy per-boundary fold: correct via
        // lit() coercion, O(boundaries) per row with the documented
        // ~2-4k depth ceiling — every layout THIS library derives
        // (keyBoundaries decodes long/double/string) takes the kernel
        boundaries.map(b => when(key >= lit(b), 1).otherwise(0))
          .reduce(_ + _)
    }
  }

  /** The interior cutpoints of a published version's file layout on
    * `key`, derived from the per-file min stats — metadata only, no scan.
    * Feed these to [[publishAligned]] to publish the NEXT version on the
    * same grid. None when the version has no stats on `key`.
    */
  def keyBoundaries(root: String, version: String,
      key: String): Option[Seq[Any]] =
    readStatsVersion(root, version).flatMap { stats =>
      val mins = stats.flatMap(fs => fs.mins.get(key).flatMap(decode))
      if (mins.size != stats.size) None
      else Some(sortAnys(mins).drop(1))
    }

  private def decode(encoded: String): Option[Any] = encoded.take(2) match {
    case "L:" => Some(encoded.drop(2).toLong)
    case "D:" => Some(encoded.drop(2).toDouble)
    case "S:" => Some(new String(
      java.util.Base64.getDecoder.decode(encoded.drop(2)), "UTF-8"))
    case _ => None
  }

  private def sortAnys(vs: Seq[Any]): Seq[Any] = vs.sortWith {
    case (a: Long, b: Long) => a < b
    case (a: Double, b: Double) => a < b
    case (a: String, b: String) => a < b
    case _ => false
  }

  /** MERGE INTO analog (Delta `whenMatched update / whenNotMatched
    * insert`, plus an optional matched-delete predicate): apply `updates`
    * (keyed by `pk`, same schema as the table) to the CURRENT version and
    * publish the result as `version`, rewriting ONLY the tiles that
    * receive changes. Matched rows are replaced by their update row
    * (or removed when `deleteWhen` holds on the update row); unmatched
    * update rows insert. A NULL `deleteWhen` result means NOT deleted
    * (the SQL MERGE `WHEN MATCHED AND <cond>` contract: an unknown
    * condition does not fire the delete clause) — the row applies as a
    * normal update/insert.
    *
    * 100 TB shape — the whole point of a table-format merge: cost is
    * proportional to the CHANGED data, not the table.
    *   - update rows map to tiles against the current version's
    *     boundaries (broadcast cutpoints, map-only);
    *   - only those tiles are read, merged (AQE broadcasts the batch's
    *     key set when it is actually small) and rewritten, one file per
    *     changed tile;
    *   - every untouched file is carried into the new version by copy —
    *     the local stand-in for a manifest re-reference — and its
    *     `_STATS` line (min/max, count, fingerprint) is reused VERBATIM,
    *     so stats cost is also changed-tiles-only. Carried-over
    *     fingerprints are what let a subsequent [[diff]] skip the same
    *     untouched tiles.
    * Rows past the last boundary merge into the last tile (growing keys
    * fatten it; re-balance with [[compact]], as with [[publishAligned]]).
    * The tile path requires the current version to carry pk stats AND a
    * range-DISJOINT file layout on pk (verified from the stats on the
    * driver — a hash-partitioned table would scatter a key's old row
    * outside the rewritten tile and duplicate it); anything else falls
    * back to a full rewrite published with pk stats, clustered when
    * `clusterFiles` is set (which is also how the first publish and the
    * fallback BOOTSTRAP the tile regime for later batches).
    *
    * DIVERGENCE vs Delta `MERGE INTO` (the interop checklist for a user
    * arriving from Delta — semantic deltas, not missing plumbing):
    *   - MATCHED UPDATE is whole-row replacement: Delta's
    *     `UPDATE SET col = expr` (partial column updates referencing
    *     both source and target) is expressed here by pre-joining the
    *     update frame against [[read]] to build full rows first.
    *   - One update clause + one optional delete predicate, and
    *     `deleteWhen` sees the UPDATE row's columns only; Delta allows
    *     N ordered `WHEN MATCHED [AND cond]` clauses whose conditions
    *     reference source AND target. NULL-condition behavior matches
    *     (unknown does not fire the clause — both follow SQL MERGE).
    *   - DUPLICATE source keys are NOT detected: Delta throws
    *     `MERGE_CARDINALITY_VIOLATION` when two source rows match one
    *     target row; here both rows land (the matched row is removed
    *     once, both updates insert) and the table ends with a duplicate
    *     pk. Dedup first ([[upsert]] is the keep-latest form).
    *   - No `WHEN NOT MATCHED BY SOURCE` clause (Delta can delete target
    *     rows absent from the source); full-table deletes go through a
    *     filtered [[publish]].
    *   - No automatic schema evolution on merge (Delta merges with
    *     `mergeSchema`); [[merge]] requires the exact table schema,
    *     [[upsert]] widens.
    */
  /** `knownChangedTiles`: (version, tile-id set) a caller already
    * computed for EXACTLY this update key set via
    * [[readMatchingTilesWithSet]]; used (and the discovery job skipped)
    * only when the tagged version is the head this merge reads.
    */
  /** `extraStatsCols`: value columns recorded in the per-file stats
    * BESIDE the pk from the FIRST publish on (later merges carry the
    * header forward automatically) — what lets a maintained table's
    * invariant checks (non-negative counts, magnitude bounds) and
    * value-band pruning run on metadata instead of a read-back job.
    */
  def merge(updates: DataFrame, root: String, pk: String, version: String,
      deleteWhen: Option[Column] = None, retain: Int = 2,
      clusterFiles: Option[Int] = None,
      rowFingerprints: Boolean = true,
      knownChangedTiles: Option[(String, Set[Int])] = None,
      extraStatsCols: Seq[String] = Nil): Unit = {
    require(version.matches("v\\d+"), s"version must be v<digits>, got $version")
    val spark = updates.sparkSession
    val vOld = latestVersion(root) match {
      case None =>
        // first publish: nothing to match, inserts only; CAS base None =
        // the empty table this merge derived from
        return publishFrom(
          deleteWhen.foldLeft(updates)((u, d) =>
            u.filter(!coalesce(d, lit(false)))),
          root, version, None, retain, (Seq(pk) ++ extraStatsCols).distinct,
          clusterFiles, rowFingerprints = rowFingerprints)
      // REPLAYED batch (foreachBatch at-least-once): the marker moves
      // LAST, so a committed `version` means the batch fully applied —
      // re-applying a merge to its own output would overwrite the very
      // files the carry step copies from. Skip; the table already holds
      // the batch (merge is idempotent in content, so skipping IS the
      // identical republish). A crash BEFORE the marker move leaves the
      // marker on the previous version and the normal path below cleans
      // the partial directory up.
      case Some(v) if v == version => return ()
      case Some(v) =>
        require(version.drop(1).toLong > v.drop(1).toLong,
          s"merge version must advance the published $v, got $version")
        v
    }
    val current = readVersion(spark, root, vOld)
    require(updates.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      current.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      "merge updates must match the table schema (names and types); " +
        s"updates=${updates.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")} " +
        s"table=${current.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")}")
    // three consumers read the update set (tile discovery, the matched-key
    // anti join, the insert union) — persist it for the merge's duration
    // rather than re-evaluating an arbitrary source frame three times
    val ups = updates.persist()
    try mergeInto(ups, root, pk, version, vOld, current, deleteWhen, retain,
      clusterFiles, rowFingerprints,
      knownChangedTiles.collect { case (v, t) if v == vOld => t },
      extraStatsCols)
    finally { ups.unpersist(blocking = false); () }
  }

  private def mergeInto(updates: DataFrame, root: String, pk: String,
      version: String, vOld: String, current: DataFrame,
      deleteWhen: Option[Column], retain: Int,
      clusterFiles: Option[Int], rowFingerprints: Boolean = true,
      knownChangedTiles: Option[Set[Int]] = None,
      extraStatsCols: Seq[String] = Nil): Unit = {
    val spark = updates.sparkSession
    // null predicate = not-deleted (SQL MERGE semantics), not delete:
    // filter(!d) alone would drop null-condition rows
    val inserts = deleteWhen.foldLeft(updates)((u, d) =>
      u.filter(!coalesce(d, lit(false))))
    val stats = readStatsVersion(root, vOld)
    val bounds = keyBoundaries(root, vOld, pk)
    (stats, bounds) match {
      case (Some(st), Some(bs)) if bs.nonEmpty && rangeDisjoint(st, pk) =>
        // tile id of each update row against the broadcast cutpoints
        val tile = tileId(spark, col(pk), bs)
        val changed = knownChangedTiles.getOrElse(
          graft.Trace(s"merge:tiles $root $version") {
            updates.select(tile.as("__tile")).distinct()
              .collect().map(_.getInt(0)).toSet })
        // file order by min(pk) IS tile order (how keyBoundaries derives)
        val filesByTile = filesInTileOrder(st, pk)
        val (chFiles, keepFiles) = filesByTile.zipWithIndex
          .partition { case (_, i) => changed(i) }
        withStage(root, version) { dir =>
        if (chFiles.isEmpty) {
          // no-op merge: clone the version (copies + verbatim sidecars)
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
          copyFiles(root, vOld, dir, filesByTile)
          writeStatsLines(dir, statsHeader(root, vOld),
            statsLines(root, vOld, filesByTile.toSet))
          bloomLines(root, vOld, filesByTile.toSet).foreach {
            case (bits, ls) => writeBloomLines(dir, bits, ls)
          }
        } else {
          val oldChanged = spark.read.schema(current.schema)
            .parquet(chFiles.map { case (f, _) => s"$root/$vOld/$f" }: _*)
          val denseIx = chFiles.map(_._2).zipWithIndex.toMap
          val tileToDense = element_at(
            typedLit(filesByTile.indices.map(i =>
              denseIx.getOrElse(i, -1)).toArray), tile + 1)
          // no broadcast hint: AQE converts to a broadcast join at
          // runtime when the batch's key set is actually small, and a
          // table-scale update set (SnapshotDiff.merged passes one)
          // stays a shuffle join instead of OOMing the driver
          // USING-join semantics move the pk to column 0; restore the
          // table's order or the NEXT merge's schema check rejects its
          // own output (only visible on tables whose pk is not already
          // the first column — every dim was, the inverted index isn't)
          val merged = oldChanged
            .join(updates.select(col(pk)), Seq(pk), "left_anti")
            .unionByName(inserts)
            .select(current.columns.map(col).toIndexedSeq: _*)
          graft.Trace(s"merge:write $root $version") { merged
            .withColumn("__pin", element_at(
              typedLit(partitionPins(chFiles.size)), tileToDense + 1))
            .repartition(chFiles.size, col("__pin"))
            .sortWithinPartitions(col(pk))
            .drop("__pin")
            .write.mode("overwrite").parquet(dir) }
          val newFiles = Option(new java.io.File(dir).listFiles())
            .getOrElse(Array.empty)
            .filter(f => f.isFile && f.getName.endsWith(".parquet"))
            .map(_.getName).toSeq
          copyFiles(root, vOld, dir, keepFiles.map(_._1))
          val cols = statsHeader(root, vOld)
          writeStatsLines(dir, cols,
            statsLines(root, vOld, keepFiles.map(_._1).toSet) ++
              computeStatsLines(spark, dir, newFiles, cols, rowFingerprints))
          // bloom sidecar rides along: carried files keep their filters,
          // fresh tiles get new ones with the same columns and sizing
          bloomLines(root, vOld, keepFiles.map(_._1).toSet).foreach {
            case (bits, kept) =>
              val bcols = readBlooms(root, vOld).get.cols.toSeq.sorted
              writeBloomLines(dir, bits,
                kept ++ computeBloomLines(spark, dir, newFiles, bcols, bits))
          }
        }
        finishCommit(root, version, retain, Some(vOld), Some(dir))
        }
      case _ =>
        // same pk-to-front USING-join reorder as the tile path — restore
        val merged = current
          .join(updates.select(col(pk)), Seq(pk), "left_anti")
          .unionByName(inserts)
          .select(current.columns.map(col).toIndexedSeq: _*)
        // full-rewrite fallback: carry the previous version's bloom
        // sidecar columns/sizing forward — a table published with a
        // `_BLOOM` must not silently lose its secondary-key pruning
        // after one non-tile-mergeable batch
        val (bcols, bbits) = readBlooms(root, vOld)
          .map(bl => (bl.cols.toSeq.sorted, bl.bits))
          .getOrElse((Nil, 1 << 17))
        // preserve the table's existing stats header on the fallback
        // rewrite — a one-off non-tile-mergeable batch must not silently
        // drop the extra stats columns later guards/prunes rely on
        val fbCols = readStatsVersion(root, vOld) match {
          case Some(_) => statsHeader(root, vOld)
          case None => (Seq(pk) ++ extraStatsCols).distinct
        }
        publishFrom(merged, root, version, Some(vOld), retain, fbCols,
          clusterFiles, bcols, bbits, rowFingerprints)
    }
  }

  /** Data files of a version in TILE order — ascending min(pk) from the
    * stats, the order [[keyBoundaries]]' cutpoints index into (shared by
    * merge's changed-tile rewrite and [[readMatchingTiles]]).
    */
  private def filesInTileOrder(st: Seq[FileStats], pk: String): IndexedSeq[String] =
    st.sortBy(fs => fs.mins.get(pk).flatMap(decode) match {
      case Some(l: Long) => (0, l, 0.0, "")
      case Some(d: Double) => (1, 0L, d, "")
      case Some(s: String) => (2, 0L, 0.0, s)
      case _ => (3, 0L, 0.0, "")
    }).map(_.file).toIndexedSeq

  /** The rows of `version` living in files whose `pk` range could hold a
    * value of `keys`' `pk` column — the READ-side twin of merge's
    * changed-tile discovery, for consumers that need the current rows of
    * a batch-sized key set without scanning the table (e.g. the additive
    * streaming folds: old count + delta for the batch's keys only). Any
    * row of `version` whose `pk` appears in `keys` is guaranteed
    * included (same cutpoint math as the merge that placed it); rows in
    * untouched tiles are pruned. Falls back to the full version read
    * when stats are absent or the layout is not range-disjoint on `pk`.
    * The key→tile assignment is one metadata-scale action over `keys`
    * (assumed batch-sized — the same contract as merge's update set).
    */
  def readMatchingTiles(spark: SparkSession, root: String, version: String,
      pk: String, keys: DataFrame): DataFrame =
    readMatchingTilesWithSet(spark, root, version, pk, keys)._1

  /** [[readMatchingTiles]] that also exposes the tile-id set it computed
    * (None on the stats-less fallback). A caller that immediately
    * [[merge]]s the SAME key set against the SAME version can hand the
    * set back (`knownChangedTiles`) and spare merge its own identical
    * key→tile discovery job — the additive-fold commit pattern.
    */
  private[graft] def readMatchingTilesWithSet(spark: SparkSession,
      root: String, version: String, pk: String,
      keys: DataFrame): (DataFrame, Option[Set[Int]]) = {
    val stats = readStatsVersion(root, version)
    val bounds = keyBoundaries(root, version, pk)
    (stats, bounds) match {
      case (Some(st), Some(bs)) if bs.nonEmpty && rangeDisjoint(st, pk) =>
        val hit = graft.Trace(s"read:tiles $root $version") {
          keys.select(tileId(spark, col(pk), bs).as("__tile"))
            .distinct().collect().map(_.getInt(0)).toSet }
        val files = filesInTileOrder(st, pk).zipWithIndex
          .collect { case (f, i) if hit(i) => s"$root/$version/$f" }
        val full = readVersion(spark, root, version)
        if (files.isEmpty) (full.limit(0), Some(hit))
        else (spark.read.schema(full.schema).parquet(files.toSeq: _*),
          Some(hit))
      case _ => (readVersion(spark, root, version), None)
    }
  }

  /** Driver-side twin of [[readMatchingTilesWithSet]] for a key set that
    * is ALREADY on the driver (bounded by the caller's batch-scale
    * contract — the same bound readMatchingTiles' key collect assumes):
    * the tile-id set comes from a binary search of the version's boundary
    * cutpoints, so the key→tile discovery costs ZERO Spark jobs. Returns
    * the pruned frame plus the hit set; None when the version lacks
    * stats/boundaries, the layout is not range-disjoint on `pk`, or a key
    * falls outside the cutpoints' type family — callers then run the
    * distributed discovery exactly as before. Tile semantics match
    * [[tileId]]'s kernel bit for bit: id = count of boundaries at or
    * below the key; nulls land in tile 0.
    */
  private[graft] def readMatchingTilesLocal(spark: SparkSession,
      root: String, version: String, pk: String,
      keys: Iterable[Any]): Option[(DataFrame, Set[Int])] = {
    val stats = readStatsVersion(root, version)
    val bounds = keyBoundaries(root, version, pk)
    (stats, bounds) match {
      case (Some(st), Some(bs)) if bs.nonEmpty && rangeDisjoint(st, pk) =>
        val hit = tileIdsLocal(bs, keys)
        hit.map { h =>
          val files = filesInTileOrder(st, pk).zipWithIndex
            .collect { case (f, i) if h(i) => s"$root/$version/$f" }
          val full = readVersion(spark, root, version)
          (if (files.isEmpty) full.limit(0)
           else spark.read.schema(full.schema).parquet(files.toSeq: _*), h)
        }
      case _ => None
    }
  }

  /** Tile ids of driver-side keys against sorted cutpoints — the scalar
    * mirror of [[tileId]] (count of boundaries `<=` key, one comparison
    * family at a time). None when any key is outside the boundaries' type
    * family (the caller must fall back — guessing a coercion here could
    * diverge from the codegen kernel's).
    */
  private def tileIdsLocal(bs: Seq[Any], keys: Iterable[Any]): Option[Set[Int]] = {
    def upperBound[T](a: Array[T], k: T)(implicit ord: Ordering[T]): Int = {
      var lo = 0; var hi = a.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (ord.lteq(a(m), k)) lo = m + 1 else hi = m
      }
      lo
    }
    bs.head match {
      case _: Long if bs.forall(_.isInstanceOf[Long]) &&
          keys.forall(k => k == null || k.isInstanceOf[Long] ||
            k.isInstanceOf[Int]) =>
        val a = bs.map(_.asInstanceOf[Long]).toArray
        Some(keys.iterator.map {
          case null => 0
          case i: Int => upperBound(a, i.toLong)
          case l => upperBound(a, l.asInstanceOf[Long])
        }.toSet)
      case _: String if bs.forall(_.isInstanceOf[String]) &&
          keys.forall(k => k == null || k.isInstanceOf[String]) =>
        // compare as UTF-8 bytes, unsigned — the ordering Spark's
        // UTF8String `>=` applies (Java String.compareTo diverges on
        // code points above 0x7F, which would mis-assign tiles)
        implicit val utf8Ord: Ordering[Array[Byte]] = (x, y) => {
          var i = 0
          var c = 0
          val n = math.min(x.length, y.length)
          while (i < n && c == 0) {
            c = (x(i) & 0xff).compare(y(i) & 0xff)
            i += 1
          }
          if (c != 0) c else x.length.compare(y.length)
        }
        val a = bs.map(_.asInstanceOf[String].getBytes("UTF-8")).toArray
        Some(keys.iterator.map {
          case null => 0
          case s => upperBound(a, s.asInstanceOf[String].getBytes("UTF-8"))
        }.toSet)
      case _ => None
    }
  }

  /** Whether a [[merge]] into `root`'s version `v` would take the
    * tile-local path on `pk`: stats present, boundaries derivable, and
    * the file layout range-disjoint. Callers choosing between merge and
    * a cheaper full-rewrite strategy (e.g. the CDC dim sink) should gate
    * on this — a non-tile-mergeable table (hash layout, or z-order whose
    * per-file pk ranges overlap) would otherwise pay merge's fallback
    * full rewrite PLUS a stats pass every batch.
    */
  def tileMergeable(root: String, version: String, pk: String): Boolean =
    readStatsVersion(root, version).exists(st =>
      keyBoundaries(root, version, pk).exists(_.nonEmpty) &&
        rangeDisjoint(st, pk))

  /** True when the per-file [min, max] ranges on `key` are strictly
    * disjoint in min-order — the layout property the tile-local merge
    * path depends on (with a unique pk, equal adjacent boundaries would
    * mean one value in two files, so strict comparison is exact). Any
    * undecodable value fails safe.
    */
  private def rangeDisjoint(stats: Seq[FileStats], key: String): Boolean = {
    val ranges = stats.map(fs => (fs.mins.get(key).flatMap(decode),
      fs.maxs.get(key).flatMap(decode)))
    if (ranges.exists(r => r._1.isEmpty || r._2.isEmpty)) false
    else {
      val sorted = ranges.map(r => (r._1.get, r._2.get))
        .sortWith((a, b) => lessThan(a._1, b._1))
      sorted.zip(sorted.drop(1)).forall { case ((_, aMax), (bMin, _)) =>
        lessThan(aMax, bMin)
      }
    }
  }

  private def lessThan(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: Double, y: Double) => x < y
    case (x: String, y: String) => x < y
    case _ => false
  }

  private def copyFiles(root: String, vFrom: String, dstDir: String,
      files: Seq[String]): Unit =
    files.foreach { f =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$root/$vFrom/$f"),
        java.nio.file.Paths.get(s"$dstDir/$f"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

  private def statsHeader(root: String, version: String): Seq[String] = {
    val p = java.nio.file.Paths.get(s"$root/$version/_STATS")
    java.nio.file.Files.readString(p).split("\n").head.split("\t").toSeq
  }

  /** Raw `_STATS` body lines of a version, restricted to `files`. */
  private def statsLines(root: String, version: String,
      files: Set[String]): Seq[String] = {
    val p = java.nio.file.Paths.get(s"$root/$version/_STATS")
    java.nio.file.Files.readString(p).split("\n").toSeq.drop(1)
      .filter(l => l.nonEmpty && files(l.split("\t").head))
  }

  private def writeStatsLines(dir: String, cols: Seq[String],
      lines: Seq[String]): Unit = {
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_STATS"),
      cols.mkString("\t") + "\n" + lines.sorted.mkString("\n") + "\n")
    ()
  }

  // ---- Bloom-filter file skipping (the `_BLOOM` sidecar) -------------
  //
  // Per-(file, column) Bloom filters let a POINT lookup skip files on a
  // column the table is not clustered by — a secondary/natural key whose
  // min/max spans every file. k = 4 bit positions per value from seeded
  // 64-bit hashes; `bits` is caller-sized (≈ 10 bits per distinct value
  // per file for ~1% false keeps). Building is one pass over the written
  // files: positions explode (4 rows/value/column), partial bit_or
  // combines map-side to at most files x bits/64 words (each task reads
  // one file, so per-task state is one file's words). The driver then
  // assembles words per (column, file) — bounded by files x bits/64
  // longs, the same metadata scale as `_STATS` — and writes the sidecar
  // before the marker move. False positives only KEEP files (never skip
  // a file containing the value); a column or file absent from the
  // sidecar is kept.

  private val BloomSeeds = 1 to 4

  /** `fams` records each column's canonical hash family as written by
    * the build ("L" integral, "D" floating, "S" string) — what lets a
    * probe detect a cross-class value and bypass the filter instead of
    * hashing in the wrong domain. Columns from sidecars written before
    * the family tag are absent (probes then fall back to the value's
    * runtime class).
    */
  final case class Blooms(bits: Int, cols: Set[String],
      words: Map[(String, String), Array[Long]],
      fams: Map[String, String] = Map.empty) {
    def mayContain(column: String, file: String, value: Any): Boolean =
      words.get((column, file)) match {
        case None => true // no filter for this pair: must keep
        case Some(ws) => BloomSeeds.forall { s =>
          val pos = ((bloomHash(value, s) % bits) + bits) % bits
          (ws(pos.toInt >> 6) >> (pos.toInt & 63) & 1L) == 1L
        }
      }
  }

  /** Driver-side twin of the build's `xxhash64(col, lit(seed))`. The
    * build canonicalizes integral columns to long and float to double
    * ([[computeBloomLines]]); the probe widens the same way so both
    * sides hash the same domain regardless of runtime width.
    */
  private def bloomHash(value: Any, seed: Int): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val v = value match {
      case i: Int => Literal(i.toLong)
      case s: Short => Literal(s.toLong)
      case b: Byte => Literal(b.toLong)
      case f: Float => Literal(f.toDouble)
      case other => Literal(other)
    }
    XxHash64(Seq(v, Literal(seed)), 42L).eval().asInstanceOf[Long]
  }

  /** The probe value for a bloom lookup against a column whose sidecar
    * family tag is `family` ("L" integral, "D" floating, "S" string) —
    * None when the probe's type CLASS differs from the column's. Range
    * pruning fails safe on an incomparable probe (keeps the file), but
    * a bloom probe hashed in the wrong domain matches no filter and
    * would wrongly SKIP every file even though the row filter could
    * still coerce-match — so a cross-class probe must bypass the bloom
    * entirely, and same-class probes normalize to the build's canonical
    * width before hashing.
    */
  private def bloomProbe(family: String, value: Any): Option[Any] =
    (family, value) match {
      case ("L", v: Long) => Some(v)
      case ("L", v: Int) => Some(v.toLong)
      case ("L", v: Short) => Some(v.toLong)
      case ("L", v: Byte) => Some(v.toLong)
      case ("D", v: Double) => Some(v)
      case ("D", v: Float) => Some(v.toDouble)
      case ("S", v: String) => Some(v)
      case _ => None
    }

  /** A column's canonical hash family tag for the sidecar. */
  private def bloomFamily(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => "L"
      case FloatType | DoubleType => "D"
      case StringType => "S"
      case _ => "O"
    }
  }

  private def writeBlooms(spark: SparkSession, dir: String,
      cols: Seq[String], bits: Int): Unit = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).toSeq
    writeBloomLines(dir, bits, computeBloomLines(spark, dir, files, cols, bits))
  }

  private def writeBloomLines(dir: String, bits: Int,
      lines: Seq[String]): Unit = {
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_BLOOM"),
      s"bits=$bits\n" + lines.sorted.mkString("\n") + "\n")
    ()
  }

  // parsed-sidecar memo: a version directory is immutable once published,
  // so its parsed filters can be reused across lookups (a dim point-read
  // path does thousands; re-parsing a multi-MB sidecar per lookup would
  // eat the pruning win). Entries carry the sidecar's mtime: a deleted-
  // and-republished root reusing the same version id (the rm-then-rerun
  // pattern harness queries follow) gets a fresh parse instead of stale
  // filters that would silently mis-skip. Small LRU — entries are the
  // sidecar's size.
  private val bloomCache =
    new java.util.LinkedHashMap[String, (Long, Option[Blooms])](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (Long, Option[Blooms])]): Boolean =
        size > 4
    }

  /** The `_BLOOM` sidecar of a version, if present (parsed once per
    * distinct sidecar file — keyed by path + modification time).
    */
  def readBlooms(root: String, version: String): Option[Blooms] =
    bloomCache.synchronized {
      val k = s"$root/$version"
      val p = java.nio.file.Paths.get(s"$k/_BLOOM")
      val mtime =
        if (java.nio.file.Files.exists(p))
          java.nio.file.Files.getLastModifiedTime(p).toMillis
        else -1L
      val hit = bloomCache.get(k)
      if (hit != null && hit._1 == mtime) hit._2
      else {
        val parsed = parseBlooms(root, version)
        bloomCache.put(k, (mtime, parsed))
        parsed
      }
    }

  private def parseBlooms(root: String, version: String): Option[Blooms] = {
    val p = java.nio.file.Paths.get(s"$root/$version/_BLOOM")
    if (!java.nio.file.Files.exists(p)) None
    else {
      val lines = java.nio.file.Files.readString(p).split("\n").toSeq
      val bits = lines.head.stripPrefix("bits=").toInt
      val parsed = lines.tail.filter(_.nonEmpty).map { l =>
        val parts = l.split("\t", 4)
        val (c, f, b64) = (parts(0), parts(1), parts(2))
        val fam = if (parts.length >= 4) Some(parts(3)) else None
        val bb = java.nio.ByteBuffer.wrap(java.util.Base64.getDecoder.decode(b64))
        val ws = new Array[Long](bits >> 6)
        var i = 0
        while (i < ws.length) { ws(i) = bb.getLong(); i += 1 }
        ((c, f) -> ws, fam.map(c -> _))
      }
      val entries = parsed.map(_._1)
      Some(Blooms(bits, entries.map(_._1._1).toSet, entries.toMap,
        parsed.flatMap(_._2).toMap))
    }
  }

  /** Raw `_BLOOM` body lines of a version restricted to `files`, with the
    * sidecar's bits — Nil when no sidecar exists.
    */
  private def bloomLines(root: String, version: String,
      files: Set[String]): Option[(Int, Seq[String])] = {
    val p = java.nio.file.Paths.get(s"$root/$version/_BLOOM")
    if (!java.nio.file.Files.exists(p)) None
    else {
      val lines = java.nio.file.Files.readString(p).split("\n").toSeq
      Some((lines.head.stripPrefix("bits=").toInt,
        lines.tail.filter(l => l.nonEmpty && files(l.split("\t")(1)))))
    }
  }

  /** Per-(column, file) bloom lines for just `files` of a version dir. */
  private def computeBloomLines(spark: SparkSession, dir: String,
      files: Seq[String], cols: Seq[String], bits: Int): Seq[String] = {
    require(bits > 0 && (bits & (bits - 1)) == 0, "bloomBits must be a power of two")
    if (files.isEmpty) Nil
    else {
      val df = spark.read.parquet(files.map(f => s"$dir/$f"): _*)
      val perCol = cols.flatMap { c =>
        // canonical hash domains (mirrors `encode`'s stats families):
        // every integral width hashes as long, float as double, so a
        // probe of any width in the same class agrees with the build
        val v = df.schema(c).dataType match {
          case org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.IntegerType => col(c).cast("long")
          case org.apache.spark.sql.types.FloatType => col(c).cast("double")
          case _ => col(c)
        }
        BloomSeeds.map { s =>
          df.select(input_file_name().as("__file"), lit(c).as("__col"),
            pmod(xxhash64(v, lit(s)), lit(bits.toLong)).as("__pos"))
        }
      }.reduce(_ unionAll _)
      val rows = perCol
        .groupBy(col("__file"), col("__col"),
          (col("__pos") / 64).cast("int").as("__word"))
        .agg(expr("bit_or(shiftleft(1L, CAST(pmod(__pos, 64) AS INT)))").as("__bits"))
        .collect()
      val fams = cols.map(c => c -> bloomFamily(df.schema(c).dataType)).toMap
      rows.groupBy(r => (r.getString(1), r.getString(0).split('/').last))
        .toSeq.map { case ((c, f), rs) =>
          val ws = new Array[Long](bits >> 6)
          rs.foreach(r => ws(r.getInt(2)) = r.getLong(3))
          val bb = java.nio.ByteBuffer.allocate(ws.length * 8)
          ws.foreach(bb.putLong)
          s"$c\t$f\t" + java.util.Base64.getEncoder.encodeToString(bb.array()) +
            s"\t${fams(c)}"
        }
    }
  }

  /** OPTIMIZE-style maintenance: rewrite the CURRENT version as new
    * version `version`, clustered — the compaction pass a streaming dim
    * sink needs after many small upserts have fragmented the table (each
    * [[upsert]] writes task-count files; a point lookup on a fragmented
    * table keeps many small files no matter how good the stats are).
    * Data is byte-identical by construction (same rows, new layout +
    * fresh stats), the rewrite publishes through the same atomic marker
    * move as any version — readers see the old layout or the new one,
    * never a half-compacted state — and retention ages the fragmented
    * version out. With `zOrderPk` set (and ≥ 2 statsCols) the rewrite
    * z-orders; otherwise it range-clusters by the lead stats column, or
    * just bin-packs to `targetFiles` when no stats are wanted.
    *
    * `version` is the CALLER's to choose because this format has one
    * publisher per table root: a streaming dim sink names versions by
    * batch id, so maintenance must run through the same sequence (e.g.
    * a dedicated micro-batch, or between stream incarnations using the
    * next unused id) — an auto-picked latest+1 would collide with the
    * next batch's own version and overwrite the directory the merge is
    * reading. Returns the new version id, or None when nothing is
    * published to compact.
    */
  def compact(spark: SparkSession, root: String, version: String,
      targetFiles: Int, statsCols: Seq[String] = Nil,
      zOrderPk: Option[String] = None, retain: Int = 2): Option[String] =
    latestVersion(root).map { v =>
      require(version.matches("v\\d+") && version.drop(1).toLong > v.drop(1).toLong,
        s"compaction version must be v<digits> after the published $v, got $version")
      val df = readVersion(spark, root, v)
      // a compaction is a layout rewrite, not a capability change: the
      // previous version's bloom sidecar columns/sizing carry forward
      // (fresh filters are rebuilt for the new files)
      val (bcols, bbits) = readBlooms(root, v)
        .map(bl => (bl.cols.toSeq.sorted, bl.bits))
        .getOrElse((Nil, 1 << 17))
      zOrderPk match {
        case Some(pk) =>
          require(statsCols.size >= 2, "z-order compaction needs >= 2 statsCols")
          publishZOrderedFrom(df, root, version, Some(v), pk, statsCols,
            targetFiles, retain, bloomCols = bcols, bloomBits = bbits)
        case None if statsCols.nonEmpty =>
          publishFrom(df, root, version, Some(v), retain, statsCols,
            Some(targetFiles), bcols, bbits)
        case None =>
          require(bcols.isEmpty,
            "compacting away stats would orphan the bloom sidecar " +
              "(pointLookup prunes by range first) — pass statsCols")
          publishFrom(df.repartition(targetFiles), root, version, Some(v),
            retain)
      }
      version
    }

  /** Export the latest published version as a PLAIN parquet directory
    * plus a `_MANIFEST.json` — the open-format interop boundary: a
    * 100 TB user arrives with Delta/Iceberg, and this is the neutral
    * exchange surface both sides read. `dir` is immediately readable by
    * ANY parquet engine (`spark.read.parquet`, DuckDB `read_parquet`,
    * Delta `CONVERT TO DELTA parquet.`dir``, Iceberg's `add_files`) —
    * the manifest and `_`-prefixed sidecars are ignored by parquet
    * readers per the Hadoop hidden-file convention. Data files and the
    * `_STATS`/`_BLOOM` skipping sidecars are copied BYTE-IDENTICAL; the
    * manifest records provenance (source root, version, schema as Spark
    * schema-JSON, file list) so [[importTable]] restores the snapshot —
    * files, stats, blooms — bit-for-bit without a rewrite or a scan.
    * Returns the exported version id (None on an unpublished root).
    */
  def exportTable(spark: SparkSession, root: String,
      dir: String): Option[String] =
    latestVersion(root).map { v =>
      import java.nio.file.{Files, Paths, StandardCopyOption}
      Files.createDirectories(Paths.get(dir))
      // CRASH-SAFE re-export ordering: copy the new version's files in
      // (part names are UUID-fresh, never colliding with a previous
      // export's), swap the manifest to the new list ATOMICALLY, and
      // only then delete the previous export's stale parts. A crash at
      // any point leaves an IMPORTABLE directory: before the manifest
      // swap the old manifest still lists the old parts (all present —
      // nothing was deleted yet, and importTable skips sidecars that
      // disagree with the manifest's list); after it, the new export is
      // complete and only stale extras remain. The raw
      // `spark.read.parquet(dir)` surface is consistent except inside
      // this window — the manifest is the consistency boundary, exactly
      // as in any manifest-based table format.
      val names = Option(new java.io.File(s"$root/$v").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isFile &&
          (f.getName.endsWith(".parquet") || f.getName == "_STATS" ||
            f.getName == "_BLOOM"))
        .map(_.getName).sorted.toSeq
      names.foreach { n =>
        Files.copy(Paths.get(s"$root/$v/$n"), Paths.get(s"$dir/$n"),
          StandardCopyOption.REPLACE_EXISTING); ()
      }
      val schemaJson = readVersion(spark, root, v).schema.json
      val listed = names.filter(_.endsWith(".parquet"))
      val fileList = listed.map(n => "\"" + n + "\"").mkString("[", ",", "]")
      val tmp = Paths.get(s"$dir/._MANIFEST.json.tmp")
      Files.writeString(tmp,
        s"""{"format":"graft-snapshot-export","version":"$v",""" +
          s""""files":$fileList,"schema":$schemaJson}""")
      Files.move(tmp, Paths.get(s"$dir/_MANIFEST.json"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      // post-swap cleanup: every managed data file the NEW manifest does
      // not list is stale (a previous export's parts, including ones a
      // crashed export orphaned without any manifest)
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
          !listed.contains(f.getName))
        .foreach(f => Files.delete(f.toPath))
      v
    }

  /** The data-file list of an export directory's `_MANIFEST.json`, if
    * present and parseable. Whitespace-tolerant around the key and
    * array — the manifest is the open-interop boundary and may have
    * been regenerated by an external JSON tool.
    */
  private def manifestFiles(dir: String): Option[Seq[String]] = {
    val f = new java.io.File(s"$dir/_MANIFEST.json")
    if (!f.isFile) None
    else "\"files\"\\s*:\\s*\\[([^\\]]*)\\]".r
      .findFirstMatchIn(java.nio.file.Files.readString(f.toPath))
      .map(_.group(1).split(",").toSeq.map(_.trim)
        .filter(_.nonEmpty).map(_.stripPrefix("\"").stripSuffix("\"")))
  }

  /** Import a parquet directory as `root`'s next published version.
    *
    * Two regimes, detected from the directory:
    *   - a [[exportTable]] directory (`_MANIFEST.json` present): the
    *     manifest's data files and any `_STATS`/`_BLOOM` sidecars are
    *     copied back byte-identical and committed — a full round trip
    *     (publish → export → import) reproduces the original version's
    *     files, skipping metadata included, with no rewrite and no scan;
    *   - a FOREIGN plain-parquet table (what a Delta/Iceberg user hands
    *     over after their own export): the data is read and published
    *     through the normal path, clustered by `statsCols`/`clusterFiles`
    *     so the imported table starts life tile-mergeable rather than
    *     inheriting a foreign layout that would force full-rewrite
    *     merges.
    *
    * Commits under the same CAS as every writer — importing into a root
    * a concurrent writer advanced raises [[SnapshotConflictException]].
    */
  def importTable(spark: SparkSession, dir: String, root: String,
      version: String, retain: Int = 2, statsCols: Seq[String] = Nil,
      clusterFiles: Option[Int] = None): Unit = {
    require(version.matches("v\\d+"), s"version must be v<digits>, got $version")
    val base = latestVersion(root)
    if (base.contains(version)) return // committed-head replay (see publish)
    val manifest = new java.io.File(s"$dir/_MANIFEST.json")
    if (manifest.isFile) {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      // copy ONLY the manifest's data-file list (not whatever .parquet
      // happens to sit in the directory — a foreign or stale stray file
      // must not ride into the committed version uncovered by _STATS)
      val listed = manifestFiles(dir).getOrElse(Seq.empty)
      require(listed.nonEmpty,
        s"$dir/_MANIFEST.json: no data files listed")
      listed.foreach(n => require(new java.io.File(s"$dir/$n").isFile,
        s"$dir: manifest lists $n but the file is missing"))
      // sidecars carry over only when they AGREE with the manifest's
      // file list — a crashed re-export can leave newer sidecars beside
      // an older manifest, and stats naming files the version does not
      // contain would corrupt pruning; skipping them degrades safely to
      // an unpruned (still correct) table
      val sidecars = Seq("_STATS", "_BLOOM").filter { n =>
        val f = new java.io.File(s"$dir/$n")
        f.isFile && {
          val body = Files.readString(f.toPath)
          val mentioned = "[A-Za-z0-9._-]+\\.parquet".r
            .findAllIn(body).toSet
          mentioned.nonEmpty && mentioned.subsetOf(listed.toSet)
        }
      }
      withStage(root, version) { stage =>
        Files.createDirectories(Paths.get(stage))
        (listed ++ sidecars).foreach { n =>
          Files.copy(Paths.get(s"$dir/$n"), Paths.get(s"$stage/$n"),
            StandardCopyOption.REPLACE_EXISTING); ()
        }
        finishCommit(root, version, retain, base, Some(stage))
      }
    } else
      publishFrom(spark.read.parquet(dir), root, version, base, retain,
        statsCols, clusterFiles)
  }

  /** Long-castable monotonic projection for rank bucketing. Strings map
    * to 7 bytes as a big-endian unsigned integer (zero-padded hex so
    * shorter strings compare correctly) — UTF-8 byte order equals
    * code-point order, so the projection is order-preserving up to ties
    * past the 7 bytes, which only blur tile boundaries, never results
    * (stats are computed from the real values; pruning stays correct).
    *
    * The 7-byte window starts AFTER the column's longest common prefix:
    * a dim keyed by URL ("https://..." everywhere) would otherwise
    * collapse every value to one surrogate and z-clustering on that
    * column would silently degrade to the pk tiebreaker's order. The
    * LCP comes from min/max alone (the LCP of a sorted set's extremes
    * is the set's LCP) — one metadata-sized aggregate on the driver.
    */
  private def zSurrogate(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.StringType =>
        val row = df.agg(min(col(c)).as("lo"), max(col(c)).as("hi")).head()
        val (lo, hi) = (Option(row.getString(0)).getOrElse(""),
          Option(row.getString(1)).getOrElse(""))
        val lcp = lo.zip(hi).takeWhile { case (a, b) => a == b }.size
        conv(rpad(hex(substring(col(c), lcp + 1, 7).cast("binary")), 14, "0"),
          16, 10).cast("long")
      case _ => col(c)
    }

  /** The shared publish tail: stats before the marker (a published
    * version always has its stats), then the atomic `_LATEST` move, then
    * retention pruning.
    */
  private def commitVersion(spark: SparkSession, root: String,
      version: String, retain: Int, statsCols: Seq[String],
      bloomCols: Seq[String], bloomBits: Int,
      base: Option[String], stage: String,
      rowFingerprints: Boolean = true): Unit = {
    // sidecars are computed against the STAGING directory (file names
    // survive the commit rename unchanged — stats lines carry names, not
    // paths), so a published version still never lacks its stats
    if (statsCols.nonEmpty) writeStats(spark, stage, statsCols, rowFingerprints)
    if (bloomCols.nonEmpty) writeBlooms(spark, stage, bloomCols, bloomBits)
    finishCommit(root, version, retain, base, Some(stage))
  }

  /** The marker move + retention half of a commit (stats, if any, must
    * already be in place — a published version never lacks its stats).
    *
    * The CAS: under the per-root lock, the marker moves only if the
    * committed head still equals `base` — the head this write derived
    * from. Anything else means a competing writer committed since the
    * derivation read: throw [[SnapshotConflictException]] and leave the
    * winner's head untouched (this write's directory stays invisible).
    * Replays need no exemption: a genuine replay re-captures `base` at
    * call entry, so it commits with base == head and passes — while a
    * SECOND writer that raced to the same version id (base behind the
    * head) conflicts here instead of silently "passing" as a fake
    * replay, which would have blessed the very lost-update the CAS
    * exists to prevent (its overwrite already stomped the winner's
    * directory; the loud failure is what makes the stomp recoverable).
    */
  private def finishCommit(root: String, version: String, retain: Int,
      base: Option[String], stage: Option[String] = None): Unit = {
    onBeforeCommit(root, version)
    withCommitLock(root) {
      val head = latestVersion(root)
      if (head != base) {
        // CAS loser: its staged files never became visible — delete them
        // so a lost race leaves no orphan bytes behind
        stage.foreach(s => rmTree(new java.io.File(s)))
        throw new SnapshotConflictException(root, base, head)
      }
      // versions are immutable and the head only moves FORWARD: a commit
      // at or below the head (base == head, so the CAS passed — a caller
      // re-using a retained version's id) would rmTree committed data
      // below and move the marker backwards. Reject it loudly before any
      // destructive step; genuine replays never reach here (the
      // committed-head short-circuits return at call entry).
      head.filter(h => version.drop(1).toLong <= h.drop(1).toLong)
        .foreach { h =>
          stage.foreach(s => rmTree(new java.io.File(s)))
          throw new IllegalArgumentException(
            s"$root: commit version $version must advance the committed " +
              s"head $h — re-committing a retained version id would " +
              "destroy committed data under its readers")
        }
      stage.foreach { s =>
        val dst = java.nio.file.Paths.get(s"$root/$version")
        // an existing destination is a crash orphan (a writer that
        // renamed but died before its marker move): committed heads are
        // never re-targeted (the replay short-circuit returns before
        // staging, head == base here, and the advance check above puts
        // version STRICTLY past the head), and no competing writer can
        // be mid-write INTO dst — everyone writes to a unique stage.
        // Clear it under the lock and rename over it.
        if (java.nio.file.Files.exists(dst)) rmTree(dst.toFile)
        java.nio.file.Files.move(java.nio.file.Paths.get(s), dst,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        ()
      }
      val tmp = java.nio.file.Paths.get(s"$root/._LATEST.tmp")
      java.nio.file.Files.writeString(tmp, version)
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$root/_LATEST"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      prune(root, retain)
    }
  }

  /** The currently published version id, if any. */
  def latestVersion(root: String): Option[String] = {
    val marker = java.nio.file.Paths.get(s"$root/_LATEST")
    if (java.nio.file.Files.exists(marker))
      Some(java.nio.file.Files.readString(marker).trim)
    else None
  }

  /** Retained version directories, numerically ascending. In-flight
    * writes stage under dot-prefixed directories and never appear here;
    * the only non-committed entry possible is a crash orphan (renamed
    * but died before its marker move). Use [[latestVersion]] for the
    * committed head.
    */
  def versions(root: String): Seq[String] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName).sortBy(_.drop(1).toLong).toSeq

  /** Read the latest published snapshot (None before the first publish —
    * unpublished version directories are never visible).
    */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    latestVersion(root).map(v => readVersion(spark, root, v))

  /** Bounded time travel: read a specific retained version. */
  def readVersion(spark: SparkSession, root: String, version: String): DataFrame =
    spark.read.parquet(s"$root/$version")

  /** Per-file column stats of one published data file. Values are the
    * typed encodings of [[encode]]; `None` min/max for a column means the
    * file is non-prunable on it. `count`/`fingerprint` (row count and an
    * order-independent content fingerprint — the sum over rows of a
    * 64-bit full-row hash, carried exactly as a decimal) exist on stats
    * written since they were introduced; older `_STATS` parse with None.
    */
  final case class FileStats(file: String,
      mins: Map[String, String], maxs: Map[String, String],
      count: Option[Long] = None, fingerprint: Option[String] = None)

  /** Typed, order-preserving-per-type encoding for stats values. Strings
    * are Base64-wrapped (raw strings could contain the field separator);
    * unknown runtime types become the non-prunable marker.
    */
  private def encode(v: Any): String = v match {
    case null => "X"
    case l: Long => s"L:$l"
    case i: Int => s"L:${i.toLong}"
    case s: Short => s"L:${s.toLong}"
    case b: Byte => s"L:${b.toLong}"
    case d: Double => s"D:$d"
    case f: Float => s"D:${f.toDouble}"
    case s: String => "S:" + java.util.Base64.getEncoder
      .encodeToString(s.getBytes("UTF-8"))
    case _ => "X"
  }

  /** Compare an encoded stats value against a query value of the same
    * family. None = not comparable → caller must keep the file.
    */
  private def cmp(encoded: String, v: Any): Option[Int] = (encoded.take(2), v) match {
    case ("L:", q: Long) => Some(encoded.drop(2).toLong.compare(q))
    case ("L:", q: Int) => Some(encoded.drop(2).toLong.compare(q.toLong))
    case ("D:", q: Double) => Some(encoded.drop(2).toDouble.compare(q))
    case ("S:", q: String) =>
      Some(new String(java.util.Base64.getDecoder.decode(encoded.drop(2)),
        "UTF-8").compareTo(q))
    case _ => None
  }

  /** Build `_STATS` for a freshly written version directory: one read of
    * the written files, min/max per (file, column), collected to the
    * driver (one row per FILE — metadata-sized at any table size) and
    * written as a tab-separated typed table. Runs before the `_LATEST`
    * move, so readers never see a version without its stats.
    */
  private def writeStats(spark: SparkSession, dir: String, cols: Seq[String],
      rowFingerprints: Boolean = true): Unit =
    writeStatsLines(dir, cols,
      computeStatsLines(spark, dir, Nil, cols, rowFingerprints))

  /** Per-file stats lines for a version directory — all files when
    * `files` is empty, else just the named ones (the merge path computes
    * stats for freshly written tiles only, carrying the rest verbatim).
    */
  private def computeStatsLines(spark: SparkSession, dir: String,
      files: Seq[String], cols: Seq[String],
      rowFingerprints: Boolean = true): Seq[String] = {
    // fingerprint-free tables take the FOOTER path: per-file min/max and
    // row counts read from the parquet metadata on the driver — zero
    // Spark jobs, which on the commit-heavy streaming twins was a
    // measured ~0.2 s read-back scan per commit. Any non-whitelisted
    // type or missing chunk statistics falls back to the scan below.
    if (!rowFingerprints)
      footerStatsLines(spark, dir, files, cols) match {
        case Some(lines) => return lines
        case None => ()
      }
    val df =
      if (files.isEmpty) spark.read.parquet(dir)
      else spark.read.parquet(files.map(f => s"$dir/$f"): _*)
    // content fingerprint: sum of a full-row 64-bit hash, accumulated in
    // DECIMAL (exact, order-independent, and safe under ANSI overflow
    // checking). Only atomic columns hash — a nested type anywhere drops
    // the fingerprint for the whole version (diff then rescans, never
    // mis-skips).
    val hashable = df.schema.fields.filter(f => f.dataType match {
      case _: org.apache.spark.sql.types.ArrayType => false
      case _: org.apache.spark.sql.types.MapType => false
      case _: org.apache.spark.sql.types.StructType => false
      case _ => true
    }).map(f => col(f.name))
    val fpAggs =
      if (hashable.length == df.schema.size)
        Seq(count(lit(1)).as("__cnt"),
          sum(xxhash64(hashable.toIndexedSeq: _*).cast("decimal(38,0)")).as("__fp"))
      else Seq(count(lit(1)).as("__cnt"), first(lit(null)).as("__fp"))
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))) ++ fpAggs
    val rows = graft.Trace(s"stats:compute $dir") { df
      .groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() }
    rows.toSeq.map { r =>
      val base = r.getString(0).split('/').last
      ((base +: cols.flatMap(c => Seq(
        encode(r.get(r.fieldIndex(s"__min_$c"))),
        encode(r.get(r.fieldIndex(s"__max_$c")))))) ++ Seq(
        r.getLong(r.fieldIndex("__cnt")).toString,
        if (rowFingerprints)
          Option(r.get(r.fieldIndex("__fp"))).map(_.toString).getOrElse("X")
        else "X"))
        .mkString("\t")
    }
  }

  /** Early-bail marker for [[footerStatsLines]] — any condition the
    * footer path cannot prove exact (non-whitelisted type, missing or
    * unusable chunk statistics) routes the whole call to the scan path.
    */
  private object FooterBail extends scala.util.control.ControlThrowable

  /** Per-file stats lines from the parquet FOOTERS alone — no Spark job.
    *
    * Exactness contract (the reason for the strict whitelist): stats
    * feed correctness-relevant pruning (readMatchingTiles' guarantee,
    * keyBoundaries' tile cutpoints), so footer values must equal what
    * the scan-path `min`/`max` aggregation would produce, bit for bit.
    *  - signed INT32/INT64 (no logical annotation or signed int
    *    annotation): parquet chunk stats are exact minima/maxima;
    *  - BINARY + string annotation: parquet orders binary stats by
    *    unsigned lexicographic bytes — the SAME order as Spark SQL's
    *    UTF8String min/max (UTF-8 byte order), and parquet-mr drops
    *    chunk stats entirely past its size cap rather than truncating,
    *    so a present value is the true bound;
    *  - everything else (floats — NaN poisons footer stats; dates,
    *    decimals, unsigned ints — encoding mismatch) bails to the scan.
    * All-null columns encode as the non-prunable marker, exactly like
    * the scan path's null min/max. The fingerprint column is always
    * `X` here — callers opt into this path only for tables that never
    * use diff fingerprint skipping.
    */
  private def footerStatsLines(spark: SparkSession, dir: String,
      files0: Seq[String], cols: Seq[String]): Option[Seq[String]] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.api.Binary
    import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
    import scala.jdk.CollectionConverters._
    val names =
      if (files0.nonEmpty) files0
      else Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(_.getName).toSeq.sorted
    val conf = spark.sparkContext.hadoopConfiguration
    try {
      val lines = names.map { name =>
        val in = HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(s"$dir/$name"), conf)
        val reader = ParquetFileReader.open(in)
        try {
          val footer = reader.getFooter
          val schema = footer.getFileMetaData.getSchema
          val blocks = footer.getBlocks.asScala.toSeq
          val rowCount = blocks.map(_.getRowCount).sum
          val encodedCols = cols.flatMap { c =>
            if (!schema.containsField(c)) throw FooterBail
            val t = schema.getType(Array(c): _*)
            if (!t.isPrimitive) throw FooterBail
            val pt = t.asPrimitiveType()
            val fam: Char = pt.getPrimitiveTypeName match {
              case PrimitiveType.PrimitiveTypeName.INT32 |
                   PrimitiveType.PrimitiveTypeName.INT64 =>
                pt.getLogicalTypeAnnotation match {
                  case null => 'L'
                  case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
                    if i.isSigned => 'L'
                  case _ => throw FooterBail
                }
              case PrimitiveType.PrimitiveTypeName.BINARY =>
                pt.getLogicalTypeAnnotation match {
                  case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation => 'S'
                  case _ => throw FooterBail
                }
              case _ => throw FooterBail
            }
            var minL = 0L; var maxL = 0L
            var minB: Binary = null; var maxB: Binary = null
            var sawValue = false
            blocks.foreach { b =>
              val cc = b.getColumns.asScala
                .find(_.getPath.toDotString == c).getOrElse(throw FooterBail)
              val st = cc.getStatistics
              if (st == null || st.isEmpty) throw FooterBail
              if (st.hasNonNullValue) {
                if (fam == 'L') {
                  val mn = st.genericGetMin.asInstanceOf[Number].longValue()
                  val mx = st.genericGetMax.asInstanceOf[Number].longValue()
                  if (!sawValue || mn < minL) minL = mn
                  if (!sawValue || mx > maxL) maxL = mx
                } else {
                  val mn = st.genericGetMin.asInstanceOf[Binary]
                  val mx = st.genericGetMax.asInstanceOf[Binary]
                  if (minB == null || mn.compareTo(minB) < 0) minB = mn
                  if (maxB == null || mx.compareTo(maxB) > 0) maxB = mx
                }
                sawValue = true
              } else if (!st.isNumNullsSet ||
                  st.getNumNulls != cc.getValueCount) throw FooterBail
            }
            if (!sawValue) Seq("X", "X") // all-null: non-prunable marker
            else if (fam == 'L') Seq(encode(minL), encode(maxL))
            else Seq(
              encode(new String(minB.getBytes, "UTF-8")),
              encode(new String(maxB.getBytes, "UTF-8")))
          }
          ((name +: encodedCols) ++ Seq(rowCount.toString, "X"))
            .mkString("\t")
        } finally reader.close()
      }
      Some(lines)
    } catch {
      case FooterBail => None
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Min over all files of `version`'s decoded LONG min-stat on `col` —
    * None when stats are absent or any file's value is not a decodable
    * long (callers then fall back to a scan-based check).
    */
  def statsMinLong(root: String, version: String,
      column: String): Option[Long] =
    readStatsVersion(root, version).flatMap { sts =>
      val vals = sts.map(_.mins.get(column).flatMap(decode))
      if (vals.isEmpty || vals.exists(v => !v.exists(_.isInstanceOf[Long])))
        None
      else Some(vals.map(_.get.asInstanceOf[Long]).min)
    }

  /** Max over all files of |min|/|max| decoded LONG stats on `col` —
    * the metadata form of a magnitude-bound guard. None as above.
    */
  def statsMaxAbsLong(root: String, version: String,
      column: String): Option[Long] =
    readStatsVersion(root, version).flatMap { sts =>
      val vals = sts.flatMap(fs =>
        Seq(fs.mins.get(column).flatMap(decode),
          fs.maxs.get(column).flatMap(decode)))
      if (vals.isEmpty || vals.exists(v => !v.exists(_.isInstanceOf[Long])))
        None
      else Some(vals.map(v => math.abs(v.get.asInstanceOf[Long])).max)
    }

  /** The published version's per-file stats, if recorded. */
  def readStats(root: String): Option[Seq[FileStats]] =
    latestVersion(root).flatMap(v => readStatsVersion(root, v))

  /** Per-file stats of a specific retained version, if recorded. */
  def readStatsVersion(root: String, version: String): Option[Seq[FileStats]] = {
    val p = java.nio.file.Paths.get(s"$root/$version/_STATS")
    if (!java.nio.file.Files.exists(p)) None
    else {
      val lines = java.nio.file.Files.readString(p).split("\n").toSeq
      val cols = lines.head.split("\t").toSeq
      Some(lines.tail.filter(_.nonEmpty).map { line =>
        val f = line.split("\t")
        val tail = f.drop(1 + 2 * cols.size)
        FileStats(f(0),
          cols.zipWithIndex.map { case (c, i) => c -> f(1 + 2 * i) }.toMap,
          cols.zipWithIndex.map { case (c, i) => c -> f(2 + 2 * i) }.toMap,
          tail.headOption.map(_.toLong),
          tail.lift(1).filter(_ != "X"))
      })
    }
  }

  /** Files of `stats` whose [min, max] on `column` intersects
    * [lower, upper]; files without comparable stats are kept (pruning may
    * only skip PROVABLY irrelevant files).
    */
  private def keptByRange(stats: Seq[FileStats], column: String,
      lower: Any, upper: Any): Seq[FileStats] =
    stats.filter { fs =>
      val below = fs.maxs.get(column).flatMap(cmp(_, lower)).exists(_ < 0)
      val above = fs.mins.get(column).flatMap(cmp(_, upper)).exists(_ > 0)
      !(below || above)
    }

  /** The COMPLEMENT prune: files that can hold a row OUTSIDE
    * [lower, upper] — i.e. skip only files whose stats prove every row
    * lies inside the band. The active-set discovery read of a residual
    * table (PLANS.md "incremental residual-push"): tiles whose |r| is
    * provably under the push threshold never load. Falls back to the
    * full version when stats are missing; files with missing min/max on
    * `column` are conservatively KEPT (non-prunable). Like
    * [[readPrunedVersion]], the result is file-granular — callers still
    * apply the row predicate.
    */
  def readOutsideRange(spark: SparkSession, root: String, version: String,
      column: String, lower: Any, upper: Any): DataFrame =
    readOutsideRangeWithTiles(spark, root, version, column, lower, upper,
      column)._1

  /** [[readOutsideRange]] that also reports WHICH tiles (file indices in
    * `pk`'s tile order) survived the complement prune — a caller that
    * later merges rows discovered here can fold the set into merge's
    * `knownChangedTiles` hint instead of re-running discovery. The set is
    * None when stats are absent or the layout is not range-disjoint on
    * `pk` (the frame is then the conservative full/kept read as before).
    */
  private[graft] def readOutsideRangeWithTiles(spark: SparkSession,
      root: String, version: String, column: String, lower: Any, upper: Any,
      pk: String): (DataFrame, Option[Set[Int]]) =
    readStatsVersion(root, version) match {
      case Some(stats) =>
        val kept = stats.filterNot { fs =>
          val minIn = fs.mins.get(column).flatMap(cmp(_, lower)).exists(_ >= 0)
          val maxIn = fs.maxs.get(column).flatMap(cmp(_, upper)).exists(_ <= 0)
          minIn && maxIn
        }.map(_.file)
        val tiles =
          if (rangeDisjoint(stats, pk)) {
            val keptSet = kept.toSet
            Some(filesInTileOrder(stats, pk).zipWithIndex
              .collect { case (f, i) if keptSet(f) => i }.toSet)
          } else None
        (readFiles(spark, root, version, kept), tiles)
      case None => (readVersion(spark, root, version), None)
    }

  /** The MULTI-RANGE prune: files whose [min, max] on `column` intersects
    * ANY of `ranges` — the "all out-edges of a batch's touched sources"
    * read the incremental residual-push wrapper needs (PLANS.md): each
    * touched source contributes one key-prefix range, and a table
    * clustered by that key loads only the tiles holding those sources'
    * rows. String-typed because the one consumer probes string sort keys;
    * files with missing/other-typed stats are conservatively KEPT.
    *
    * Driver cost: ranges sort once (the caller's range list is
    * batch-scale by contract — the same bound as [[readMatchingTiles]]'
    * key-to-tile collect), then each file binary-searches the sorted
    * lowers with a prefix-max over uppers: files·log(ranges), metadata
    * work at any table size. Like every pruned read, the result is
    * file-granular — callers still apply the row predicate.
    */
  def readPrunedRanges(spark: SparkSession, root: String, version: String,
      column: String, ranges: Seq[(String, String)]): DataFrame =
    if (ranges.isEmpty) // zero ranges hold zero rows, with or without stats
      readVersion(spark, root, version).filter(lit(false))
    else readStatsVersion(root, version) match {
      case Some(stats) =>
        val sorted = ranges.sortBy(_._1)
        val los = sorted.map(_._1).toArray
        // prefMaxHi(j) = max upper among sorted(0..j) — lets the
        // "any range with lo <= fmax has hi >= fmin" test run on the
        // binary-searched prefix in O(1)
        val prefMaxHi = sorted.map(_._2)
          .scanLeft("")((m, h) => if (h > m) h else m).drop(1).toArray
        val kept = stats.filter { fs =>
          (fs.mins.get(column).flatMap(decode),
            fs.maxs.get(column).flatMap(decode)) match {
            case (Some(fmin: String), Some(fmax: String)) =>
              var lo = 0; var hi = los.length - 1; var j = -1
              while (lo <= hi) {
                val m = (lo + hi) >>> 1
                if (los(m) <= fmax) { j = m; lo = m + 1 } else hi = m - 1
              }
              j >= 0 && prefMaxHi(j) >= fmin
            case _ => true // non-prunable stats: keep (pruning may only
              // skip PROVABLY irrelevant files)
          }
        }
        readFiles(spark, root, version, kept.map(_.file))
      case None => readVersion(spark, root, version)
    }

  /** A frame over exactly `files` of version `v` (schema-preserving empty
    * frame when none survive pruning).
    */
  private def readFiles(spark: SparkSession, root: String, v: String,
      files: Seq[String]): DataFrame =
    if (files.isEmpty) readVersion(spark, root, v).filter(lit(false))
    else spark.read.parquet(files.map(f => s"$root/$v/$f"): _*)

  /** Read the latest snapshot restricted to files whose [min, max] on
    * `column` intersects [lower, upper] (inclusive). Falls back to the
    * full scan when no stats exist. The returned frame is NOT yet
    * filtered — skipping is file-granular; callers apply their row
    * predicate as usual.
    */
  def readPruned(spark: SparkSession, root: String, column: String,
      lower: Any, upper: Any): Option[DataFrame] =
    latestVersion(root).map(v =>
      readPrunedVersion(spark, root, v, column, lower, upper))

  /** [[readPruned]] against an explicit version — consumers that read a
    * table several ways inside one derivation pin every read to ONE
    * captured head instead of re-resolving `_LATEST` per call (a
    * concurrent writer's commit between calls would otherwise mix
    * versions within a single result).
    */
  def readPrunedVersion(spark: SparkSession, root: String, version: String,
      column: String, lower: Any, upper: Any): DataFrame =
    readStatsVersion(root, version) match {
      case Some(stats) => readFiles(spark, root, version,
        keptByRange(stats, column, lower, upper).map(_.file))
      case None => readVersion(spark, root, version)
    }

  /** Dim point-lookup (reference: `RT/utils/DimUtil.java:22-27`, one
    * HBase row by pk): stats-pruned scan + the pk filter — one file's
    * worth of IO on a pk-clustered snapshot. When the version carries a
    * `_BLOOM` sidecar for `pkCol` ([[publish]]'s `bloomCols`), files
    * whose filter excludes the value are also skipped — that is what
    * prunes equality lookups on a column the table is NOT clustered by
    * (a secondary/natural key), where min/max spans everything.
    */
  def pointLookup(spark: SparkSession, root: String, pkCol: String,
      value: Any): Option[DataFrame] =
    latestVersion(root).map { v =>
      val frame = readStatsVersion(root, v) match {
        case Some(stats) =>
          val ranged = keptByRange(stats, pkCol, value, value).map(_.file)
          val kept = readBlooms(root, v) match {
            case Some(bl) if bl.cols.contains(pkCol) =>
              // normalize the probe against the column's sidecar family
              // first: a cross-class probe (e.g. a String against a
              // long column) bypasses the bloom — false keeps are safe,
              // wrong-domain hashing that skips everything is not.
              // A tagged "O" (other-typed) column bypasses outright —
              // no canonical probe domain exists. Sidecars written
              // before the family tag bypass too: inferring the family
              // from the PROBE's runtime class would reintroduce the
              // wrong-domain skip for exactly the cross-class probes the
              // tag exists to catch (the build's family is unknowable
              // from a legacy sidecar, and bypass only ever KEEPS files).
              // The legacy bypass is correctness-safe but a silent
              // pruning regression for pre-tag tables — surface it once
              // per root so the operator knows a republish restores it.
              val family = bl.fams.get(pkCol)
              if (family.isEmpty && legacyBloomWarned.add(root))
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"$root: _BLOOM sidecar predates the type-family tag; " +
                    "bloom pruning is bypassed (range pruning still " +
                    "applies). Republish the table to regain it.")
              family.flatMap(bloomProbe(_, value)) match {
                case Some(p) => ranged.filter(f => bl.mayContain(pkCol, f, p))
                case None => ranged
              }
            case _ => ranged
          }
          readFiles(spark, root, v, kept)
        case None => readVersion(spark, root, v)
      }
      frame.filter(col(pkCol) === lit(value))
    }

  /** CHANGE DATA FEED between two retained versions (the Delta
    * `table_changes` / Iceberg incremental-read analog): every row that
    * is in `vNew` but not `vOld` (`insert`), in `vOld` but not `vNew`
    * (`delete`), or present in both with different content
    * (`update_preimage` + `update_postimage` — both images, the Delta CDF
    * contract). Rows are identified by `pk` (must be unique and non-null
    * per version); sameness is a 64-bit full-row hash.
    *
    * 100 TB shape: the naive version diff is two full scans plus a
    * table-sized shuffle. When both versions carry per-file count +
    * content fingerprints in `_STATS` ([[publish]] has recorded them
    * since fingerprints were introduced), [[diffFiles]] first matches
    * identical files pair-wise ON THE DRIVER — same min/max, row count
    * and fingerprint — and the scan reads only the UNMATCHED files on
    * each side. A clustered table whose changes concentrate in a few
    * tiles (the common dim-update pattern) diffs by scanning just those
    * tiles; the deterministic layout ([[publishZOrdered]], and
    * [[publish]]'s range clustering for stable key populations) is what
    * makes tile boundaries line up between versions so untouched tiles
    * fingerprint-match. Missing or incomparable stats on either side fall
    * back to the full diff — skipping is an optimization, never a
    * correctness dependence (up to the 64-bit fingerprint, the same
    * confidence bar as the row-sameness hash).
    */
  def diff(spark: SparkSession, root: String, vOld: String, vNew: String,
      pk: String): DataFrame = {
    val oldDf = readVersion(spark, root, vOld)
    val newDf = readVersion(spark, root, vNew)
    require(oldDf.schema == newDf.schema,
      s"diff requires identical schemas; $vOld vs $vNew differ")
    val kept = diffFiles(root, vOld, vNew)
    def side(df: DataFrame, version: String, files: Option[Seq[String]]) =
      files match {
        case Some(Nil) => df.filter(lit(false))
        case Some(fs) => spark.read.schema(df.schema)
          .parquet(fs.map(f => s"$root/$version/$f"): _*)
        case None => df
      }
    val dataCols = oldDf.columns.toSeq.map(col)
    def keyed(df: DataFrame, h: String, row: String) =
      df.select(col(pk).as("__pk"),
        xxhash64(dataCols: _*).as(h), struct(dataCols: _*).as(row))
    val j = graft.CacheRegistry.persist(
      keyed(side(oldDf, vOld, kept.map(_._1)), "__oh", "__orow")
        .join(keyed(side(newDf, vNew, kept.map(_._2)), "__nh", "__nrow"),
          Seq("__pk"), "full_outer"))
    val changed = j.filter(col("__oh").isNotNull && col("__nh").isNotNull &&
      col("__oh") =!= col("__nh"))
    Seq(
      j.filter(col("__oh").isNull)
        .select(col("__nrow.*")).withColumn("_change_type", lit("insert")),
      j.filter(col("__nh").isNull)
        .select(col("__orow.*")).withColumn("_change_type", lit("delete")),
      changed.select(col("__orow.*"))
        .withColumn("_change_type", lit("update_preimage")),
      changed.select(col("__nrow.*"))
        .withColumn("_change_type", lit("update_postimage")))
      .reduce(_ unionByName _)
  }

  /** The driver-side file-matching half of [[diff]]: the UNMATCHED files
    * of each version (old, new), or None when either side lacks complete
    * count+fingerprint stats (→ full diff). Matching is multiset-exact:
    * a (mins, maxs, count, fingerprint) key pairs one old file with one
    * new file per occurrence.
    */
  private[graft] def diffFiles(root: String, vOld: String,
      vNew: String): Option[(Seq[String], Seq[String])] = {
    def key(fs: FileStats): Option[(Map[String, String], Map[String, String],
        Long, String)] =
      for { c <- fs.count; f <- fs.fingerprint } yield (fs.mins, fs.maxs, c, f)
    for {
      so <- readStatsVersion(root, vOld)
      sn <- readStatsVersion(root, vNew)
      if so.forall(key(_).isDefined) && sn.forall(key(_).isDefined)
    } yield {
      def unmatched(mine: Seq[FileStats], other: Seq[FileStats]) = {
        val budget = scala.collection.mutable.Map.empty[Any, Int]
        other.foreach { fs =>
          budget.updateWith(key(fs).get)(n => Some(n.getOrElse(0) + 1)); ()
        }
        mine.filter { fs =>
          val k = key(fs).get
          if (budget.getOrElse(k, 0) > 0) { budget(k) -= 1; false } else true
        }.map(_.file)
      }
      (unmatched(so, sn), unmatched(sn, so))
    }
  }

  /** Keep-latest upsert: merge `updates` over the current snapshot by
    * `pk` (update rows win; schema may widen — existing rows null-fill
    * new columns) and publish the result as `version`. The merge reads
    * the PUBLISHED version only, so a replayed batch reproduces the
    * identical new version.
    */
  def upsert(updates: DataFrame, root: String, pk: String, version: String,
      retain: Int = 2, statsCols: Seq[String] = Nil,
      clusterFiles: Option[Int] = None): Unit = {
    val base = latestVersion(root)
    // committed-head replay short-circuit (the publish/merge/import
    // discipline, which upsert previously lacked — it relied on
    // re-overwriting the live directory): a keep-latest merge of the
    // same updates over the same base is idempotent in content, so
    // skipping IS the identical republish, without re-running the merge
    // or racing the commit's head-advance invariant
    if (base.contains(version)) return
    val merged = base.map(readVersion(updates.sparkSession, root, _)) match {
      case Some(existing) =>
        val w = Window.partitionBy(col(pk)).orderBy(col("_prio").desc)
        updates.withColumn("_prio", lit(1))
          .unionByName(existing.withColumn("_prio", lit(0)), allowMissingColumns = true)
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .drop("_prio", "_rn")
      case None => updates
    }
    publishFrom(merged, root, version, base, retain, statsCols, clusterFiles)
  }

  /** Delete retained-window stragglers: keep the newest `retain` version
    * directories by numeric order, remove the rest. Never touches the
    * published version.
    */
  private def prune(root: String, retain: Int): Unit = {
    val head = latestVersion(root)
    val keep = head.toSet
    val dir = new java.io.File(root)
    val versions = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .sortBy(f => -f.getName.drop(1).toLong)
    versions.drop(math.max(retain, 1)).filterNot(f => keep(f.getName))
      .foreach(rmTree)
    // stale staging directories: a stage whose embedded version id is
    // STRICTLY below the committed head can never win its CAS (its base
    // is at least two commits behind), so it is a crashed writer's
    // orphan or a doomed straggler — GC it with the retention sweep.
    // Strictly-below, not at-or-below: a stage AT the head is usually
    // the same-id race's still-writing loser, and deleting it mid-write
    // would turn its clean SnapshotConflictException into an opaque
    // task IOException; it becomes GC-able one commit later. (A doomed
    // straggler two versions behind can still lose its stage mid-write
    // — it was going to conflict regardless, and recovery is the same
    // re-derive-and-retry.)
    val headId = head.map(_.drop(1).toLong)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(".stage_v"))
      .foreach { f =>
        val vid = "^\\.stage_v(\\d+)_".r.findFirstMatchIn(f.getName)
          .map(_.group(1).toLong)
        if (vid.exists(v => headId.exists(_ > v))) rmTree(f)
      }
  }
}

/** A commit lost its optimistic-concurrency race: the table head moved
  * past the snapshot this write derived from (see the MULTI-WRITER
  * CONCURRENCY section of [[SnapshotTable]]'s scaladoc). The winner's
  * version is intact; the loser's data directory never became visible.
  * Recovery: re-read the head, re-derive the write, retry with a version
  * id past the new head.
  */
final class SnapshotConflictException(val root: String,
    val expected: Option[String], val found: Option[String])
  extends RuntimeException(
    s"concurrent publish on $root: this write derived from head " +
      s"${expected.getOrElse("<empty table>")} but the committed head is " +
      s"now ${found.getOrElse("<empty table>")} — re-read the head and " +
      "retry with a version id past it")
