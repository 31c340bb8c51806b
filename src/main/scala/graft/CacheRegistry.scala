package graft

import org.apache.spark.sql.DataFrame

/** Tracks DataFrames persisted inside query builders so harnesses running
  * many queries in one session (Verify/Bench) can release cached partitions
  * between queries — an unpaired `persist()` would otherwise pin shingle
  * arrays in storage memory for the rest of the session.
  */
object CacheRegistry {
  private val registered = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val sharedDfs = scala.collection.mutable.Map.empty[String, DataFrame]

  def persist(df: DataFrame): DataFrame = synchronized {
    registered += df
    df.persist()
  }

  /** A persisted frame SHARED across queries in one harness session (e.g.
    * the enriched events derivation feeding the whole log suite — the DWD
    * layer materialized once for its DWS/ADS consumers, as the reference
    * stages through a Kafka topic). Survives per-query [[clear]]; released
    * by [[clearAll]].
    */
  def shared(key: String)(build: => DataFrame): DataFrame = synchronized {
    sharedDfs.getOrElseUpdate(key, build.persist())
  }

  /** Eagerly materialize `df` behind a lineage LEAF and register the cache
    * with this registry. For iterative algorithms whose frame references
    * itself each round: the self-referencing logical plan grows
    * exponentially without truncation, and `localCheckpoint` — the stock
    * answer — caches storage the registry cannot see (freed only when the
    * ContextCleaner notices the GC'd RDD, which across a 50-query harness
    * session accumulates into storage pressure `clear()` exists to
    * prevent). Round-tripping through the row RDD cuts the plan to a
    * `LogicalRDD` leaf while the persist stays registry-managed.
    */
  def materialize(df: DataFrame): DataFrame = {
    val cut = df.sparkSession.createDataFrame(df.rdd, df.schema)
    val p = persist(cut)
    p.count()
    p
  }

  /** Test visibility: how many per-query persists are registered, and the
    * column names of each — specs pin persist BUDGETS for composed
    * operators (e.g. distNtileScores: one wide base + N slim rank frames,
    * never N wide ones) without reaching into Spark's cache manager.
    */
  private[graft] def registeredCount: Int = synchronized { registered.size }
  private[graft] def registeredSchemas: Seq[Seq[String]] = synchronized {
    registered.map(_.schema.fieldNames.toSeq).toSeq
  }

  /** Release per-query persists (between queries in Verify/Bench). */
  def clear(): Unit = synchronized {
    registered.foreach(_.unpersist(blocking = false))
    registered.clear()
  }

  /** Release everything, shared frames included (end of harness run). */
  def clearAll(): Unit = synchronized {
    clear()
    sharedDfs.values.foreach(_.unpersist(blocking = false))
    sharedDfs.clear()
  }
}
