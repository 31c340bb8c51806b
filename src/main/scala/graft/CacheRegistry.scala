package graft

import org.apache.spark.sql.DataFrame

/** Tracks DataFrames persisted inside query builders so harnesses running
  * many queries in one session (Verify/Bench) can release cached partitions
  * between queries — an unpaired `persist()` would otherwise pin shingle
  * arrays in storage memory for the rest of the session.
  */
object CacheRegistry {
  private val registered = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  def persist(df: DataFrame): DataFrame = synchronized {
    registered += df
    df.persist()
  }

  def clear(): Unit = synchronized {
    registered.foreach(_.unpersist(blocking = false))
    registered.clear()
  }
}
