package graft.streaming

import graft.sources.SnapshotTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch-id-keyed snapshot-table state for foreachBatch streams: a batch
  * always reads the newest published version numbered BELOW its own id.
  * Plain "read latest" is wrong under post-publish replay — a crash
  * between the state publish and the checkpoint's offset commit replays
  * the batch against state its own writes already compacted (AsofStream's
  * class doc walks the concrete lost-match case; AsofStreamSpec plants
  * it). Reading below-own-id makes every replay an exact recompute from
  * pre-batch state, and a torn version directory from a pre-publish crash
  * is never read (it is numbered AT the replaying batch's id, not below).
  * The snapshot table's retention covers the one-step lookback.
  */
object VersionedState {

  /** Pre-batch state for `batchId`, or an empty frame of `schema`. */
  def readBelow(spark: SparkSession, root: String, batchId: Long,
      schema: StructType): DataFrame = {
    val prior = Option(new java.io.File(root).listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong)
      .filter(_ < batchId)
      .sorted.lastOption
    prior match {
      case Some(v) if SnapshotTable.latestVersion(root).isDefined =>
        SnapshotTable.readVersion(spark, root, s"v$v")
      case _ =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }
}
