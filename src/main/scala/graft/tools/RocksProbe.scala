package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated probe for the RocksDB state-store provider (required by
  * transformWithState). Round 1 documented a hang at first store creation
  * in this container; run under `timeout` to retest with tuning confs:
  * `sbt "runMain graft.tools.RocksProbe"` → prints ROCKSDB_OK or hangs.
  */
object RocksProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.compactOnCommit", "false")
      .config("spark.sql.streaming.stateStore.rocksdb.blockCacheSizeMB", "16")
      .config("spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB", "16")
      .config("spark.sql.streaming.stateStore.rocksdb.maxOpenFiles", "100")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val q = ms.toDF().toDF("k", "v")
      .groupBy($"k").count()
      .writeStream.format("memory").queryName("probe")
      .outputMode("complete").start()
    ms.addData(("a", 1L), ("b", 2L))
    q.processAllAvailable()
    println("ROCKSDB_OK rows=" + spark.table("probe").count())
    q.stop()

    // phase 2: transformWithState specifically (UniqueVisitProcessor)
    val ms2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.PageLog]
    val ds = graft.streaming.UniqueVisitProcessor(ms2.toDS())
    val q2 = ds.writeStream.format("memory").queryName("probe2")
      .outputMode("append").start()
    ms2.addData(
      graft.streaming.PageLog("t1", "", java.sql.Timestamp.valueOf("2024-01-01 08:00:00")),
      graft.streaming.PageLog("t1", "", java.sql.Timestamp.valueOf("2024-01-02 08:00:00")))
    q2.processAllAvailable()
    println("TWS_OK rows=" + spark.table("probe2").count())
    q2.stop()
    spark.stop()
  }
}
