package graft.tools

import graft._
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness: times each named query twice in one session
  * (second run isolates steady-state cost from codegen/scan warmup) and
  * prints the formatted plan when SPARK_GRAFT_EXPLAIN=1.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"[profile] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        fn(spark, sfDir).explain("formatted")
      CacheRegistry.clearAll()
    }
    spark.stop()
  }
}
