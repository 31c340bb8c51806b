// times each SparkEntry query individually at sf0.1
package graft.tools
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate("benchone", "local[32]")
    val sf = "/root/testdata/sf0.1"
    val log = new java.io.PrintWriter(new java.io.FileWriter("/tmp/benchone.log", true))
    def out(s: String): Unit = { log.println(s); log.flush(); println(s) }
    graft.SparkEntry.allQueries.foreach { q =>
      out(s"START ${q.name}")
      val t0 = System.nanoTime()
      val n = try q.run(spark, sf).count() catch { case e: Throwable => out(s"${q.name} ERROR ${e.getMessage.take(100)}"); -1L }
      out(f"${q.name}%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    log.close()
    spark.stop()
  }
}
