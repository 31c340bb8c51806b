package graft.tools

import graft.GraftSession
import graft.operators.{KnnJoin, Similarity}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off stage attribution for the blocked k-NN family on a scale
  * fixture: times the shared vector frame, the blocked neighbor rows and
  * each half of the recall audit separately so a blow-up in one stage is
  * visible (used to pin the 10x recall regression on the vector-bearing
  * window shuffle; kept for the next such hunt).
  *
  * Usage: `sbt "runMain graft.tools.KnnProbe <sfDir>"`
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val spark = GraftSession.getOrCreate("knn-probe")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = Similarity.vecs(spark, sf)
    time("vecs")(e.count())
    if (sys.env.contains("KNN_PROBE_EXPLAIN")) {
      val plan = KnnJoin.knnRows(spark, sf).queryExecution.executedPlan.toString
      println(s"[probe] knnRows exchanges: ${"(?i)exchange hashpartitioning".r.findAllIn(plan).size}")
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Window") || l.contains("Sort")).mkString("\n"))
    }
    println("[probe] knn rows: " + time("knnRows")(KnnJoin.knnRows(spark, sf).count()))
    val q = e.filter(col("vec_id") % 17 === 0)
    val scored = e.repartition(spark.sparkContext.defaultParallelism).as("c")
      .join(broadcast(q.as("q")), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        floor(expr("dot_double(q.v, c.v)") * lit(10000.0) /
          (col("q.nrm") * col("c.nrm"))).cast("long").as("cos_bp"))
    time("truth scored")(println(scored.count()))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_bp").desc, col("neighbor_id"))
    time("truth ranked")(println(
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3).count()))
    time("full recall query")(println(KnnJoin.knnRecall.run(spark, sf).count()))
    spark.stop()
  }
}
