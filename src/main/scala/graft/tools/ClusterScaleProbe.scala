package graft.tools

import graft.{CacheRegistry, GraftSession}
import graft.operators.ClusterCurate
import org.apache.spark.sql.functions._

/** Scale capture for the cluster-curation family: synthetic planted
  * clusters at 1x/10x/100x the sf0.1 fixture, with k scaled √(n/64)-style
  * (the occupancy discipline the IVF family documents — cells stay
  * broadcast-range while per-cell population stays bounded). Measures the
  * two stages separately:
  *
  *   - train: [[ClusterCurate.Iters]] exact Lloyd steps + the final
  *     assignment (cost ∝ n·k map-side dots + per-step (cell, dim)
  *     fine-key refine exchanges),
  *   - curate: the balance pass (one k-row broadcast join + one
  *     groupBy(cell) exchange).
  *
  * Also reports recovered purity against the planted truth — a train-time
  * capture that silently stopped recovering clusters would be meaningless.
  * Vectors: per-cluster ±Sig signature from hash(cluster, dim) plus
  * hash-derived jitter in [-1, 1] — cross-cluster templates are
  * near-orthogonal, within-cluster cosine is high, nothing is random.
  */
object ClusterScaleProbe {

  private val Sig = 2.0

  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(20000L, 200000L, 2000000L)
    val spark = GraftSession.getOrCreate("cluster-scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.DotProductDouble.register(spark)

    for (n <- ns) {
      val k = math.max(8,
        Integer.highestOneBit(math.max(1, math.sqrt(n / 64.0).toInt)))
      val e = spark.range(n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(1), lit(64)), d =>
          when(pmod(hash(pmod(col("id"), lit(k)), d), lit(2)) === 0, lit(Sig))
            .otherwise(lit(-Sig))
          + (pmod(hash(col("id") * lit(131L) + d), lit(2001)) - lit(1000))
            .cast("double") / lit(1000.0)).as("v"))
        .withColumn("nrm", sqrt(expr("dot_double(v, v)")))
        .persist()
      e.count()

      val t0 = System.nanoTime()
      val ta = CacheRegistry.persist(ClusterCurate.trainOn(e, k))
      ta.count()
      val tTrain = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val bal = ClusterCurate.balanceOn(ta, k).collect()
      val tBal = (System.nanoTime() - t1) / 1e9

      val pur = ta.groupBy(col("cell"), col("true_label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("cell"))
        .agg(max(col("cnt")).as("dom"), sum(col("cnt")).as("tot"))
        .agg(sum(col("dom")).as("dom"), sum(col("tot")).as("tot"),
          count(lit(1)).as("cells")).collect()(0)
      val purityBp = pur.getAs[Long]("dom") * 10000L / pur.getAs[Long]("tot")
      val kept = bal.map(_.getAs[Long]("n_kept")).sum

      println(f"""{"probe":"cluster_scale","n":$n,"k":$k,""" +
        f""""cells":${pur.getAs[Long]("cells")},"purity_bp":$purityBp,""" +
        f""""kept":$kept,"train_sec":$tTrain%.2f,"curate_sec":$tBal%.2f}""")
      CacheRegistry.clear()
      e.unpersist(blocking = true)
    }
    spark.stop()
  }
}
