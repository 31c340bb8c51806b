package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered engine queries (each with its DuckDB oracle when
    * SQL-expressible). Extended module by module per SURVEY.md §2.
    */
  def allQueries: Seq[GraftQuery] =
    ProvinceStats.all ++ LogStats.all ++ OrderWide.all ++
      ProductStats.all ++ KeywordStats.all ++ AdsQueries.all ++ CdcRoute.all ++
      TextAnalysis.all ++ Dedup.all ++ BloomPrefilter.all ++ SpanDedup.all ++ IncrementalDedup.all ++ LineDedup.all ++
      Similarity.all ++ KnnJoin.all ++ ProductQuant.all ++ Opq.all ++ TextEmbed.all ++ ClusterCurate.all ++ EmbedPca.all ++
      Multimodal.all ++ MultimodalAv.all ++
      SqlSurface.all ++ Relevance.all ++ RowParity.all ++ Sampling.all ++
      Packing.all ++ PipelineManifest.all ++ Temporal.all ++ HllDistinct.all ++
      HistQuantiles.all ++ Behavior.all ++ OlapSurface.all ++ SkewReport.all ++
      SnapshotDiff.all ++ Graph.all ++ CorpusStats.all ++ SaltedJoin.all ++
      InvertedIndex.all ++ LsmIndex.all ++ Retrieval.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ProvinceStats.stats.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GraftQuery.queryMap(allQueries)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    GraftQuery.oracleMap(allQueries)
}
