package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of the engine: a Spark query over the testdata plus
  * (when SQL-expressible) an equivalent DuckDB oracle query the driver runs
  * for hash comparison. Column names and row order must match the oracle
  * exactly (driver sorts columns by name, so aliases must be identical on
  * both sides; we additionally ORDER BY the full column list on both sides
  * so row order is deterministic).
  */
trait GraftQuery {
  def name: String

  /** Build the result DataFrame reading tables from `sfDir`. */
  def run(spark: SparkSession, sfDir: String): DataFrame

  /** DuckDB SQL over the same parquet tables (views named as in
    * [[Tables.all]]); None → driver falls back to a rows-only check.
    */
  def oracle: Option[String]
}

object GraftQuery {
  /** Duplicate names must fail LOUDLY: `toMap` keeps the last entry, so a
    * new query that reuses an existing name would silently SHADOW the old
    * one — the whole gate still passes while one query quietly stops
    * being verified (caught live: a second `embed_outliers` dropped the
    * ClusterCurate one and the 170-query run reported 169 greens with no
    * error anywhere).
    */
  private def requireUnique(qs: Seq[GraftQuery]): Seq[GraftQuery] = {
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"duplicate query names would shadow each other: ${dups.mkString(", ")}")
    qs
  }

  /** Assemble the SparkEntry maps from a list of queries. */
  def queryMap(qs: Seq[GraftQuery]): Map[String, (SparkSession, String) => DataFrame] =
    requireUnique(qs)
      .map(q => q.name -> ((s: SparkSession, d: String) => q.run(s, d))).toMap

  def oracleMap(qs: Seq[GraftQuery]): Map[String, String] =
    requireUnique(qs).flatMap(q => q.oracle.map(q.name -> _)).toMap
}
