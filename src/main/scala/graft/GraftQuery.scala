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
  /** Assemble the SparkEntry maps from a list of queries. */
  def queryMap(qs: Seq[GraftQuery]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> ((s: SparkSession, d: String) => q.run(s, d))).toMap

  def oracleMap(qs: Seq[GraftQuery]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
