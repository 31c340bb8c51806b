package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Money/measure projection helpers for verify-facing outputs.
  *
  * Internal summation stays DECIMAL (exact, order-independent under any
  * partitioning — the reference's BigDecimal semantics,
  * `RT/bean/OrderWide.java:22,29-37`). The FINAL verify projection, however,
  * is emitted as BIGINT integer cents: parquet DECIMAL canonicalizes
  * differently across readers (pandas Decimal vs DuckDB float64), so a
  * DECIMAL output column hash-mismatches even when values are equal.
  * Scale-2 × 100 is always an exact integer, so the cast is lossless.
  */
object Money {

  /** Exact sum of a double money column as BIGINT integer cents:
    * per-row round to DECIMAL(18,2) (identical rounding on both engines),
    * exact DECIMAL summation, then ×100 → long.
    */
  def sumCents(c: Column): Column =
    (sum(c.cast(DecimalType(18, 2))) * 100).cast("long")

  /** Per-row money value as BIGINT integer cents. */
  def cents(c: Column): Column =
    (c.cast(DecimalType(18, 2)) * 100).cast("long")

  /** DuckDB oracle fragment equivalent to [[sumCents]]. */
  def sumCentsSql(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,2))) * 100 AS BIGINT)"

  /** DuckDB oracle fragment equivalent to [[cents]]. */
  def centsSql(col: String): String =
    s"CAST(CAST($col AS DECIMAL(18,2)) * 100 AS BIGINT)"
}
