package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Codegen-friendly text primitives shared by the text-analysis and dedup
  * operators. Everything here is built from `org.apache.spark.sql.functions`
  * (no UDFs) so the hot path stays inside whole-stage codegen, and each
  * construct has an exact DuckDB-SQL counterpart for the oracle (see the
  * `duck*` builders in the companion queries).
  */
object TextFunctions {

  /** Lowercased alphanumeric-run tokens; empty fragments dropped.
    * DuckDB: `list_filter(string_split_regex(lower(x),'[^a-z0-9]+'), x -> x <> '')`.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Distinct word n-gram shingles joined by spaces; fewer than n tokens →
    * empty array (guard needed: Spark `sequence(1,0)` would count DOWN).
    * DuckDB: `CASE WHEN len(ws) < n THEN CAST([] AS VARCHAR[]) ELSE
    * list_distinct(list_transform(generate_series(1, len(ws)-(n-1)), i -> ...))`.
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))))

  /** Distinct character n-gram shingles of a string (string shorter than n →
    * empty). DuckDB mirror uses `substr(t, i, n)` in a `list_transform`.
    */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))

  /** First 16 bits of md5(x) as an Int — the portable token hash used by
    * simhash/LSH. DuckDB mirror (no hex parse there):
    * `(strpos('0123456789abcdef',substr(md5(x),1,1))-1)*4096 + ... `.
    */
  def hash16(c: Column): Column =
    conv(substring(md5(c), 1, 4), 16, 10).cast("int")

  /** DuckDB SQL fragment for [[hash16]] over SQL expression `x`. */
  def duckHash16(x: String): String = {
    val digits = (1 to 4).map { i =>
      val w = math.pow(16, 4 - i).toInt
      s"(strpos('0123456789abcdef', substr(md5($x), $i, 1)) - 1) * $w"
    }
    "(" + digits.mkString(" + ") + ")"
  }

  /** Shared DuckDB CTE producing `toks(documents.*, ws)` — the oracle
    * counterpart of [[tokens]] over the documents table.
    */
  val duckToksCte: String =
    """WITH toks AS (
      |  SELECT *, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                        x -> x <> '') AS ws
      |  FROM documents
      |)""".stripMargin
}
