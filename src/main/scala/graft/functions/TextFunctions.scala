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
    * empty array. Built from `slice` + `zip_with` so no lambda references a
    * COMPUTED outer expression — Spark evaluates higher-order-function
    * lambdas interpreted and re-evaluates any captured expression once PER
    * ELEMENT (a `transform(..., i => element_at(toks, i))` formulation made
    * the tokenizer run ~50x per row). DuckDB mirror:
    * `CASE WHEN len(ws) < n THEN CAST([] AS VARCHAR[]) ELSE
    * list_distinct(list_transform(generate_series(1, len(ws)-(n-1)), i -> ...))`
    * (DuckDB's lambdas don't have this trap).
    */
  def wordShingles(toks: Column, n: Int): Column = {
    val len = size(toks) - (n - 1)
    val parts = (0 until n).map(k => slice(toks, lit(k + 1), len))
    val joined = parts.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
    when(len <= 0, array().cast("array<string>")).otherwise(array_distinct(joined))
  }

  /** POSITIONAL word n-gram shingles joined by spaces — like
    * [[wordShingles]] but keeping order and duplicates, so element i
    * (0-based after `posexplode`) is the gram starting at token i+1. The
    * span-dedup operators reconstruct shared token runs from these
    * positions. Same slice+zip_with build (no computed-expression lambda
    * capture). DuckDB mirror: `list_transform(generate_series(1,
    * len(ws)-(n-1)), i -> array_to_string(ws[i:i+n-1], ' '))`.
    */
  def positionalShingles(toks: Column, n: Int): Column = {
    val len = size(toks) - (n - 1)
    val parts = (0 until n).map(k => slice(toks, lit(k + 1), len))
    val joined = parts.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
    when(len <= 0, array().cast("array<string>")).otherwise(joined)
  }

  /** Distinct character n-gram shingles of a string (string shorter than n →
    * empty). IMPORTANT: pass a plain column reference (not a computed
    * expression) — the per-position lambda would re-evaluate a computed
    * input once per character; apply normalization per shingle afterwards.
    * DuckDB mirror uses `substr(t, i, n)` in a `list_transform`.
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

  /** 16-bit window `win` (0-based) of md5(x) as an Int: hex chars
    * [4·win+1, 4·win+4]. One digest yields 8 independent 16-bit hashes —
    * the 64-bit simhash reads windows 0-3.
    */
  def hash16Win(c: Column, win: Int): Column =
    conv(substring(md5(c), 4 * win + 1, 4), 16, 10).cast("int")

  /** First 24 bits of md5(x) as an Int — shingle-set hashing (16M space). */
  def hash24(c: Column): Column =
    conv(substring(md5(c), 1, 6), 16, 10).cast("int")

  /** DuckDB SQL fragment: `digits` hex chars of hex-string expr `hexExpr`
    * starting at 0-based char `offset`, as an int.
    */
  def duckHexWindow(hexExpr: String, offset: Int, digits: Int): String = {
    val terms = (1 to digits).map { i =>
      val w = math.pow(16, digits - i).toLong
      s"(strpos('0123456789abcdef', substr($hexExpr, ${offset + i}, 1)) - 1) * $w"
    }
    "(" + terms.mkString(" + ") + ")"
  }

  /** DuckDB SQL fragment: first `digits` hex chars of md5(`x`) as an int. */
  def duckHashHex(x: String, digits: Int): String =
    duckHexWindow(s"md5($x)", 0, digits)

  /** DuckDB SQL fragment for [[hash16]] over SQL expression `x`. */
  def duckHash16(x: String): String = duckHashHex(x, 4)

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
