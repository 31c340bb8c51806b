package graft

import org.apache.spark.sql.functions._

/** The tile-routing kernel: `search_sorted(value, bounds)` must equal the
  * per-boundary `when(...)` fold it replaced (count of bounds ≤ value,
  * null value → 0) while staying constant-depth — the fold's Column tree
  * grew with the file count and overflowed the analyzer stack at the
  * 4096-tile layout a 100x corpus publishes.
  */
class SearchSortedSpec extends SparkSpec {

  private def registered() = graft.expressions.SearchSorted.register(spark)

  test("equals the per-boundary when-chain on long keys, nulls to tile 0") {
    registered()
    val bs = Seq(10L, 20L, 30L, 40L)
    val df = spark.range(-5, 60).select(
      when(col("id") % 7 === 0, lit(null)).otherwise(col("id")).as("k"))
    val chain = bs.map(b => when(col("k") >= lit(b), 1).otherwise(0))
      .reduce(_ + _)
    val diff = df.select(
      call_function("search_sorted", col("k"), typedLit(bs.toArray)).as("a"),
      coalesce(chain, lit(0)).as("b"))
    assert(diff.filter(col("a") =!= col("b")).count() == 0)
  }

  test("string keys compare in Spark order; bounds may arrive unsorted") {
    registered()
    // tok_doc-style composite keys; bounds deliberately shuffled
    val bounds = Array("ml:2", "data:7", "spark:1")
    val rows = Seq("apple:1", "data:7", "data:8", "ml:1", "ml:2", "zz:9", null)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(org.apache.spark.sql.Row(_))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType))))
    val got = df.select(col("k"),
      call_function("search_sorted", col("k"), typedLit(bounds)).as("t"))
      .collect().map(r => Option(r.getString(0)) -> r.getInt(1)).toMap
    assert(got(Some("apple:1")) == 0) // below all cutpoints
    assert(got(Some("data:7")) == 1)  // == first sorted cutpoint
    assert(got(Some("data:8")) == 1)
    assert(got(Some("ml:1")) == 1)
    assert(got(Some("ml:2")) == 2)
    assert(got(Some("zz:9")) == 3)
    assert(got(None) == 0)
  }

  test("8191 cutpoints evaluate constant-depth (the fold overflowed)") {
    registered()
    val bs = (1L to 8191L).map(_ * 10).toArray
    val bad = spark.range(0, 100000)
      .select(col("id"),
        call_function("search_sorted", col("id"), typedLit(bs)).as("t"))
      .filter(col("t") =!=
        least(lit(8191), floor(col("id") / 10)).cast("int"))
      .count()
    assert(bad == 0)
  }

  test("generated code compiles — no silent interpreted fallback") {
    // CODEGEN_ONLY + fallback=false turn a janino failure in the
    // hand-written doGenCode into a test failure instead of a WARN +
    // interpreted fallback that hides a 10x slowdown in the merge path
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      registered()
      graft.expressions.SortedIntIntersectAtLeast.register(spark)
      val r = spark.range(0, 100)
        .select(
          call_function("search_sorted", col("id"),
            typedLit(Array(10L, 50L))).as("t"),
          expr("sorted_int_intersect_atleast(array(1,2,3), array(2,3,4), 2)")
            .as("n"))
        .agg(sum("t"), max("n")).head
      assert(r.getLong(0) == 40L * 1 + 50L * 2) // 0-9→0, 10-49→1, 50-99→2
      assert(r.getInt(1) == 2)
    } finally {
      def restore(k: String, v: Option[String]) = v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      }
      restore("spark.sql.codegen.factoryMode", prevMode)
      restore("spark.sql.codegen.fallback", prevFb)
    }
  }

  test("double keys: NaN routes to the last tile, consistently") {
    registered()
    val bs = Array(1.0, 2.0)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(java.lang.Double.valueOf(Double.NaN)),
        org.apache.spark.sql.Row(java.lang.Double.valueOf(0.5)),
        org.apache.spark.sql.Row(java.lang.Double.valueOf(1.0)),
        org.apache.spark.sql.Row(null))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.DoubleType))))
    val got = df.select(col("k"),
      call_function("search_sorted", col("k"), typedLit(bs)).as("t"))
      .collect().map(r =>
        Option(r.get(0)).map(_.asInstanceOf[Double]) -> r.getInt(1))
    // NaN != NaN under ==, so find by predicate rather than map lookup
    assert(got.collectFirst { case (Some(v), t) if v.isNaN => t }.contains(2))
    assert(got.collectFirst { case (Some(v), t) if v == 0.5 => t }.contains(0))
    assert(got.collectFirst { case (Some(v), t) if v == 1.0 => t }.contains(1))
    assert(got.collectFirst { case (None, t) => t }.contains(0))
  }
}
