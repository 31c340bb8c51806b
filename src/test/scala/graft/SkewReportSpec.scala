package graft

import graft.operators.SkewReport
import org.apache.spark.sql.functions._

/** The key-skew gate on planted distributions (the sf oracle proves the
  * report numbers; these pin the flag rule).
  */
class SkewReportSpec extends SparkSpec {
  import spark.implicits._

  test("a whale key is flagged, an even population is not") {
    // whale owns 300/1000 rows (3000 bp); the rest spread over 700 keys
    val whale = Seq.fill(300)(999L) ++ (1L to 700L)
    val rep = SkewReport.keySkewReport(whale.toDF("k"), col("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rep("999") === ((3000L, 1L)))
    assert(rep.filterNot(_._1 == "999").values.forall(_._2 == 0L))
  }

  test("flag fires exactly at the floored threshold boundary") {
    // 2 of 100 rows = exactly 200 bp -> flagged; 1 of 100 = 100 bp -> not
    val keys = Seq.fill(2)(1L) ++ Seq.fill(1)(2L) ++ (10L until 107L)
    val rep = SkewReport.keySkewReport(keys.toDF("k"), col("k"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rep("1") === 1L)
    assert(rep("2") === 0L)
  }
}
