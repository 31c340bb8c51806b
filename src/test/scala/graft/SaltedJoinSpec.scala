package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

/** Salted-join replication correctness + the salt actually in the keys. */
class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join row-for-row") {
    // skewed fact: key 1 owns most rows; key 3 has no dim match;
    // dim key 2 is DUPLICATED (both replicas must match)
    val fact = (Seq.fill(20)(1L) ++ Seq(2L, 2L, 3L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "row_id")
    val dim = Seq((1L, "a"), (2L, "b"), (2L, "c")).toDF("k", "v")
    val salted = SaltedJoin.saltedJoin(fact, dim, "k", 4,
      pmod(col("row_id"), lit(4)))
    val plain = fact.join(dim, "k")
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select("k", "row_id", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(key(salted) === key(plain))
    assert(key(salted).size === 20 + 4) // 2-key fact rows match 2 dim rows
  }

  test("the executed join keys on the salt (hot key spread over buckets)") {
    val fact = (1L to 100L).map(i => (1L, i)).toDF("k", "row_id")
    val dim = Seq((1L, "a")).toDF("k", "v")
    val salted = SaltedJoin.saltedJoin(fact, dim, "k", 4,
      pmod(col("row_id"), lit(4)))
    salted.count()
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"salt column absent from plan:\n$plan")
  }
}
