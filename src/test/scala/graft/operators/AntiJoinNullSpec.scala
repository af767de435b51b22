package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the anti-join ⟷ oracle semantic agreement under NULL keys.
  *
  * The q_anti_join oracle uses NOT EXISTS (Relational.oracleSql): with a
  * NOT IN oracle, a single NULL in the subquery column returns ZERO rows
  * (three-valued logic) while Spark's `left_anti` keeps every non-match —
  * a latent trap the NULL-free fixtures would never expose. This spec
  * builds a NULL-bearing fixture and asserts `left_anti` ≡ NOT EXISTS
  * (and documents that NOT IN would diverge).
  */
class AntiJoinNullSpec extends SparkSpec {

  test("left_anti equals NOT EXISTS on NULL-bearing keys; NOT IN would not") {
    import spark.implicits._
    val cust = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (3L, "c"), (null, "d")
    ).toDF("c_custkey", "c_name")
    val ords = Seq[(java.lang.Long, String)](
      (1L, "o1"), (null, "o2")
    ).toDF("o_custkey", "o_id")

    val anti = cust.join(ords, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_name")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSeq

    cust.createOrReplaceTempView("cust_n")
    ords.createOrReplaceTempView("ords_n")
    val notExists = spark.sql(
      """SELECT c_custkey, c_name FROM cust_n c
         WHERE NOT EXISTS (SELECT 1 FROM ords_n o WHERE o.o_custkey = c.c_custkey)
         ORDER BY c_name""")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSeq

    // Non-matches survive — including the NULL-keyed customer (the join
    // predicate is UNKNOWN for it, so it never matches).
    assert(anti == Seq((Some(2L), "b"), (Some(3L), "c"), (None, "d")))
    assert(notExists == anti, "left_anti and NOT EXISTS must agree under NULLs")

    // The trap the oracle rewrite avoids: NOT IN collapses to zero rows.
    val notIn = spark.sql(
      """SELECT c_custkey FROM cust_n
         WHERE c_custkey NOT IN (SELECT o_custkey FROM ords_n)""").count()
    assert(notIn == 0L, "NOT IN over a NULL-bearing subquery returns no rows")
  }
}
