package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Bucketed-layout co-location: writing both join sides bucketed on the
  * join key means the join and the bucket-key aggregation run with ZERO
  * shuffle exchanges — the write-once-shuffle-never layout a 100 TB fact
  * table wants. Asserted on the physical plan (AQE off so exchange nodes
  * are reachable), with results cross-checked against the plain-parquet
  * plan.
  */
class BucketingSpec extends SparkSpec {

  private lazy val dir = sf("sf0.001")

  test("join and agg on bucketed tables run with zero shuffle exchanges") {
    val sess = spark.newSession()
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    sess.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val orders = sess.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = sess.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_name")
    FileSources.writeBucketed(orders, "b_orders", 8, Seq("o_custkey"))
    FileSources.writeBucketed(cust, "b_cust", 8, Seq("c_custkey"))
    try {
      val bo = sess.table("b_orders")
      val bc = sess.table("b_cust")
      // Join on the bucket key, then aggregate BY the bucket key: the
      // join's output partitioning already satisfies the agg's
      // requirement, so the whole pipeline runs shuffle-free.
      // Integer aggregate only: a Double sum would be reduction-order-
      // dependent between the two plans' scan/fetch orders (the repo's
      // own cross-engine determinism rule, applied cross-plan here).
      val aggs = Seq(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice")).cast("long")).as("total_floor"))
      val joined = bo.join(bc, col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey").agg(aggs.head, aggs.tail: _*)
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join/agg still shuffles:\n${joined.queryExecution.executedPlan}")
      // Same answer as the unbucketed plan (bucketing is layout, not semantics).
      val plain = orders.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey").agg(aggs.head, aggs.tail: _*)
      val got = joined.orderBy("c_custkey").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val want = plain.orderBy("c_custkey").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.sameElements(want), "bucketed join result differs from plain join")
    } finally {
      sess.sql("DROP TABLE IF EXISTS b_orders")
      sess.sql("DROP TABLE IF EXISTS b_cust")
    }
  }
}
