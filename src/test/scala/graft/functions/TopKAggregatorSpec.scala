package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {

  test("udaf top-k equals the window row_number formulation (q_topk_per_group)") {
    val dir = sf("sf0.001")
    val topk = udaf(new TopKAggregator(5))
    val viaAgg = Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(topk(col("o_totalprice")).as("tops"))
      .select(col("o_orderpriority"), explode(col("tops")).as("price"))
      .collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val viaWindow = graft.operators.ExtrasQueries.queries("q_topk_per_group")(spark, dir)
      .collect()
      .map(r => (r.getString(0), math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(viaAgg == viaWindow)
  }

  test("merge keeps only k values (bounded partial state)") {
    val agg = new TopKAggregator(3)
    val merged = agg.merge(List(9.0, 5.0, 1.0), List(10.0, 6.0, 2.0))
    assert(merged == List(10.0, 9.0, 6.0))
  }

  test("usable from SQL after registration") {
    spark.udf.register("graft_top3", udaf(new TopKAggregator(3)))
    import spark.implicits._
    Seq(1.0, 5.0, 3.0, 4.0, 2.0).toDF("v").createOrReplaceTempView("vals")
    val out = spark.sql("SELECT graft_top3(v) AS t FROM vals").head().getSeq[Double](0)
    assert(out == Seq(5.0, 4.0, 3.0))
  }
}
