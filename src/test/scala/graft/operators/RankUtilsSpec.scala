package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins RankUtils.globalRank against the single-partition row_number it
  * replaces: identical ranks on every row, regardless of where the
  * sampled range-partition bounds fall or how many partitions end up
  * empty. */
class RankUtilsSpec extends SparkSpec {
  import spark.implicits._

  test("globalRank equals unpartitioned row_number on a total order") {
    // Keys deliberately collide on `k` (ties broken by id), span
    // negatives, and arrive in a scrambled order.
    val df = (1 to 997).map(i => ((i * 131) % 23 - 11, i.toLong))
      .toDF("k", "id")
    val got = RankUtils.globalRank(df, Seq(col("k").asc, col("id").asc))
    val want = df.withColumn("rank",
      row_number().over(Window.orderBy(col("k").asc, col("id").asc)).cast("long"))
    assert(got.columns.sorted.toSeq == want.columns.sorted.toSeq)
    val g = got.orderBy("rank").collect().map(r =>
      (r.getAs[Long]("rank"), r.getAs[Int]("k"), r.getAs[Long]("id")))
    val w = want.orderBy("rank").collect().map(r =>
      (r.getAs[Long]("rank"), r.getAs[Int]("k"), r.getAs[Long]("id")))
    assert(g.sameElements(w))
  }

  test("globalRank on tiny frames (fewer rows than partitions) and empty frames") {
    val tiny = Seq((3, 1L), (1, 2L), (2, 3L)).toDF("k", "id")
    val r = RankUtils.globalRank(tiny, Seq(col("k").asc, col("id").asc))
      .orderBy("rank").select("k", "rank").as[(Int, Long)].collect().toSeq
    assert(r == Seq((1, 1L), (2, 2L), (3, 3L)))
    val empty = Seq.empty[(Int, Long)].toDF("k", "id")
    assert(RankUtils.globalRank(empty, Seq(col("k").asc)).count() == 0)
  }

  test("globalRank refuses a colliding rank column") {
    val df = Seq((1, 1L)).toDF("rank", "id")
    intercept[IllegalArgumentException] {
      RankUtils.globalRank(df, Seq(col("id").asc))
    }
  }

  test("globalPrefixSum equals the unpartitioned window cumsum") {
    // Weights include zeros; keys collide on k (ties broken by id) and
    // arrive scrambled, so the scan must follow the total order, not
    // the arrival order.
    val df = (1 to 997).map(i => ((i * 131) % 23 - 11, i.toLong, (i * 7) % 5L))
      .toDF("k", "id", "w")
    val got = RankUtils.globalPrefixSum(df,
      Seq(col("k").asc, col("id").asc), col("w"), prefixCol = "pre")
    val want = df.withColumn("pre",
      coalesce(sum("w").over(Window.orderBy(col("k").asc, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val g = got.orderBy("k", "id").select("k", "id", "pre")
      .as[(Int, Long, Long)].collect().toSeq
    val w = want.orderBy("k", "id").select("k", "id", "pre")
      .as[(Int, Long, Long)].collect().toSeq
    assert(g == w)
    // Exclusive semantics: the global first row starts at 0, and the
    // last row's prefix + weight is the grand total.
    assert(g.head._3 == 0L)
  }

  test("globalPrefixSum on tiny and empty frames; colliding column refused") {
    val tiny = Seq((3, 10L), (1, 5L), (2, 7L)).toDF("id", "w")
    val r = RankUtils.globalPrefixSum(tiny, Seq(col("id").asc), col("w"),
      prefixCol = "pre")
      .orderBy("id").select("id", "pre").as[(Int, Long)].collect().toSeq
    assert(r == Seq((1, 0L), (2, 5L), (3, 12L)))
    val empty = Seq.empty[(Int, Long)].toDF("id", "w")
    assert(RankUtils.globalPrefixSum(empty, Seq(col("id").asc), col("w"))
      .count() == 0)
    intercept[IllegalArgumentException] {
      RankUtils.globalPrefixSum(Seq((1, 1L)).toDF("prefix", "w"),
        Seq(col("w").asc), col("w"))
    }
  }
}
