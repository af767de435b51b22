package graft.functions

import graft.SparkSpec
import graft.functions.expressions.GraftFunctions
import org.apache.spark.sql.functions._

class MinHashSketchSpec extends SparkSpec {

  private def groundTruth(values: Seq[String]): Seq[Long] = {
    val mins = Array.fill(32)(Long.MaxValue)
    values.foreach { s =>
      val h0 = JvmHash.h60p(s)
      var k = 0
      while (k < 32) {
        val hv = JvmHash.seeded(h0, k)
        if (hv < mins(k)) mins(k) = hv
        k += 1
      }
    }
    mins.toSeq
  }

  test("graft_minhash equals the JvmHash fold per group, any partitioning") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rows = (1 to 500).map(i => (s"g${i % 3}", s"tok$i"))
    val expected = rows.groupBy(_._1).view.mapValues(vs => groundTruth(vs.map(_._2))).toMap
    for (parts <- Seq(1, 7)) {
      val got = rows.toDF("g", "s").repartition(parts)
        .groupBy("g")
        .agg(GraftFunctions.minhashSketchCol(col("s")).as("sig"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(got == expected, s"mismatch at $parts partitions")
    }
  }

  test("graft_minhash is duplicate-insensitive and null-skipping") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val base = Seq("a", "b", "c")
    val noisy = base ++ base ++ base
    val sig = (xs: Seq[String]) =>
      xs.map(Option(_)).toDF("s").agg(GraftFunctions.minhashSketchCol(col("s")))
        .head().getSeq[Long](0)
    assert(sig(base) == sig(noisy))
    assert(sig(base :+ null.asInstanceOf[String]) == sig(base))
  }

  test("a degenerate sketch width fails fast instead of emitting empty sketches") {
    val e = intercept[IllegalArgumentException] {
      graft.functions.expressions.MinHashSketch(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), 0, 0, 0)
    }
    assert(e.getMessage.contains("numHashes"))
  }

  test("graft_minhash works from SQL; identical sets estimate Jaccard 1.0") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    Seq(("x", "w1"), ("x", "w2"), ("y", "w1"), ("y", "w2"))
      .toDF("g", "s").createOrReplaceTempView("mh")
    val sigs = spark.sql("SELECT g, graft_minhash(s) AS sig FROM mh GROUP BY g ORDER BY g")
      .collect().map(_.getSeq[Long](1))
    assert(sigs(0) == sigs(1), "identical sets must produce identical signatures")
  }
}
