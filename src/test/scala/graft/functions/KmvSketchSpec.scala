package graft.functions

import graft.SparkSpec
import graft.functions.expressions.{GraftFunctions, KmvSketch}
import org.apache.spark.sql.functions._

/** Pins the KMV theta sketch: the exact-below-k branch, the estimator's
  * statistical accuracy, the merge identity (merge of partials is
  * BYTE-EQUAL to the single build — partitioning invariance), exactness
  * of intersection when both sides are exact, the theta-rule
  * intersection's accuracy, and the loud-failure contract on garbage
  * artifacts and mismatched k.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(keys: Seq[String], k: Int = 256): Array[Byte] = {
    GraftFunctions.ensureRegistered(spark)
    keys.toDF("k")
      .agg(expr(s"graft_kmv_agg(k, $k)").as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
  }

  test("below k the sketch is exact") {
    val sk = sketchOf((1 to 100).map(i => s"key$i"))
    assert(KmvSketch.estimate(sk) == 100L)
    // Duplicates must not inflate it: distinct hashes only.
    val sk2 = sketchOf((1 to 100).map(i => s"key${i % 10}"))
    assert(KmvSketch.estimate(sk2) == 10L)
  }

  test("estimator lands within 4 relative standard errors on 10k keys") {
    val n = 10000
    val sk = sketchOf((1 to n).map(i => s"user-$i"))
    val est = KmvSketch.estimate(sk)
    val rse = 1.0 / math.sqrt(256 - 2)
    assert(math.abs(est - n).toDouble / n <= 4 * rse,
      s"est=$est for n=$n (allowed ±${(4 * rse * 100).round}%)")
  }

  test("merge of partials is byte-equal to the single build") {
    GraftFunctions.ensureRegistered(spark)
    val keys = (1 to 5000).map(i => s"k$i")
    val single = sketchOf(keys)
    val merged = keys.zipWithIndex.map { case (s, i) => (s, i % 7) }
      .toDF("k", "part")
      .groupBy("part").agg(expr("graft_kmv_agg(k)").as("sk"))
      .agg(expr("graft_kmv_merge(sk)").as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(single, merged),
      "k smallest of a union must equal the trimmed union of k-smallest sets")
  }

  test("intersection is exact when both sketches are exact, estimated past k") {
    val a = sketchOf((1 to 150).map(i => s"x$i"))
    val b = sketchOf((100 to 220).map(i => s"x$i"))
    assert(KmvSketch.intersect(a, b) == 51L, "both below k: the theta rule is exact")
    val bigA = sketchOf((1 to 8000).map(i => s"y$i"))
    val bigB = sketchOf((6000 to 14000).map(i => s"y$i"))
    val est = KmvSketch.intersect(bigA, bigB)
    assert(math.abs(est - 2001.0) / 2001.0 <= 0.5,
      s"theta-rule estimate $est too far from the true overlap 2001")
  }

  test("garbage artifacts and mismatched k fail loudly") {
    intercept[IllegalArgumentException] {
      KmvSketch.estimate(Array[Byte](1, 2, 3))
    }
    // A zero-length binary in the DATA is a truncated artifact, not an
    // empty sketch — graft_kmv_merge must refuse it like any garbage.
    GraftFunctions.ensureRegistered(spark)
    val exEmpty = intercept[Exception] {
      Seq(Array.emptyByteArray).toDF("sk")
        .agg(expr("graft_kmv_merge(sk)")).collect()
    }
    assert(exEmpty.getMessage != null)
    GraftFunctions.ensureRegistered(spark)
    val a = sketchOf(Seq("a"), k = 64)
    val b = sketchOf(Seq("b"), k = 128)
    val ex = intercept[Exception] {
      Seq(a, b).toDF("sk").agg(expr("graft_kmv_merge(sk)")).collect()
    }
    assert(ex.getMessage != null)
  }
}
