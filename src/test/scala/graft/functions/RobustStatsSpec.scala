package graft.functions

import graft.SparkSpec
import graft.functions.expressions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

class RobustStatsSpec extends SparkSpec {

  /** Independent model: expand the multiset, sort, and apply the
    * quantile_cont definition directly — no count maps, no two-pointer
    * merge, so it shares no code path with the aggregate under test. */
  private def model(xs: Seq[Long]): (Long, Double, Double, Long, Long) = {
    def p50(vs: Seq[Double]): Double = {
      val s = vs.sorted
      val pos = 0.5 * (s.size - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      s(lo) + (s(hi) - s(lo)) * (pos - lo)
    }
    val med = p50(xs.map(_.toDouble))
    val mad = p50(xs.map(v => math.abs(v.toDouble - med)))
    val out = xs.filter(v => math.abs(v.toDouble - med) > mad * 3)
    (xs.size.toLong, med, mad, out.size.toLong,
      if (out.isEmpty) -1L else out.max)
  }

  private def run(xs: Seq[Long], parts: Int): (Long, Double, Double, Long, Long) = {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val r = xs.toDF("v").repartition(parts)
      .agg(expr("graft_robust_stats(v)").as("rs"))
      .select("rs.n_rows", "rs.med", "rs.mad", "rs.n_outliers", "rs.max_out")
      .head()
    (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))
  }

  test("graft_robust_stats matches the hand-built median/MAD case") {
    // {100, 200, 300, 400, 100000}: med 300, adev {200,100,0,100,99700}
    // → MAD 100, threshold 300 → only 100000 is out.
    assert(run(Seq(100L, 200L, 300L, 400L, 100000L), 3) ==
      ((5L, 300.0, 100.0, 1L, 100000L)))
  }

  test("graft_robust_stats interpolates on even counts and ties") {
    // {100,200,300,400}: med 250, adev {150,50,50,150} → MAD 100.
    assert(run(Seq(100L, 200L, 300L, 400L), 2) == ((4L, 250.0, 100.0, 0L, -1L)))
    // All-equal group: MAD 0, nothing deviates → 0 outliers.
    assert(run(Seq(500L, 500L, 500L), 2) == ((3L, 500.0, 0.0, 0L, -1L)))
    // Single value.
    assert(run(Seq(7L), 1) == ((1L, 7.0, 0.0, 0L, -1L)))
  }

  test("graft_robust_stats skips nulls and returns null for all-null input") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val r = Seq[Option[Long]](Some(1L), None, Some(3L)).toDF("v")
      .agg(expr("graft_robust_stats(v)").as("rs")).select("rs.n_rows").head()
    assert(r.getLong(0) == 2L)
    val rn = Seq[Option[Long]](None, None).toDF("v")
      .agg(expr("graft_robust_stats(v)").as("rs")).head()
    assert(rn.isNullAt(0))
  }

  test("graft_robust_stats rejects non-bigint input") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val e = intercept[Exception] {
      Seq("x").toDF("v").agg(expr("graft_robust_stats(v)")).head()
    }
    assert(e.getMessage.toLowerCase.contains("bigint") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}

/** Driverless property check: the aggregate's count-map + two-pointer-
  * merge finalize against the naive expanded-sort model, exercised
  * directly on the expression (update/merge/eval) so shrinking stays
  * fast. Partition splits are randomized to pin merge associativity. */
object RobustStatsProps extends Properties("RobustStatsAgg") {

  private def p50(vs: Seq[Double]): Double = {
    val s = vs.sorted
    val pos = 0.5 * (s.size - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    s(lo) + (s(hi) - s(lo)) * (pos - lo)
  }

  private def evalAgg(chunks: Seq[Seq[Long]]): (Long, Double, Double, Long, Long) = {
    val agg = new graft.functions.expressions.RobustStatsAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = false))
    val parts = chunks.map { c =>
      val b = agg.createAggregationBuffer()
      c.foreach { v =>
        agg.update(b, org.apache.spark.sql.catalyst.InternalRow(v))
      }
      // Round-trip serialization on every partial, like a real shuffle.
      agg.deserialize(agg.serialize(b))
    }
    val merged = parts.reduceLeft(agg.merge)
    val r = agg.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
    (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))
  }

  private val gen = for {
    n <- Gen.choose(1, 120)
    // Small value range forces heavy duplication (count-map depth);
    // the occasional wide value exercises the outlier branch.
    xs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.choose(-50L, 50L), 1 -> Gen.choose(-100000L, 100000L)))
    nChunks <- Gen.choose(1, 5)
  } yield (xs, nChunks)

  property("≡ expanded-sort model on random multisets, any split") =
    Prop.forAll(gen) { case (xs, nChunks) =>
      val chunks = xs.grouped(math.max(1, xs.size / nChunks)).toSeq
      val (n, med, mad, nOut, maxOut) = evalAgg(chunks)
      val med0 = p50(xs.map(_.toDouble))
      val mad0 = p50(xs.map(v => math.abs(v.toDouble - med0)))
      val out0 = xs.filter(v => math.abs(v.toDouble - med0) > mad0 * 3)
      n == xs.size.toLong && med == med0 && mad == mad0 &&
        nOut == out0.size.toLong &&
        maxOut == (if (out0.isEmpty) -1L else out0.max)
    }
}
