package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF-PQ composition pins on top of PqSpec's machinery checks: the ADC
  * identity with the per-cell constant, candidate confinement to the
  * probed cells, and the residual encode's validity.
  */
class IvfPqSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("every vector gets one cell and M valid residual codes") {
    val nVecs = SimilarityQueries.vecs(spark, dir).count()
    val codes = IvfPqQueries.ivfpqCodes(spark, dir).collect()
    assert(codes.length.toLong == nVecs)
    val valid = IvfPqQueries.residualCodebook(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    codes.foreach { r =>
      val cs = r.getSeq[Int](r.fieldIndex("codes"))
      assert(cs.size == PqCodebook.M)
      cs.zipWithIndex.foreach { case (c, m) => assert(valid((m, c.toLong))) }
    }
  }

  test("ADC equals dot(q, centroid) + residual-LUT sum, recomputed independently") {
    val cent = IvfCodebook.centroids(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val rcb = IvfPqQueries.residualCodebook(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2).toArray).toMap
    val q = SimilarityQueries.vecs(spark, dir)
      .filter(col("vec_id") === 0).select("v").collect()(0)
      .getSeq[Float](0).map(_.toDouble).toArray
    val codes = IvfPqQueries.ivfpqCodes(spark, dir).collect()
      .map(r => r.getLong(r.fieldIndex("vec_id")) ->
        (r.getLong(r.fieldIndex("cluster")), r.getSeq[Int](r.fieldIndex("codes")))).toMap
    def dotFold(a: Array[Double], b: Array[Double], off: Int): Double =
      b.indices.foldLeft(0.0)((acc, i) => acc + a(off + i) * b(i))
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val got = IvfPqQueries.queries("sim_ivfpq_adc")(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (cluster, cs) = codes(r.getLong(0))
      assert(cluster == r.getLong(1), "output cluster must be the vector's assigned cell")
      val expect = (0 until PqCodebook.M).foldLeft(dotFold(q, cent(cluster), 0)) {
        (acc, m) => acc + dotFold(q, rcb((m, cs(m).toLong)), m * PqCodebook.SubDim)
      }
      assert(r.getDouble(2) == r6(expect),
        s"vec ${r.getLong(0)}: plan adc ${r.getDouble(2)} != direct ${r6(expect)}")
    }
  }

  test("candidates are confined to the probed cells") {
    val e = SimilarityQueries.vecs(spark, dir)
    val cent = IvfCodebook.centroids(spark, dir)
    val dotc = graft.functions.expressions.GraftFunctions.dotCol _
    val probed = e.filter(col("vec_id") === 0)
      .crossJoin(broadcast(cent))
      .withColumn("ccos", dotc(col("v"), col("w")) / (col("nrm") * col("wnrm")))
      .orderBy(col("ccos").desc, col("cid"))
      .limit(IvfPqQueries.QueryNprobe)
      .collect().map(_.getAs[Long]("cid")).toSet
    val outCells = IvfPqQueries.queries("sim_ivfpq_adc")(spark, dir)
      .collect().map(_.getLong(1)).toSet
    assert(outCells.subsetOf(probed),
      s"ADC results from unprobed cells: ${outCells -- probed}")
  }

  test("the recall gate holds on sf0.001") {
    val row = IvfPqQueries.queries("sim_ivfpq_recall")(spark, dir).collect()(0)
    assert(row.getLong(1) >= IvfPqQueries.RecallFloorHits && row.getBoolean(3), row.toString)
  }

  test("refine stage: exact scores, ranked, recall dominates the 50-shortlist gate") {
    val rows = IvfPqQueries.queries("sim_ivfpq_refine")(spark, dir).collect()
    assert(rows.length == 10)
    // Ranked 1..10 by (dq DESC, vec_id) with dq non-increasing.
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val dqs = rows.map(_.getDouble(4))
    assert(dqs.zip(dqs.tail).forall { case (a, b) => a >= b })
    // Each row's exact dot recomputed directly from the raw vectors.
    val e = SimilarityQueries.vecs(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](r.fieldIndex("v")).map(_.toDouble).toArray)
      .toMap
    val q = e(0L)
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    rows.foreach { r =>
      val v = e(r.getLong(1))
      val dot = v.indices.foldLeft(0.0)((acc, i) => acc + v(i) * q(i))
      assert(r.getDouble(4) == r6(dot), s"vec ${r.getLong(1)} exact dot mismatch")
    }
    // recall@10 encoded by in_brute must be ≥ the 50-shortlist gate's
    // n_hit (a candidate superset can only add exact-top-10 members)
    // and ≥ the published floor.
    val nHit = rows.count(_.getBoolean(5))
    val gate = IvfPqQueries.queries("sim_ivfpq_recall")(spark, dir).collect()(0).getLong(1)
    assert(nHit >= gate, s"refine n_hit $nHit < 50-shortlist gate $gate")
    assert(nHit >= IvfPqQueries.RecallFloorHits)
  }
}
