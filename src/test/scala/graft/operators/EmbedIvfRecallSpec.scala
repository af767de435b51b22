package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dedup_embed_ivf is exact-verify-over-blocked-candidates: every emitted
  * pair must be a true cos ≥ 0.4 pair (precision 1 by construction), and
  * IVF-cell blocking with nprobe=2 must recover a sane fraction of the
  * all-pairs truth on the fixture (random synthetic vectors — the
  * worst case for cell blocking; measured ~0.35-0.4 recall).
  */
class EmbedIvfRecallSpec extends SparkSpec {

  private lazy val dir = sf("sf0.001")

  test("dedup_embed_ivf: subset of all-pairs truth, recall above floor") {
    import graft.functions.expressions.GraftFunctions
    GraftFunctions.ensureRegistered(spark)
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", GraftFunctions.normCol(col("v")))
    val a = e.select(col("vec_id").as("va"), col("v").as("v_a"), col("nrm").as("nrm_a"))
    val b = e.select(col("vec_id").as("vb"), col("v").as("v_b"), col("nrm").as("nrm_b"))
    val truth = a.join(b, col("va") < col("vb"))
      .withColumn("cos",
        GraftFunctions.dotCol(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= 0.4)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = DedupQueries.queries("dedup_embed_ivf")(spark, dir)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture has no cos >= 0.4 pairs — test is vacuous")
    assert(got.subsetOf(truth),
      s"blocked+verified pairs must all be true pairs; extras: ${(got -- truth).take(5)}")
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.2, s"nprobe=2 IVF recall $recall below fixture floor 0.2")
  }

  test("dedup_embed_rhp: subset of all-pairs truth, recall in the documented band") {
    import graft.functions.expressions.GraftFunctions
    GraftFunctions.ensureRegistered(spark)
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", GraftFunctions.normCol(col("v")))
    val a = e.select(col("vec_id").as("va"), col("v").as("v_a"), col("nrm").as("nrm_a"))
    val b = e.select(col("vec_id").as("vb"), col("v").as("v_b"), col("nrm").as("nrm_b"))
    val truth = a.join(b, col("va") < col("vb"))
      .withColumn("cos",
        GraftFunctions.dotCol(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= 0.4)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = DedupQueries.queries("dedup_embed_rhp")(spark, dir)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture has no cos >= 0.4 pairs — test is vacuous")
    assert(got.subsetOf(truth),
      s"RHP candidates are exact-verified; extras: ${(got -- truth).take(5)}")
    // The scaladoc's honest claim: 4x4-bit banding at this fixture's
    // 0.4-0.6 similarity recalls roughly half the truth (theory ~0.50).
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.25 && recall < 1.0,
      s"RHP recall $recall outside the documented band [0.25, 1)")
  }
}
