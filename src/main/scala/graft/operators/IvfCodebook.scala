package graft.operators

import graft.{Stage, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned IVF codebook: deterministic sampled spherical k-means.
  *
  * Replaces the round-4..7 stand-in centroids (`vec_id < 16`) with a
  * codebook actually fit to the corpus — the thing a real 100 TB ANN
  * pipeline runs before assignment, because a bad codebook wastes the
  * whole Σ cells² candidate budget on lopsided cells.
  *
  * Scale shape (the part that must survive 1000 executors):
  *  - The k-means input is a HASH-SAMPLED subset capped at [[SampleTarget]]
  *    rows (deterministic Bernoulli on xxhash64(vec_id) — no sort, no
  *    collect of the corpus). At 100 TB the sample is the only thing the
  *    fit ever scans twice.
  *  - Each Lloyd iteration is one pass over the sample: broadcast the k
  *    current centroids, argmax cosine per vector via max(struct) (map-side
  *    partial agg — ships one candidate per vector per partition), then a
  *    (cid, dim) grouped sum — k×64 rows collected to the driver, never
  *    the data.
  *  - The fitted codebook (k rows) is staged to parquet and read back, so
  *    every consumer — the Spark assignment AND the DuckDB oracle CTE —
  *    reads the IDENTICAL bytes. Cross-engine equality is by construction,
  *    not by re-deriving the fit in SQL (5 Lloyd iterations in a recursive
  *    CTE would be both unreadable and numerically fragile).
  *
  * Determinism: init picks the k sample vectors with the smallest
  * xxhash64(vec_id) (a seeded pseudo-random draw with no RNG state);
  * every updated centroid component is rounded to 6 dp before the next
  * iteration, which collapses the last-ulp differences a shuffled
  * double-sum can produce, so repeated fits are bit-stable. An empty
  * cluster keeps its previous centroid (no resampling — resampling would
  * reintroduce order dependence).
  *
  * Reference tie-in: the reference engine has no ANN surface at all
  * (SURVEY.md §2 extension mandate); this is the LLM-pipeline extension's
  * scale path, consumed by sim_ivf / sim_knn_ivf / sim_knn_ivf2 /
  * dedup_embed_ivf via [[SimilarityQueries.ivfScoredAssignment]].
  */
object IvfCodebook {

  /** Cells in the codebook — matches the stand-in's 16 so the recall
    * specs' Σ cells² budget math is unchanged. */
  val K = 16

  /** Lloyd iterations: 5 is past the knee on every fixture (assignment
    * churn is ~0 by iteration 4) and keeps the fit at 5 sample passes. */
  val Iters = 5

  /** Upper bound on the k-means input regardless of corpus size. 100k
    * 64-dim vectors ≈ 50 MB — a single executor's comfortable working
    * set, and 6k samples per centroid at k=16. */
  val SampleTarget = 100000L

  /** Bump whenever the fit algorithm changes its output (sampling rule,
    * init, iteration count, rounding, K): an existing stage is REUSED
    * (see fitAndStage), so bytes written by an older algorithm must land
    * under a path the newer code never reads. */
  private val FitVersion = 1

  private val cache =
    Tables.registerCache(
      new java.util.concurrent.ConcurrentHashMap[(String, String, String), DataFrame]())

  // Per-stage-path fit lock: two SESSIONS in one JVM racing their first
  // IVF query would both miss the per-session cache and write the same
  // stage path concurrently (overwrite-mode committers clobbering each
  // other). The loser of the race now adopts the winner's bytes via
  // existingStage. Cross-PROCESS races remain excluded by the driver's
  // single-runner-per-dataset contract (see Stage's scaladoc).
  private val fitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** The staged codebook parquet for `dataDir` — the oracle CTEs name
    * this path (see the packs' oracleSqlFor overrides). */
  def stagePath(dataDir: String): String =
    Stage.dir(dataDir, s"ivf_centroids_v$FitVersion")

  /** The fitted codebook as a 16-row (cid: long, w: array<double>,
    * wnrm: double) frame read from the staged parquet — fit once per
    * (session, dir), shared by every IVF consumer. */
  def centroids(s: SparkSession, d: String): DataFrame = {
    Tables.evictDead(cache, Tables.sessionKey(s))
    cache.computeIfAbsent((Tables.sessionKey(s), d, "ivfcent"), _ => fitAndStage(s, d))
  }

  private def round6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def fitAndStage(s: SparkSession, d: String): DataFrame = {
    // The fit is deterministic, so an existing stage holds the identical
    // bytes: REUSE it instead of overwriting. Overwriting has two costs —
    // it invalidates any cached plan in another session of this JVM that
    // pins the old part files (FAILED_READ.FILE_NOT_EXIST on next use,
    // found by IvfCodebookSpec's refit test), and it re-runs the 5-pass
    // fit once per JVM for output that cannot change. FitVersion in the
    // path keeps an older algorithm's bytes from being picked up; the
    // shape check below rejects a torn or foreign directory.
    val path = stagePath(d)
    fitLocks.computeIfAbsent(path, _ => new Object).synchronized {
      existingStage(s, path).getOrElse(fitInto(s, d, path))
    }
  }

  private def existingStage(s: SparkSession, path: String): Option[DataFrame] =
    try {
      if (!new java.io.File(path, "_SUCCESS").exists()) None
      else {
        val df = s.read.parquet(path)
        val n = df.count()
        if (df.columns.toSeq == Seq("cid", "w", "wnrm") && n >= 1 && n <= K)
          Some(df)
        else None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def fitInto(s: SparkSession, d: String, path: String): DataFrame = {
    val cents = fitCodebook(s, SimilarityQueries.vecs(s, d), K)
    require(cents.nonEmpty, s"IVF codebook: no sample vectors in $d")
    // Stage the fitted codebook; the returned frame READS it back, so the
    // Spark plans and the DuckDB oracle consume identical bytes.
    import s.implicits._
    cents.toDF("cid", "w", "wnrm")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }

  /** The deterministic sampled spherical k-means fit over ANY
    * (vec_id, v, nrm) frame — the reusable kernel behind the staged
    * query-side codebook AND `Graft.embedNearDupIvf`'s per-call codebook
    * (arbitrary k there). Zero-norm vectors are excluded (cosine is
    * undefined for them); an empty input yields an empty codebook —
    * callers that require data assert themselves. Returns (cid, w, wnrm)
    * with cid = 0..k'-1, k' = min(k, sample size). */
  def fitCodebook(s: SparkSession, vecs: DataFrame,
                  k: Int): Seq[(Long, Array[Double], Double)] = {
    require(k >= 1, s"codebook size must be >= 1, got $k")
    // Degenerate-vector guard, SAME contract as embedNearDupIvf's input
    // door (round-9): under Spark's total ordering NaN > 0 is TRUE, so a
    // bare `nrm > 0` lets a NaN-norm vector through to poison every
    // centroid sum it touches (round-9 ADVICE made the shared kernel
    // consistent with the callers).
    val e = vecs
      .filter(col("nrm") > 0 && !isnan(col("nrm")))
      .select(col("vec_id"), col("v"), col("nrm"))

    // Deterministic Bernoulli sample bounded at SampleTarget: keep rows
    // whose xxhash64 bucket (out of 1e6) falls under the sampling rate.
    // One count() to size the rate — metadata-cheap next to the fit.
    val n = e.count()
    // persist(): init + every Lloyd pass re-reads the sample, and without
    // a cache boundary each of those ~Iters+1 actions would re-execute the
    // caller's FULL upstream plan (expensive when `vecs` is derived —
    // round-8 ADVICE). Unpersisted in the finally below; MEMORY_AND_DISK
    // because the sample is bounded (≤ SampleTarget × dim doubles) but a
    // small-memory executor should spill, not recompute.
    val sample = (
      if (n <= SampleTarget) e
      else e.filter(
        pmod(xxhash64(col("vec_id")), lit(1000000L)) <
          lit((SampleTarget * 1000000L) / n))
      ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {

    // Seeded init: the k sample vectors with the smallest vec_id hash —
    // a uniform pseudo-random draw that needs no RNG state. k rows
    // collected; the corpus never is.
    val dot = graft.functions.expressions.GraftFunctions.dotCol _
    var cents: Array[(Long, Array[Double])] = sample
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(k)
      .select(expr("transform(v, x -> CAST(x AS DOUBLE))").as("w"))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](0).toArray) }

    import s.implicits._
    for (_ <- 1 to Iters if cents.nonEmpty) {
      val centDf = cents.toSeq
        .map { case (cid, w) => (cid, w, math.sqrt(w.map(x => x * x).sum)) }
        .toDF("cid", "w", "wnrm")
      // Assign: argmax cosine via max(struct) — partial-aggregates
      // map-side; ties broken toward the smallest cid like the query-side
      // assignment. Then per-(cell, dim) sums: k×dim rows to the driver.
      val sums = sample.crossJoin(broadcast(centDf))
        .withColumn("ccos", dot(col("v"), col("w")) / (col("nrm") * col("wnrm")))
        .groupBy("vec_id")
        .agg(max(struct(col("ccos"), (-col("cid")).as("negid"))).as("m"),
          first(col("v")).as("v"))
        .select((-col("m.negid")).as("cid"), col("v"))
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(sum(col("x").cast("double")).as("sx"), count(lit(1)).as("cnt"))
        .collect()
      val byCell = sums.groupBy(_.getLong(0))
      cents = cents.map { case (cid, prev) =>
        byCell.get(cid) match {
          case Some(rows) =>
            val w = new Array[Double](prev.length)
            rows.foreach { r =>
              w(r.getInt(1)) = round6d(r.getDouble(2) / r.getLong(3))
            }
            (cid, w)
          case None => (cid, prev) // empty cell keeps its centroid
        }
      }
    }

    cents.toSeq.map { case (cid, w) =>
      (cid, w, math.sqrt(w.map(x => x * x).sum))
    }
    } finally sample.unpersist(blocking = false)
  }
}
