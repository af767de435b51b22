package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness for the live streaming gates: breaks one
  * gate's wall time into its fixed-cost components (session scaffolding,
  * fixture staging, stream start, micro-batches, sink read-back) so the
  * optimization work attacks the measured piece, not a guess. Not a
  * declared query; never run by the driver.
  */
object ProfileLive {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // Warm the JVM on the exact gate once (like Bench's warm-up).
    t("warmup windowed_live sf0.001") {
      graft.streaming.EventStreams.runWindowedCountsLive(spark, "/root/testdata/sf0.001").count()
    }

    for (i <- 1 to 3) {
      println(s"--- draw $i: stream_windowed_live at $sfDir, instrumented ---")
      t(s"total windowed_live") {
        graft.streaming.EventStreams.runWindowedCountsLive(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
