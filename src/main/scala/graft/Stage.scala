package graft

/** Per-data-dir staging directories for the file round-trip queries
  * (csv_roundtrip / jsonl_roundtrip / dir_wordcount).
  *
  * Those queries deliberately write real files and read them back through
  * two independent engines (Spark sink+source, then the DuckDB oracle over
  * the very same bytes), so the oracle SQL must NAME the staged path. A
  * fixed literal ("/tmp/graft_csv_stage") made two concurrent sessions
  * running DIFFERENT data dirs clobber each other's staged files between
  * the Spark run and the oracle read (round-4 ADVICE). The path is now a
  * pure function of the data directory: sessions over different dirs can
  * never collide, and the Spark side and the oracle SQL derive the SAME
  * path from the SAME dir string (QueryPack.oracleSqlFor → Verify dumps
  * the rendered SQL). Two sessions over the SAME data dir still share a
  * stage — their staged bytes are identical (deterministic projection of
  * an immutable fixture), so the only hazard is the transient window of
  * `mode("overwrite")` itself; the driver's verify flow is single-runner
  * per dataset, which is the documented contract for that residual case.
  */
object Stage {
  /** The driver's correctness-gate data dir (TESTDATA.md: Verify runs at
    * sf=0.01). `SparkEntry.oracleSql` — the static contract map — is
    * rendered against this dir, so even a consumer that bypasses Verify's
    * dump gets SQL that is correct at the gate scale factor. */
  val GateDir = "/root/testdata/sf0.01"

  /** Staging root for `dataDir`: a sanitized, human-readable tail plus an
    * md5 prefix of the absolute path (two dirs differing only in
    * characters the sanitizer folds still get distinct roots). */
  def root(dataDir: String): String = {
    val abs = new java.io.File(dataDir).getAbsolutePath.stripSuffix("/")
    val tail = abs.stripPrefix("/").replaceAll("[^A-Za-z0-9._-]", "_")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    val tmp = System.getProperty("java.io.tmpdir", "/tmp").stripSuffix("/")
    s"$tmp/graft_stage_${key}_$tail"
  }

  /** Stage dir for one query kind under `root(dataDir)`. */
  def dir(dataDir: String, kind: String): String = s"${root(dataDir)}/$kind"
}
