package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A transaction-log table format — the Delta/Iceberg-style substrate
  * the maintenance pack (MERGE, snapshot diff, compaction, retention)
  * was missing: a versioned parquet table whose source of truth is an
  * ordered JSON commit log, giving SNAPSHOT-ISOLATED reads and
  * time-travel (`read AS OF version N`) with no extra jars — the log
  * is plain JSON lines beside plain parquet (the AvroSource playbook:
  * the format is public and hand-buildable).
  *
  * Layout (the published Delta transaction-log architecture):
  * {{{
  *   table_dir/_log/00000000000000000000.json   // commit 0
  *   table_dir/_log/00000000000000000001.json   // commit 1
  *   table_dir/data/v0/part-….parquet           // data files
  * }}}
  *
  * A commit file is JSON LINES — one action per line, a trailer last:
  * {{{
  *   {"add":{"path":"data/v0/part-0.parquet"}}
  *   {"remove":{"path":"data/v0/part-0.parquet"}}
  *   {"commit":{"version":0,"operation":"append","n_actions":1}}
  * }}}
  *
  * The invariants that make this a TABLE format rather than a directory
  * of files:
  *  - **Atomic visibility**: a commit is written to a temp name and
  *    atomically hard-LINKED into place (link(2) fails EEXIST atomically
  *    where rename silently replaces); a version file either exists complete
  *    or not at all, and committing an already-taken version REFUSES
  *    (optimistic concurrency — the loser must re-resolve and retry).
  *  - **Torn-commit refusal**: the trailer line carries the action
  *    count; a reader that finds a missing/mismatched trailer, an
  *    unknown action shape, or a version gap refuses the whole read —
  *    it never serves a half-visible commit.
  *  - **Snapshot isolation / time travel**: the active file set at
  *    version V is the replay of commits 0..V, LATEST ACTION WINS per
  *    path (add→remove→add leaves the file active). Readers of
  *    version V are untouched by any later commit.
  *
  * Scale shape: the log is METADATA — one small JSON file per commit,
  * one line per data file (~10⁵ lines for a 100 TB table), read on the
  * driver exactly as production lakehouse clients do; the DATA is
  * parquet read fully distributed (`spark.read.parquet(activeFiles)`),
  * so filters/pruning push down per usual. Nothing table-sized ever
  * passes through the driver.
  */
object TxLog {

  private def logDir(dir: String) = new java.io.File(dir, "_log")
  private def logFile(dir: String, v: Long) =
    new java.io.File(logDir(dir), f"$v%020d.json")

  private val AddRe = """\{"add":\{"path":"([^"]+)"\}\}""".r
  private val RemoveRe = """\{"remove":\{"path":"([^"]+)"\}\}""".r
  private val CommitRe =
    """\{"commit":\{"version":(\d+),"operation":"(append|overwrite)","n_actions":(\d+)\}\}""".r

  /** One replayed commit: version, operation, add/remove paths
    * (relative to the table dir). */
  case class Commit(version: Long, operation: String,
                    adds: Seq[String], removes: Seq[String])

  /** Write commit `version`: `adds`/`removes` are table-relative parquet
    * paths. Atomic (temp file + createLink); REFUSES if the version
    * already exists — the optimistic-concurrency loser must reread the
    * log, re-resolve and retry with the next version. Returns the
    * version written. */
  def commit(dir: String, version: Long, operation: String,
             adds: Seq[String], removes: Seq[String] = Nil): Long = {
    require(operation == "append" || operation == "overwrite", operation)
    val ld = logDir(dir)
    ld.mkdirs()
    val target = logFile(dir, version)
    if (target.exists())
      throw new IllegalStateException(
        s"version $version already committed at $target (concurrent writer wins; reread and retry)")
    val sb = new StringBuilder
    adds.foreach { p =>
      require(!p.contains("\"") && !p.contains("\n"), s"unencodable path: $p")
      sb ++= s"""{"add":{"path":"$p"}}""" += '\n'
    }
    removes.foreach { p =>
      require(!p.contains("\"") && !p.contains("\n"), s"unencodable path: $p")
      sb ++= s"""{"remove":{"path":"$p"}}""" += '\n'
    }
    sb ++= s"""{"commit":{"version":$version,"operation":"$operation","n_actions":${adds.size + removes.size}}}""" += '\n'
    val tmp = java.nio.file.Files.createTempFile(ld.toPath, s".tmp-$version-", ".json")
    java.nio.file.Files.write(tmp, sb.result().getBytes("UTF-8"))
    // createLink, NOT move: POSIX rename(2) silently REPLACES an
    // existing target (ATOMIC_MOVE included), so a move-based commit
    // would let the loser of a version race overwrite the winner's
    // commit file. link(2) fails with EEXIST atomically — the claim
    // and the publication are one filesystem operation.
    try
      java.nio.file.Files.createLink(target.toPath, tmp)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"version $version already committed (lost the race)", e)
    } finally java.nio.file.Files.deleteIfExists(tmp)
    version
  }

  /** Parse one commit file; refuses torn/foreign content: every line
    * must match a known action shape, the last line must be a trailer
    * whose version matches the filename and whose n_actions matches the
    * action count (a truncated tail or interleaved torn write fails
    * here, never half-applies). */
  private[graft] def parseCommit(dir: String, v: Long): Commit = {
    val f = logFile(dir, v)
    if (!f.exists())
      throw new IllegalStateException(s"missing commit $v in ${logDir(dir)} (version gap)")
    val lines = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      .split("\n", -1).filter(_.nonEmpty)
    if (lines.isEmpty)
      throw new IllegalStateException(s"torn commit $v: empty file")
    val adds = Seq.newBuilder[String]
    val removes = Seq.newBuilder[String]
    lines.init.foreach {
      case AddRe(p) => adds += p
      case RemoveRe(p) => removes += p
      case other => throw new IllegalStateException(
        s"torn commit $v: unrecognized action ${other.take(80)}")
    }
    lines.last match {
      case CommitRe(ver, op, n) =>
        val (a, r) = (adds.result(), removes.result())
        if (ver.toLong != v)
          throw new IllegalStateException(
            s"torn commit $v: trailer names version $ver")
        if (n.toInt != a.size + r.size)
          throw new IllegalStateException(
            s"torn commit $v: trailer declares $n actions, file carries ${a.size + r.size}")
        Commit(v, op, a, r)
      case other => throw new IllegalStateException(
        s"torn commit $v: missing trailer (last line: ${other.take(80)})")
    }
  }

  /** Highest committed version, or -1 for an empty/absent log. Skips
    * temp files; refuses foreign names in `_log/`. */
  def latestVersion(dir: String): Long = {
    val ld = logDir(dir)
    if (!ld.isDirectory) return -1L
    val names = ld.listFiles().map(_.getName)
      .filterNot(_.startsWith(".tmp-")).sorted
    if (names.isEmpty) return -1L
    names.foreach { n =>
      if (!n.matches("\\d{20}\\.json"))
        throw new IllegalStateException(s"foreign file in log dir: $n")
    }
    names.last.stripSuffix(".json").toLong
  }

  /** The ACTIVE file set (table-relative, sorted) at `asOf` — replay of
    * commits 0..asOf, latest action per path wins. Refuses version
    * gaps, torn commits, and an `asOf` beyond the log's head (a reader
    * must not silently serve an older snapshot than asked for). */
  def activeFiles(dir: String, asOf: Long): Seq[String] = {
    val head = latestVersion(dir)
    if (asOf > head)
      throw new IllegalStateException(
        s"version $asOf not committed yet (log head is $head)")
    require(asOf >= 0, s"asOf=$asOf")
    val state = scala.collection.mutable.LinkedHashMap[String, Boolean]()
    (0L to asOf).foreach { v =>
      val c = parseCommit(dir, v)
      // Overwrite commits list their removes explicitly (the writer
      // computes them from the prior snapshot) — replay is uniform.
      c.removes.foreach(p => state(p) = false)
      c.adds.foreach(p => state(p) = true)
    }
    state.collect { case (p, true) => p }.toSeq.sorted
  }

  /** Snapshot-isolated read AS OF `version`: the active files' parquet,
    * fully distributed. An empty snapshot is refused (this table format
    * has no schema store; read something that exists). */
  def readAsOf(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val files = activeFiles(dir, version)
    if (files.isEmpty)
      throw new IllegalStateException(s"snapshot $version of $dir is empty")
    spark.read.parquet(files.map(p => s"$dir/$p"): _*)
  }

  /** Read the log head (the latest snapshot). */
  def readLatest(spark: SparkSession, dir: String): DataFrame =
    readAsOf(spark, dir, latestVersion(dir))

  /** VACUUM: physically delete data files not referenced by any
    * version ≥ `retainFrom` (the retention horizon). The log itself is
    * untouched — vacuum is a PHYSICAL operation, exactly as in the
    * published lakehouse formats: time travel to versions below the
    * horizon keeps resolving in the log but fails loudly at read time
    * (the files are gone), while every retained version stays fully
    * readable. Returns the table-relative paths deleted. Idempotent —
    * already-deleted files are skipped. */
  def vacuum(dir: String, retainFrom: Long): Seq[String] = {
    val head = latestVersion(dir)
    require(retainFrom >= 0 && retainFrom <= head,
      s"retainFrom=$retainFrom outside [0, $head]")
    val keep = (retainFrom to head).flatMap(v => activeFiles(dir, v)).toSet
    val everAdded = (0L to head).flatMap(v => parseCommit(dir, v).adds).toSet
    val dead = (everAdded -- keep).toSeq.sorted
    dead.filter { p =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(s"$dir/$p"))
    }
  }

  /** Write `df` as the data files of commit `version` (a distributed
    * parquet write under `data/v<version>/`) and return the
    * table-relative file list, ready to pass to [[commit]]. */
  def writeData(df: DataFrame, dir: String, version: Long): Seq[String] = {
    val rel = s"data/v$version"
    df.write.mode("overwrite").parquet(s"$dir/$rel")
    new java.io.File(dir, rel).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => s"$rel/${f.getName}").sorted.toSeq
  }
}
