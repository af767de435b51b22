package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the transaction-log table format: snapshot isolation across
  * an overwrite, latest-action-wins replay, torn-commit refusal,
  * version-gap refusal, optimistic-concurrency refusal, and the
  * time-travel read's row-level identity with the pre-merge table. */
class TxLogSpec extends SparkSpec {

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("txlog_spec_").toFile
    d.deleteOnExit()
    d.getPath
  }

  private def commitLines(dir: String, v: Long): Array[String] = {
    val f = new java.io.File(dir, f"_log/$v%020d.json")
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      .split("\n").filter(_.nonEmpty)
  }

  test("append then overwrite: both snapshots stay readable (snapshot isolation)") {
    val dir = freshDir()
    import spark.implicits._
    val a = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    TxLog.commit(dir, 0, "append", TxLog.writeData(a, dir, 0))
    val b = Seq((10L, "x")).toDF("k", "s")
    TxLog.commit(dir, 1, "overwrite",
      TxLog.writeData(b, dir, 1), removes = TxLog.activeFiles(dir, 0))
    assert(TxLog.latestVersion(dir) == 1)
    assert(TxLog.readAsOf(spark, dir, 0).orderBy("k").as[(Long, String)].collect()
      .toSeq == Seq((1L, "a"), (2L, "b")))
    assert(TxLog.readLatest(spark, dir).as[(Long, String)].collect()
      .toSeq == Seq((10L, "x")))
  }

  test("latest action wins: add → remove → re-add leaves the file active") {
    val dir = freshDir()
    import spark.implicits._
    val files = TxLog.writeData(Seq((1L, "a")).toDF("k", "s"), dir, 0)
    TxLog.commit(dir, 0, "append", files)
    TxLog.commit(dir, 1, "overwrite",
      TxLog.writeData(Seq((2L, "b")).toDF("k", "s"), dir, 1), removes = files)
    assert(TxLog.activeFiles(dir, 1).forall(_.startsWith("data/v1/")))
    // Commit 2 re-adds version 0's files (a production RESTORE): the
    // replay's latest-wins rule must resurrect them.
    TxLog.commit(dir, 2, "overwrite", files, removes = TxLog.activeFiles(dir, 1))
    assert(TxLog.activeFiles(dir, 2) == files.sorted)
    assert(TxLog.readAsOf(spark, dir, 2).as[(Long, String)].collect()
      .toSeq == Seq((1L, "a")))
    // …and version 1 still reads as it always did.
    assert(TxLog.readAsOf(spark, dir, 1).as[(Long, String)].collect()
      .toSeq == Seq((2L, "b")))
  }

  test("torn commits refuse: truncated tail, action-count lie, foreign line") {
    val dir = freshDir()
    import spark.implicits._
    TxLog.commit(dir, 0, "append",
      TxLog.writeData(Seq((1L, "a")).toDF("k", "s"), dir, 0))
    val logFile = new java.io.File(dir, "_log/" + f"${0L}%020d" + ".json")
    val lines = commitLines(dir, 0)
    // Truncated: the trailer never made it to disk.
    java.nio.file.Files.write(logFile.toPath,
      (lines.init.mkString("\n") + "\n").getBytes("UTF-8"))
    intercept[IllegalStateException] { TxLog.activeFiles(dir, 0) }
    // Trailer lies about the action count.
    java.nio.file.Files.write(logFile.toPath,
      (lines.init.mkString("\n") + "\n" +
        """{"commit":{"version":0,"operation":"append","n_actions":99}}""" + "\n")
        .getBytes("UTF-8"))
    intercept[IllegalStateException] { TxLog.activeFiles(dir, 0) }
    // A foreign/corrupt action line.
    java.nio.file.Files.write(logFile.toPath,
      ("{\"garbage\":1}\n" + lines.mkString("\n") + "\n").getBytes("UTF-8"))
    intercept[IllegalStateException] { TxLog.activeFiles(dir, 0) }
    // Restored intact: reads again.
    java.nio.file.Files.write(logFile.toPath,
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    assert(TxLog.activeFiles(dir, 0).nonEmpty)
  }

  test("version gaps, over-head reads and double commits refuse") {
    val dir = freshDir()
    import spark.implicits._
    val files = TxLog.writeData(Seq((1L, "a")).toDF("k", "s"), dir, 0)
    TxLog.commit(dir, 0, "append", files)
    // Same version again: the optimistic-concurrency loser must refuse —
    // AND the winner's commit file must be byte-identical afterwards
    // (the link(2) publication cannot replace; a rename-based commit
    // silently would — round-19 review finding).
    val before = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "_log/" + f"${0L}%020d" + ".json").toPath)
    intercept[IllegalStateException] { TxLog.commit(dir, 0, "append", files) }
    val after = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "_log/" + f"${0L}%020d" + ".json").toPath)
    assert(java.util.Arrays.equals(before, after), "commit file was replaced")
    // Reading past the head must refuse, not serve the older snapshot.
    intercept[IllegalStateException] { TxLog.activeFiles(dir, 1) }
    // A gap (commit 2 without 1) breaks the replay for asOf ≥ 1.
    TxLog.commit(dir, 2, "append", files)
    intercept[IllegalStateException] { TxLog.activeFiles(dir, 2) }
    assert(TxLog.activeFiles(dir, 0) == files.sorted) // prefix still fine
  }

  test("the staged gate table: version 0 row-identical to the pre-merge projection") {
    val d = sf("sf0.001")
    val dir = graft.operators.MaintenanceQueries.stageTxTable(spark, d)
    val v0 = TxLog.readAsOf(spark, dir, 0)
    val o = graft.Tables.orders(spark, d)
    assert(v0.count() == o.count())
    // Row-level identity, not just counts: anti-join both ways is empty.
    val proj = o.select(col("o_orderkey").as("key"),
      col("o_orderpriority").as("pri"), col("o_totalprice").as("price"))
    assert(v0.select("key", "pri", "price")
      .join(proj, Seq("key", "pri", "price"), "left_anti").count() == 0)
    assert(proj.join(v0, Seq("key", "pri", "price"), "left_anti").count() == 0)
    // Version 1 equals the merge kernel's output by checksum.
    val v1 = TxLog.readAsOf(spark, dir, 1)
    val m = graft.operators.MaintenanceQueries.mergedOrdersOf(o)
    def chk(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(graft.functions.PortableHash.h60p(concat_ws("|",
        col("key"), col("pri"), floor(col("price") * 100 + 0.5))))).collect()(0).getLong(0)
    assert(chk(v1) == chk(m))
  }

  test("compaction rewrites the manifest, not the content; time travel survives") {
    val d = sf("sf0.001")
    val dir = graft.operators.MaintenanceQueries.stageTxCompact(spark, d)
    val f0 = TxLog.activeFiles(dir, 0)
    val f1 = TxLog.activeFiles(dir, 1)
    assert(f0.size == 8, s"small-file layout expected 8 files, got ${f0.size}")
    assert(f1.size < f0.size, s"compaction did not shrink: ${f0.size} -> ${f1.size}")
    assert(f1.forall(_.startsWith("data/v1/")))
    def chk(v: Long): Long =
      TxLog.readAsOf(spark, dir, v).agg(sum(graft.functions.PortableHash.h60p(
        concat_ws("|", col("key"), col("pri"), floor(col("price") * 100 + 0.5)))))
        .collect()(0).getLong(0)
    // Content identical across the rewrite; the pre-compaction
    // small-file layout still reads through the log.
    assert(chk(1) == chk(0))
    assert(TxLog.readAsOf(spark, dir, 0).count() ==
      graft.Tables.orders(spark, d).count())
  }

  test("vacuum deletes exactly the below-horizon files; time travel there fails loudly") {
    val d = sf("sf0.001")
    val dir = graft.operators.MaintenanceQueries.stageTxVacuum(spark, d)
    val f0 = TxLog.activeFiles(dir, 0)
    val f1 = TxLog.activeFiles(dir, 1)
    // The log keeps the full history (vacuum is physical, not logical)…
    assert(f0.size == 8 && f1.size == 2)
    // …but version 0's files are gone and version 1's remain.
    assert(f0.forall(p => !new java.io.File(dir, p).exists()))
    assert(f1.forall(p => new java.io.File(dir, p).exists()))
    // The retained snapshot reads; the vacuumed one fails loudly.
    assert(TxLog.readLatest(spark, dir).count() ==
      graft.Tables.orders(spark, d).count())
    intercept[Exception] { TxLog.readAsOf(spark, dir, 0).count() }
    // Idempotent: a second vacuum deletes nothing further.
    assert(TxLog.vacuum(dir, retainFrom = 1).isEmpty)
    // Horizon validation: a retention point past the head refuses.
    intercept[IllegalArgumentException] { TxLog.vacuum(dir, retainFrom = 9) }
  }
}
