package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File sources/sinks (SURVEY.md §2.2 A).
  *
  * A1 (directory scan — parse_input, FileWordCounter.cpp:189-226) and A2
  * (whole-file read — loadFile, :139-147) map to Spark's FileIndex +
  * `wholetext` mode: one row per regular file, (path, content). The
  * reference's S_ISREG filter (:218) is Spark's file-index behavior
  * (directories are recursed/listed, non-files skipped). A3/A4 (in-memory
  * source/sink) are `createDataset`/`collect` — exercised by the
  * MapReduceJob facade tests. CSV/JSON/parquet are builtins surfaced here
  * for completeness.
  *
  * Scale: `wholetext` makes one task per file (a file must fit in one
  * task's memory — same contract as the reference's loadFile, but
  * distributed across executors instead of one heap). Line-oriented
  * `textLines` splits large files by `maxPartitionBytes` instead.
  */
object FileSources {

  /** One row per file: (path, content).
    *
    * Spark's text source emits NO row for a 0-byte file, but the
    * reference reads every regular file and `loadFile`
    * (FileWordCounter.cpp:139-147) yields `""` for an empty one — whose
    * quirk-tokenization is one empty token, an observable output. The
    * round-9 randomized-directory property test caught that divergence,
    * so empty files are restored from the directory listing here. Scale:
    * the listing is the same driver-side metadata pass Spark's FileIndex
    * already runs to plan the scan; the unioned frame holds only the
    * ZERO-LENGTH files. Matches the source's visibility rules (top-level
    * regular files; `_`/`.`-prefixed names are metadata, not data). */
  def wholeTextDir(spark: SparkSession, dir: String): DataFrame = {
    val scanned = spark.read.option("wholetext", "true").text(dir)
      .select(input_file_name().as("path"), col("value").as("content"))
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val empties = fs.listStatus(p)
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && s.getLen == 0 && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(_.getPath.toUri.toString)
    if (empties.isEmpty) scanned
    else {
      import spark.implicits._
      scanned.unionByName(
        empties.toSeq.toDF("path").select(col("path"), lit("").as("content")))
    }
  }

  /** One row per line: (path, line) — the scalable variant for big files. */
  def textLines(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(dir)
      .select(input_file_name().as("path"), col("value").as("line"))

  def csv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true").csv(path)

  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** ORC source/sink — the other columnar lake format Spark ships with;
    * same pushdown/pruning machinery as parquet (asserted in the spec). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Bucketed parquet table (bucketBy needs a catalog table name, not a
    * bare path): rows are pre-shuffled into `nBuckets` by hash of
    * `bucketCols` and sorted within each bucket. Joins and aggregations
    * on the bucket key then read co-located, pre-sorted data with NO
    * exchange — the 100 TB answer to a fact table joined on the same key
    * by every query: pay the shuffle once at write time
    * (BucketingSpec asserts the exchange-free join plan). */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
                    bucketCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Z-ordered parquet write — the layout step q_zorder audits: Morton-
    * interleave the low 8 bits of two integer dimensions, range-partition
    * on the z-value (each output file owns a contiguous z-range) and
    * sort within partitions, so parquet row-group min/max stats are tight
    * on BOTH dimensions and a scan with a predicate on EITHER prunes
    * files. `nFiles` ≈ target file count (one per range partition). */
  def writeZOrdered(df: DataFrame, path: String, dimA: String, dimB: String,
                    nFiles: Int): Unit = {
    import org.apache.spark.sql.functions._
    require(!df.columns.contains("__graft_z"),
      "input already has a __graft_z column — rename it before a z-ordered write")
    df.withColumn("__graft_z", expr(graft.Portable.mortonInterleaveSql(dimA, dimB)))
      .repartitionByRange(nFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** The reference's complete example program (FileWordCounter.cpp main,
    * :234-286) as one call: scan a directory, word-count every file with
    * the quirk tokenizer, return (word, total) — here distributed and
    * sorted by key like the reference's reduce visit order. */
  def directoryWordCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val input = wholeTextDir(spark, dir).as[(String, String)]
    graft.mr.MapReduceJob.run(input, graft.mr.FileWordCounter.client, sortedByKey = true)
      .toDF("word", "count")
  }
}
