package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class FileSourcesSpec extends SparkSpec {

  private def tempDirWith(files: (String, String)*): String = {
    val dir = Files.createTempDirectory("graft-src").toFile
    dir.deleteOnExit()
    files.foreach { case (name, content) =>
      Files.writeString(new java.io.File(dir, name).toPath, content)
    }
    dir.getAbsolutePath
  }

  test("wholeTextDir yields one (path, content) row per file (A1+A2)") {
    val dir = tempDirWith("a.txt" -> "hello world", "b.txt" -> "foo")
    val rows = FileSources.wholeTextDir(spark, dir).collect()
    assert(rows.length == 2)
    val byName = rows.map(r => (r.getString(0).split('/').last, r.getString(1))).toMap
    assert(byName("a.txt") == "hello world" && byName("b.txt") == "foo")
  }

  test("textLines splits files into lines with path attached") {
    val dir = tempDirWith("a.txt" -> "l1\nl2\nl3")
    assert(FileSources.textLines(spark, dir).count() == 3)
  }

  test("directoryWordCount reproduces the reference example end-to-end") {
    // README.md:42-53-shaped fixture: two files, overlapping words,
    // a double space exercising the quirk tokenizer (empty token).
    val dir = tempDirWith("f1.txt" -> "the quick  fox the", "f2.txt" -> "fox jumps")
    val out = FileSources.directoryWordCount(spark, dir)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("" -> 1, "fox" -> 2, "jumps" -> 1, "quick" -> 1, "the" -> 2))
  }

  test("csv and json round-trip through builtin sources") {
    val dir = tempDirWith("d.csv" -> "a,b\n1,x\n2,y")
    val df = FileSources.csv(spark, s"$dir/d.csv")
    assert(df.count() == 2 && df.columns.toSeq == Seq("a", "b"))
    val jdir = tempDirWith("d.json" -> """{"a":1}\n{"a":2}""".replace("\\n", "\n"))
    assert(FileSources.json(spark, s"$jdir/d.json").count() == 2)
  }

  test("writeParquet partitions by requested columns") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-sink").toFile.getAbsolutePath + "/out"
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("v", "k")
    FileSources.writeParquet(df, tmp, Seq("k"))
    val back = spark.read.parquet(tmp)
    assert(back.count() == 3)
    assert(new java.io.File(tmp).listFiles().exists(_.getName.startsWith("k=")))
  }

  test("parquet schema evolution: mergeSchema unions columns across file generations") {
    import spark.implicits._
    // A lake ingests v1 files, then the producer adds a column — readers
    // must see the union schema with nulls for old files.
    val lake = Files.createTempDirectory("graft-evolve").toFile.getAbsolutePath
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$lake/gen=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$lake/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(lake)
    assert(merged.columns.sorted.toSeq == Seq("gen", "id", "name", "score"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.get(r.fieldIndex("score"))))).toSeq
    assert(rows == Seq((1L, None), (2L, Some(9.5))))
  }

  test("ORC round-trips with predicate pushdown reaching the scan") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-orc").toFile.getAbsolutePath + "/li"
    val rows = (1 to 100).map(i => (i.toLong, i % 7, s"name$i"))
    FileSources.writeOrc(rows.toDF("id", "grp", "name"), tmp)
    val back = FileSources.orc(spark, tmp)
    assert(back.count() == 100)
    assert(back.orderBy("id").head().getLong(0) == 1L)
    val q = back.filter(col("grp") === 3).select("id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("grp"),
      s"no ORC pushdown:\n$plan")
    assert(q.count() == rows.count(_._2 == 3))
  }

  test("writeOrc partitions by requested columns (partition-pruned reads)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-orc-part").toFile.getAbsolutePath + "/out"
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("v", "k")
    FileSources.writeOrc(df, tmp, Seq("k"))
    assert(new java.io.File(tmp).listFiles().exists(_.getName.startsWith("k=")))
    val pruned = FileSources.orc(spark, tmp).filter(col("k") === "a")
    assert(pruned.count() == 2)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }
}
