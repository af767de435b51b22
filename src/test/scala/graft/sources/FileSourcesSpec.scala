package graft.sources

import java.nio.file.Files

import graft.SparkSpec

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
}
