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

  test("bz2 is the splittable text codec: one shard fans out; gzip stays one task") {
    // The codec-class property jsonl_bz2_roundtrip's scale note claims:
    assert(classOf[org.apache.hadoop.io.compress.SplittableCompressionCodec]
      .isAssignableFrom(classOf[org.apache.hadoop.io.compress.BZip2Codec]))
    assert(!classOf[org.apache.hadoop.io.compress.SplittableCompressionCodec]
      .isAssignableFrom(classOf[org.apache.hadoop.io.compress.GzipCodec]))
    // And behaviorally: the SAME single-shard json under a 32 KiB split
    // target — bz2 fans out into multiple input partitions (block
    // resync), gzip cannot. Values are deterministic so the count pins
    // that the split loses and duplicates nothing.
    import org.apache.spark.sql.functions.{concat, lit}
    val dir = Files.createTempDirectory("graft-bz2split").toFile.getAbsolutePath
    val df = spark.range(20000).select(col("id"),
      concat(lit("pad-the-line-so-blocks-exist-"), col("id")).as("s"))
    df.coalesce(1).write.mode("overwrite").option("compression", "bzip2").json(s"$dir/bz")
    df.coalesce(1).write.mode("overwrite").option("compression", "gzip").json(s"$dir/gz")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.files.maxPartitionBytes", (32 * 1024).toString)
    sess.conf.set("spark.sql.files.openCostInBytes", "0")
    val bz = sess.read.json(s"$dir/bz")
    val gz = sess.read.json(s"$dir/gz")
    assert(bz.rdd.getNumPartitions > 1,
      s"bz2 must split under a 32 KiB target: ${bz.rdd.getNumPartitions}")
    assert(gz.rdd.getNumPartitions == 1,
      s"gzip must stay one task: ${gz.rdd.getNumPartitions}")
    assert(bz.count() == 20000L)
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

  test("property: emit-style adapter ≡ quirk-tokenizer fold on randomized directories") {
    // Round-8 verdict #6: closes the gap between "quirk parity pinned on
    // fixtures" and "quirk parity proven on arbitrary input". Seeded
    // randomized directories (random single/double spaces, newlines,
    // tabs, NUL bytes, empty and hidden files), three ways through the
    // word count:
    //  (1) the reference semantics — a sequential fold of tokenizeQuirk
    //      (FileWordCounter.cpp:149-177) over every regular file's bytes
    //      up to the first NUL (loadFile's getline delimiter, :143);
    //  (2) directoryWordCount — the full ingest path (wholetext scan →
    //      MR facade with the iterator client);
    //  (3) the SAME pipeline through EmitStyleClient — the reference's
    //      exact void-map/emit2 + void-reduce/emit3 callback signatures.
    // All three must agree exactly, file set by file set.
    import spark.implicits._
    val emitClient = new graft.mr.EmitStyleClient[String, String, String, Int, String, Int] {
      def mapEmit(path: String, text: String, emit2: (String, Int) => Unit): Unit =
        graft.mr.FileWordCounter.tokenizeQuirk(text).foreach(w => emit2(w, 1))
      def reduceEmit(word: String, counts: Iterator[Int], emit3: (String, Int) => Unit): Unit =
        emit3(word, counts.sum)
    }
    val rnd = new scala.util.Random(20260813)
    val nul = 0.toChar
    // Word chars include MULTIBYTE UTF-8 (é = 2 bytes, 語 = 3): the
    // reference tokenizes raw bytes, but 0x20 never occurs inside a
    // valid UTF-8 multibyte sequence, so byte- and char-tokenization
    // yield identical word sets — pinned here through the whole
    // distributed ingest (wholetext decode + readWholeFiles decode).
    // Plus double-weighted space, newline, tab, and a rare NUL.
    val alphabet = "ab x\n\t".toVector ++ Vector('é', '語', nul)
    for (round <- 1 to 4) {
      val contents = Vector.tabulate(rnd.nextInt(5) + 3) { i =>
        val body =
          if (i == 0) "" // always include one EMPTY file (reference: one "" token)
          else Vector.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.size))).mkString
        // every round scatters HIDDEN regular files (readdir+S_ISREG
        // reads them; Spark's file index would silently drop them)
        val name = i % 3 match {
          case 1 => s".f$i.txt"
          case 2 => s"_f$i.txt"
          case _ => s"f$i.txt"
        }
        name -> body
      }
      val dir = tempDirWith(contents: _*)
      val expected = contents
        .flatMap { case (_, text) =>
          graft.mr.FileWordCounter.tokenizeQuirk(text.takeWhile(_ != nul))
        }
        .groupBy(identity).map { case (w, ws) => w -> ws.size }
      val viaDir = FileSources.directoryWordCount(spark, dir)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(viaDir == expected, s"round $round: directoryWordCount diverged from quirk fold")
      val viaEmit = graft.mr.MapReduceJob.run(
          FileSources.wholeTextDirRef(spark, dir).as[(String, String)], emitClient)
        .collect().groupBy(_._1).map { case (w, ps) => w -> ps.map(_._2).sum }
      assert(viaEmit == expected, s"round $round: emit-style adapter diverged from quirk fold")
    }
  }

  test("loadFile parity: hidden files counted, content truncated at the first NUL") {
    // The round-9 siblings of the empty-file divergence, pinned directly:
    //  - parse_input (FileWordCounter.cpp:218) keeps EVERY regular file —
    //    `.`/`_`-prefixed names included — where Spark's file index drops
    //    them even as explicit paths ("All paths were ignored");
    //  - loadFile (:143) reads `getline(file, content, '\0')`: an
    //    embedded NUL ends the content, a leading NUL means "".
    val nul = 0.toChar
    val dir = tempDirWith(
      "plain.txt" -> "alpha beta",
      ".hidden.txt" -> "alpha gamma",
      "_meta.txt" -> "beta",
      "nul.txt" -> s"pre post${nul}never never",
      ".empty" -> "")
    val out = FileSources.directoryWordCount(spark, dir)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("" -> 1, "alpha" -> 2, "beta" -> 2, "gamma" -> 1,
      "pre" -> 1, "post" -> 1))
    // wholeTextDir default keeps Spark's lake visibility: no hidden rows.
    val defaultNames = FileSources.wholeTextDir(spark, dir)
      .collect().map(_.getString(0).split('/').last).toSet
    assert(defaultNames == Set("plain.txt", "nul.txt"))
    // readWholeFiles serves explicit hidden paths the builtin refuses —
    // as RAW paths (what a user types) as well as encoded URIs (what a
    // listing yields), including names the URI parser alone would reject.
    val direct = FileSources.readWholeFiles(spark, Seq(s"$dir/.hidden.txt"))
      .collect().map(r => r.getString(1))
    assert(direct.toSeq == Seq("alpha gamma"))
  }

  test("hidden files with URI-hostile names (spaces) read through the parity path") {
    val dir = tempDirWith("plain.txt" -> "a", ".with space.txt" -> "b c")
    val out = FileSources.directoryWordCount(spark, dir)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("a" -> 1, "b" -> 1, "c" -> 1))
    val raw = FileSources.readWholeFiles(spark, Seq(s"$dir/.with space.txt"))
      .collect().map(r => r.getString(1))
    assert(raw.toSeq == Seq("b c"))
  }

  test("degenerate directory shapes: empty, all-hidden, all-empty-files") {
    // Shapes where the builtin scan leg contributes ZERO rows and the
    // listing-based legs carry the whole result (or nothing at all).
    // Reference behavior: an empty dir is an empty job (parse_input finds
    // no regular files); all-hidden and all-empty dirs are ordinary
    // corpora (S_ISREG keeps hidden files, loadFile yields "" for empty).
    val emptyDir = tempDirWith()
    assert(FileSources.wholeTextDir(spark, emptyDir).count() == 0)
    assert(FileSources.directoryWordCount(spark, emptyDir).count() == 0)

    val allHidden = tempDirWith(".a.txt" -> "x y", "_b.txt" -> "y")
    assert(FileSources.wholeTextDir(spark, allHidden).count() == 0) // lake default
    val hiddenCounts = FileSources.directoryWordCount(spark, allHidden)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(hiddenCounts == Map("x" -> 1, "y" -> 2))

    val allEmpty = tempDirWith("a.txt" -> "", "b.txt" -> "")
    val emptyCounts = FileSources.directoryWordCount(spark, allEmpty)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(emptyCounts == Map("" -> 2)) // one "" token per empty file
  }

  test("property: directoryWordCountRaw ≡ byte-level quirk fold on random BYTE files") {
    // Round-9 verdict #7 — the last documented loadFile divergence
    // (non-UTF-8 bytes) closed: the raw path never decodes, so it must
    // match the reference byte-for-byte on ARBITRARY bytes — malformed
    // UTF-8, embedded NULs, 0x20 inside multibyte garbage, hidden names,
    // empty files.
    val rnd = new scala.util.Random(101326)
    for (round <- 1 to 4) {
      val dir = Files.createTempDirectory("graft-raw").toFile
      dir.deleteOnExit()
      val contents = Vector.tabulate(rnd.nextInt(5) + 3) { i =>
        val body =
          if (i == 0) Array.emptyByteArray
          else {
            val b = new Array[Byte](rnd.nextInt(120))
            rnd.nextBytes(b)
            // re-seed spaces and NULs so both quirk paths trigger often
            b.indices.foreach { j =>
              val r = rnd.nextInt(6)
              if (r == 0) b(j) = ' '.toByte else if (r == 1) b(j) = 0
            }
            b
          }
        val name = i % 3 match {
          case 1 => s".f$i.bin"
          case 2 => s"_f$i.bin"
          case _ => s"f$i.bin"
        }
        Files.write(new java.io.File(dir, name).toPath, body)
        name -> body
      }
      val expected = contents
        .flatMap { case (_, bytes) =>
          graft.mr.FileWordCounter.tokenizeQuirkBytes(bytes.takeWhile(_ != 0))
        }
        .groupBy(_.toSeq).map { case (w, ws) => w -> ws.size }
      val got = FileSources.directoryWordCountRaw(spark, dir.getAbsolutePath)
        .collect().map(r => r.getAs[Array[Byte]](0).toSeq -> r.getInt(1))
      assert(got.toMap == expected, s"round $round: raw word count diverged from byte fold")
      // Reduce visit order parity: std::map<std::string> iterates in
      // unsigned-char lexicographic order ≡ Spark's binary sort order.
      val keys = got.map(_._1.map(_ & 0xff).toVector).toSeq
      assert(keys == keys.sorted(math.Ordering.Implicits.seqOrdering[Vector, Int]),
        s"round $round: output not in unsigned-lex byte order")
    }
  }

  test("raw-path-first resolution: a literal 'a%20b.txt' is never URI-decoded away") {
    // Round-9 ADVICE: URI-first parsing silently read 'a b.txt' when the
    // caller named 'a%20b.txt'. Both files exist here with different
    // content — the raw spelling must win; the encoded listing spelling
    // (whose literal interpretation never exists) must still decode.
    val dir = tempDirWith("a%20b.txt" -> "LITERAL", "a b.txt" -> "DECODED")
    val literal = FileSources.readWholeFiles(spark, Seq(s"$dir/a%20b.txt"))
      .collect().map(_.getString(1)).toSeq
    assert(literal == Seq("LITERAL"), "percent spelling was URI-decoded away")
    // With BOTH files present, the encoded spelling of 'a b.txt' is the
    // raw spelling of 'a%20b.txt' — genuinely ambiguous; raw wins by
    // contract (and a LISTING never produces this spelling for the
    // literal file: toUri encodes its '%' to %25, checked below).
    val encoded = new java.io.File(dir, "a b.txt").toURI.toString // .../a%20b.txt
    val ambiguous = FileSources.readWholeFiles(spark, Seq(encoded))
      .collect().map(_.getString(1)).toSeq
    assert(ambiguous == Seq("LITERAL"), "ambiguous spelling must resolve raw-first")
    val listedLiteral = new org.apache.hadoop.fs.Path(s"$dir/a%20b.txt").toUri.toString
    assert(listedLiteral.endsWith("a%2520b.txt"), s"listing spelling: $listedLiteral")
    val viaListing = FileSources.readWholeFiles(spark, Seq(listedLiteral))
      .collect().map(_.getString(1)).toSeq
    assert(viaListing == Seq("LITERAL"))
    // URI-decode fallback: where no literal percent-file shadows it, the
    // encoded spelling still resolves to the decoded file.
    val dir2 = tempDirWith("a b.txt" -> "DECODED")
    val decoded = FileSources.readWholeFiles(
        spark, Seq(new java.io.File(dir2, "a b.txt").toURI.toString))
      .collect().map(_.getString(1)).toSeq
    assert(decoded == Seq("DECODED"), "encoded URI spelling no longer resolves")
    // Default: a missing path fails the job; missingAsEmpty (the
    // reference's ignored-open-error contract) yields empty content.
    intercept[org.apache.spark.SparkException] {
      FileSources.readWholeFilesBytes(spark, Seq(s"$dir/nope.txt")).collect()
    }
    val lenient = FileSources
      .readWholeFilesBytes(spark, Seq(s"$dir/nope.txt"), missingAsEmpty = true)
      .collect().map(r => r.getAs[Array[Byte]]("content").length).toSeq
    assert(lenient == Seq(0))
  }

  test("wholeTextDir emits ONE canonical path spelling across all three legs") {
    // Round-9 ADVICE: empty-authority file URIs get spelled 'file:/p' or
    // 'file:///p' depending on which code path produced them — grouping
    // on path across legs mis-grouped. All legs normalize to 'file:///'.
    val dir = tempDirWith(
      "plain.txt" -> "a", "empty.txt" -> "", ".hidden.txt" -> "b", ".e2" -> "")
    val paths = FileSources.wholeTextDir(spark, dir, includeHidden = true)
      .collect().map(_.getString(0))
    assert(paths.length == 4 && paths.distinct.length == 4)
    paths.foreach { p =>
      assert(p.startsWith("file:///") && !p.startsWith("file:////"),
        s"non-canonical spelling: $p")
    }
    assert(paths.map(_.split('/').last).toSet ==
      Set("plain.txt", "empty.txt", ".hidden.txt", ".e2"))
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

  test("ORC zstd writes carry the requested codec and real stripes (reader metadata)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-orc-meta").toFile.getAbsolutePath + "/z"
    (1 to 5000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").option("compression", "zstd").orc(tmp)
    val orcFile = new java.io.File(tmp).listFiles()
      .filter(f => f.getName.endsWith(".orc")).head
    // Pin the physical file properties from orc-core's own reader — the
    // codec actually written (a silently-ignored compression option
    // would fall back to the session default) and a sane stripe layout.
    val reader = org.apache.orc.OrcFile.createReader(
      new org.apache.hadoop.fs.Path(orcFile.getAbsolutePath),
      org.apache.orc.OrcFile.readerOptions(
        spark.sparkContext.hadoopConfiguration))
    try {
      assert(reader.getCompressionKind == org.apache.orc.CompressionKind.ZSTD,
        s"expected ZSTD, wrote ${reader.getCompressionKind}")
      assert(reader.getNumberOfRows == 5000L)
      val stripes = reader.getStripes
      assert(stripes.size() >= 1)
      var rows = 0L
      stripes.forEach(s => rows += s.getNumberOfRows)
      assert(rows == 5000L, "stripe row counts must cover the file exactly")
    } finally reader.close()
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
