package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro Object Container File (OCF) source + sink on the avro CORE
  * library Spark already ships (`avro-1.12.1.jar` in /opt/spark/jars).
  *
  * Why hand-rolled: the `spark-avro` DataSource MODULE is not in the
  * image (NOTES.md backlog — "env-blocked"), but the core library is,
  * and OCF is all container framing: a header (magic `Obj`,
  * metadata map carrying the writer schema JSON + codec name, a 16-byte
  * sync marker), then blocks of `[row count, byte length, payload,
  * sync]`. The reference engine reads loose text dirs
  * (FileWordCounter.cpp:189-226); Avro shards are the row-oriented wire
  * format the same corpus uses in Kafka/log-shipping pipelines, so the
  * engine must ingest and emit them.
  *
  * Scale contract:
  *  - SINK: one OCF shard per partition, written through the Hadoop
  *    FileSystem API (works against HDFS/S3 on a real cluster, local FS
  *    here) — per-partition independent encode, no driver funnel. The
  *    codec is per-file (`null`, `deflate`, `snappy`, `zstandard` — all
  *    four backing jars are in the image).
  *  - SOURCE: parse-as-filter over whole shard files, one task per
  *    shard, same shape as [[TarSource]]/[[WarcSource]]. OCF blocks are
  *    individually framed so a production reader could split INSIDE a
  *    shard by scanning to the next sync marker; at 100 TB the corpus
  *    arrives as many shard files anyway (the standard log layout), so
  *    whole-shard tasks keep parallelism without that machinery.
  *  - EVOLUTION: Avro resolves writer→reader schemas at read time; the
  *    reader accepts an optional READER schema and the library applies
  *    field defaults for added columns and legal promotions (int→long,
  *    float→double) for changed ones — the contract
  *    `avro_evolution` gates end-to-end.
  *
  * Corruption: DataFileReader verifies codec integrity (deflate/zstd
  * checksums) and block framing; a flipped byte throws rather than
  * yielding garbage rows — pinned in AvroSourceSpec.
  */
object AvroSource {

  /** Spark→Avro schema for the flat projections the queries write.
    * Nullable Spark fields become `union {null, T}` with null default. */
  private[sources] def avroSchemaFor(schema: StructType, name: String): Schema = {
    def base(dt: DataType): Schema = dt match {
      case LongType    => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"avro sink supports flat primitive projections; got $other")
    }
    val fields = schema.fields.map { f =>
      val s =
        if (f.nullable) Schema.createUnion(java.util.List.of(
          Schema.create(Schema.Type.NULL), base(f.dataType)))
        else base(f.dataType)
      new Schema.Field(f.name, s,
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  private def codecFor(name: String): CodecFactory = name match {
    case "null"      => CodecFactory.nullCodec()
    case "deflate"   => CodecFactory.deflateCodec(6)
    case "snappy"    => CodecFactory.snappyCodec()
    case "zstandard" => CodecFactory.zstandardCodec(3)
    case other => throw new IllegalArgumentException(s"unknown avro codec: $other")
  }

  /** Write `df` as `numShards` OCF files under `dir` (replaced if
    * present). Returns the shard paths. Runs as one distributed job:
    * each output partition opens its shard through the Hadoop
    * FileSystem and streams rows — the driver only learns (path, rows).
    */
  def writeShards(df: DataFrame, dir: String, codec: String = "zstandard",
                  numShards: Int = 4): Seq[String] = {
    val spark = df.sparkSession
    val sparkSchema = df.schema
    val schemaJson = avroSchemaFor(sparkSchema, "GraftRecord").toString
    val confSer = new org.apache.spark.SerializableWritable(
      new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration))

    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fsDriver = dirPath.getFileSystem(confSer.value)
    if (fsDriver.exists(dirPath)) fsDriver.delete(dirPath, true)
    fsDriver.mkdirs(dirPath)

    val written = df.repartition(numShards).rdd.mapPartitionsWithIndex { (pid, rows) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val path = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.avro")
      val fs = path.getFileSystem(confSer.value)
      val out = fs.create(path, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(codecFor(codec))
      writer.create(schema, out)
      var n = 0L
      try {
        rows.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < sparkSchema.length) {
            val v = row.get(i) match {
              case null               => null
              case s: String          => new org.apache.avro.util.Utf8(s)
              case b: Array[Byte]     => java.nio.ByteBuffer.wrap(b)
              case x                  => x
            }
            rec.put(i, v)
            i += 1
          }
          writer.append(rec)
          n += 1
        }
      } finally writer.close() // closes the FS stream too
      Iterator((path.toString, n))
    }.collect() // small: one (path, rows) pair per shard

    written.map(_._1).toSeq.sorted
  }

  /** Read OCF shards under `dir` into a DataFrame. `readerSchemaJson`
    * (optional) is the Avro READER schema — the library resolves the
    * file's writer schema against it (added-field defaults, int→long /
    * float→double promotions). Without it, each file is read with its
    * own writer schema (all shards must then agree). */
  def read(spark: SparkSession, dir: String,
           readerSchemaJson: Option[String] = None): DataFrame = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards = fs.listStatus(dirPath).toSeq
      .map(_.getPath.toString).filter(_.endsWith(".avro")).sorted
    require(shards.nonEmpty, s"no .avro shards under $dir")

    // Resolve the OUTPUT schema on the driver from one shard's header
    // (cheap: DataFileStream consumes only the header bytes from the
    // open stream — never the shard body, whatever its size), or from
    // the reader schema if supplied.
    val outAvro = readerSchemaJson match {
      case Some(js) => new Schema.Parser().parse(js)
      case None =>
        val in = fs.open(new org.apache.hadoop.fs.Path(shards.head))
        try {
          val dfs = new org.apache.avro.file.DataFileStream[GenericRecord](
            in, new GenericDatumReader[GenericRecord]())
          try dfs.getSchema finally dfs.close()
        } finally in.close()
    }
    val outSpark = sparkSchemaFor(outAvro)
    // Ship SCHEMA JSON to the executors, never a Schema object — the
    // closure must stay serializable across avro versions.
    val outJson = outAvro.toString
    val hasReader = readerSchemaJson.isDefined

    val rows = FileSources.readWholeFilesBytes(spark, shards).rdd.flatMap { r =>
      val bytes = r.getAs[Array[Byte]]("content")
      val out = new Schema.Parser().parse(outJson)
      val reader =
        if (hasReader) new GenericDatumReader[GenericRecord](null, out)
        else new GenericDatumReader[GenericRecord]()
      val dfr = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(bytes), reader)
      // Lazy row stream (closing on exhaustion): the whole-shard byte
      // array is already in memory; buffering every decoded Row on top
      // of it would double the task's footprint on text-heavy shards.
      // A consumer that stops early (limit/take) never exhausts the
      // iterator, so the task-completion listener closes the reader
      // deterministically — today the input is an in-memory
      // SeekableByteArrayInput (close is a no-op), but the hook keeps
      // that an implementation detail rather than a leak if this source
      // ever switches to streaming file handles (round-18 ADVICE).
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => dfr.close()))
      new Iterator[Row] {
        private var open = true
        def hasNext: Boolean = {
          if (open && !dfr.hasNext) { dfr.close(); open = false }
          open
        }
        def next(): Row = {
          if (!hasNext) throw new NoSuchElementException("exhausted avro shard")
          rowOf(dfr.next(), out)
        }
      }
    }
    spark.createDataFrame(rows, outSpark)
  }

  /** Avro→Spark schema for the flat records this source handles. */
  private[sources] def sparkSchemaFor(avro: Schema): StructType = {
    def dt(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.LONG    => (LongType, false)
      case Schema.Type.INT     => (IntegerType, false)
      case Schema.Type.DOUBLE  => (DoubleType, false)
      case Schema.Type.FLOAT   => (FloatType, false)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.STRING  => (StringType, false)
      case Schema.Type.BYTES   => (BinaryType, false)
      case Schema.Type.UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1, s"unsupported union $s")
        (dt(nonNull.head)._1, true)
      case other => throw new IllegalArgumentException(
        s"avro source supports flat primitive records; got $other")
    }
    StructType(avro.getFields.asScala.toSeq.map { f =>
      val (t, nullable) = dt(f.schema())
      StructField(f.name(), t, nullable)
    })
  }

  private def rowOf(rec: GenericRecord, schema: Schema): Row = {
    val vals = schema.getFields.asScala.toSeq.map { f =>
      rec.get(f.pos()) match {
        case null                          => null
        case u: org.apache.avro.util.Utf8  => u.toString
        case bb: java.nio.ByteBuffer =>
          val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
        case x                             => x
      }
    }
    Row.fromSeq(vals)
  }
}
