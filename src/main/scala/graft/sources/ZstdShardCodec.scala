package graft.sources

import java.io.{InputStream, OutputStream}

import com.github.luben.zstd.{ZstdInputStreamNoFinalizer, ZstdOutputStreamNoFinalizer}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream, CompressionOutputStream, Compressor, Decompressor}
import org.apache.spark.sql.SparkSession

/** Pure-JVM zstd codec for Spark's TEXT sources/sinks (`.jsonl.zst` /
  * `.csv.zst` shards — the Common Crawl alternative wire format the WARC
  * path already ingests via [[WarcSource.recordsZst]]).
  *
  * Hadoop ships `ZStandardCodec`, but it hard-requires the NATIVE
  * libhadoop+libzstd pair (`System.loadLibrary("hadoop")`) that most
  * Spark deployments — including this sandbox — do not carry; without it
  * every `.zst` text read/write throws `native zstd library not
  * available`. Spark itself uses zstd-jni (pure JVM-loadable) for
  * shuffle/parquet, so this codec closes the gap: the SAME zstd-jni
  * streams, exposed through Hadoop's `CompressionCodec` SPI, which is
  * all Spark's text formats need for both directions:
  *
  *  - WRITE: `df.write.option("compression", classOf[ZstdShardCodec]
  *    .getName).json(dir)` — Spark resolves the FQCN through
  *    `CompressionCodecs.getCodecClassName` and suffixes part files with
  *    [[ZstdShardCodec.Extension]].
  *  - READ: [[ZstdShardCodec.register]] splices the class into the
  *    Hadoop `io.compression.codecs` list (APPENDED to the resolved
  *    defaults — setting the key replaces ServiceLoader discovery, so a
  *    naive set would silently break `.gz`/`.bz2` reads), after which
  *    `spark.read.json/csv/text` decode `.zst` files by extension with
  *    one decompressing task per shard.
  *
  * Scale contract (same as gzip text): a zstd frame is NOT splittable,
  * so one `.zst` shard = one task regardless of size — a 100 TB corpus
  * must arrive as many shard files (the standard crawl layout). For a
  * splittable archival layout use zstd PARQUET
  * (`parquet_zstd_roundtrip`), which compresses per column chunk.
  *
  * Stream discipline:
  *  - frames carry content checksums ([[ZOut]] sets `setChecksum(true)`);
  *    zstd-jni verifies them on read, so shard corruption fails loudly
  *    instead of parsing garbage.
  *  - the reader runs `setContinuous(true)`: CONCATENATED frames decode
  *    as one logical stream — `cat a.zst b.zst > c.zst` stays readable,
  *    exactly like Hadoop's multi-member gzip handling (and DuckDB's
  *    zstd reader, which the `jsonl_zst_roundtrip` oracle runs over the
  *    very same bytes).
  *  - the `Compressor`/`Decompressor` SPI slots are inert tokens
  *    ([[NullCompressor]]/[[NullDecompressor]]): zstd-jni is
  *    stream-based, so both `createInputStream`/`createOutputStream`
  *    overloads ignore the pooled object — but they return NON-null
  *    types so `CodecPool` borrow/return cycles (LineRecordReader does
  *    one per split) never trip on a null-keyed pool.
  */
final class ZstdShardCodec extends CompressionCodec {
  import ZstdShardCodec._

  override def createOutputStream(out: OutputStream): CompressionOutputStream = new ZOut(out)
  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream = new ZOut(out)
  override def getCompressorType: Class[_ <: Compressor] = classOf[NullCompressor]
  override def createCompressor(): Compressor = new NullCompressor
  override def createInputStream(in: InputStream): CompressionInputStream = new ZIn(in)
  override def createInputStream(in: InputStream, d: Decompressor): CompressionInputStream = new ZIn(in)
  override def getDecompressorType: Class[_ <: Decompressor] = classOf[NullDecompressor]
  override def createDecompressor(): Decompressor = new NullDecompressor
  override def getDefaultExtension: String = Extension
}

object ZstdShardCodec {
  val Extension = ".zst"

  /** zstd level 3 — the library default; the shard-size/ratio tradeoff
    * knob belongs to the writer job, not this codec. */
  val Level = 3

  private val CodecsKey = "io.compression.codecs"

  /** Idempotently append this codec to the session's Hadoop codec list so
    * `.zst` text files resolve by extension. Must run on the DRIVER before
    * the read is planned (the hadoopConf snapshot ships to executors with
    * the scan). Appending LAST also wins the `.zst` extension over
    * Hadoop's native-only ZStandardCodec if a deployment lists it. */
  def register(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val cls = classOf[ZstdShardCodec].getName
    val cur = Option(conf.get(CodecsKey))
    if (!cur.exists(_.contains(cls))) {
      val base = cur match {
        case Some(list) => list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        case None =>
          // Key unset ⇒ Hadoop would discover codecs via ServiceLoader;
          // SETTING the key replaces that, so resolve the defaults first
          // and splice rather than clobber.
          import scala.jdk.CollectionConverters._
          org.apache.hadoop.io.compress.CompressionCodecFactory
            .getCodecClasses(conf).asScala.map(_.getName).toSeq
      }
      conf.set(CodecsKey, (base :+ cls).distinct.mkString(","))
    }
  }

  /** One zstd frame per shard: epilogue + checksum written on close. */
  private final class ZOut(raw: OutputStream) extends CompressionOutputStream(raw) {
    private val z = new ZstdOutputStreamNoFinalizer(raw, Level)
    z.setChecksum(true)
    private var closed = false

    override def write(b: Int): Unit = z.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit = z.write(b, off, len)
    override def flush(): Unit = z.flush()
    // finish() must end the frame WITHOUT closing the underlying stream
    // (the base close() calls finish() then out.close()): flip zstd-jni's
    // close-frame-on-flush latch for one flush. Writes after finish()
    // start a new frame — legal under the reader's continuous mode.
    override def finish(): Unit = {
      z.setCloseFrameOnFlush(true)
      z.flush()
      z.setCloseFrameOnFlush(false)
    }
    // SequenceFile block-reset hook; text shards never reset mid-stream.
    override def resetState(): Unit = ()
    override def close(): Unit = if (!closed) {
      closed = true
      z.close() // frame epilogue + native ctx release + raw close
    }
  }

  private final class ZIn(raw: InputStream) extends CompressionInputStream(raw) {
    private val z = new ZstdInputStreamNoFinalizer(raw)
    z.setContinuous(true)
    private var closed = false

    override def read(): Int = z.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int = z.read(b, off, len)
    override def available(): Int = z.available()
    override def resetState(): Unit = ()
    override def close(): Unit = if (!closed) {
      closed = true
      z.close() // native ctx release + raw close
    }
  }

  /** Inert CodecPool token — see the class Scaladoc. Hard-fails if any
    * code path ever tries to use it as a real block compressor. */
  private[sources] final class NullCompressor extends Compressor {
    private def unused = throw new UnsupportedOperationException(
      "ZstdShardCodec is stream-based; its Compressor is an inert pool token")
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = unused
    override def needsInput(): Boolean = unused
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = unused
    override def getBytesRead: Long = 0L
    override def getBytesWritten: Long = 0L
    override def finish(): Unit = unused
    override def finished(): Boolean = unused
    override def compress(b: Array[Byte], off: Int, len: Int): Int = unused
    override def reset(): Unit = () // CodecPool return-path calls this
    override def end(): Unit = ()
    override def reinit(conf: Configuration): Unit = ()
  }

  private[sources] final class NullDecompressor extends Decompressor {
    private def unused = throw new UnsupportedOperationException(
      "ZstdShardCodec is stream-based; its Decompressor is an inert pool token")
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = unused
    override def needsInput(): Boolean = unused
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = unused
    override def needsDictionary(): Boolean = false
    override def finished(): Boolean = unused
    override def decompress(b: Array[Byte], off: Int, len: Int): Int = unused
    override def getRemaining: Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }
}
