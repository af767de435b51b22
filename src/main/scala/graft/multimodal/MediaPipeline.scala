package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north star, BASELINE.json).
  *
  * Images/audio/video are carried as opaque `binary` columns plus typed
  * metadata structs — the standard lakehouse pattern. The Spark-side
  * machinery here is real (schema, typed Dataset, partition-batched
  * processing via mapPartitions — the Scala analogue of a Pandas-UDF
  * `mapInPandas` batch loop); only the innermost byte decode is a STUB,
  * because no image/audio codec libraries exist in this container.
  *
  * Scale notes: decode is a map-only pass — no shuffle; partition sizing
  * is governed by `spark.sql.files.maxPartitionBytes`, and a real decoder
  * would be limited by per-executor memory for frame buffers, which the
  * iterator-based batch loop (one element materialized at a time) respects.
  */
object MediaPipeline {

  /** A row carrying an opaque media payload. */
  case class MediaRow(doc_id: Long, source: String, media: Array[Byte])

  /** Typed metadata the "decoder" extracts per payload. */
  case class MediaMeta(doc_id: Long, source: String, bytes: Long,
                       width: Int, height: Int, n_frames: Int)

  /** STUB decoder — deterministic fake derived from the payload length.
    * A real implementation would parse the container header (JPEG/PNG/
    * WAV/MP4) here; the container image has no codec libs, so the fake
    * keeps every downstream query runnable AND oracle-checkable.
    */
  def decodeStub(media: Array[Byte]): (Int, Int, Int) = {
    val n = media.length
    ((n % 640) + 16, ((n * 7) % 480) + 16, (n % 30) + 1)
  }

  /** Build the media table from documents (payload = utf-8 bytes of text —
    * a stand-in for real blobs, with realistic size variance). */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("media"))

  /** Decode pass: typed Dataset + mapPartitions — the batch shape a real
    * decoder needs (iterator in, iterator out, one partition per task). */
  def decoded(s: SparkSession, dir: String): DataFrame =
    decodedOf(s, mediaTable(s, dir))

  /** Decode pass over ANY (doc_id, source, media) frame. Callers that only
    * need a few payloads should filter BEFORE this call: the typed
    * mapPartitions is a pushdown barrier, so a filter above it still
    * decodes (and scans) the whole corpus. */
  def decodedOf(s: SparkSession, mediaDf: DataFrame): DataFrame = {
    import s.implicits._
    mediaDf.as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, f) = decodeStub(r.media)
          MediaMeta(r.doc_id, r.source, r.media.length.toLong, w, h, f)
        }
      }
      .toDF()
  }
}
