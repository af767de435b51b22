package graft.operators

import graft.QueryPack
import graft.Portable.round4
import graft.multimodal.MediaPipeline
import org.apache.spark.sql.functions._

/** Queries over the multimodal (binary media) pipeline.
  *
  * The decode step is a deterministic stub (see MediaPipeline.decodeStub),
  * so the oracle can replicate its arithmetic from strlen(text) —
  * documents are ASCII, so utf-8 byte length == n_chars.
  */
object MultimodalQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // Per-source media statistics after the mapPartitions decode pass.
    "mm_meta_stats" -> ((s, d) =>
      MediaPipeline.decoded(s, d)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_media"),
          sum("bytes").as("total_bytes"),
          round4(avg("width")).as("avg_width"),
          round4(avg("height")).as("avg_height"),
          max("n_frames").as("max_frames"))
        .orderBy("source")),

    // Frame sampling: every 5th frame of each payload — explode of a
    // generated sequence, the shape a video pipeline uses before per-frame
    // feature extraction.
    "mm_frame_sample" -> ((s, d) =>
      MediaPipeline.decoded(s, d)
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
        .filter(col("frame_idx") % 5 === 0)
        .groupBy("source")
        .agg(count(lit(1)).as("n_sampled_frames"))
        .orderBy("source")),

    // Resize plan: target bounding box 224×224 preserving aspect ratio —
    // pure metadata arithmetic (the real resize would be a mapInPandas/
    // mapPartitions kernel over the binary column).
    "mm_resize_plan" -> ((s, d) =>
      MediaPipeline.decoded(s, d)
        .withColumn("scale",
          least(lit(224.0) / col("width"), lit(224.0) / col("height")))
        .select(
          col("doc_id"),
          col("width"), col("height"),
          floor(col("width") * col("scale")).cast("int").as("out_w"),
          floor(col("height") * col("scale")).cast("int").as("out_h"))
        .orderBy("doc_id"))
  )

  // Oracle mirrors decodeStub arithmetic on strlen(text) (ASCII ⇒
  // byte length == char length).
  val oracleSql: Map[String, String] = Map(
    "mm_meta_stats" ->
      """WITH m AS (SELECT doc_id, source, strlen(text) AS b FROM documents),
            meta AS (SELECT doc_id, source, CAST(b AS BIGINT) AS bytes,
                            (b % 640) + 16 AS width,
                            ((b * 7) % 480) + 16 AS height,
                            (b % 30) + 1 AS n_frames
                     FROM m)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_media,
                CAST(SUM(bytes) AS BIGINT) AS total_bytes,
                FLOOR(AVG(width)*10000 + 0.5)/10000 AS avg_width,
                FLOOR(AVG(height)*10000 + 0.5)/10000 AS avg_height,
                CAST(MAX(n_frames) AS INT) AS max_frames
         FROM meta GROUP BY source ORDER BY source""",
    "mm_frame_sample" ->
      """WITH m AS (SELECT doc_id, source, (strlen(text) % 30) + 1 AS n_frames FROM documents),
            fr AS (SELECT source, unnest(range(n_frames)) AS frame_idx FROM m)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled_frames
         FROM fr WHERE frame_idx % 5 = 0 GROUP BY source ORDER BY source""",
    "mm_resize_plan" ->
      """WITH meta AS (SELECT doc_id,
                              (strlen(text) % 640) + 16 AS width,
                              ((strlen(text) * 7) % 480) + 16 AS height
                       FROM documents)
         SELECT doc_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
                CAST(FLOOR(width * LEAST(224.0 / width, 224.0 / height)) AS INT) AS out_w,
                CAST(FLOOR(height * LEAST(224.0 / width, 224.0 / height)) AS INT) AS out_h
         FROM meta ORDER BY doc_id"""
  )
}
