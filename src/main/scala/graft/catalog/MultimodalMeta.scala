package graft.catalog

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.ops.Multimodal

/** Multimodal-column queries: binary payload → typed metadata through
  * the partition-wise (stub) decoder, and frame sampling over the
  * decoded metadata. The oracle reproduces the stub's deterministic
  * arithmetic from the text byte length.
  */
object MultimodalMeta {

  private val metaCte =
    """m AS (SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents),
      |meta AS (SELECT doc_id, media_type, n_bytes,
      |  CASE media_type WHEN 'audio' THEN 0 ELSE 64 + n_bytes % 577 END AS width,
      |  CASE media_type WHEN 'audio' THEN 0 ELSE 64 + (n_bytes * 31) % 577 END AS height,
      |  CASE media_type WHEN 'video' THEN n_bytes // 100 + 1 ELSE 1 END AS n_frames,
      |  CASE media_type WHEN 'image' THEN 'png' WHEN 'audio' THEN 'wav' ELSE 'mp4' END AS format
      |  FROM m)""".stripMargin

  val decodeMeta: QueryDef = QueryDef.sql("q_mm_decode_meta")(
    s"""WITH $metaCte
       |SELECT doc_id, media_type, n_bytes, width, height, n_frames, format
       |FROM meta ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
    Multimodal.decodeMeta(media).toDF().orderBy("doc_id")
  }

  val frameSample: QueryDef = QueryDef.sql("q_mm_frame_sample")(
    s"""WITH $metaCte,
       |f AS (SELECT doc_id, UNNEST(range(0, n_frames, 5)) AS frame_idx
       |      FROM meta WHERE media_type = 'video')
       |SELECT doc_id, frame_idx FROM f ORDER BY doc_id, frame_idx""".stripMargin) {
    (s, dir) =>
      val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
      Multimodal.sampleFrames(Multimodal.decodeMeta(media), 5)
        .orderBy("doc_id", "frame_idx")
  }

  val all: Seq[QueryDef] = Seq(decodeMeta, frameSample)
}
