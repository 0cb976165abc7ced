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

  // Feature extraction stub: first-8-byte embedding, exact byte/255
  // float division reproduced by the oracle from codepoints (ASCII
  // corpus → codepoint == UTF-8 byte), surfaced as a flattened column
  // per dimension for stable hashing.
  val features: QueryDef = QueryDef.sql("q_mm_features")(
    s"""SELECT doc_id,
       |  ${(0 until 8).map(i =>
            s"CAST(CASE WHEN length(text) >= ${i + 1} " +
              s"THEN CAST(unicode(substr(text, ${i + 1}, 1)) AS FLOAT) / CAST(255 AS FLOAT) " +
              s"ELSE CAST(0 AS FLOAT) END AS DOUBLE) AS f_$i")
            .mkString(",\n  ")}
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
    Multimodal.extractFeatures(media)
      .select(col("doc_id") +:
        (0 until 8).map(i =>
          element_at(col("features"), i + 1).cast("double").as(s"f_$i")): _*)
      .orderBy("doc_id")
  }

  // Resize stub: aspect-preserving integer downscale to max side 256.
  val resize: QueryDef = QueryDef.sql("q_mm_resize")(
    s"""WITH $metaCte
       |SELECT doc_id, media_type, width, height,
       |  CASE WHEN greatest(width, height) <= 256 OR greatest(width, height) = 0
       |       THEN width ELSE width * 256 // greatest(width, height) END AS rs_width,
       |  CASE WHEN greatest(width, height) <= 256 OR greatest(width, height) = 0
       |       THEN height ELSE height * 256 // greatest(width, height) END AS rs_height
       |FROM meta ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
    Multimodal.resizeMeta(Multimodal.decodeMeta(media), 256)
      .orderBy("doc_id")
  }

  // Cross-modal retrieval pipeline: media rows (decoded metadata) look
  // up their embedding (vec_id == doc_id in the testdata) and fetch
  // their top-3 cosine neighbors from the full embedding corpus — the
  // media→embedding→ANN stitch a multimodal training pipeline runs for
  // near-dup images or retrieval-augmented captioning. Query side
  // broadcasts (tiny), corpus side streams once.
  val retrieval: QueryDef = QueryDef.sql("q_mm_retrieval")(
    s"""WITH $metaCte,
       |n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |        sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                              CAST(embedding AS DOUBLE[]))) AS nrm
       |      FROM embeddings),
       |q AS (SELECT meta.doc_id, meta.media_type, n.v AS qv, n.nrm AS qnrm
       |      FROM meta JOIN n ON n.vec_id = meta.doc_id WHERE meta.doc_id < 20),
       |scored AS (
       |  SELECT q.doc_id, q.media_type, n.vec_id AS neighbor_id,
       |    list_dot_product(qv, v) / (qnrm * nrm) AS cosine
       |  FROM q CROSS JOIN n WHERE n.vec_id <> q.doc_id),
       |ranked AS (SELECT *, ROW_NUMBER() OVER
       |  (PARTITION BY doc_id ORDER BY cosine DESC, neighbor_id) AS rnk FROM scored)
       |SELECT doc_id, media_type, neighbor_id, cosine, rnk FROM ranked
       |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Vectors
    val media = Multimodal.decodeMeta(
        Multimodal.mediaFromDocuments(s, Tables.documents(s, dir)))
      .toDF().select("doc_id", "media_type")
    val n = SimilaritySearch.normed(s, dir)
    val q = media.filter(col("doc_id") < 20)
      .join(n, col("vec_id") === col("doc_id"))
      .select(col("doc_id"), col("media_type"),
        col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = broadcast(q).crossJoin(n)
      .filter(col("vec_id") =!= col("doc_id"))
      .select(col("doc_id"), col("media_type"), col("vec_id").as("neighbor_id"),
        Vectors.cosine(col("qv"), col("v"), col("qnrm"), col("nrm")).as("cosine"))
    val w = Window.partitionBy("doc_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("doc_id", "media_type", "neighbor_id", "cosine", "rnk")
      .orderBy("doc_id", "rnk")
  }

  val all: Seq[QueryDef] = Seq(decodeMeta, frameSample, features, resize, retrieval)
}
