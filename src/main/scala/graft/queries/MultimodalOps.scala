package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalPipeline

/** Multimodal-column plumbing: the `documents.text` bytes stand in for
  * opaque media payloads (`binary` column + typed metadata). The
  * decode step is a clearly-marked deterministic stub (no image/audio
  * codecs in this container — see [[MultimodalPipeline.decodeStub]]);
  * everything Spark-side — schema, binary columns, frame chunking,
  * batch shape — is real and oracle-checked.
  */
object MultimodalOps {

  def entries: Seq[Entry] = Seq(

    // Binary payload + typed metadata extraction.
    Entry("m_binary_meta",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
        MultimodalPipeline.withPayload(d, col("text"))
          .select(col("doc_id"),
            octet_length(col("payload")).cast("long").as("n_bytes"),
            md5(col("payload")).as("payload_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, strlen(text) AS n_bytes, md5(text) AS payload_md5
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Fixed-size frame sampling (first 4 frames of 64 bytes each) —
    // the video-frame-extraction shape: explode(payload → frames).
    Entry("m_frame_sample",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
        MultimodalPipeline.sampleFrames(d, col("text"), frameBytes = 64,
            maxFrames = 4)
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""SELECT doc_id, i AS frame_idx,
        |  md5(substr(text, CAST(i * 64 + 1 AS INT), 64)) AS frame_md5,
        |  strlen(substr(text, CAST(i * 64 + 1 AS INT), 64)) AS frame_len
        |FROM documents,
        |  unnest(generate_series(0, least(3, (strlen(text) - 1) // 64))) t(i)
        |ORDER BY doc_id, frame_idx""".stripMargin)),

    // Deterministic stub "feature extraction" from raw bytes — the
    // embedding-from-media shape with a fake feature vector.
    // The feature vector is serialized to a comma-joined string in the
    // final projection (fixed order, so lossless): the driver's
    // comparator cannot sort/hash array cells.
    Entry("m_feature_stub",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
        MultimodalPipeline.featureStub(d, col("text"))
          .select(col("doc_id"),
            concat_ws(",", col("features").cast("array<string>"))
              .as("features"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
        |  array_to_string([strlen(text),
        |   len(string_split(text, ' ')),
        |   strlen(text) - strlen(regexp_replace(text, '[aeiou]', '', 'g')),
        |   strlen(text) - strlen(regexp_replace(text, '[0-9]', '', 'g'))
        |  ]::BIGINT[], ',') AS features
        |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
