package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.multimodal.MultimodalPipeline

/** Multimodal-column plumbing: the `documents.text` bytes stand in for
  * opaque media payloads (`binary` column + typed metadata). The
  * generic decode step is a clearly-marked deterministic stub (no
  * image/audio codecs in this container — see
  * [[MultimodalPipeline.decodeStub]]) EXCEPT for uncompressed 24bpp
  * BMP, which needs no library and is encoded+decoded for real with
  * pure byte arithmetic (m_image_decode /
  * [[graft.functions.BmpDecodeExpr]]); everything Spark-side —
  * schema, binary columns, frame chunking, batch shape — is real and
  * oracle-checked.
  */
object MultimodalOps {

  /** Shared with StreamingOps (s37): the incremental CDC chunk-dedup
    * state must converge to exactly this batch sharing report. Built
    * from the same winnowing hash constants as
    * MultimodalPipeline.cdcChunkHashes, so split points agree
    * byte-for-byte across engines. */
  private[queries] val cdcChunkOracleSql: String = {
    import graft.functions.TextFunctions.{polyPowers, winnowP}
    val w = 16
    // hash of the 16-gram STARTING at i (1-based), exactly as
    // polyWindowHashes computes it: sum(ord(char)·B^(k-1-j)) mod P
    val hashExpr = polyPowers(w).zipWithIndex.map { case (p, j) =>
      s"ord(substr(text, CAST(i + $j AS INT), 1))::BIGINT * ${p}"
    }.mkString("(", " + ", s") % $winnowP")
    s"""WITH c AS (SELECT doc_id, text, length(text) AS len,
      |  list_transform(
      |    list_filter(generate_series(1, length(text) - ${w - 1}), i ->
      |      $hashExpr % 32 = 0 AND i + ${w - 1} < length(text)),
      |    i -> i + ${w - 1}) AS bnd
      |  FROM documents),
      |s AS (SELECT doc_id, text,
      |  list_concat([1], list_transform(bnd, b -> b + 1)) AS starts,
      |  list_concat(bnd, [len]) AS ends FROM c),
      |ch AS (SELECT doc_id,
      |  unnest(list_transform(generate_series(1, len(starts)), k ->
      |    md5(substr(text, CAST(starts[k] AS INT),
      |      CAST(ends[k] - starts[k] + 1 AS INT))))) AS chunk_md5
      |  FROM s)
      |SELECT chunk_md5, count(*) AS n_chunks,
      |  count(DISTINCT doc_id) AS n_docs
      |FROM ch GROUP BY 1 HAVING count(DISTINCT doc_id) > 1
      |ORDER BY chunk_md5""".stripMargin
  }

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
      // strlen (BYTES) is correct here — it pairs with Spark's
      // octet_length over the binary payload. The char-indexed rows
      // below pair with Spark's length()/substr() and use DuckDB
      // length() (characters) so they stay exact on non-ASCII text.
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
        |  length(substr(text, CAST(i * 64 + 1 AS INT), 64)) AS frame_len
        |FROM documents,
        |  unnest(generate_series(0, least(3, (length(text) - 1) // 64))) t(i)
        |ORDER BY doc_id, frame_idx""".stripMargin)),

    // Content-chunk storage dedup: chunk every payload into fixed
    // 64-byte blocks, hash each, and report blocks shared across
    // documents — the chunk-level dedup a media lake runs to avoid
    // storing the same bytes twice (fixed-size chunking here; a
    // content-defined (rolling-hash) chunker changes only the split
    // points, not this plan). One shuffle on the chunk hash with
    // map-side partials; the exact countDistinct adds the standard
    // second shuffle and swaps for approx_count_distinct at 100 TB.
    Entry("m_chunk_dedup",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
        MultimodalPipeline.chunkHashes(d, col("text"), chunkBytes = 64)
          .groupBy(col("chunk_md5"))
          .agg(count(lit(1)).as("n_chunks"),
            countDistinct(col("doc_id")).as("n_docs"))
          .filter(col("n_docs") > 1)
          .orderBy(col("chunk_md5"))
      },
      Some("""WITH c AS (SELECT doc_id,
        |  unnest(list_transform(
        |    generate_series(0, CAST((length(text) - 1) // 64 AS INT)),
        |    i -> md5(substr(text, CAST(i * 64 + 1 AS INT), 64)))) AS chunk_md5
        |  FROM documents)
        |SELECT chunk_md5, count(*) AS n_chunks,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM c GROUP BY 1 HAVING count(DISTINCT doc_id) > 1
        |ORDER BY chunk_md5""".stripMargin)),

    // Content-DEFINED chunk dedup: same sharing report as m_chunk_dedup
    // but with Rabin-style content-aligned split points (boundary after
    // byte b iff the polynomial rolling hash of the 16-byte window
    // ending at b is ≡ 0 mod 32 — see MultimodalPipeline
    // .cdcChunkHashes), so an insertion in one document no longer
    // shifts — and thus breaks — every downstream chunk match. The
    // DuckDB oracle below is BUILT from the same winnowing hash
    // constants (TextFunctions.polyPowers), so split points agree
    // byte-for-byte across engines; integer hashing keeps the boundary
    // scan ~10× faster than a digest-per-position rule (measured
    // 5.5 s → sub-second at sf0.1).
    Entry("m_chunk_cdc",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
        MultimodalPipeline.cdcChunkHashes(d, col("text"), window = 16,
            divisor = 32)
          .groupBy(col("chunk_md5"))
          .agg(count(lit(1)).as("n_chunks"),
            countDistinct(col("doc_id")).as("n_docs"))
          .filter(col("n_docs") > 1)
          .orderBy(col("chunk_md5"))
      },
      Some(cdcChunkOracleSql)),

    // REAL image decode (not the stub): a deterministic 24bpp BMP is
    // rendered per doc_id (width 4–8 × height 5–8, so every 4-byte
    // row-padding case 0–3 occurs), and BmpDecodeExpr parses the
    // actual container — magic, little-endian header fields, pixel
    // offset, stride, bottom-up row order, BGR channel order — into
    // per-channel pixel stats. The pixel pattern is closed-form, so
    // the oracle reproduces the expected stats (and the exact file
    // size) analytically: any mistake in either side of the
    // encode→bytes→decode round trip breaks the hash. Both codec
    // sides are native expressions compiled as one static call per
    // row inside whole-stage codegen; at 100 TB this is the
    // scan-local, shuffle-free decode stage of a media-lake pipeline
    // (a JPEG/audio codec swaps in at the same call site — see
    // MultimodalPipeline.decodeBmp).
    Entry("m_image_decode",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents").select(col("doc_id"))
        d.withColumn("payload", MultimodalPipeline.encodeBmp(col("doc_id")))
          .withColumn("img", MultimodalPipeline.decodeBmp(col("payload")))
          .select(col("doc_id"),
            col("img.width").as("width"),
            col("img.height").as("height"),
            col("img.n_pixels").as("n_pixels"),
            octet_length(col("payload")).cast("long").as("n_bytes"),
            round(col("img.sum_r") / col("img.n_pixels"), 6).as("mean_r"),
            round(col("img.sum_g") / col("img.n_pixels"), 6).as("mean_g"),
            round(col("img.sum_b") / col("img.n_pixels"), 6).as("mean_b"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH g AS (SELECT doc_id,
        |    (4 + doc_id % 5)::INT AS w, (5 + doc_id % 4)::INT AS h
        |  FROM documents),
        |px AS (SELECT doc_id, w, h,
        |    CAST(sum((doc_id*7 + y*31 + x*13) % 251) AS BIGINT) AS sum_r,
        |    CAST(sum((doc_id*7 + y*31 + x*13 + 5) % 251) AS BIGINT) AS sum_g,
        |    CAST(sum((doc_id*7 + y*31 + x*13 + 10) % 251) AS BIGINT) AS sum_b
        |  FROM g, unnest(generate_series(0, w - 1)) gx(x),
        |    unnest(generate_series(0, h - 1)) gy(y)
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, w AS width, h AS height,
        |  (w * h)::BIGINT AS n_pixels,
        |  (54 + ((w * 3 + 3) // 4) * 4 * h)::BIGINT AS n_bytes,
        |  round(sum_r::DOUBLE / (w * h), 6) AS mean_r,
        |  round(sum_g::DOUBLE / (w * h), 6) AS mean_g,
        |  round(sum_b::DOUBLE / (w * h), 6) AS mean_b
        |FROM px ORDER BY doc_id""".stripMargin)),

    // REAL image RESIZE — the remaining multimodal-pipeline verb
    // (decode / feature-extract / frame-sample / RESIZE) made real:
    // each document's BMP is nearest-neighbor resampled to a fixed
    // 4×4 thumbnail by BmpResizeExpr, which PARSES the actual
    // container (both row orders, stride re-padding), samples source
    // pixel (⌊x·w/4⌋, ⌊y·h/4⌋) per output pixel, and re-encodes a
    // spec-complete BMP — which the REAL decoder then re-parses for
    // the emitted stats, so the round trip encode→resize→decode is
    // exercised end-to-end. Scan-local native codegen expressions
    // (no shuffle, no UDF); at 100 TB a thumbnail stage is exactly
    // this: an embarrassingly parallel per-row transform whose output
    // bytes (102/doc here) are a fraction of the input's. The
    // closed-form pixel pattern makes the resampled sums analytic,
    // so the NN source-index math is hash-checked too.
    Entry("m_image_resize",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents").select(col("doc_id"))
        d.withColumn("payload", MultimodalPipeline.encodeBmp(col("doc_id")))
          .withColumn("thumb",
            MultimodalPipeline.resizeBmp(col("payload"), 4, 4))
          .withColumn("img", MultimodalPipeline.decodeBmp(col("thumb")))
          .select(col("doc_id"),
            col("img.width").as("width"),
            col("img.height").as("height"),
            octet_length(col("thumb")).cast("long").as("n_bytes"),
            col("img.sum_r").as("sum_r"),
            col("img.sum_g").as("sum_g"),
            col("img.sum_b").as("sum_b"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH g AS (SELECT doc_id,
        |    (4 + doc_id % 5)::INT AS w, (5 + doc_id % 4)::INT AS h
        |  FROM documents),
        |px AS (SELECT doc_id,
        |    CAST(sum((doc_id*7 + ((y*h)//4)*31 + ((x*w)//4)*13) % 251)
        |      AS BIGINT) AS sum_r,
        |    CAST(sum((doc_id*7 + ((y*h)//4)*31 + ((x*w)//4)*13 + 5) % 251)
        |      AS BIGINT) AS sum_g,
        |    CAST(sum((doc_id*7 + ((y*h)//4)*31 + ((x*w)//4)*13 + 10) % 251)
        |      AS BIGINT) AS sum_b
        |  FROM g, unnest(generate_series(0, 3)) gx(x),
        |    unnest(generate_series(0, 3)) gy(y)
        |  GROUP BY 1)
        |SELECT doc_id, 4 AS width, 4 AS height,
        |  102::BIGINT AS n_bytes, sum_r, sum_g, sum_b
        |FROM px ORDER BY doc_id""".stripMargin)),

    // REAL COMPRESSED image decode — PNG, the first multimodal rung
    // whose pixels are NOT raw bytes in the container: the payload is
    // a spec-complete 8-bit truecolor PNG (zlib-deflated scanlines,
    // per-row filter types cycling through all five, IDAT split in
    // two, CRC-32 per chunk) and PngDecodeExpr decodes it the way a
    // real reader must — chunk walk with CRC verification, multi-IDAT
    // concatenation, JDK-zlib inflate, then unfiltering every row
    // (Sub/Up/Average/Paeth predictors included) into per-channel
    // sums. The pixel pattern is the SAME closed form as the BMP rung,
    // so the oracle reproduces the stats analytically and the whole
    // deflate→inflate→unfilter round trip is hash-checked; the only
    // container property deliberately NOT emitted is the compressed
    // byte size (deflate output is a zlib implementation detail, not
    // part of the decode contract — PngCodecSpec asserts the
    // round-trip identity instead). Scan-local native codegen like
    // every decode rung: the 100 TB shape is unchanged.
    Entry("m_png_decode",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents").select(col("doc_id"))
        d.withColumn("payload", MultimodalPipeline.encodePng(col("doc_id")))
          .withColumn("img", MultimodalPipeline.decodePng(col("payload")))
          .select(col("doc_id"),
            col("img.width").as("width"),
            col("img.height").as("height"),
            col("img.bit_depth").as("bit_depth"),
            col("img.n_pixels").as("n_pixels"),
            round(col("img.sum_r") / col("img.n_pixels"), 6).as("mean_r"),
            round(col("img.sum_g") / col("img.n_pixels"), 6).as("mean_g"),
            round(col("img.sum_b") / col("img.n_pixels"), 6).as("mean_b"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH g AS (SELECT doc_id,
        |    (4 + doc_id % 5)::INT AS w, (5 + doc_id % 4)::INT AS h
        |  FROM documents),
        |px AS (SELECT doc_id, w, h,
        |    CAST(sum((doc_id*7 + y*31 + x*13) % 251) AS BIGINT) AS sum_r,
        |    CAST(sum((doc_id*7 + y*31 + x*13 + 5) % 251) AS BIGINT) AS sum_g,
        |    CAST(sum((doc_id*7 + y*31 + x*13 + 10) % 251) AS BIGINT) AS sum_b
        |  FROM g, unnest(generate_series(0, w - 1)) gx(x),
        |    unnest(generate_series(0, h - 1)) gy(y)
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, w AS width, h AS height, 8 AS bit_depth,
        |  (w * h)::BIGINT AS n_pixels,
        |  round(sum_r::DOUBLE / (w * h), 6) AS mean_r,
        |  round(sum_g::DOUBLE / (w * h), 6) AS mean_g,
        |  round(sum_b::DOUBLE / (w * h), 6) AS mean_b
        |FROM px ORDER BY doc_id""".stripMargin)),

    // VIDEO = CONTAINER OF FRAMES, with REAL per-frame decode: the
    // composition that closes the third modality. Each document's
    // "video" payload is four equal-size 24bpp BMP frames
    // concatenated (frame f rendered for id doc_id·80 + f·20 — the
    // ·80/·20 stride pins width/height mod 5/4, so every frame is the
    // same 114-byte 4×5 container and frame offsets are pure
    // arithmetic, exactly how raw video frame extraction addresses a
    // fixed-size frame stream). The query is m_frame_sample's explode
    // shape with the decode stub replaced by the REAL BmpDecodeExpr on
    // each frame slice: one row per (doc, frame) with decoded pixel
    // stats. Scan-local (sequence + substr + native decode — no
    // shuffle, no UDF); the oracle re-derives every frame's stats
    // analytically, so frame offsets, slicing, and per-frame decode
    // are all hash-checked.
    Entry("m_video_frames",
      (spark, dir) => {
        val frameLen = 114 // 54-byte headers + 5 rows × 12-byte stride
        val d = Registry.table(spark, dir, "documents").select(col("doc_id"))
        d.withColumn("payload",
            concat((0 until 4).map(f =>
              MultimodalPipeline.encodeBmp(col("doc_id") * 80 + f * 20)): _*))
          .select(col("doc_id"),
            posexplode(expr(s"transform(sequence(0, 3), " +
              s"f -> substring(payload, f * $frameLen + 1, $frameLen))"))
              .as(Seq("frame_idx", "frame")))
          .withColumn("img", MultimodalPipeline.decodeBmp(col("frame")))
          .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
            col("img.width").as("width"), col("img.height").as("height"),
            col("img.sum_r").as("sum_r"), col("img.sum_g").as("sum_g"),
            col("img.sum_b").as("sum_b"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""WITH fr AS (SELECT doc_id, f, doc_id * 80 + f * 20 AS fid
        |  FROM documents, unnest(generate_series(0, 3)) t(f)),
        |px AS (SELECT doc_id, f,
        |    CAST(sum((fid*7 + y*31 + x*13) % 251) AS BIGINT) AS sum_r,
        |    CAST(sum((fid*7 + y*31 + x*13 + 5) % 251) AS BIGINT) AS sum_g,
        |    CAST(sum((fid*7 + y*31 + x*13 + 10) % 251) AS BIGINT) AS sum_b
        |  FROM fr, unnest(generate_series(0, 3)) gx(x),
        |    unnest(generate_series(0, 4)) gy(y)
        |  GROUP BY 1, 2)
        |SELECT doc_id, f AS frame_idx, 4 AS width, 5 AS height,
        |  sum_r, sum_g, sum_b
        |FROM px ORDER BY doc_id, frame_idx""".stripMargin)),

    // SCENE-CUT DETECTION — the standard shot-boundary heuristic over
    // the REAL per-frame decodes (frame-difference thresholding on
    // channel statistics, the public PySceneDetect/FFmpeg
    // `select=gt(scene,..)` approach): per consecutive frame pair the
    // L1 distance of the decoded per-channel pixel sums, a cut where
    // the difference exceeds the DOC-RELATIVE bar (diff·3 > Σdiffs ⟺
    // diff > its video's mean — cross-multiplied integers, no float
    // drift; production exposes the ratio as the sensitivity knob).
    // The decode is the genuine BmpDecodeExpr chunk of m_video_frames;
    // differencing adds one per-doc window over the frame index —
    // frames of a video are co-partitioned by doc_id, so at 100 TB
    // cut detection never shuffles pixels, only the 3-sum stat rows.
    Entry("m_video_scene_cut",
      (spark, dir) => sceneCutFrom(videoFrameStats(
        Registry.table(spark, dir, "documents").select(col("doc_id")))),
      Some(sceneCutOracleSql)),

    // REAL audio decode — the second real-codec rung (audio modality):
    // a deterministic stereo 16-bit PCM RIFF/WAVE is rendered per
    // doc_id (varying frame counts; signed samples spanning both
    // polarities so two's-complement handling is exercised, and a junk
    // LIST chunk between fmt and data so the decoder's CHUNK WALK is
    // provably real — a hardcoded-offset parser fails on it), then
    // WavDecodeExpr walks the chunks, validates the PCM format fields,
    // and scans the signed little-endian samples into per-channel sums
    // and the absolute peak. Closed-form signal → the oracle
    // reproduces the stats and exact container size analytically.
    // Native expressions, one static call per row in whole-stage
    // codegen; scan-local at 100 TB like m_image_decode.
    Entry("m_audio_decode",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents").select(col("doc_id"))
        d.withColumn("payload", MultimodalPipeline.encodeWav(col("doc_id")))
          .withColumn("au", MultimodalPipeline.decodeWav(col("payload")))
          .select(col("doc_id"),
            col("au.channels").as("channels"),
            col("au.sample_rate").as("sample_rate"),
            col("au.bits").as("bits"),
            col("au.n_frames").as("n_frames"),
            octet_length(col("payload")).cast("long").as("n_bytes"),
            col("au.sum_l").as("sum_l"),
            col("au.sum_r").as("sum_r"),
            col("au.peak").as("peak"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH g AS (SELECT doc_id,
        |    (64 + (doc_id % 5) * 16)::BIGINT AS n FROM documents),
        |sm AS (SELECT doc_id, n,
        |    CAST(sum(((doc_id*31 + i*17) % 2003) - 1001) AS BIGINT) AS sum_l,
        |    CAST(sum(((doc_id*31 + i*17 + 7) % 2003) - 1001) AS BIGINT) AS sum_r,
        |    CAST(max(GREATEST(abs(((doc_id*31 + i*17) % 2003) - 1001),
        |      abs(((doc_id*31 + i*17 + 7) % 2003) - 1001))) AS INT) AS peak
        |  FROM g, unnest(generate_series(0, n - 1)) t(i)
        |  GROUP BY 1, 2)
        |SELECT doc_id, 2 AS channels, 8000 AS sample_rate, 16 AS bits,
        |  n AS n_frames, (68 + 4 * n)::BIGINT AS n_bytes,
        |  sum_l, sum_r, peak
        |FROM sm ORDER BY doc_id""".stripMargin)),

    // REAL audio RESAMPLE — the audio twin of m_image_resize: each
    // document's WAV is decimated 2× by WavResampleExpr, which
    // chunk-walks and validates the actual container (the junk LIST
    // chunk is dropped like a normalizing transcoder would), keeps
    // every second frame, and re-encodes a spec-complete RIFF/WAVE at
    // half the sample rate — which the REAL decoder then re-parses
    // for the emitted stats, so encode→resample→decode runs on
    // genuine containers end-to-end. Scan-local native codegen; at
    // 100 TB this is the rate-normalization pass before feature
    // extraction, an embarrassingly parallel per-row transform that
    // halves the bytes. Closed-form signal → the oracle re-derives
    // the kept-frame sums/peak and exact output container size
    // analytically, hash-checking the decimation index math.
    Entry("m_audio_resample",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents").select(col("doc_id"))
        d.withColumn("payload", MultimodalPipeline.encodeWav(col("doc_id")))
          .withColumn("half",
            MultimodalPipeline.resampleWav(col("payload"), 2))
          .withColumn("a", MultimodalPipeline.decodeWav(col("half")))
          .select(col("doc_id"),
            col("a.channels").as("channels"),
            col("a.sample_rate").as("sample_rate"),
            col("a.n_frames").as("n_frames"),
            octet_length(col("half")).cast("long").as("n_bytes"),
            col("a.sum_l").as("sum_l"),
            col("a.sum_r").as("sum_r"),
            col("a.peak").as("peak"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH g AS (SELECT doc_id,
        |    (64 + (doc_id % 5) * 16)::BIGINT AS n FROM documents),
        |k AS (SELECT doc_id, n // 2 AS kept FROM g),
        |sm AS (SELECT doc_id, kept,
        |    CAST(sum(((doc_id*31 + 2*j*17) % 2003) - 1001) AS BIGINT)
        |      AS sum_l,
        |    CAST(sum(((doc_id*31 + 2*j*17 + 7) % 2003) - 1001) AS BIGINT)
        |      AS sum_r,
        |    CAST(max(GREATEST(abs(((doc_id*31 + 2*j*17) % 2003) - 1001),
        |      abs(((doc_id*31 + 2*j*17 + 7) % 2003) - 1001))) AS INT)
        |      AS peak
        |  FROM k, unnest(generate_series(0, kept - 1)) t(j)
        |  GROUP BY 1, 2)
        |SELECT doc_id, 2 AS channels, 4000 AS sample_rate,
        |  kept AS n_frames, (44 + 4 * kept)::BIGINT AS n_bytes,
        |  sum_l, sum_r, peak
        |FROM sm ORDER BY doc_id""".stripMargin)),

    // REAL feature extraction over the REAL decode — the
    // embedding-from-media stage made genuine end to end: each
    // document's BMP payload is mean-pooled over a 4×4 cell grid into
    // a 48-dim integer feature vector (per-cell per-channel pixel
    // means on a fixed 1e-3 grid — the pooled-statistics descriptor a
    // pretrained model's embedding replaces 1:1) by BmpPoolExpr, which
    // PARSES the actual container; the closed-form pixel pattern makes
    // every cell mean analytic, so the whole encode→decode→pool chain
    // is hash-checked. Scan-local native codegen (no shuffle, no UDF);
    // at 100 TB this is the embarrassingly parallel featurize stage
    // between decode and vector indexing, and ann_media_topk below
    // consumes exactly these vectors. The feature vector is serialized
    // to a comma-joined string in the final projection (fixed order,
    // so lossless): the driver's comparator cannot sort/hash array
    // cells.
    Entry("m_feature_pool",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents").select(col("doc_id"))
        d.withColumn("payload", MultimodalPipeline.encodeBmp(col("doc_id")))
          .withColumn("f", MultimodalPipeline.poolBmp(col("payload"), 4, 4))
          .select(col("doc_id"),
            size(col("f")).cast("long").as("n_dims"),
            concat_ws(",", col("f").cast("array<string>")).as("features"))
          .orderBy(col("doc_id"))
      },
      Some(featurePoolCtes + "\n" +
        """SELECT doc_id, 48::BIGINT AS n_dims,
        |  string_agg(f::VARCHAR, ',' ORDER BY cell*3 + c) AS features
        |FROM pc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ANN OVER MEDIA-DERIVED FEATURES — closes the decode → featurize
    // → index loop: brute-force cosine top-5 for an 8-image query
    // panel against the corpus, over the m_feature_pool vectors (not
    // the embeddings table — these features came out of real decoded
    // pixels). Same exactness-baseline shape as ann_topk_bruteforce
    // (the broadcast side is the fixed query panel, never the data);
    // the documented scale path is identical too: bucket the pooled
    // vectors with the existing LSH/IVF rungs — they consume any
    // (id, array) input, this query just derives that input from
    // media. All arithmetic is exact cross-engine: integer features,
    // integer dot products, and IEEE sqrt/division are exactly
    // rounded.
    Entry("ann_media_topk",
      (spark, dir) => mediaTopkFrom(pooledFeatures(spark, dir))
        .orderBy(col("query_id"), col("rank")),
      Some(mediaTopkOracleSql)),

    // VIDEO → ANN CLOSURE — completes image/audio/video symmetry in
    // the media-ANN family: scene-cut segmentation picks each scene's
    // REPRESENTATIVE frame (its first — what a video search index
    // actually stores per shot), that frame's decoded pixels pool
    // through the m_feature_pool grid into a per-SCENE vector, and
    // the scene vectors serve the standing query panel through the
    // exact media serving tail (items keyed doc·4+scene, panel = the
    // first two docs' scenes). Pixels stay scan-local end to end:
    // segmentation shuffles 3-sum stat rows, pooling re-renders only
    // the ≤4 representative frames per doc, and the tail ranks via
    // the mergeable map-side top-k. At 100 TB this is shot-level
    // video retrieval: per-scene vectors are the index (≤4 × 48
    // longs per asset), never per-frame, and the LSH/IVF rungs
    // consume them unchanged.
    Entry("ann_video_topk",
      (spark, dir) => videoTopkFrom(videoFrameStats(
          Registry.table(spark, dir, "documents").select(col("doc_id"))))
        .orderBy(col("query_id"), col("rank")),
      Some(videoTopkOracleSql)),

    // VIDEO × IVF COMPOSITION — the last lane of the modality × index
    // matrix: the per-SCENE vectors behind ann_video_topk (shot-level
    // retrieval items, ≤4 per asset) feed the exact embeddings IVF
    // pipeline. At 100 TB this is the video lake's production layout:
    // scene vectors partition by cell, a query touches nprobe
    // partitions, and re-indexing after a segmentation change touches
    // scene vectors only — never frames. Every modality (embeddings,
    // image, audio, video) now serves through both the exact panel
    // and the partitioned IVF index, each with a measured recall row.
    Entry("ann_video_ivf_topk",
      (spark, dir) => mediaIvfTopkFrom(videoSceneVectors(videoFrameStats(
        Registry.table(spark, dir, "documents").select(col("doc_id"))))),
      Some(videoIvfTopkOracleSql)),

    // MEASURED RECALL OF THE VIDEO IVF RUNG — recall@5 of the
    // IVF-probed scene index against the exact brute panel over the
    // SAME scene vectors; retuning nprobe re-runs one query.
    Entry("ann_video_ivf_recall",
      (spark, dir) => ivfRecallFrom(videoSceneVectors(videoFrameStats(
        Registry.table(spark, dir, "documents").select(col("doc_id"))))),
      Some(videoIvfRecallOracleSql)),

    // MEDIA × IVF COMPOSITION — the hash-checked proof of the claim
    // the ANN family has documented all along: the rungs consume ANY
    // (id, vector) input unchanged. The pooled media features (real
    // decoded pixels, m_feature_pool's grid) feed the EXACT IVF
    // pipeline the embeddings rungs run — 16 feature-vectors seed the
    // cells, every asset assigns to its best cell, the 8-image panel
    // probes nprobe cells, candidates verify at full precision, and
    // the tail ranks through the mergeable map-side top-k. At 100 TB
    // this is the media lake's production index layout: the corpus
    // partitioned by cell (pixels featurized scan-locally at ingest,
    // s50's path), a query touching nprobe partitions — identical
    // scale story to ann_ivf_topk because it IS the same code.
    Entry("ann_media_ivf_topk",
      (spark, dir) => mediaIvfTopkFrom(pooledFeatures(spark, dir)),
      Some(mediaIvfTopkOracleSql)),

    // MEASURED RECALL OF THE MEDIA IVF RUNG — the same
    // quality-of-approximation row every embeddings rung carries
    // (ann_recall, ann_quantized_recall, …), for the media
    // composition: per-query recall@5 of the IVF-probed index against
    // the exact brute-force panel over the SAME pooled features. The
    // production knob story transfers verbatim: retuning nprobe on
    // the media lake re-runs ONE query (this one), never the corpus.
    Entry("ann_media_ivf_recall",
      (spark, dir) => ivfRecallFrom(pooledFeatures(spark, dir)),
      Some(mediaIvfRecallOracleSql)),

    // REAL audio feature extraction over the REAL chunk-walked decode
    // — the audio twin of m_feature_pool: each document's WAV is
    // pooled by WavPoolExpr into a 32-dim integer feature vector (16
    // time bands × 2 channels, per-cell fixed-point mean of |PCM| —
    // the energy-envelope descriptor a learned audio embedding
    // replaces 1:1). The closed-form signal makes every band mean
    // analytic, so the whole encode→chunk-walk→pool chain is
    // hash-checked. Scan-local native codegen (no shuffle, no UDF);
    // ann_audio_topk below consumes exactly these vectors, closing
    // the decode→featurize→index loop for the second modality.
    Entry("m_audio_features",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents").select(col("doc_id"))
        d.withColumn("payload", MultimodalPipeline.encodeWav(col("doc_id")))
          .withColumn("f", MultimodalPipeline.poolWav(col("payload"), 16))
          .select(col("doc_id"),
            size(col("f")).cast("long").as("n_dims"),
            concat_ws(",", col("f").cast("array<string>")).as("features"))
          .orderBy(col("doc_id"))
      },
      Some(audioPoolCtes + "\n" +
        """SELECT doc_id, 32::BIGINT AS n_dims,
        |  string_agg(f::VARCHAR, ',' ORDER BY band*2 + c) AS features
        |FROM ab GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ANN OVER AUDIO-DERIVED FEATURES — the audio closure of the
    // decode → featurize → index loop (ann_media_topk is the image
    // one): brute-force cosine top-5 for the 8-clip query panel over
    // the m_audio_features vectors. Same exactness-baseline shape and
    // the same documented scale path (bucket the pooled vectors with
    // the LSH/IVF rungs — they consume any (id, array) input).
    Entry("ann_audio_topk",
      (spark, dir) => mediaTopkFrom(audioFeatures(spark, dir))
        .orderBy(col("query_id"), col("rank")),
      Some(audioTopkOracleSql)),

    // AUDIO × IVF COMPOSITION — the ann_media_ivf_topk pattern applied
    // to the second modality, finishing the modality × index matrix's
    // audio lane: the banded-energy vectors behind ann_audio_topk feed
    // the EXACT embeddings IVF pipeline (16 clip-vectors seed the
    // cells, every clip assigns to its best cell, the 8-clip panel
    // probes nprobe cells, candidates verify at full precision, the
    // tail ranks through the mergeable map-side top-k). At 100 TB this
    // is the audio lake's production index layout: cell id is the
    // partition key for a corpus whose features extracted scan-locally
    // at ingest (s52's path), and a query touches nprobe partitions —
    // the same scale story as ann_ivf_topk because it IS the same code.
    Entry("ann_audio_ivf_topk",
      (spark, dir) => mediaIvfTopkFrom(audioFeatures(spark, dir)),
      Some(audioIvfTopkOracleSql)),

    // MEASURED RECALL OF THE AUDIO IVF RUNG — recall@5 of the
    // IVF-probed audio index against the exact brute panel over the
    // SAME banded-energy features (the ann_media_ivf_recall fold for
    // the audio lane). Retuning nprobe on the audio lake re-runs ONE
    // query, never the corpus.
    Entry("ann_audio_ivf_recall",
      (spark, dir) => ivfRecallFrom(audioFeatures(spark, dir)),
      Some(audioIvfRecallOracleSql))
  )

  /** The corpus's pooled audio feature table `(doc_id, f
    * array<bigint>)` — the chunk-walked WAV decode through the 16-band
    * × 2-channel energy grid, scan-local native codegen. Shared by
    * every audio-ANN row. */
  private[queries] def audioFeatures(spark: org.apache.spark.sql.SparkSession,
                                     dir: String)
      : org.apache.spark.sql.DataFrame =
    Registry.table(spark, dir, "documents").select(col("doc_id"))
      .withColumn("payload", MultimodalPipeline.encodeWav(col("doc_id")))
      .select(col("doc_id"),
        MultimodalPipeline.poolWav(col("payload"), 16).as("f"))

  /** Per-query recall@5 of the IVF-probed index vs the exact brute
    * panel over the SAME pooled features — shared by
    * ann_media_ivf_recall and ann_audio_ivf_recall (both sides are
    * already-justified broadcast shapes folded into one measurement;
    * localCheckpoint keeps the feature extraction from running twice). */
  private[queries] def ivfRecallFrom(featTable: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val feats = featTable.localCheckpoint()
    val exact = mediaTopkFrom(feats)
      .select(col("query_id"), col("neighbor_id"))
    val approx = mediaIvfTopkFrom(feats)
      .select(col("query_id"), col("neighbor_id"))
      .withColumn("hit", lit(1))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
      .withColumn("recall", round(col("n_hit") / col("n_exact"), 6))
      .orderBy(col("query_id"))
  }

  /** Oracle for [[mediaTopkFrom]] over the analytic AUDIO feature
    * replay — shared by ann_audio_topk and its streaming twin (s52,
    * which serves the SAME oracle from incrementally-built feature
    * state). */
  private[queries] lazy val audioTopkOracleSql: String =
    audioPoolCtes + ",\n" +
      """v AS (SELECT doc_id, list(f::DOUBLE ORDER BY band*2 + c) AS e
      |  FROM ab GROUP BY doc_id)
      |SELECT q.doc_id AS query_id,
      |  CAST(row_number() OVER (PARTITION BY q.doc_id
      |    ORDER BY round(list_inner_product(q.e, n.e) /
      |      (sqrt(list_inner_product(q.e, q.e)) *
      |       sqrt(list_inner_product(n.e, n.e))), 6) DESC, n.doc_id)
      |    AS INT) AS rank,
      |  n.doc_id AS neighbor_id,
      |  round(list_inner_product(q.e, n.e) /
      |    (sqrt(list_inner_product(q.e, q.e)) *
      |     sqrt(list_inner_product(n.e, n.e))), 6) AS sim
      |FROM v q JOIN v n ON q.doc_id < 8 AND q.doc_id <> n.doc_id
      |QUALIFY rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Brute-force cosine top-5 of the 8-image query panel over a
    * supplied `(doc_id, f array<bigint>)` pooled-feature table —
    * shared by the batch ann_media_topk and its streaming twin
    * (s50, which serves the SAME oracle from incrementally-built
    * feature state). Exact cross-engine: integer features, integer
    * dot products, exactly-rounded IEEE sqrt/division. */
  private[queries] def mediaTopkFrom(featTable: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val feats = featTable
      .select(col("doc_id"), col("f").cast("array<double>").as("e"))
      .withColumn("nrm",
        sqrt(graft.functions.VectorFunctions.dot(col("e"), col("e"))))
    val q = feats.filter(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"), col("e").as("qe"),
        col("nrm").as("qn"))
    val n = feats.select(col("doc_id").as("neighbor_id"),
      col("e").as("ne"), col("nrm").as("nn"))
    val scored = broadcast(q).join(n, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.functions.VectorFunctions.dot(col("qe"), col("ne")) /
          (col("qn") * col("nn")), 6).as("sim"))
    VectorOps.topkTail(scored, 5, "sim", desc = true)
  }

  /** Oracle for [[mediaTopkFrom]] over the analytic feature replay —
    * shared by ann_media_topk and s50. */
  private[queries] val mediaTopkOracleSql: String =
    featurePoolCtes + ",\n" +
      """v AS (SELECT doc_id, list(f::DOUBLE ORDER BY cell*3 + c) AS e
      |  FROM pc GROUP BY doc_id)
      |SELECT q.doc_id AS query_id,
      |  CAST(row_number() OVER (PARTITION BY q.doc_id
      |    ORDER BY round(list_inner_product(q.e, n.e) /
      |      (sqrt(list_inner_product(q.e, q.e)) *
      |       sqrt(list_inner_product(n.e, n.e))), 6) DESC, n.doc_id)
      |    AS INT) AS rank,
      |  n.doc_id AS neighbor_id,
      |  round(list_inner_product(q.e, n.e) /
      |    (sqrt(list_inner_product(q.e, q.e)) *
      |     sqrt(list_inner_product(n.e, n.e))), 6) AS sim
      |FROM v q JOIN v n ON q.doc_id < 8 AND q.doc_id <> n.doc_id
      |QUALIFY rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** The media × IVF composition over a supplied `(doc_id, f
    * array<bigint>)` pooled-feature table: the features become the
    * ANN base (vec_id, e, nrm) and run the EXACT embeddings IVF
    * pipeline (seed cells → assign → probe → verify → mergeable
    * top-k). Shared by the batch ann_media_ivf_topk and its streamed
    * serving twin (s61, which serves the same oracle from
    * incrementally-built feature state — the s50 ingest under the
    * IVF read path). */
  private[queries] def mediaIvfTopkFrom(
      featTable: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val base = featTable
      .select(col("doc_id").as("vec_id"),
        col("f").cast("array<double>").as("e"))
      .withColumn("nrm",
        sqrt(graft.functions.VectorFunctions.dot(col("e"), col("e"))))
    VectorOps.ivfTopkPairsOn(base, 8)
      .orderBy(col("query_id"), col("rank"))
  }

  /** The media pooled-feature corpus as the IVF oracle's `v` CTE
    * (vec_id, e) — fixed cell*3+c component order. */
  private lazy val mediaVCteSql: String =
    """v AS (SELECT doc_id AS vec_id,
    |    list(f::DOUBLE ORDER BY cell*3 + c) AS e
    |  FROM pc GROUP BY doc_id),
    |""".stripMargin

  /** The audio banded-energy corpus as the IVF oracle's `v` CTE —
    * fixed band*2+c component order. */
  private lazy val audioVCteSql: String =
    """v AS (SELECT doc_id AS vec_id,
    |    list(f::DOUBLE ORDER BY band*2 + c) AS e
    |  FROM ab GROUP BY doc_id),
    |""".stripMargin

  /** Final ranked-candidate SELECT over the IVF chain's `cand` + `v`
    * — the tail shared by the media and audio IVF top-k oracles. */
  private lazy val ivfPanelTopkTailSql: String =
    s"""SELECT cand.query_id,
    |  CAST(row_number() OVER (PARTITION BY cand.query_id
    |    ORDER BY round(${VectorOps.cosSql("q.e", "n.e")}, 6) DESC,
    |      cand.neighbor_id) AS INT) AS rank,
    |  cand.neighbor_id,
    |  round(${VectorOps.cosSql("q.e", "n.e")}, 6) AS sim
    |FROM cand JOIN v q ON q.vec_id = cand.query_id
    |  JOIN v n ON n.vec_id = cand.neighbor_id
    |QUALIFY rank <= ${VectorOps.ivfTopK}
    |ORDER BY query_id, rank""".stripMargin

  /** Oracle for [[mediaIvfTopkFrom]] over the analytic feature replay
    * — shared by ann_media_ivf_topk and s61. */
  private[queries] lazy val mediaIvfTopkOracleSql: String =
    featurePoolCtes + ",\n" + mediaVCteSql +
      VectorOps.ivfChainSql(8) + "\n" + ivfPanelTopkTailSql

  /** Oracle for ann_audio_ivf_topk: the IVF chain over the analytic
    * AUDIO feature replay. */
  private[queries] lazy val audioIvfTopkOracleSql: String =
    audioPoolCtes + ",\n" + audioVCteSql +
      VectorOps.ivfChainSql(8) + "\n" + ivfPanelTopkTailSql

  /** The corpus's pooled-pixel feature table `(doc_id, f
    * array<bigint>)` — real decoded pixels through the 4×4 grid,
    * scan-local native codegen. Shared by every media-ANN row. */
  private[queries] def pooledFeatures(spark: org.apache.spark.sql.SparkSession,
                                      dir: String)
      : org.apache.spark.sql.DataFrame =
    Registry.table(spark, dir, "documents").select(col("doc_id"))
      .withColumn("payload", MultimodalPipeline.encodeBmp(col("doc_id")))
      .select(col("doc_id"),
        MultimodalPipeline.poolBmp(col("payload"), 4, 4).as("f"))

  /** The recall fold over the IVF chain's `cand` + `v` — the tail
    * shared by the media and audio IVF recall oracles (the ann_recall
    * fold with nq = 8). */
  private lazy val ivfPanelRecallTailSql: String =
    s"""iv AS (SELECT query_id, neighbor_id FROM (
    |  SELECT cand.query_id, cand.neighbor_id,
    |    row_number() OVER (PARTITION BY cand.query_id
    |      ORDER BY round(${VectorOps.cosSql("q.e", "n.e")}, 6) DESC,
    |        cand.neighbor_id) AS rank
    |  FROM cand JOIN v q ON q.vec_id = cand.query_id
    |    JOIN v n ON n.vec_id = cand.neighbor_id)
    |  WHERE rank <= ${VectorOps.ivfTopK}),
    |ex AS (SELECT query_id, neighbor_id FROM (
    |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
    |    row_number() OVER (PARTITION BY q.vec_id
    |      ORDER BY round(${VectorOps.cosSql("q.e", "n.e")}, 6) DESC,
    |        n.vec_id) AS rank
    |  FROM v q JOIN v n ON q.vec_id < 8 AND q.vec_id <> n.vec_id)
    |  WHERE rank <= 5)
    |SELECT ex.query_id, count(*) AS n_exact,
    |  count(iv.neighbor_id) AS n_hit,
    |  round(count(iv.neighbor_id) / count(*), 6) AS recall
    |FROM ex LEFT JOIN iv ON iv.query_id = ex.query_id
    |  AND iv.neighbor_id = ex.neighbor_id
    |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin

  /** Oracle for ann_media_ivf_recall: the IVF chain's ranked
    * candidates vs the exact brute panel, both over the pooled
    * features. */
  private[queries] lazy val mediaIvfRecallOracleSql: String =
    featurePoolCtes + ",\n" + mediaVCteSql +
      VectorOps.ivfChainSql(8) + ",\n" + ivfPanelRecallTailSql

  /** Oracle for ann_audio_ivf_recall: the same fold over the analytic
    * AUDIO feature replay. */
  private[queries] lazy val audioIvfRecallOracleSql: String =
    audioPoolCtes + ",\n" + audioVCteSql +
      VectorOps.ivfChainSql(8) + ",\n" + ivfPanelRecallTailSql

  /** Shared analytic replay of the encode→pool chain (4×4 grid, 48
    * dims): per (doc, cell, channel) the fixed-point mean of the
    * closed-form pixel pattern — the oracle-side twin of
    * [[graft.functions.BmpCodec.pool]] over
    * [[graft.functions.BmpCodec.encode]]. Callers append their final
    * SELECT (`"\n"`) or a further CTE (`",\n"`). */
  // lazy: referenced by mediaTopkOracleSql, a val declared ABOVE this
  // definition — laziness makes the initialization order-independent
  /** Shared analytic replay of the audio encode→pool chain (16 bands
    * × 2 channels, 32 dims): per (doc, band, channel) the fixed-point
    * mean of |sample| over the closed-form PCM pattern — the
    * oracle-side twin of [[graft.functions.WavCodec.pool]] over
    * [[graft.functions.WavCodec.encode]]. Band of frame i is
    * i·16/n, the same grid rule the pool expression applies. Callers
    * append their final SELECT (`"\n"`) or a further CTE (`",\n"`). */
  private lazy val audioPoolCtes: String =
    """WITH g AS (SELECT doc_id,
    |    (64 + (doc_id % 5) * 16)::BIGINT AS n FROM documents),
    |ab AS (SELECT doc_id, (i * 16) // n AS band, c,
    |    CAST(sum(abs(((doc_id*31 + i*17 + c*7) % 2003) - 1001)) * 1000
    |      // count(*) AS BIGINT) AS f
    |  FROM g, unnest(generate_series(0, n - 1)) t(i),
    |    unnest(generate_series(0, 1)) tc(c)
    |  GROUP BY doc_id, band, c)""".stripMargin

  private lazy val featurePoolCtes: String =
    """WITH g AS (SELECT doc_id, (4 + doc_id % 5)::INT AS w,
    |    (5 + doc_id % 4)::INT AS h
    |  FROM documents),
    |pc AS (SELECT doc_id, ((y*4)//h)*4 + (x*4)//w AS cell, c,
    |    CAST(sum((doc_id*7 + y*31 + x*13 + c*5) % 251) * 1000
    |      // count(*) AS BIGINT) AS f
    |  FROM g, unnest(generate_series(0, w - 1)) gx(x),
    |    unnest(generate_series(0, h - 1)) gy(y),
    |    unnest(generate_series(0, 2)) gc(c)
    |  GROUP BY doc_id, cell, c)""".stripMargin

  /** Per-(doc, frame) decoded channel sums from a doc_id table: the
    * four-frame fixed-stride container is rendered and sliced
    * scan-locally, each frame slice decoded by the REAL BmpDecodeExpr
    * — shared by the batch m_video_scene_cut and the streamed s57
    * twin's microbatch featurization (pixels never leave the scan;
    * only these 3-sum stat rows flow on). */
  private[queries] def videoFrameStats(d: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val frameLen = 114 // 54-byte headers + 5 rows × 12-byte stride
    d.withColumn("payload",
        concat((0 until 4).map(f =>
          MultimodalPipeline.encodeBmp(col("doc_id") * 80 + f * 20)): _*))
      .select(col("doc_id"),
        posexplode(expr(s"transform(sequence(0, 3), " +
          s"f -> substring(payload, f * $frameLen + 1, $frameLen))"))
          .as(Seq("frame_idx", "frame")))
      .withColumn("img", MultimodalPipeline.decodeBmp(col("frame")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("img.sum_r").as("sum_r"), col("img.sum_g").as("sum_g"),
        col("img.sum_b").as("sum_b"))
  }

  /** The cut-decision tail over a SUPPLIED (doc_id, frame_idx, sum_r,
    * sum_g, sum_b) stat table — shared by batch and s57: per
    * consecutive frame pair the L1 channel-sum distance, a cut where
    * diff·3 > Σdiffs (its video's mean, cross-multiplied integers).
    * Frames of a video are co-partitioned by doc_id, so both windows
    * ride one doc_id exchange. */
  private[queries] def sceneCutFrom(stats: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val wAll = Window.partitionBy(col("doc_id"))
    stats
      .withColumn("diff",
        abs(col("sum_r") - lag(col("sum_r"), 1).over(w)) +
          abs(col("sum_g") - lag(col("sum_g"), 1).over(w)) +
          abs(col("sum_b") - lag(col("sum_b"), 1).over(w)))
      .filter(col("diff").isNotNull)
      .withColumn("is_cut",
        (col("diff") * 3 > sum(col("diff")).over(wAll)).cast("int"))
      .select(col("doc_id"), col("frame_idx"), col("diff"),
        col("is_cut"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** The video-retrieval tail over a SUPPLIED (doc_id, frame_idx,
    * sum_r, sum_g, sum_b) frame-stat table — shared by the batch
    * ann_video_topk and the streamed s58 serving twin: scene-cut
    * segmentation ([[sceneCutFrom]]) picks each scene's
    * representative (first) frame, its decoded pixels pool through
    * the m_feature_pool grid into a per-SCENE vector keyed
    * doc·4+scene, and the scene vectors answer the standing panel
    * (items < 8 = the first two docs' scenes) through
    * [[mediaTopkFrom]]'s mergeable top-k. Only ≤4 representative
    * frames per doc are (re-)rendered for pooling; segmentation
    * itself moves 3-sum stat rows, never pixels. */
  private[queries] def videoTopkFrom(stats: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    mediaTopkFrom(videoSceneVectors(stats))

  /** The per-SCENE pooled feature table `(doc_id = doc·4+scene, f
    * array<bigint>)` from a frame-stat table: scene-cut segmentation
    * ([[sceneCutFrom]]) picks each scene's representative (first)
    * frame, whose decoded pixels pool through the m_feature_pool grid.
    * Only ≤4 representative frames per doc are (re-)rendered;
    * segmentation itself moves 3-sum stat rows, never pixels. The
    * video index items behind ann_video_topk and the IVF composition. */
  private[queries] def videoSceneVectors(
      stats: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cuts = sceneCutFrom(stats)
      .select(col("doc_id"), col("frame_idx"), col("is_cut"))
    // scene id of a frame = cuts at frames <= it (frame 0 opens
    // scene 0; its missing diff row coalesces to no-cut)
    val wCum = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scenes = stats.select(col("doc_id"), col("frame_idx"))
      .join(cuts, Seq("doc_id", "frame_idx"), "left")
      .withColumn("scene",
        sum(coalesce(col("is_cut"), lit(0))).over(wCum))
    val rep = scenes.groupBy(col("doc_id"), col("scene"))
      .agg(min(col("frame_idx")).as("rf"))
    rep
      .withColumn("payload",
        MultimodalPipeline.encodeBmp(col("doc_id") * 80 + col("rf") * 20))
      .select((col("doc_id") * 4 + col("scene")).as("doc_id"),
        MultimodalPipeline.poolBmp(col("payload"), 4, 4).as("f"))
  }

  /** Analytic replay of the scene-cut → representative-frame →
    * pooled-scene-vector chain (the oracle twin of
    * [[videoSceneVectors]]) — shared by the video brute/IVF oracles.
    * Callers append a `v` CTE over `pc` then their tail. */
  private lazy val videoSceneCtes: String =
    """WITH fr AS (SELECT doc_id, f, doc_id * 80 + f * 20 AS fid
      |  FROM documents, unnest(generate_series(0, 3)) t(f)),
      |px AS (SELECT doc_id, f,
      |    CAST(sum((fid*7 + y*31 + x*13) % 251) AS BIGINT) AS sum_r,
      |    CAST(sum((fid*7 + y*31 + x*13 + 5) % 251) AS BIGINT) AS sum_g,
      |    CAST(sum((fid*7 + y*31 + x*13 + 10) % 251) AS BIGINT) AS sum_b
      |  FROM fr, unnest(generate_series(0, 3)) gx(x),
      |    unnest(generate_series(0, 4)) gy(y)
      |  GROUP BY 1, 2),
      |df AS (SELECT doc_id, f,
      |    abs(sum_r - lag(sum_r) OVER w) + abs(sum_g - lag(sum_g) OVER w)
      |      + abs(sum_b - lag(sum_b) OVER w) AS diff
      |  FROM px WINDOW w AS (PARTITION BY doc_id ORDER BY f)),
      |ct AS (SELECT doc_id, f,
      |    CASE WHEN diff IS NOT NULL AND
      |      diff * 3 > sum(diff) OVER (PARTITION BY doc_id)
      |      THEN 1 ELSE 0 END AS is_cut
      |  FROM df),
      |scn AS (SELECT doc_id, f,
      |    sum(is_cut) OVER (PARTITION BY doc_id ORDER BY f
      |      ROWS UNBOUNDED PRECEDING) AS scene
      |  FROM ct),
      |rep AS (SELECT doc_id, scene, doc_id*80 + min(f)*20 AS fid
      |  FROM scn GROUP BY 1, 2),
      |pc AS (SELECT r.doc_id, r.scene, ((y*4)//5)*4 + (x*4)//4 AS cell,
      |    c, CAST(sum((r.fid*7 + y*31 + x*13 + c*5) % 251) * 1000
      |      // count(*) AS BIGINT) AS f
      |  FROM rep r, unnest(generate_series(0, 3)) gx(x),
      |    unnest(generate_series(0, 4)) gy(y),
      |    unnest(generate_series(0, 2)) gc(c)
      |  GROUP BY 1, 2, 3, 4)""".stripMargin

  /** The per-scene vector corpus as the oracles' `v` CTE — scene keys
    * doc·4+scene, fixed cell*3+c component order. */
  private lazy val videoVCteSql: String =
    """v AS (SELECT CAST(doc_id*4 + scene AS BIGINT) AS vec_id,
    |    list(f::DOUBLE ORDER BY cell*3 + c) AS e
    |  FROM pc GROUP BY doc_id, scene),
    |""".stripMargin

  /** Shared with StreamingOps (s58): the streamed frame-stat state
    * must serve exactly this batch panel answer. */
  private[queries] lazy val videoTopkOracleSql: String =
    videoSceneCtes + ",\n" + videoVCteSql.stripSuffix(",\n") +
      s"""
      |SELECT q.vec_id AS query_id,
      |  CAST(row_number() OVER (PARTITION BY q.vec_id
      |    ORDER BY round(list_inner_product(q.e, n.e) /
      |      (sqrt(list_inner_product(q.e, q.e)) *
      |       sqrt(list_inner_product(n.e, n.e))), 6) DESC, n.vec_id)
      |    AS INT) AS rank,
      |  n.vec_id AS neighbor_id,
      |  round(list_inner_product(q.e, n.e) /
      |    (sqrt(list_inner_product(q.e, q.e)) *
      |     sqrt(list_inner_product(n.e, n.e))), 6) AS sim
      |FROM v q JOIN v n ON q.vec_id < 8 AND q.vec_id <> n.vec_id
      |QUALIFY rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Oracle for ann_video_ivf_topk: the IVF chain over the per-scene
    * vector corpus. */
  private[queries] lazy val videoIvfTopkOracleSql: String =
    videoSceneCtes + ",\n" + videoVCteSql +
      VectorOps.ivfChainSql(8) + "\n" + ivfPanelTopkTailSql

  /** Oracle for ann_video_ivf_recall: the recall fold over the same
    * per-scene corpus. */
  private[queries] lazy val videoIvfRecallOracleSql: String =
    videoSceneCtes + ",\n" + videoVCteSql +
      VectorOps.ivfChainSql(8) + ",\n" + ivfPanelRecallTailSql

  /** Shared with StreamingOps (s57): the streamed per-frame stat
    * state must reproduce exactly this batch cut report. */
  private[queries] val sceneCutOracleSql: String =
    """WITH fr AS (SELECT doc_id, f, doc_id * 80 + f * 20 AS fid
      |  FROM documents, unnest(generate_series(0, 3)) t(f)),
      |px AS (SELECT doc_id, f,
      |    CAST(sum((fid*7 + y*31 + x*13) % 251) AS BIGINT) AS sum_r,
      |    CAST(sum((fid*7 + y*31 + x*13 + 5) % 251) AS BIGINT) AS sum_g,
      |    CAST(sum((fid*7 + y*31 + x*13 + 10) % 251) AS BIGINT) AS sum_b
      |  FROM fr, unnest(generate_series(0, 3)) gx(x),
      |    unnest(generate_series(0, 4)) gy(y)
      |  GROUP BY 1, 2),
      |df AS (SELECT doc_id, f,
      |    abs(sum_r - lag(sum_r) OVER w) + abs(sum_g - lag(sum_g) OVER w)
      |      + abs(sum_b - lag(sum_b) OVER w) AS diff
      |  FROM px WINDOW w AS (PARTITION BY doc_id ORDER BY f))
      |SELECT doc_id, f AS frame_idx, diff,
      |  CAST(diff * 3 > sum(diff) OVER (PARTITION BY doc_id)
      |    AS INTEGER) AS is_cut
      |FROM df WHERE diff IS NOT NULL
      |ORDER BY doc_id, frame_idx""".stripMargin
}
