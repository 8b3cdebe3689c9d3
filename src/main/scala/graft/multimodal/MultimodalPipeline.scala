package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-side plumbing for multimodal (image/audio/video) columns:
  * media is carried as an opaque `binary` payload column with typed
  * metadata alongside, partition-parallel and codegen-friendly.
  *
  * The actual codec work (JPEG decode, resample, frame decode) is NOT
  * implementable in this container (no media libraries), so
  * [[decodeStub]] is a clearly-marked deterministic fake; the schema,
  * chunking, and batch shapes around it are real, so swapping the stub
  * for a real codec (e.g. an `mapInArrow` stage feeding a native
  * decoder) changes no query shape.
  */
object MultimodalPipeline {

  /** Attach a binary `payload` column (utf-8 bytes of `src` here; in a
    * real pipeline this is the raw media column read from parquet). */
  def withPayload(df: DataFrame, src: Column): DataFrame =
    df.withColumn("payload", src.cast("binary"))

  /** STUB decode: a real implementation would decode `payload` into
    * pixels/samples. Deterministic fake: the payload length and md5
    * act as the "decoded" surrogate so downstream stages are testable.
    * For the one format that needs no media library there IS a real
    * rung now — see [[decodeBmp]] / m_image_decode, which parses an
    * actual 24bpp BMP container byte-for-byte. */
  def decodeStub(payload: Column): Column =
    struct(octet_length(payload).as("decoded_len"),
      md5(payload).as("decoded_md5"))

  /** REAL decode: binary 24bpp uncompressed BMP → struct(width,
    * height, bpp, n_pixels, sum_r, sum_g, sum_b), null on malformed
    * input. Native expression, one static call per row inside
    * whole-stage codegen (see [[graft.functions.BmpDecodeExpr]]). */
  def decodeBmp(payload: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.BmpDecodeExpr(
        org.apache.spark.sql.graft.Bridge.expression(payload)))

  /** Deterministic per-id BMP payload (the test-pattern generator
    * feeding [[decodeBmp]]'s round trip). */
  def encodeBmp(docId: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.BmpEncodeExpr(
        org.apache.spark.sql.graft.Bridge.expression(docId)))

  /** REAL resize: binary 24bpp BMP → nearest-neighbor-resampled
    * outW×outH binary BMP, null on malformed input — the thumbnail
    * stage of an image-lake pipeline, scan-local and codegen'd (see
    * [[graft.functions.BmpResizeExpr]]). The output is itself a
    * spec-complete BMP, so it feeds straight back into [[decodeBmp]]. */
  def resizeBmp(payload: Column, outW: Int, outH: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.BmpResizeExpr(
        org.apache.spark.sql.graft.Bridge.expression(payload), outW, outH))

  /** REAL audio decode: binary 16-bit PCM RIFF/WAVE → struct(channels,
    * sample_rate, bits, n_frames, sum_l, sum_r, peak), null on
    * malformed input. A genuine chunk walker, not a fixed-offset read
    * (see [[graft.functions.WavDecodeExpr]]). */
  def decodeWav(payload: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.WavDecodeExpr(
        org.apache.spark.sql.graft.Bridge.expression(payload)))

  /** Deterministic per-id WAV payload (stereo test signal, junk LIST
    * chunk included so [[decodeWav]]'s chunk walk is exercised). */
  def encodeWav(docId: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.WavEncodeExpr(
        org.apache.spark.sql.graft.Bridge.expression(docId)))

  /** REAL decimation: binary 16-bit PCM WAV → every-`factor`-th-frame
    * WAV at rate/`factor`, null on malformed input — the
    * rate-normalizing downsample of an audio-lake pipeline,
    * scan-local and codegen'd (see
    * [[graft.functions.WavResampleExpr]]). The output is itself a
    * spec-complete container, so it feeds straight back into
    * [[decodeWav]]. */
  def resampleWav(payload: Column, factor: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.WavResampleExpr(
        org.apache.spark.sql.graft.Bridge.expression(payload), factor))

  /** Sample up to `maxFrames` fixed-size frames from the payload —
    * the video-frame-extraction shape: one output row per frame with
    * a content hash. Pure Column expressions (sequence + posexplode),
    * so it scales with the scan. */
  def sampleFrames(df: DataFrame, src: Column, frameBytes: Int,
                   maxFrames: Int): DataFrame = {
    val nFrames = least(lit(maxFrames - 1),
      floor((length(src) - lit(1)) / lit(frameBytes)).cast("int"))
    val frames = transform(sequence(lit(0), nFrames),
      i => src.substr(i * frameBytes + 1, lit(frameBytes)))
    df.select(col("doc_id"), posexplode(frames).as(Seq("frame_idx", "frame")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(col("frame")).as("frame_md5"),
        length(col("frame")).cast("long").as("frame_len"))
  }

  /** Chunk the ENTIRE payload into fixed-size blocks with a content
    * hash per block — no frame cap, unlike [[sampleFrames]]: storage
    * dedup must see every byte or it under-reports sharing. Same pure
    * Column shape (sequence + posexplode). */
  def chunkHashes(df: DataFrame, src: Column, chunkBytes: Int): DataFrame = {
    val nChunks = floor((length(src) - lit(1)) / lit(chunkBytes)).cast("int")
    val chunks = transform(sequence(lit(0), nChunks),
      i => src.substr(i * chunkBytes + 1, lit(chunkBytes)))
    df.select(col("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        md5(col("chunk")).as("chunk_md5"),
        length(col("chunk")).cast("long").as("chunk_len"))
  }

  /** Content-defined chunking (CDC) — the real storage-dedup chunker
    * the fixed-size [[chunkHashes]] approximates: a chunk boundary
    * falls after byte `i` iff the hash of the trailing `window`-byte
    * run ending at `i` is ≡ 0 (mod `divisor`) — the classic
    * Rabin-fingerprint boundary rule (LBFS). Because each boundary
    * test depends ONLY on the `window` bytes before it, an insertion
    * re-chunks just its neighborhood: every boundary ≥ `window` bytes
    * downstream survives, so shared regions across near-identical
    * payloads still produce identical chunks (fixed-size chunking
    * loses ALL downstream chunks to the shift). Expected chunk length
    * is `divisor` bytes; no min/max clamp is applied (production
    * chunkers add one to bound the tail of the geometric length
    * distribution — it would change split points, not this plan
    * shape). Boundaries are never placed at the final byte, so the
    * last chunk is always non-empty. Pure Column HOFs over the scan —
    * no shuffle until the consumer aggregates chunk hashes. */
  def cdcChunkHashes(df: DataFrame, src: Column, window: Int,
                     divisor: Int): DataFrame = {
    val (staged, chunks) = stagedCdcChunks(df, src, window, divisor)
    staged
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        md5(col("chunk")).as("chunk_md5"),
        length(col("chunk")).cast("long").as("chunk_len"))
  }

  /** The CDC chunk hashes kept as ONE array row per document — the
    * shape the streaming twin (s37) needs so per-document chunk
    * multiplicities can be counted scan-locally before anything enters
    * keyed state. Same split points as [[cdcChunkHashes]]. */
  def cdcChunkMd5s(df: DataFrame, src: Column, window: Int,
                   divisor: Int): DataFrame = {
    val (staged, chunks) = stagedCdcChunks(df, src, window, divisor)
    staged.select(col("doc_id"),
      transform(chunks, c => md5(c)).as("chs"))
  }

  /** Shared CDC chunker: returns the STAGED projection (whose
    * materialized `cdc_h` hash-array attribute Catalyst will not
    * inline — it is referenced more than once downstream) together
    * with the chunk-array EXPRESSION over it. Consumers MUST select
    * the expression directly over `staged`: routing it through a
    * single-use alias column re-introduces the O(n²) inlining pitfall
    * (Catalyst collapses the alias into the consuming Generate and its
    * InferFiltersFromGenerate pre-filter, re-deriving the whole O(n)
    * rolling-hash array per element — measured 1.24 s → 19.7 s at
    * sf0.1; see TextFunctions.polyWindowHashes and the
    * RegistrySpec "rolling hash evaluated once" plan guard). */
  private def stagedCdcChunks(df: DataFrame, src: Column, window: Int,
                              divisor: Int): (DataFrame, Column) = {
    // stage 1: MATERIALIZE the per-position polynomial window hashes
    // (integer math, no per-window digest; the TextFunctions
    // two-stage discipline — inlining this array into the boundary
    // filter would re-derive it per element, O(n²·k))
    val staged = df
      .withColumn("cdc_len", length(src))
      .withColumn("cdc_h",
        when(col("cdc_len") >= window,
          graft.functions.TextFunctions.polyWindowHashes(src, window))
          .otherwise(array().cast("array<bigint>")))
    // gram i (1-based) covers chars [i, i+window-1]; a qualifying gram
    // puts the boundary after its LAST char — never at the final char
    // (the last chunk is always non-empty)
    // guard the index range: sequence(1, 0) DESCENDS ([1, 0]) when the
    // hash array is empty (text shorter than `window`), and the filter
    // lambda then faults on element_at([], 1) under ANSI — such texts
    // are a single chunk with no interior boundaries
    val idxs = when(size(col("cdc_h")) >= 1,
      sequence(lit(1), size(col("cdc_h"))))
      .otherwise(array().cast("array<int>"))
    val bnd = transform(
      filter(idxs, i =>
        pmod(element_at(col("cdc_h"), i), lit(divisor)) === 0 &&
          (i + lit(window - 1)) < col("cdc_len")),
      i => i + lit(window - 1))
    val starts = concat(array(lit(1)), transform(bnd, b => b + 1))
    val ends = concat(bnd, array(col("cdc_len")))
    val chunks = zip_with(starts, ends, (s, e) => src.substr(s, e - s + 1))
    (staged, chunks)
  }

  /** REAL COMPRESSED decode: binary 8-bit truecolor PNG →
    * struct(width, height, bit_depth, n_pixels, sum_r, sum_g, sum_b),
    * null on malformed/corrupt input — a genuine zlib inflate +
    * scanline unfilter (all five PNG filter types), not a raw-byte
    * walk (see [[graft.functions.PngDecodeExpr]]). */
  def decodePng(payload: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.PngDecodeExpr(
        org.apache.spark.sql.graft.Bridge.expression(payload)))

  /** Deterministic per-id PNG payload — the SAME closed-form pixel
    * pattern as [[encodeBmp]] (cross-checkable pixel-for-pixel), with
    * per-row filter types cycling through all five and the IDAT split
    * in two (see [[graft.functions.PngEncodeExpr]]). */
  def encodePng(docId: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.PngEncodeExpr(
        org.apache.spark.sql.graft.Bridge.expression(docId)))

  /** REAL feature extraction: binary 24bpp BMP → `gw·gh·3`-dim bigint
    * feature vector (per-cell per-channel mean-pooled pixels on a
    * fixed 1e-3 integer grid — the classic pooled-statistics image
    * descriptor a pretrained model's embedding replaces 1:1), null on
    * malformed input. Scan-local native codegen expression (see
    * [[graft.functions.BmpPoolExpr]]); the output feeds the ANN /
    * vector-index family directly (ann_media_topk). */
  def poolBmp(payload: Column, gridW: Int, gridH: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.BmpPoolExpr(
        org.apache.spark.sql.graft.Bridge.expression(payload), gridW, gridH))

  /** REAL audio feature extraction: binary 16-bit PCM WAV →
    * `nBands·channels`-dim bigint banded mean-|PCM| feature vector
    * (per-band per-channel energy envelope on a fixed 1e-3 integer
    * grid — the pooled-statistics descriptor a learned audio
    * embedding replaces 1:1), null on malformed input. Scan-local
    * native codegen expression (see [[graft.functions.WavPoolExpr]]);
    * the output feeds the ANN / vector-index family directly
    * (ann_audio_topk). */
  def poolWav(payload: Column, nBands: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.WavPoolExpr(
        org.apache.spark.sql.graft.Bridge.expression(payload), nBands))
}
