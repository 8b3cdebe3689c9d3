package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{SketchFunctions, TextFunctions}
import graft.streaming.{VersionedStreamDedup, VersionedStreamJoin}

/** Converged-state SERVING twins: live-ingest index state (IVF
  * membership, PQ codes, sign codes, media/audio/video features)
  * built to convergence and then answering the standing query panels
  * through the exact batch read paths — byte-identical to the
  * batch-built indexes they replace. */
private[graft] object StreamServingTwins {

  import StreamingHarness._

  def entries: Seq[Entry] = Seq(

    // INCREMENTAL IVF INDEX MAINTENANCE over a growing embedding
    // corpus — the similarity-search half of the engine in streaming
    // form (docs have s19/s21/s24; this is the embeddings analog).
    // Stage 1 is stateless per microbatch: each arriving vector is
    // scored against the broadcast 16-row seed centroid table (the
    // same deterministic seed ann_ivf_topk probes) and reduced to its
    // argmax cell — a batch plan inside foreachBatch, relaying only
    // slim (vec_id, cell) rows. Stage 2 tails the relay and upserts
    // cell-keyed membership state (VersionedStreamDedup): the LIVE
    // inverted index a production ANN service probes, holding two
    // longs per vector, never the vectors. Converges to the batch
    // seed-assignment oracle; a re-embedded vector (new version)
    // would move cells by upsert.
    Entry("s25_stream_ivf_index",
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_")
          val relay = tmp.resolve("relay")
          val log = tmp.resolve("log")
          val ckpt1 = tmp.resolve("ckpt1")
          val ckpt2 = tmp.resolve("ckpt2")
          try {
            val in = sharedChunkDir(dir, "embvec", "embeddings") { p =>
              VectorOps.embSlim(spark, dir)
                .repartitionByRange(chunks, col("vec_id"))
                .write.parquet(p.toString)
            }
            val cent = VectorOps.ivfSeedCentroids(spark, dir)
              .localCheckpoint()
            val q1 = spark.readStream
              .schema("vec_id BIGINT, e ARRAY<DOUBLE>, nrm DOUBLE")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
              .writeStream.outputMode("append")
              .option("checkpointLocation", ckpt1.toString)
              .foreachBatch { (df: DataFrame, bid: Long) =>
                // scan-local per-batch assignment (VectorOps.assignScan
                // — no per-microbatch argmax exchange; replay chunks
                // are PK-unique, so the dropped groupBy changed
                // nothing); stable part count = the batch's input
                // split count, deterministic on re-delivery
                writeBatchIdempotent(
                  VectorOps.assignScan(df, cent)
                    .select(col("vec_id"), col("cell")),
                  relay, bid)
                ()
              }.start()
            java.nio.file.Files.createDirectories(relay)
            val asgs = spark.readStream.schema("vec_id BIGINT, cell BIGINT")
              .option("maxFilesPerTrigger", streamShufflePartitions.toString)
              .option("pathGlobFilter", "b*")
              .parquet(relay.toString).as[AsgRow]
            val dd = VersionedStreamDedup.latestPerKeyId[AsgRow](
              asgs, _.cell.toString, _.vec_id.toString, _ => 0L)
            val q2 = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt2.toString)
              .foreachBatch { (df: DataFrame, bid: Long) =>
                writeBatchIdempotent(df.repartition(1), log, bid)
                ()
              }.start()
            try {
              q1.processAllAvailable()
              q2.processAllAvailable()
            } finally {
              try q1.stop() finally q2.stop()
            }
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("key"))
            raw
              .withColumn("max_seq", max(col("seq")).over(wMax))
              .filter(col("seq") === col("max_seq"))
              .select(explode(col("xs")).as("x"))
              .select(col("x.vec_id").as("vec_id"), col("x.cell").as("cell"))
              .orderBy(col("vec_id"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(VectorOps.ivfAssignOracleSql)),

    // STREAMING ANN SERVING — the index-maintenance → query-serving
    // loop CLOSED: s25's incremental IVF index (vectors streamed in,
    // cell memberships upserted in keyed state) is built to
    // convergence, and then ANSWERS the standing query panel through
    // the full production read path — probe nprobe cells against the
    // broadcast centroids, fetch candidates from the LIVE streamed
    // membership table (not a batch assignment), score candidates
    // int8-only (SQ8), top-k per query. Hash-matches the batch
    // ann_ivf_quantized_topk oracle exactly: a service that swapped
    // its batch-built index for this streamed one would return
    // byte-identical answers. At 100 TB the index state holds two
    // longs per vector (never payloads), probes touch Σ|probed cell|
    // candidates, and scoring reads the int8 corpus — each rung's
    // scale story is unchanged from its batch row.
    Entry("s44_stream_ann_serving",
      (spark, dir) => {
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_serve_")
          val relay = tmp.resolve("relay")
          val log = tmp.resolve("log")
          val ckpt1 = tmp.resolve("ckpt1")
          val ckpt2 = tmp.resolve("ckpt2")
          try {
            val in = StreamTrainedTwins.kmeansIngestChunks(spark, dir)
            val cent = VectorOps.ivfSeedCentroids(spark, dir)
              .localCheckpoint()
            // coarsened trigger (StreamingHarness.coarseFilesPerTrigger):
            // membership upsert state, converged fold batching-
            // independent; s25 keeps the relay per-file archetype (and
            // StreamAnnRecoverySpec drives this stage per-file)
            val q1 = startIvfAssignStream(spark, in.toString, cent,
              ckpt1, relay, filesPerTrigger = coarseFilesPerTrigger.toInt)
            java.nio.file.Files.createDirectories(relay)
            val q2 = startIvfMembershipStream(spark, relay, ckpt2, log)
            try {
              q1.processAllAvailable()
              q2.processAllAvailable()
            } finally {
              try q1.stop() finally q2.stop()
            }
            requireMultiBatch(ckpt1, "s44_stream_ann_serving")
            // SERVE: probe → fetch members from the streamed index →
            // int8 score → top-k (the batch entry's exact tail)
            VectorOps.quantScoredTopk(spark, dir,
                VectorOps.ivfCandidatesFrom(spark, dir,
                  convergedMembershipFrom(spark, log)))
              .orderBy(col("query_id"), col("rank"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(VectorOps.ivfQuantTopkOracleSql)),

    // STREAMING PQ SERVING — the maintenance→serving loop closed for
    // the SECOND compression codec: arriving vectors are PQ-encoded
    // per microbatch against the broadcast codebook (the exact batch
    // encoder, VectorOps.pqEncode — same grid arithmetic, same
    // tie-break), the (vec_id, s) → code rows upsert into keyed state
    // (8 codes per vector: the state IS the compressed corpus,
    // ~4 bytes/vector, never the vectors), and the converged code
    // table answers the standing query panel through the batch ADC
    // read path — hash-matching the ann_pq_topk oracle exactly. With
    // s44 (IVF+SQ8) this gives both production codecs a live-index
    // serving proof; at 100 TB the arriving corpus never exists
    // uncompressed anywhere downstream of the encoder.
    Entry("s46_stream_pq_serving",
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_pqserve_")
          val relay = tmp.resolve("relay")
          val log = tmp.resolve("log")
          val ckpt1 = tmp.resolve("ckpt1")
          val ckpt2 = tmp.resolve("ckpt2")
          try {
            val in = sharedChunkDir(dir, "embvec", "embeddings") { p =>
              VectorOps.embSlim(spark, dir)
                .repartitionByRange(chunks, col("vec_id"))
                .write.parquet(p.toString)
            }
            val cb = VectorOps.pqCodebook(spark, dir).localCheckpoint()
            val q1 = spark.readStream
              .schema("vec_id BIGINT, e ARRAY<DOUBLE>, nrm DOUBLE")
              // coarsened trigger (StreamingHarness.coarseFilesPerTrigger):
              // latest-per-id upsert state, converged max-seq fold is
              // batching-independent
              .option("maxFilesPerTrigger", coarseFilesPerTrigger)
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
              .writeStream.outputMode("append")
              .option("checkpointLocation", ckpt1.toString)
              .foreachBatch { (df: DataFrame, bid: Long) =>
                writeBatchIdempotent(
                  VectorOps.pqEncode(spark,
                    df.select(col("vec_id"), col("e")), cb),
                  relay, bid)
                ()
              }.start()
            java.nio.file.Files.createDirectories(relay)
            val codesIn = spark.readStream
              .schema("vec_id BIGINT, s INT, code BIGINT")
              .option("maxFilesPerTrigger", streamShufflePartitions.toString)
              .option("pathGlobFilter", "b*")
              .parquet(relay.toString).as[PqCodeRow]
            val dd = VersionedStreamDedup.latestPerKeyId[PqCodeRow](
              codesIn, _.vec_id.toString, _.s.toString, _ => 0L)
            val q2 = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt2.toString)
              .foreachBatch { (df: DataFrame, bid: Long) =>
                writeBatchIdempotent(df.repartition(1), log, bid)
                ()
              }.start()
            try {
              q1.processAllAvailable()
              q2.processAllAvailable()
            } finally {
              try q1.stop() finally q2.stop()
            }
            requireMultiBatch(ckpt1, "s46_stream_pq_serving")
            // the converged code table, read back from state output
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("key"))
            val codes = raw
              .withColumn("max_seq", max(col("seq")).over(wMax))
              .filter(col("seq") === col("max_seq"))
              .select(explode(col("xs")).as("x"))
              .select(col("x.vec_id").as("vec_id"), col("x.s").as("s"),
                col("x.code").as("code"))
            // SERVE: ADC against the streamed codes (the batch
            // entry's exact scoring tail)
            VectorOps.pqAdcServe(spark, dir, codes)
              .orderBy(col("query_id"), col("rank"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(VectorOps.pqTopkOracleSql)),

    // STREAMING MEDIA FEATURIZATION — the decode→featurize→index loop
    // run incrementally, completing the media family's streaming
    // symmetry (fingerprints s19, minhash s21, LSH s24, IVF s25, PQ
    // codes s46 — now pooled media features): each arriving asset is
    // decoded and mean-pooled SCAN-LOCALLY in the microbatch (the
    // same native BmpPoolExpr the batch row runs — no shuffle touches
    // pixels), and only the 48-long feature vector is upserted into
    // doc-keyed state. The converged feature table then serves the
    // EXACT batch scoring tail (MultimodalOps.mediaTopkFrom), so the
    // streamed index answers the query panel bit-for-bit like
    // ann_media_topk — the s46 serve-the-batch-oracle contract,
    // applied to media. At 100 TB this is the live-ingest media
    // index: features extract where the bytes land, state holds 48
    // longs per asset, and the ANN family queries it while assets
    // stream in.
    Entry("s50_stream_media_features",
      (spark, dir) => runMediaFeatureStream(spark, dir) { feats =>
        MultimodalOps.mediaTopkFrom(feats)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(MultimodalOps.mediaTopkOracleSql)),

    // STREAMED MEDIA-IVF SERVING — s50's live-ingest feature state
    // put behind the PRODUCTION index layout: the converged pooled
    // features seed/assign/probe through the exact embeddings IVF
    // pipeline (ann_media_ivf_topk's read path, itself ann_ivf_topk's
    // code), hash-matching that oracle. This closes the last
    // streamed-index asymmetry — every index family (LSH s24, IVF
    // s25/s44, PQ s46, Hamming s53, media brute s50/s52) now also has
    // its trained/partitioned variant served from streamed state where
    // one exists. At 100 TB this is the media lake ingest story
    // end-to-end: pixels featurize scan-locally at ingest (s50's
    // loop), state holds 48 longs per asset, the cell id becomes the
    // partition key, and a query touches nprobe partitions of a
    // corpus that was never batch-indexed.
    Entry("s61_stream_media_ivf",
      (spark, dir) => runMediaFeatureStream(spark, dir) { feats =>
        MultimodalOps.mediaIvfTopkFrom(feats)
      },
      Some(MultimodalOps.mediaIvfTopkOracleSql)),

    // STREAMING AUDIO FEATURIZATION — s50's loop run for the SECOND
    // modality: arriving clips are chunk-walk decoded and pooled
    // scan-locally per microbatch (WavPoolExpr — the identical batch
    // featurizer), the (doc → 32-dim banded-energy vector) rows
    // upsert into doc-keyed feature state, and the converged feature
    // index answers the standing 8-clip query panel through the batch
    // scoring tail — hash-matching the ann_audio_topk oracle. With
    // s50 both media modalities have a live featurize→index→serve
    // proof; at 100 TB features stream into the index as clips land,
    // never a corpus-wide refeaturize.
    Entry("s52_stream_audio_features",
      (spark, dir) => runMediaFeatureStream(spark, dir, wavPooled) { feats =>
        MultimodalOps.mediaTopkFrom(feats)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(MultimodalOps.audioTopkOracleSql)),

    // STREAMED AUDIO-IVF SERVING — s52's live-ingest feature state put
    // behind the production index layout (the s61 pattern for the
    // second modality): the converged banded-energy features
    // seed/assign/probe through the exact embeddings IVF pipeline,
    // hash-matching the ann_audio_ivf_topk oracle. Every modality's
    // IVF lane is now ALSO served from streamed state — the full
    // modality × index × (batch|streamed) cube has no missing corner
    // on the audio side. At 100 TB this is the audio lake's ingest
    // story: clips featurize scan-locally as they land, state holds
    // 32 longs per clip, and a query touches nprobe cell partitions
    // of a corpus that was never batch-indexed.
    Entry("s67_stream_audio_ivf",
      (spark, dir) => runMediaFeatureStream(spark, dir, wavPooled) { feats =>
        MultimodalOps.mediaIvfTopkFrom(feats)
      },
      Some(MultimodalOps.audioIvfTopkOracleSql)),

    // STREAMING 1-BIT INDEX SERVING — the maintenance→serving loop
    // closed for the THIRD and smallest codec (IVF+SQ8: s44, PQ: s46,
    // now binary sign quantization): arriving vectors pack to their
    // 64-bit sign codes SCAN-LOCALLY in the microbatch (the exact
    // batch encoder, VectorOps.signPackedFrom — 64 codegen terms, no
    // shuffle touches vectors), the (vec_id → lo, hi) rows upsert
    // into keyed state (the state IS the compressed corpus, 8 logical
    // bytes per vector — at 100 TB a billion-vector index is ~8 GB of
    // state), and the converged code table answers the standing query
    // panel through the batch Hamming read path, hash-matching the
    // ann_hamming_topk oracle exactly. The full codec ladder now has
    // live-index serving proofs at every rung a production stack
    // deploys: 32×(binary) / 16×(PQ) / 4×(SQ8) compression, each
    // converging bit-for-bit to its batch twin.
    Entry("s53_stream_hamming_serving",
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_hserve_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "embvec", "embeddings") { p =>
              VectorOps.embSlim(spark, dir)
                .repartitionByRange(chunks, col("vec_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream
              .schema("vec_id BIGINT, e ARRAY<DOUBLE>, nrm DOUBLE")
              // coarsened trigger (StreamingHarness.coarseFilesPerTrigger):
              // latest-per-id upsert state, converged max-seq fold is
              // batching-independent
              .option("maxFilesPerTrigger", coarseFilesPerTrigger)
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val codeRows = VectorOps.signPackedFrom(src).as[SignCodeRow]
            val dd = VersionedStreamDedup.latestPerKeyId[SignCodeRow](
              codeRows, _.vec_id.toString, _ => "c", _ => 0L)
            val q = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, bid: Long) =>
                writeBatchIdempotent(df.repartition(1), log, bid)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            requireMultiBatch(ckpt, "s53_stream_hamming_serving")
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("key"))
            val codes = raw
              .withColumn("max_seq", max(col("seq")).over(wMax))
              .filter(col("seq") === col("max_seq"))
              .select(explode(col("xs")).as("x"))
              .select(col("x.vec_id").as("vec_id"), col("x.lo").as("lo"),
                col("x.hi").as("hi"))
            VectorOps.hammingTopkFrom(spark, dir, codes)
              .orderBy(col("query_id"), col("rank"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(VectorOps.hammingTopkOracleSql)),

    // STREAMING SCENE-CUT — the shot-boundary statistic maintained
    // incrementally: each arriving video's frames decode and reduce
    // to per-(doc, frame) channel sums SCAN-LOCALLY in the microbatch
    // (the identical BmpDecodeExpr chain the batch row runs — pixels
    // never shuffle, never enter state), the 3-sum stat rows upsert
    // into (doc, frame)-keyed state (the s50 media-feature shape, one
    // row per frame), and the CONVERGED stat table drives the exact
    // batch cut-decision tail (lag-diff vs per-doc mean,
    // cross-multiplied integers), hash-matching the m_video_scene_cut
    // oracle. At 100 TB this is live shot segmentation: frames
    // featurize where the bytes land, state holds 3 longs per frame,
    // and cut reports re-derive from state as late frames of a video
    // arrive — never a re-decode of what's already ingested.
    Entry("s57_stream_scene_cut",
      (spark, dir) => runFrameStatStream(spark, dir)(
        MultimodalOps.sceneCutFrom),
      Some(MultimodalOps.sceneCutOracleSql)),

    // STREAMING VIDEO INDEX SERVING — the s50/s52 live-index proof
    // for the THIRD modality, closing streamed media-ANN symmetry:
    // arriving videos' frames decode and reduce to per-(doc, frame)
    // channel sums scan-locally (s57's ingest, pixels never in
    // state), and the CONVERGED frame-stat table drives the exact
    // batch video-retrieval tail — scene segmentation, representative
    // -frame pooling, per-scene vectors, panel scoring through the
    // mergeable top-k — hash-matching the ann_video_topk oracle. At
    // 100 TB this is live shot-level retrieval: stat rows stream in
    // as videos land, the scene index re-derives from 3-longs-per-
    // frame state (late frames re-segment their own doc only), and
    // the query panel is answered from the index while ingest runs.
    Entry("s58_stream_video_serving",
      (spark, dir) => runFrameStatStream(spark, dir) { stats =>
        MultimodalOps.videoTopkFrom(stats)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(MultimodalOps.videoTopkOracleSql)),

    // STREAMED VIDEO-IVF SERVING — the s61/s67 pattern for the third
    // modality, finishing the modality × index × (batch|streamed)
    // cube: the CONVERGED frame-stat state re-derives the per-scene
    // vectors (s58's segmentation + representative-frame pooling) and
    // serves them through the exact embeddings IVF pipeline,
    // hash-matching the ann_video_ivf_topk oracle. At 100 TB this is
    // live shot-level retrieval behind the production index layout:
    // 3-longs-per-frame state streams in as videos land, scene
    // vectors partition by cell, and a query touches nprobe
    // partitions while ingest runs.
    Entry("s68_stream_video_ivf",
      (spark, dir) => runFrameStatStream(spark, dir) { stats =>
        MultimodalOps.mediaIvfTopkFrom(
          MultimodalOps.videoSceneVectors(stats))
      },
      Some(MultimodalOps.videoIvfTopkOracleSql)),
  )


  /** s44's stage 1 (also driven stop/restart by StreamAnnRecoverySpec):
    * arriving vectors assign to the broadcast `cent` cells SCAN-LOCALLY
    * in their microbatch (exact batch arithmetic — rounded cosine,
    * lower-cid argmax) and relay slim (vec_id, cell) rows; the vectors
    * themselves never enter streaming state. */
  private[graft] def startIvfAssignStream(spark: SparkSession, in: String,
      cent: DataFrame, ckpt: java.nio.file.Path, relay: java.nio.file.Path,
      filesPerTrigger: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema("vec_id BIGINT, e ARRAY<DOUBLE>, nrm DOUBLE")
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .option("pathGlobFilter", "part-*")
      .parquet(in)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        // scan-local per-batch assignment — see the s25 site note
        writeBatchIdempotent(
          VectorOps.assignScan(df, cent)
            .select(col("vec_id"), col("cell")),
          relay, bid)
        ()
      }.start()

  /** s44's stage 2: the relayed (vec_id, cell) assignments upsert into
    * cell-keyed membership state (two longs per vector), each update
    * appending to the convergence log that
    * [[convergedMembershipFrom]] folds. */
  private[graft] def startIvfMembershipStream(spark: SparkSession,
      relay: java.nio.file.Path, ckpt: java.nio.file.Path,
      log: java.nio.file.Path)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val asgs = spark.readStream.schema("vec_id BIGINT, cell BIGINT")
      .option("maxFilesPerTrigger", streamShufflePartitions.toString)
      .option("pathGlobFilter", "b*")
      .parquet(relay.toString).as[AsgRow]
    val dd = VersionedStreamDedup.latestPerKeyId[AsgRow](
      asgs, _.cell.toString, _.vec_id.toString, _ => 0L)
    dd.toDF().writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        writeBatchIdempotent(df.repartition(1), log, bid)
        ()
      }.start()
  }

  /** The converged inverted index (vec_id, cell) read back from a
    * membership stream's convergence log: latest emission per cell
    * key, members exploded. */
  private[graft] def convergedMembershipFrom(spark: SparkSession,
      log: java.nio.file.Path): DataFrame = {
    val raw = spark.read.parquet(log.toString)
    val wMax = Window.partitionBy(col("key"))
    raw
      .withColumn("max_seq", max(col("seq")).over(wMax))
      .filter(col("seq") === col("max_seq"))
      .select(explode(col("xs")).as("x"))
      .select(col("x.vec_id").as("vec_id"), col("x.cell").as("cell"))
  }

  /** The streamed media featurize→index loop shared by s50 and s61:
    * document ids replay as chunked files, each arriving asset is
    * BMP-decoded and mean-pooled SCAN-LOCALLY in its microbatch (the
    * exact batch featurizer — no shuffle touches pixels), the 48-long
    * feature vector upserts into doc-keyed state, and `serve` runs an
    * arbitrary batch scoring tail over the CONVERGED feature table
    * (brute panel for s50, the IVF index layout for s61). */
  private[graft] def runMediaFeatureStream(spark: SparkSession, dir: String,
      featurize: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        id => graft.multimodal.MultimodalPipeline.poolBmp(
          graft.multimodal.MultimodalPipeline.encodeBmp(id), 4, 4))(
      serve: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    withStreamConf(spark) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_mfeat_")
      val log = tmp.resolve("log")
      val ckpt = tmp.resolve("ckpt")
      try {
        val in = sharedChunkDir(dir, "docid", "documents") { p =>
          Registry.table(spark, dir, "documents").select(col("doc_id"))
            .repartitionByRange(chunks, col("doc_id"))
            .write.parquet(p.toString)
        }
        // coarsened trigger (StreamingHarness.coarseFilesPerTrigger):
        // doc-keyed feature upserts, converged max-seq fold is
        // batching-independent
        val src = spark.readStream.schema("doc_id BIGINT")
          .option("maxFilesPerTrigger", coarseFilesPerTrigger)
          .option("pathGlobFilter", "part-*")
          .parquet(in.toString)
        val featRows = src
          .select(col("doc_id"), featurize(col("doc_id")).as("f"))
          .as[MediaFeatRow]
        val dd = VersionedStreamDedup.latestPerKeyId[MediaFeatRow](
          featRows, _.doc_id.toString, _ => "f", _ => 0L)
        // key-bucketed like s63's log: these rows carry the pooled
        // feature vector per asset, so the payload — not the row
        // count — is the per-batch write cost
        val q = dd.toDF().writeStream.outputMode("update")
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch { (df: DataFrame, bid: Long) =>
            writeBatchIdempotent(
              df.repartition(streamShufflePartitions.toInt, col("key")),
              log, bid)
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
        requireMultiBatch(ckpt, "runMediaFeatureStream")
        val raw = spark.read.parquet(log.toString)
        val wMax = Window.partitionBy(col("key"))
        val feats = raw
          .withColumn("max_seq", max(col("seq")).over(wMax))
          .filter(col("seq") === col("max_seq"))
          .select(explode(col("xs")).as("x"))
          .select(col("x.doc_id").as("doc_id"), col("x.f").as("f"))
        serve(feats).localCheckpoint()
      } finally deleteRecursively(tmp)
    }
  }

  /** The WAV banded-energy featurizer for [[runMediaFeatureStream]]
    * (s52, s67): the identical batch featurizer behind
    * ann_audio_topk. */
  private[graft] val wavPooled
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    id => graft.multimodal.MultimodalPipeline.poolWav(
      graft.multimodal.MultimodalPipeline.encodeWav(id), 16)

  /** The streamed frame-stat ingest shared by the video rows (s57,
    * s58, s68): arriving videos' frames decode and reduce to
    * per-(doc, frame) channel sums SCAN-LOCALLY in their microbatch
    * (pixels never enter state — 3 longs per frame do), the stat rows
    * upsert into (doc, frame)-keyed state, and `serve` runs an
    * arbitrary batch tail over the CONVERGED stat table (cut report
    * for s57, brute panel for s58, the IVF index layout for s68). */
  private[graft] def runFrameStatStream(spark: SparkSession, dir: String)(
      serve: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    withStreamConf(spark) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_vstat_")
      val log = tmp.resolve("log")
      val ckpt = tmp.resolve("ckpt")
      try {
        val in = sharedChunkDir(dir, "docid", "documents") { p =>
          Registry.table(spark, dir, "documents").select(col("doc_id"))
            .repartitionByRange(chunks, col("doc_id"))
            .write.parquet(p.toString)
        }
        // coarsened trigger (StreamingHarness.coarseFilesPerTrigger):
        // (doc, frame)-keyed stat upserts, converged fold is
        // batching-independent
        val src = spark.readStream.schema("doc_id BIGINT")
          .option("maxFilesPerTrigger", coarseFilesPerTrigger)
          .option("pathGlobFilter", "part-*")
          .parquet(in.toString)
        val statRows = MultimodalOps.videoFrameStats(src)
          .as[FrameStatRow]
        val dd = VersionedStreamDedup.latestPerKeyId[FrameStatRow](
          statRows, _.doc_id.toString, _.frame_idx.toString, _ => 0L)
        val q = dd.toDF().writeStream.outputMode("update")
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch { (df: DataFrame, bid: Long) =>
            writeBatchIdempotent(df.repartition(1), log, bid)
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
        requireMultiBatch(ckpt, "runFrameStatStream")
        val raw = spark.read.parquet(log.toString)
        val wMax = Window.partitionBy(col("key"))
        val stats = raw
          .withColumn("max_seq", max(col("seq")).over(wMax))
          .filter(col("seq") === col("max_seq"))
          .select(explode(col("xs")).as("x"))
          .select(col("x.doc_id").as("doc_id"),
            col("x.frame_idx").as("frame_idx"),
            col("x.sum_r").as("sum_r"), col("x.sum_g").as("sum_g"),
            col("x.sum_b").as("sum_b"))
        serve(stats.localCheckpoint()).localCheckpoint()
      } finally deleteRecursively(tmp)
    }
  }
}
