package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{SketchFunctions, TextFunctions}
import graft.streaming.{VersionedStreamDedup, VersionedStreamJoin}

/** Trained-statistic twins: every statistic a training pipeline
  * maintains (PCA moment matrix, hard-negative pool, BPE vocabulary,
  * k-means sufficient statistics, and the full re-seeded Lloyd
  * trajectory) kept current by streaming state and hash-matched
  * against the batch training oracles. */
private[graft] object StreamTrainedTwins {

  import StreamingHarness._

  def entries: Seq[Entry] = Seq(

    // STREAMING PCA TRAINING — the moment matrix M = Σ x·xᵀ is a pure
    // SUM, so Spark's native streaming aggregation maintains it with
    // no custom state code at all (the mergeable-sketch argument,
    // applied to a training statistic): arriving vectors grid and
    // fan out scan-locally to their (i, j, xi·xj) outer-product
    // cells, a groupBy(i, j) sum in update mode accumulates them —
    // state is exactly the 64×64 matrix, independent of corpus size —
    // and the CONVERGED matrix runs the identical power-iteration
    // tail, hash-matching the batch v_pca_power3 oracle bit-for-bit.
    // The third training primitive with a streamed twin (IVF index:
    // s25/s44, PQ codes: s46, now the PCA direction); at 100 TB the
    // training statistic updates incrementally while the corpus
    // streams in, and the eigenvector re-derives from 32 KB whenever
    // wanted.
    Entry("s47_stream_pca_moment",
      (spark, dir) => {
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_pcam_")
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
              // monoid/upsert state, converged max-bid fold is
              // batching-independent
              .option("maxFilesPerTrigger", coarseFilesPerTrigger)
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val cells = src
              .select(col("vec_id"), VectorOps.gridOf(col("e")).as("g"))
              .select(col("vec_id"), col("g"),
                posexplode(col("g")).as(Seq("i", "xi")))
              .select(col("i"), col("xi"),
                posexplode(col("g")).as(Seq("j", "xj")))
              .groupBy(col("i"), col("j"))
              .agg(sum(col("xi") * col("xj")).cast("long").as("m"))
            val q = cells.writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, bid: Long) =>
                writeBatchIdempotent(
                  df.withColumn("bid", lit(bid)).repartition(1), log, bid)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            requireMultiBatch(ckpt, "s47_stream_pca_moment")
            // converged matrix = each cell's LAST emitted running sum
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("i"), col("j"))
            val entries = raw
              .withColumn("max_bid", max(col("bid")).over(wMax))
              .filter(col("bid") === col("max_bid"))
              .select(col("i"), col("j"), col("m"))
            VectorOps.pcaPowerFromMoment(spark,
                VectorOps.momentArrays(entries).localCheckpoint(), 3)
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(VectorOps.pcaPowerOracleSql(3))),

    // STREAMED HARD-NEGATIVE MINING — the contrastive-training data
    // loop served live: labeled vectors stream in and upsert into
    // vec-keyed state (the s44 ingest shape widened by the class
    // label — the one vector state that keeps full precision, because
    // mining verifies exactly), and the converged corpus mines the
    // standing query panel through the exact batch tail
    // (label-mismatch predicate fused into the candidate join,
    // map-side top-k, neighbor label re-fetched after the k-trim) —
    // hash-matching the v_hard_negatives oracle. At 100 TB this is
    // how a contrastive run keeps its negative pool current while the
    // corpus grows: state holds vector+label per id, and each
    // re-mine is the candidate-join read path against state that is
    // already up to date.
    Entry("s63_stream_hard_negatives",
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_hneg_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "emblab", "embeddings") { p =>
              VectorOps.embLabeled(spark, dir)
                .repartitionByRange(chunks, col("vec_id"))
                .write.parquet(p.toString)
            }
            val rows = spark.readStream
              .schema("vec_id BIGINT, label INT, e ARRAY<DOUBLE>, nrm DOUBLE")
              // coarsened trigger (StreamingHarness.coarseFilesPerTrigger):
              // monoid/upsert state, converged max-bid fold is
              // batching-independent
              .option("maxFilesPerTrigger", coarseFilesPerTrigger)
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString).as[EmbLabRow]
            val dd = VersionedStreamDedup.latestPerKeyId[EmbLabRow](
              rows, _.vec_id.toString, _ => "v", _ => 0L)
            // KEY-BUCKETED log write: unlike the ≤5-row convergence
            // logs elsewhere (where repartition(1) is documented and
            // fine), this log's rows carry full 64-dim vector payloads
            // per upserted key — the payload, not the row count, is
            // the per-batch cost, so the append is hash-bucketed by
            // the upsert key across the stream's shuffle width instead
            // of funneled through one task.
            val q = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, bid: Long) =>
                writeBatchIdempotent(
                  df.repartition(streamShufflePartitions.toInt, col("key")),
                  log, bid)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            requireMultiBatch(ckpt, "s63_stream_hard_negatives")
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("key"))
            val corpus = raw
              .withColumn("max_seq", max(col("seq")).over(wMax))
              .filter(col("seq") === col("max_seq"))
              .select(explode(col("xs")).as("x"))
              .select(col("x.vec_id").as("vec_id"),
                col("x.label").as("label"), col("x.e").as("e"),
                col("x.nrm").as("nrm"))
            VectorOps.hardNegativesFrom(corpus).localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(VectorOps.hardNegOracleSql)),

    // STREAMED BPE TRAINING — the tokenizer-training statistic
    // maintained incrementally: BPE's only corpus-wide input is the
    // word-frequency table, a pure sum over scan-local pre-tokens
    // (the s60 df-model shape — each document contributes its counts
    // exactly once at ingest, no stateful dedup needed), so the
    // native streaming groupBy-count IS the training-set state. The
    // converged (w, cnt) vocabulary then drives the exact batch merge
    // loop (vocab-sized pair-count rounds, 1-row broadcast
    // merge-apply), hash-matching the t_bpe_train oracle's full merge
    // trajectory. At 100 TB this is how a tokenizer retrains as the
    // corpus grows: the corpus is never re-scanned — the merge rounds
    // run over word-count state that is already current, orders of
    // magnitude smaller than the text.
    Entry("s64_stream_bpe_train",
      (spark, dir) => {
        withStreamConf(spark) {
          val in = bpeIngestChunks(spark, dir)
          val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_")
          try {
            val counts = streamedBpeCounts(spark, in, tmp)
            requireMultiBatch(tmp.resolve("ckpt"), "s64_stream_bpe_train")
            TextOps.bpeTrainFromCounts(spark, counts)
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(TextOps.bpeTrainSharedOracleSql)),

    // STREAMED K-MEANS SUFFICIENT STATISTICS — the last trained
    // statistic without a streamed twin: Lloyd's M-step needs only
    // per-(cell, dim) (Σq, n), a pure sum over micro-quantized exact
    // integers, so arriving vectors assign to the broadcast seed
    // centroids SCAN-LOCALLY in their microbatch (the exact batch
    // assignment — rounded cosine, lower-cid argmax) and fan out to
    // slim (cell, pos, q) rows whose native streaming aggregation IS
    // the training-set state (16 cells × 64 dims of (sum, count)
    // regardless of corpus size — the s47 moment-matrix argument
    // applied to k-means). The converged stats produce the round-1
    // centroids exactly as the batch updateCentroids does
    // (microMean's deterministic division per component) and
    // the final assignment hash-matches the v_kmeans_assign oracle.
    // At 100 TB this is how an IVF index's centroids refresh while
    // the corpus streams in: the M-step reads 1,024 stat rows that
    // are already current, never the vectors.
    Entry("s65_stream_kmeans_stats",
      (spark, dir) => {
        withStreamConf(spark) {
          val in = kmeansIngestChunks(spark, dir)
          val cent = VectorOps.ivfSeedCentroids(spark, dir)
            .select(col("cid"), col("ce")).localCheckpoint()
          val tmp = java.nio.file.Files.createTempDirectory("graft_kmeans_")
          try {
            // SERVE: the final assignment against the streamed-trained
            // round-1 centroids (the batch v_kmeans_assign tail)
            graft.core.VectorTools.assignCells(
                VectorOps.embSlim(spark, dir)
                  .select(col("vec_id").as("id"), col("e")),
                {
                  val r1 = streamedLloydRound(spark, in, cent,
                    tmp.resolve("r1"))
                  requireMultiBatch(tmp.resolve("r1").resolve("ckpt1"),
                    "s65_stream_kmeans_stats")
                  r1
                })
              .select(col("id").as("vec_id"), col("cell"), col("csim"))
              .orderBy(col("vec_id"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(VectorOps.kmeansAssignOracleSql)),

    // STREAMED FULL LLOYD TRAJECTORY — s65's sufficient-statistics
    // pass RE-SEEDED per round (the s64 merge-round discipline applied
    // to Lloyd): round r replays the embedding chunks through a fresh
    // streaming pass whose scan-local assignment broadcasts round
    // r-1's streamed-trained centroids, maintains the per-(cell, dim)
    // (Σq, n) state, and hands its fixed-point-mean centroids to round
    // r+1. Three such passes reproduce the batch VectorTools.lloyd
    // 3-round trajectory — including cross-round assignment migration
    // and empty-cell dropout — and the final assignment hash-matches
    // the v_kmeans_lloyd3 oracle. Unlike BPE (whose merge rounds run
    // over vocab-sized state), Lloyd's round-r statistic depends on
    // round r-1's model for EVERY vector, so a full re-scan per round
    // is the honest cost — identical to batch Lloyd's; what streaming
    // buys is that each pass is the live-ingest stat maintenance
    // (1,024 (Σ, n) rows of state, never the vectors), so a centroid
    // refresh never needs the corpus materialized as a batch table.
    Entry("s66_stream_kmeans_lloyd3",
      (spark, dir) => {
        withStreamConf(spark) {
          val in = kmeansIngestChunks(spark, dir)
          // ONE temp root for the whole trajectory, one subdir per
          // round (each round is its own pair of streaming queries
          // with its own checkpoints — the restart unit)
          val tmp = java.nio.file.Files.createTempDirectory("graft_kmeans_")
          try {
            var cent = VectorOps.ivfSeedCentroids(spark, dir)
              .select(col("cid"), col("ce")).localCheckpoint()
            for (r <- 1 to 3) {
              cent = streamedLloydRound(spark, in, cent, tmp.resolve(s"r$r"))
              requireMultiBatch(tmp.resolve(s"r$r").resolve("ckpt1"),
                "s66_stream_kmeans_lloyd3")
            }
            graft.core.VectorTools.assignCells(
                VectorOps.embSlim(spark, dir)
                  .select(col("vec_id").as("id"), col("e")),
                cent)
              .select(col("id").as("vec_id"), col("cell"), col("csim"))
              .orderBy(col("vec_id"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(VectorOps.kmeansLloyd3OracleSql)),
  )


  /** The shared document-text replay chunks for the streamed BPE row
    * (s64). */
  private[graft] def bpeIngestChunks(spark: SparkSession,
                                     dir: String): java.nio.file.Path =
    sharedChunkDir(dir, "doctext", "documents") { p =>
      Registry.table(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartitionByRange(chunks, col("doc_id"))
        .write.parquet(p.toString)
    }

  /** The streamed BPE word-count ingest behind s64: replay the
    * document chunks, pre-tokenize scan-locally, maintain the (w, cnt)
    * streaming aggregation — the tokenizer's training-set state — and
    * return the CONVERGED word-count table (each word's last emitted
    * running count, the max-bid fold over the idempotent log).
    *
    * RESTART-SAFE: the streaming artifacts (converged log, checkpoint)
    * live under the caller-provided `work` dir, which is NOT deleted
    * here — re-invoking with the same dir resumes from the checkpoint
    * (a replay stopped mid-corpus picks up exactly the unread chunk
    * files, with the count state restored from the state store), and
    * the sink writes through
    * [[StreamingHarness.writeBatchIdempotent]], so an at-least-once
    * foreachBatch re-delivery (crash between the sink write and the
    * checkpoint commit) REPLACES its first attempt's files instead of
    * appending duplicate counts into the max-bid fold. Both surfaces
    * are driven by StreamTrainedRecoverySpec; s47 (PCA moment) and
    * s63 (hard negatives) share the identical single-query
    * converged-log discipline. */
  private[graft] def streamedBpeCounts(spark: SparkSession,
      in: java.nio.file.Path, work: java.nio.file.Path): DataFrame = {
    val log = work.resolve("log")
    val ckpt = work.resolve("ckpt")
    val src = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      // coarsened trigger (StreamingHarness.coarseFilesPerTrigger):
      // word-count agg state is a monoid; max-bid fold batching-
      // independent (recovery surfaces unchanged — spec-driven)
      .option("maxFilesPerTrigger", coarseFilesPerTrigger)
      .option("pathGlobFilter", "part-*")
      .parquet(in.toString)
    val counts = TextOps.bpePreTokens(src)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("cnt"))
    val q = counts.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        writeBatchIdempotent(
          df.withColumn("bid", lit(bid)).repartition(1), log, bid)
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // converged vocabulary = each word's LAST emitted count
    val raw = spark.read.parquet(log.toString)
    val wMax = Window.partitionBy(col("w"))
    raw
      .withColumn("max_bid", max(col("bid")).over(wMax))
      .filter(col("bid") === col("max_bid"))
      .select(col("w"), col("cnt"))
      .localCheckpoint() // materialize before the caller deletes work
  }

  /** The shared slim-embedding replay chunks for the streamed k-means
    * rows (s65, s66). */
  private[graft] def kmeansIngestChunks(spark: SparkSession,
                                 dir: String): java.nio.file.Path =
    sharedChunkDir(dir, "embvec", "embeddings") { p =>
      VectorOps.embSlim(spark, dir)
        .repartitionByRange(chunks, col("vec_id"))
        .write.parquet(p.toString)
    }

  /** ONE streamed Lloyd round (shared by s65 and s66): replay the
    * embedding chunks, assign each arriving vector to the broadcast
    * `cent` table SCAN-LOCALLY in its microbatch (the exact batch
    * assignment — rounded cosine, lower-cid argmax), fan out to slim
    * (cell, pos, q) rows — q the micro-quantized component
    * floor(v·10⁶ + 0.5), an exact integer (VectorTools.microQuantize,
    * the same scan-local quantization the batch M-step applies) —
    * whose native streaming aggregation maintains the per-(cell, dim)
    * (Σq, n) sufficient statistics — 16 cells × 64 dims of state
    * regardless of corpus size — and return the updated centroid
    * table (cid, ce) via the batch updateCentroids arithmetic
    * (VectorTools.microMean — exact integer sums, one deterministic
    * division) over the converged sums.
    *
    * RESTART-SAFE: the round's streaming artifacts (relay, converged
    * log, both checkpoints) live under the caller-provided `work` dir,
    * which is NOT deleted here — re-invoking with the same dir resumes
    * the round from its checkpoints, and both sinks write through
    * [[StreamingHarness.writeBatchIdempotent]], so an at-least-once
    * foreachBatch re-delivery (crash between a sink write and its
    * checkpoint commit) REPLACES its first attempt's files instead of
    * appending duplicate (cell, pos, q) rows into the Σq/n statistics.
    * A kill between q1's commit and q2's listing, a re-delivered
    * microbatch on either query, and a mid-chain restart in s66's
    * 3-round trajectory are all driven by StreamTrainedRecoverySpec. */
  private[graft] def streamedLloydRound(spark: SparkSession,
      in: java.nio.file.Path, cent: DataFrame,
      work: java.nio.file.Path): DataFrame = {
    val relay = work.resolve("relay")
    val log = work.resolve("log")
    val ckpt1 = work.resolve("ckpt1")
    val ckpt2 = work.resolve("ckpt2")
    java.nio.file.Files.createDirectories(relay)
    val q1 = spark.readStream
      .schema("vec_id BIGINT, e ARRAY<DOUBLE>, nrm DOUBLE")
      // coarsened trigger (StreamingHarness.coarseFilesPerTrigger):
      // the (cell,pos) sums are exact-integer monoids; any batching
      // converges to the same statistics (recovery spec-driven)
      .option("maxFilesPerTrigger", coarseFilesPerTrigger)
      .option("pathGlobFilter", "part-*")
      .parquet(in.toString)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt1.toString)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        val b = df.select(col("vec_id").as("id"), col("e"))
        writeBatchIdempotent(
          graft.core.VectorTools.assignCells(b, cent)
            .select(col("id"), col("cell"))
            .join(b, "id")
            .select(col("cell"), posexplode(col("e")).as(Seq("pos", "v")))
            .select(col("cell"), col("pos"),
              graft.core.VectorTools.microQuantize(col("v")).as("q")),
          relay, bid)
        ()
      }.start()
    val stats = spark.readStream
      .schema("cell BIGINT, pos INT, q BIGINT")
      .option("maxFilesPerTrigger", streamShufflePartitions.toString)
      .option("pathGlobFilter", "b*")
      .parquet(relay.toString)
      .groupBy(col("cell"), col("pos"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
    val q2 = stats.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt2.toString)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        writeBatchIdempotent(
          df.withColumn("bid", lit(bid)).repartition(1), log, bid)
        ()
      }.start()
    // Sequencing: q1.processAllAvailable() is a BARRIER — it returns
    // only after every q1 microbatch has committed, i.e. after every
    // relay file is fully written and atomically renamed into place
    // (writeBatchIdempotent moves completed files; the directory
    // listing is deterministic). Only then does q2.processAllAvailable()
    // run, so q2's file source cannot list a half-written relay file or
    // miss q1's last one. A refactor that overlaps the two calls
    // (or swaps their order) silently breaks this.
    try {
      q1.processAllAvailable()
      q2.processAllAvailable()
    } finally {
      try q1.stop() finally q2.stop()
    }
    // converged stats → updated centroids (the batch updateCentroids
    // arithmetic over maintained sums). No summation-order hazard:
    // the relay carries micro-quantized EXACT INTEGERS, so the
    // streamed Σq is bit-identical whatever the microbatch arrival
    // order, and microMean's single division reproduces the batch
    // (and DuckDB-oracle) component exactly — the former double-Σv
    // lane relied on round(·, 6) absorbing arrival-order ulps, which
    // could flake on a component sitting exactly on a 6-decimal
    // boundary (r17 verdict's ask; the integer lane retires the
    // class instead of widening the round).
    val raw = spark.read.parquet(log.toString)
    val wMax = Window.partitionBy(col("cell"), col("pos"))
    raw
      .withColumn("max_bid", max(col("bid")).over(wMax))
      .filter(col("bid") === col("max_bid"))
      .select(col("cell"), col("pos"),
        graft.core.VectorTools.microMean(col("s"), col("n")).as("c"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c"))))
        .as("pc"))
      .select(col("cell").as("cid"),
        expr("transform(pc, x -> x.c)").as("ce"))
      .localCheckpoint() // materialize before the caller deletes work
  }
}
