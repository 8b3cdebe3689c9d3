package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{SketchFunctions, TextFunctions}
import graft.streaming.{VersionedStreamDedup, VersionedStreamJoin}

/** Shared machinery of every streaming replay row: the synchronous
  * file-source harnesses (chunked ingest dirs, shared immutable chunk
  * cache, converged-log folds), the stream-tuned session conf (NIO
  * checkpoint manager, replay-sized shuffle width), and the
  * watermark/append replay with its sentinel flush. Every temp-dir
  * lifecycle helper lives here so the per-family files hold only
  * query logic. */
private[graft] object StreamingHarness {


  private[graft] val chunks = 8

  /** Coarsened replay trigger size — the s22 trigger discipline (r18)
    * generalized: 4 files per trigger over the 8 replay chunks gives
    * 2+ microbatches, amortizing the per-microbatch fixed costs
    * (state-store commit, sink write + rename, incremental planning,
    * offset/commit WAL) that dominate these rows at replay scale
    * (guide §1/§2: the data barely registers; measured ~0.2–0.5 s per
    * microbatch against a converged answer that is identical at any
    * batching). ONLY sound for rows whose converged answer is
    * batching-independent — upsert/monoid state with max-seq/max-bid
    * folds; rows where batch boundaries are load-bearing (TTL firing
    * schedules: s17/s18/s45; watermark-horizon dedup: s29; the
    * batch-size-capped incremental CC paths: s62; the per-family
    * per-file-fidelity archetypes: s4, s8, s11, s19, s20, s25, s48)
    * keep maxFilesPerTrigger=1. Every coarsened row must call
    * [[requireMultiBatch]] (or run through runFileStream, which does)
    * so replay can never silently degrade to a single batch. */
  private[graft] val coarseFilesPerTrigger = "4"

  /** Assert a coarsened replay actually ran ≥2 committed microbatches,
    * from the engine's own commit log (works for every output mode —
    * update/append logs and complete-mode overwrite sinks alike). */
  private[graft] def requireMultiBatch(ckpt: java.nio.file.Path,
                                       what: String): Unit = {
    val commits = listDir(ckpt.resolve("commits"))
      .count(_.getFileName.toString.forall(_.isDigit))
    require(commits >= 2,
      s"$what: coarsened replay ran $commits committed microbatch(es); " +
        ">=2 required so multi-batch upsert semantics stay exercised")
  }

  /** State-store parallelism for the replay runs. Each microbatch
    * writes one checkpoint delta file per state partition, and on a
    * local filesystem without native Hadoop libs every file costs an
    * exec'd `chmod` (measured: the dominant cost of these queries).
    * 8 partitions is ample for ~150 join keys; a real cluster against
    * object storage would size this to executor count instead — hence
    * the env knob (must be constant across a query's restarts: the
    * idempotent sink's stable-part-count contract rides this width).
    * Widening was A/B-measured at replay scale and LOSES: 8/16/32
    * over six representative rows (min-of-3, sf0.1) read totals
    * 28.9 / 30.5 / 52.2 s — the per-partition per-batch commit cost
    * (RocksDB instance + changelog file each) grows faster than the
    * state-update critical path shrinks. */
  private[graft] val streamShufflePartitions = {
    val raw = sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8")
    // validate ONCE at class load and fail fast with a clear message:
    // this value becomes spark.sql.shuffle.partitions AND relay
    // trigger sizes, where a non-numeric or non-positive value would
    // otherwise surface as an opaque mid-query failure (r19 ADVICE)
    require(raw.toIntOption.exists(_ > 0),
      s"SPARK_GRAFT_STREAM_PARTS must be a positive integer, got '$raw'" +
        " (it must also stay constant across a query's restarts - the" +
        " idempotent sink's stable-part-count contract rides it)")
    raw
  }

  private[graft] def withStreamConf[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", streamShufflePartitions)
    // All replay checkpoints live under the local /tmp dirs these
    // harnesses create, so commit them through the fork-free NIO
    // manager (see [[graft.streaming.NioCheckpointFileManager]]: the
    // Hadoop local FS forks a `chmod` process per checkpoint file —
    // measured ~1,600 forks for ONE stream-stream join replay, the
    // dominant cost of the streaming suite).
    val prevFm = spark.conf.getOption(
      "spark.sql.streaming.checkpointFileManagerClass")
    spark.conf.set("spark.sql.streaming.checkpointFileManagerClass",
      classOf[graft.streaming.NioCheckpointFileManager].getName)
    // Spark 4.1 wraps the manager with checksum-sidecar generation by
    // default, DOUBLING the per-commit file count. Corruption detection
    // buys nothing for a throwaway local replay checkpoint (it exists
    // for long-lived checkpoints on remote storage) — keep it off here.
    val prevCk = spark.conf.getOption(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled")
    spark.conf.set(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    try body finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      def restore(k: String, v: Option[String]): Unit = v match {
        case Some(x) => spark.conf.set(k, x)
        case None    => spark.conf.unset(k)
      }
      restore("spark.sql.streaming.checkpointFileManagerClass", prevFm)
      restore("spark.sql.streaming.checkpoint.fileChecksum.enabled", prevCk)
    }
  }

  /** Shared by every temp-dir harness below (deepest paths first). */
  private[graft] def deleteRecursively(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(root).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
  }

  /** Immediate children of `root`, with the listing stream CLOSED (an
    * unclosed Files.list leaks a directory fd per call — some callers
    * run every microbatch). The one flat-listing idiom for every
    * harness and the s62 snapshot machinery. */
  private[graft] def listDir(root: java.nio.file.Path): Seq[java.nio.file.Path] =
    if (!java.nio.file.Files.isDirectory(root)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(root)
      try s.iterator().asScala.toVector finally s.close()
    }

  /** IDEMPOTENT per-microbatch sink write for the converged-log /
    * relay harnesses: stages the batch with Spark's committer, then
    * atomically renames each part file to a DETERMINISTIC
    * `b<bid>_p<i>` name inside `dir`. foreachBatch is at-least-once —
    * a re-delivered batch (crash between the sink write and the
    * checkpoint commit) re-runs this body with the SAME bid and, the
    * computation being deterministic, the same content: the renames
    * then REPLACE the first attempt's files instead of appending
    * duplicates next to them, so downstream folds (max-bid/max-seq,
    * streaming file sources tracking seen paths) observe exactly-once
    * content with no dedup logic of their own. Stable names also mean
    * a streaming file source that already consumed the first attempt
    * sees nothing new. Plain `mode("append")` logs lack exactly this
    * property (r16 ADVICE on the s65/s66 relay).
    *
    * CONTRACT: a re-delivery must reproduce the first attempt's FILE
    * SET — deterministic content AND a stable part count across
    * attempts. Callers uphold the count side one of two ways: an
    * explicit constant layout (`repartition(1)`, or
    * `repartition(k, key)` with k a compile-time constant), or — for
    * the relay/join-log writers that keep the upstream shuffle layout —
    * the harness itself, which runs every twin (and therefore every
    * re-delivery) under [[withStreamConf]]'s compile-time-constant
    * shuffle width, so the same deterministic plan over the same batch
    * produces the same non-empty-partition set on retry (AQE included:
    * its coalescing decisions are a function of the same runtime
    * stats). A re-delivery whose part count DRIFTED anyway — possible
    * only if the code or its constants changed between crash and
    * restart — is handled for a fresh lister (the tail-trim below),
    * but a tailing file source that consumed part of the first attempt
    * mid-batch cannot be reconciled with a content-repacked retry by
    * ANY filesystem layout (its path-based seen-files log would skip
    * the replaced names while the trimmed tails vanish) — which is why
    * the stable-layout contract, not the trim, is the load-bearing
    * property. */
  private[graft] def writeBatchIdempotent(df: DataFrame,
      dir: java.nio.file.Path, bid: Long): Unit = {
    val stage = dir.resolveSibling(
      dir.getFileName.toString + s".stage_b$bid")
    if (java.nio.file.Files.exists(stage)) deleteRecursively(stage)
    df.write.mode("overwrite").parquet(stage.toString)
    java.nio.file.Files.createDirectories(dir)
    val parts = listDir(stage)
      .filter(_.getFileName.toString.startsWith("part-"))
      .sortBy(_.getFileName.toString)
    val prefix = s"b${bid}_p"
    // total parse of a file's `b<bid>_p<i>` index: None for a name
    // with no digit run after the prefix (a stray or foreign artifact
    // in the log dir must be ignored, not crash the microbatch with
    // NumberFormatException — r17 ADVICE)
    def partIndex(p: java.nio.file.Path): Option[Int] = {
      val n = p.getFileName.toString
      if (!n.startsWith(prefix)) None
      else n.stripPrefix(prefix).takeWhile(_.isDigit).toIntOption
    }
    // one pre-rename listing serves both the drift check and the
    // tail-trim: leftover indices >= parts.length are never rename
    // targets, so the set is identical before and after the moves
    val existing = listDir(dir)
    // part-count drift across a re-delivery (possible only if code or
    // conf changed between crash and restart) is reconciled for fresh
    // listers by the tail-trim below, but a TAILING source may then
    // hold a mixed view — surface it instead of staying silent
    val prior = existing.count(partIndex(_).isDefined)
    if (prior != 0 && prior != parts.length)
      System.err.println(s"[graft] writeBatchIdempotent: part-count " +
        s"drift on re-delivery of batch $bid in $dir: " +
        s"$prior existing vs ${parts.length} staged — a tailing file " +
        s"source that consumed the first attempt mid-batch may hold a " +
        s"mixed view (fresh listers are reconciled by the tail-trim)")
    parts.zipWithIndex.foreach { case (p, i) =>
      // ATOMIC_MOVE on POSIX is rename(2): replaces an existing
      // target atomically, so a reader never sees a partial file
      java.nio.file.Files.move(p, dir.resolve(f"b${bid}_p$i%05d.parquet"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    // a re-delivery that produced FEWER parts than the first attempt
    // (partition-count drift across a restart) must not leave the
    // first attempt's tail files beside the replacement — they would
    // duplicate the batch for any fresh lister of the directory
    existing
      .filter(partIndex(_).exists(_ >= parts.length))
      .foreach(java.nio.file.Files.delete(_))
    deleteRecursively(stage)
  }

  // -- shared immutable replay-ingest chunk dirs ----------------------
  //
  // Every streaming row replays a table as range-split parquet chunks.
  // The chunk files are a pure function of (sf dir, projection, chunk
  // count), so they are written ONCE into a shared immutable dir and
  // reused by all replay rows — each row keeps its own checkpoint and
  // sink-log dirs (the stateful parts), only the read-only ingest
  // prefix is shared. Previously each of the 20 s-rows paid the
  // repartition+write fixed cost (~the dominant non-state cost of the
  // streaming suite). Publication is atomic (write to a pid-suffixed
  // sibling, rename into place) so a concurrent second process either
  // wins the rename or reuses the winner's dir; _SUCCESS (written by
  // Spark's committer) marks completeness across JVM restarts.

  private[graft] val sharedIngestRoot = java.nio.file.Paths
    .get(sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_shared_ingest")

  /** Content fingerprint of a source table file/dir: total byte size +
    * newest mtime over its files. Part of the shared-ingest cache key so
    * a driver-side testdata regeneration invalidates the cache instead
    * of silently replaying stale chunks into the streaming rows (the
    * events regeneration between r07 and r08 made this a live hazard:
    * the oracle reads fresh parquet while a keyed-on-path cache would
    * keep serving the old vintage). */
  private[graft] def srcFingerprint(sfDir: String, srcTable: String): String = {
    val p = java.nio.file.Paths.get(sfDir, srcTable + ".parquet")
    if (!java.nio.file.Files.exists(p)) "absent"
    else {
      // digest over every file's (relative path, size, mtime): a
      // regeneration that happens to preserve the TOTAL size and lands
      // within the filesystem's mtime granularity must still change
      // the key (the aggregate size+max-mtime form it replaces could
      // silently replay stale chunks in exactly that case)
      import scala.jdk.CollectionConverters._
      val parts = {
        val s = java.nio.file.Files.walk(p)
        try s.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(f => p.relativize(f).toString + ":" +
            java.nio.file.Files.size(f) + ":" +
            java.nio.file.Files.getLastModifiedTime(f).toMillis)
          .toSeq.sorted
        finally s.close()
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      parts.foreach(x => md.update(x.getBytes("UTF-8")))
      md.digest().map("%02x".format(_)).mkString.take(16)
    }
  }

  private[graft] def sharedChunkDir(sfDir: String, name: String,
      srcTable: String)(
      write: java.nio.file.Path => Unit): java.nio.file.Path = synchronized {
    val prefix = (sfDir + "_" + name + "_" + chunks + "_")
      .replaceAll("[^A-Za-z0-9._-]", "_")
    val key = prefix + srcFingerprint(sfDir, srcTable)
      .replaceAll("[^A-Za-z0-9._-]", "_")
    val target = sharedIngestRoot.resolve(key)
    // prune superseded cache dirs for the same (sfDir, name, chunks):
    // a regenerated source changes the fingerprint suffix, and without
    // this the stale chunk dirs accumulate under /tmp forever (in-
    // flight ".tmp.<pid>" dirs of other processes are left alone)
    listDir(sharedIngestRoot)
      .filter { d =>
        val n = d.getFileName.toString
        n.startsWith(prefix) && n != key && !n.contains(".tmp.")
      }.foreach(deleteRecursively)
    if (java.nio.file.Files.exists(target.resolve("_SUCCESS"))) target
    else {
      java.nio.file.Files.createDirectories(sharedIngestRoot)
      val tmp = sharedIngestRoot.resolve(
        key + ".tmp." + ProcessHandle.current().pid())
      if (java.nio.file.Files.exists(tmp)) deleteRecursively(tmp)
      write(tmp)
      try java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileSystemException =>
        deleteRecursively(tmp) // another process published first; reuse
      }
      target
    }
  }

  /** The events table as `chunks` range-split replay files (the shape
    * every events-replay row consumes; see [[evReplaySchema]]). */
  private[graft] def sharedEventsChunks(spark: SparkSession,
                                 dir: String): java.nio.file.Path =
    sharedChunkDir(dir, "events", "events") { p =>
      Registry.table(spark, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("ts_us"), col("value"))
        .repartitionByRange(chunks, col("event_id"))
        .write.parquet(p.toString)
    }

  /** The chained-join tables (customer / orders / lineitem) as chunked
    * replay dirs — shared by s11 and s22. `l_ver` packs (shipdate
    * epoch-days, price cents) so its strict ordering equals the batch
    * oracle's dedup (see [[LiRow]]). */
  private[graft] def chainChunkDirs(spark: SparkSession, dir: String)
      : (java.nio.file.Path, java.nio.file.Path, java.nio.file.Path) = {
    val cust = sharedChunkDir(dir, "chain_cust", "customer") { p =>
      Registry.table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
        .repartitionByRange(chunks, col("c_custkey"))
        .write.parquet(p.toString)
    }
    // "_v2" = the +1 o_ver shift below: sharedChunkDir keys fingerprint
    // the SOURCE data but not this derivation logic, so a
    // schema/derivation change must still bump the name or a stale
    // cache from an older build poisons the replay
    val ord = sharedChunkDir(dir, "chain_ord_v2", "orders") { p =>
      Registry.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          // +1: versions must stay POSITIVE — o_orderkey 0 exists, and
          // under s22's event-time TTL an epoch-zero version is dropped
          // by the watermarked union (EventTimeZeroVersionSpec); a
          // strictly monotone shift changes no dedup outcome
          (col("o_orderkey") + lit(1)).as("o_ver"), col("o_totalprice"))
        .repartitionByRange(chunks, col("o_orderkey"))
        .write.parquet(p.toString)
    }
    val li = sharedChunkDir(dir, "chain_li", "lineitem") { p =>
      Registry.table(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (expr("unix_date(cast(l_shipdate as date))") * lit(10000000000L)
            + expr("cast(round(l_extendedprice * 100) as bigint)"))
            .as("l_ver"),
          col("l_extendedprice"))
        .repartitionByRange(chunks, col("l_orderkey"))
        .write.parquet(p.toString)
    }
    (cust, ord, li)
  }

  /** Schema of the range-split events replay files (runFileStream and
    * s13 must agree — the same writer feeds both). */
  private[graft] val evReplaySchema = "event_id BIGINT, user_id BIGINT, " +
    "event_type STRING, ts_us BIGINT, value DOUBLE"

  /** File-source streaming harness (the production shape — nothing is
    * EVER driver-resident, sink included): the events table is
    * range-split into `chunks` parquet files (a stand-in for a growing
    * ingest directory — at 100 TB this is the object-store prefix new
    * files land in), then readStream consumes one file per trigger
    * through `build`, and every microbatch's emissions land in a
    * parquet LOG via foreachBatch (per-bid idempotent renames via
    * [[writeBatchIdempotent]] for update/append mode; whole-dir
    * overwrite for complete mode, where each trigger carries the full
    * current answer). Raw update-mode emission volume (typically 5–10×
    * the converged answer) therefore lives only in executor-written
    * files, never in a driver-side memory sink. `finish` reduces the
    * re-read log to the small converged answer (e.g. the max-seq
    * filter), which is localCheckpointed so the temp log can be
    * deleted. Arrival order varies with file mtimes, but versions are
    * unique per (key, id) so converged state is order-independent. */
  private[graft] def runFileStream(spark: SparkSession, dir: String,
                            mode: String = "update",
                            filesPerTrigger: Int = 1)(
      build: (() => org.apache.spark.sql.Dataset[Ev]) => DataFrame)(
      finish: DataFrame => DataFrame): DataFrame =
    withStreamConf(spark) {
      import spark.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_fs_")
      val log = tmp.resolve("log")
      val ckpt = tmp.resolve("ckpt")
      try {
        // read-only ingest chunks are shared across rows; checkpoint
        // and sink log stay private to this row
        val in = sharedEventsChunks(spark, dir)
        def src = spark.readStream.schema(evReplaySchema)
          .option("maxFilesPerTrigger", filesPerTrigger.toString)
          .option("pathGlobFilter", "part-*")
          .parquet(in.toString).as[Ev]
        val q = build(() => src).writeStream
          .outputMode(mode)
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch { (df: DataFrame, bid: Long) =>
            // Bound the log's file count: without this, every microbatch
            // appends one file PER SHUFFLE PARTITION (32 × trigger count
            // small files), and the converge-scan pays the open/footer
            // tax per file. repartition — not coalesce — so the stateful
            // stage keeps its full parallelism and only the (small)
            // emission set funnels through the single write task; a
            // production deployment sizes this to emission volume
            // (one file per few hundred MB) rather than 1.
            // Complete mode overwrites (each trigger carries the full
            // current answer — re-delivery is idempotent by shape);
            // update/append modes write through the per-bid idempotent
            // renamer so a re-delivered batch replaces its first
            // attempt instead of duplicating the log's max-seq rows.
            if (mode == "complete")
              df.repartition(1).write.mode("overwrite").parquet(log.toString)
            else writeBatchIdempotent(df.repartition(1), log, bid)
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
        // a coarsened replay (see [[coarseFilesPerTrigger]]) must keep
        // multi-batch semantics exercised — enforced from the engine's
        // own commit log
        if (filesPerTrigger > 1) requireMultiBatch(ckpt, "runFileStream")
        // converge BEFORE materializing: only the small final answer is
        // pinned (executor block manager, not driver), then the raw log
        // — which carries every emission — can be deleted.
        finish(spark.read.parquet(log.toString)).localCheckpoint()
      } finally deleteRecursively(tmp)
    }

  /** Converged view of a raw update-mode join sink: keep each key's
    * rows from its highest emission seq, then project to the batch
    * J1/J2 output shape (shared by s1, s4 and s5 — all must hash-match
    * their batch oracles). */
  private[graft] def convergedJ1(raw: DataFrame): DataFrame = {
    val wMax = Window.partitionBy(col("key"))
    raw
      .withColumn("max_seq", max(col("seq")).over(wMax))
      .filter(col("seq") === col("max_seq"))
      .select(
        col("key").cast("long").as("user_id"),
        col("x.event_id").as("x_event_id"),
        col("x.event_type").as("x_type"),
        expr("timestamp_micros(x.ts_us)").as("x_ts"),
        col("y.event_id").as("y_event_id"),
        col("y.event_type").as("y_type"),
        expr("timestamp_micros(y.ts_us)").as("y_ts"))
      .orderBy(col("user_id"), asc_nulls_first("x_type"),
        asc_nulls_first("y_type"))
  }

  private[graft] def isX(e: Ev): Boolean =
    (e.event_type == "signup" || e.event_type == "error") && e.user_id % 3 != 0
  private[graft] def isY(e: Ev): Boolean =
    (e.event_type == "click" || e.event_type == "purchase" ||
      e.event_type == "view") && e.user_id % 5 != 0

  /** Watermark + append-mode replay harness with the sentinel flush
    * (shared by s13 tumbling and s15 session windows): the events table
    * is range-split into chunked ingest files, a sentinel event 40 days
    * past max event time is appended as the LAST file (mtime-bumped so
    * the source lists it last — were it processed early, its watermark
    * would mark every later-arriving real event beyond-late), and the
    * 35-day watermark delay EXCEEDS the corpus time span so no real
    * window can close before the sentinel arrives, making file arrival
    * order irrelevant (no late-drop risk). The sentinel's own window /
    * session never closes, so it is never emitted. `agg` builds the
    * watermarked windowed aggregation over the `ets`-stamped source;
    * each closed window lands exactly once in a parquet FILE sink (a
    * downstream consumer needs no upsert handling) and closed-window
    * state is dropped. */
  private[graft] def runAppendReplay(spark: SparkSession, dir: String,
                              filesPerTrigger: Int = 1)(
      agg: (() => DataFrame) => DataFrame)(
      finish: DataFrame => DataFrame): DataFrame = withStreamConf(spark) {
    val tmp = java.nio.file.Files.createTempDirectory("graft_app_")
    val in = tmp.resolve("in"); val out = tmp.resolve("out")
    val ckpt = tmp.resolve("ckpt")
    try {
      import spark.implicits._
      // the immutable shared chunks, HARDLINKED into this row's private
      // dir (the sentinel below must not pollute the shared prefix);
      // links cost no copy and no re-write
      java.nio.file.Files.createDirectories(in)
      listDir(sharedEventsChunks(spark, dir))
        .filter(_.getFileName.toString.startsWith("part-"))
        .foreach { p =>
          java.nio.file.Files.createLink(in.resolve(p.getFileName), p)
        }
      // sentinel bounds: one scalar row to the driver, not a data
      // collect — read back from the narrow chunk files, not a second
      // source scan. Fail fast if data growth ever breaks the
      // delay-exceeds-span invariant.
      val bounds = spark.read.parquet(in.toString)
        .agg(min(col("ts_us")), max(col("ts_us"))).head()
      val (minUs, maxUs) = (bounds.getLong(0), bounds.getLong(1))
      require(maxUs - minUs < 34L * 86400000000L,
        s"events span ${(maxUs - minUs) / 86400000000L} days; " +
          "raise the 35-day watermark or arrival order can drop rows")
      def parts() = listDir(in)
        .filter(_.getFileName.toString.startsWith("part-")).toSet
      val mainParts = parts()
      // THREE sentinel rows, one per downstream filter shape: consumers
      // prune their event types below the watermark operator (Catalyst
      // pushes the filter through EventTimeWatermark), so a sentinel
      // only advances a branch's watermark if it SURVIVES that branch's
      // filter. The negative user ids ride the never-emitted trick
      // (their windows / sessions / match-ranges never close before the
      // stream ends) and differ so the sentinels cannot join each other.
      Seq((-1L, -1L, "sentinel", maxUs + 40L * 86400000000L, 0.0),
          (-2L, -1L, "signup", maxUs + 40L * 86400000000L, 0.0),
          (-3L, -2L, "click", maxUs + 40L * 86400000000L, 0.0))
        .toDF("event_id", "user_id", "event_type", "ts_us", "value")
        .coalesce(1).write.mode("append").parquet(in.toString)
      (parts() -- mainParts).foreach { p =>
        java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() + 60000L))
      }
      // a FACTORY so joins can open two independently-watermarked
      // streams over the same replay dir (the sentinel advances both)
      // a coarsened replay (see [[coarseFilesPerTrigger]]) is sound
      // here because the sentinel file's mtime bump keeps it in the
      // LAST batch whatever the trigger size, the 35-day delay exceeds
      // the corpus span (no real row is ever beyond-late at any
      // batching), and every append emission flushes only once the
      // sentinel advances the watermark — so the sink's final content
      // is batching-independent by construction
      def src(): DataFrame = spark.readStream.schema(evReplaySchema)
        .option("maxFilesPerTrigger", filesPerTrigger.toString)
        .option("pathGlobFilter", "part-*")
        .parquet(in.toString)
        .withColumn("ets", expr("timestamp_micros(ts_us)"))
        .withWatermark("ets", "35 days")
      // EVENT-DRIVEN QUIESCE (replaces the former 500 ms sink-count
      // sleep-poll, which set a 1–2 s wall-clock floor per row and was
      // the surface co-tenant noise coupled into). The emissions these
      // rows wait for land in the NO-DATA batch(es) that run once the
      // sentinel has advanced the watermark — processAllAvailable can
      // return before those commit (it only covers source DATA), so
      // the waiter below blocks on the listener bus instead of
      // sleeping: each completed batch (its file-sink commit included)
      // posts a QueryProgressEvent carrying the watermark that batch
      // ran at. The query is converged exactly when (a) some committed
      // batch ran AT the final watermark — any state that can ever
      // flush, flushed in it or an immediately-following batch, since
      // no new data exists to move the watermark further — (b) the
      // engine has gone quiet (no event for a grace window and no
      // trigger in flight: follow-up no-data batches run back-to-back,
      // so a pending one is always either active or already reported
      // inside the grace), and (c) the sink is non-empty.
      //
      // The final watermark is exact, not observed: event-time stats
      // are tracked in ms (the watermark operator floor-divides the
      // micros column), the sentinel is the max event at
      // maxUs + 40 days, and the delay is 35 days:
      val finalWmMs = (maxUs + 40L * 86400000000L) / 1000L -
        35L * 86400000L
      val monitor = new Object
      val flushSeen = java.util.concurrent.ConcurrentHashMap
        .newKeySet[java.util.UUID]()
      val lastEvent = new java.util.concurrent.ConcurrentHashMap[
        java.util.UUID, java.lang.Long]()
      // the listener is registered BEFORE start() (events are not
      // replayed to late subscribers) and keyed by progress.id so a
      // concurrently-running query on the same session cannot satisfy
      // this row's conditions
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          lastEvent.put(e.progress.id, System.nanoTime())
          val wm = Option(e.progress.eventTime.get("watermark"))
          if (wm.exists(w =>
              java.time.Instant.parse(w).toEpochMilli >= finalWmMs))
            flushSeen.add(e.progress.id)
          monitor.synchronized(monitor.notifyAll())
        }
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
          monitor.synchronized(monitor.notifyAll())
      }
      spark.streams.addListener(listener)
      try {
        val q = agg(() => src())
          .writeStream.outputMode("append")
          .format("parquet").option("path", out.toString)
          .option("checkpointLocation", ckpt.toString)
          .start()
        try {
          q.processAllAvailable()
          def sinkCount(): Long =
            try spark.read.parquet(out.toString).count()
            catch { case _: Exception => -1L } // sink not created yet
          val graceNs = 300L * 1000000L
          val deadline = System.nanoTime() + 60L * 1000000000L
          var done = false
          while (!done && System.nanoTime() < deadline) {
            val ready = monitor.synchronized {
              val last = Option(lastEvent.get(q.id))
                .fold(Long.MinValue)(_.longValue)
              val quietNs =
                if (last == Long.MinValue) Long.MaxValue
                else System.nanoTime() - last
              val ok = flushSeen.contains(q.id) && quietNs >= graceNs &&
                !q.status.isTriggerActive
              if (!ok) monitor.wait(
                // no flush batch observed yet: block until the bus
                // delivers one (bounded re-check vs a lost wake-up);
                // inside the grace: sleep exactly the remainder;
                // only a trigger in flight: short re-check
                if (!flushSeen.contains(q.id)) 1000L
                else if (quietNs < graceNs)
                  math.max(1L, (graceNs - quietNs) / 1000000L + 1)
                else 50L)
              ok
            }
            // the sink check costs a Spark job, so it runs only once
            // the engine is quiet — empty here means the flush batch
            // emitted nothing yet (cannot happen for these shapes, but
            // the deadline bounds it rather than an assumption)
            if (ready) {
              if (sinkCount() > 0) done = true
              else monitor.synchronized(monitor.wait(200L))
            }
          }
        } finally q.stop()
      } finally spark.streams.removeListener(listener)
      if (filesPerTrigger > 1) requireMultiBatch(ckpt, "runAppendReplay")
      finish(spark.read.parquet(out.toString))
        .localCheckpoint() // materialize before the tmp dir is deleted
    } finally deleteRecursively(tmp)
  }
}
