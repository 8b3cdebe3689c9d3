package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{SketchFunctions, TextFunctions}
import graft.streaming.{VersionedStreamDedup, VersionedStreamJoin}

/** A typed event row for the streaming paths: `ts_us` is the event
  * timestamp in epoch microseconds (the version — unique per
  * (user, type) in the driver data at every SF). */
final case class Ev(event_id: Long, user_id: Long, event_type: String,
                    ts_us: Long, value: Double)

/** Typed rows for the chained streaming join (s11): the reference's
  * 3-level A 1—N B 1—N C data model (GenJoinInput.scala:32-34) over
  * customer → orders → lineitem. `o_ver`/`l_ver` are Long versions;
  * `l_ver` = (shipdate epoch-days, price cents) packed so its strict
  * ordering equals the batch oracle's (l_shipdate DESC,
  * l_extendedprice DESC) dedup — the packed quadruple is verified
  * unique at sf0.01 and sf0.1, so streaming latest-wins is
  * arrival-order independent. */
final case class CustRow(c_custkey: Long, c_name: String)
final case class OrdRow(o_orderkey: Long, o_custkey: Long, o_ver: Long,
                        o_totalprice: Double)
/** One stage-1 (customer⋈orders) emission relayed to stage 2. Identity
  * for stage-2 upsert = `o_orderkey` (stable across the AB row's
  * lifetime); version = the stage-1 per-key emission `seq` (monotone
  * per customer, hence per order). */
final case class AbRel(seq: Long, c_custkey: Option[Long],
                       c_name: Option[String], o_orderkey: Long,
                       o_totalprice: Double)
final case class LiRow(l_orderkey: Long, l_linenumber: Int, l_ver: Long,
                       l_extendedprice: Double)

/** Slim streamed document row for incremental dedup (s19): content
  * fingerprint + id only — the text itself never enters streaming
  * state (at 100 TB the state holds fingerprints, not the corpus). */
final case class DocFp(doc_id: Long, fp: String)

/** One document's minhash signature (s21): the k=8 permutation minima.
  * Like [[DocFp]], this is all that enters streaming state — 9 longs
  * per document, not the text. */
final case class DocSig(doc_id: Long, h0: Long, h1: Long, h2: Long,
                        h3: Long, h4: Long, h5: Long, h6: Long, h7: Long)

/** One LSH band row (s24): band index, packed band value, doc id —
  * the unit of bucket membership in the streaming LSH state. */
final case class BandRow(bi: Int, bv: String, doc_id: Long)

/** One IVF cell assignment (s25): the unit of membership in the
  * streaming vector-index state — never the 64-dim vector itself. */
final case class AsgRow(vec_id: Long, cell: Long)
final case class PqCodeRow(vec_id: Long, s: Int, code: Long)

/** One packed sign-bit code row (s53): the 64-bit binary quantization
  * of a vector, split across two 32-bit words — the unit of the
  * streaming 1-bit index state (8 logical bytes per vector, the
  * smallest of the codec states). */
final case class SignCodeRow(vec_id: Long, lo: Long, hi: Long)

/** s45's slim event row (purchase stream under event-time TTL). */
final case class TtlEv(user_id: Long, event_id: Long, ts_us: Long)

/** One k-token-window fingerprint membership row (s36): gram md5,
  * doc id, and the window count of that gram within the doc — the
  * unit of exact-substring state; the text never enters state. */
final case class GramRow(g: String, doc_id: Long, cnt: Long)

/** One CDC chunk-hash membership row (s37): chunk md5, doc id, and
  * the chunk's multiplicity within the doc — the unit of streaming
  * storage-dedup state; the payload bytes never enter state. */
final case class ChunkRow(chunk_md5: String, doc_id: Long, cnt: Long)

/** One media-derived feature row (s50): the 48-dim pooled-pixel
  * vector per document — the unit of the streaming media index; the
  * payload bytes never enter state (at 100 TB the state holds 48
  * longs per asset, not the media lake). */
final case class MediaFeatRow(doc_id: Long, f: Seq[Long])

/** One k-token-window fingerprint POSITION row (s42): gram md5, doc
  * id, and the 1-based window-start positions of that gram within the
  * doc — [[GramRow]] widened just enough that the converged state can
  * reconstruct which spans to CUT (the trim transform needs where a
  * duplicated window sits, not only how often); the text itself still
  * never enters state. */
final case class GramPosRow(g: String, doc_id: Long, ps: Seq[Long])

/** One labeled embedding row (s63): vector + class label — the unit
  * of the streaming hard-negative-mining state (the one vector state
  * that must keep full precision AND the label, since mining scores
  * candidates exactly and filters on label mismatch). */
final case class EmbLabRow(vec_id: Long, label: Int, e: Seq[Double],
                           nrm: Double)

/** One decoded video-frame stat row (s57): per (doc, frame) the three
  * channel pixel sums — the unit of the streaming scene-cut state;
  * pixels decode and reduce inside the microbatch scan and never
  * enter state (at 100 TB the state holds 3 longs per frame, not the
  * frame bytes). */
final case class FrameStatRow(doc_id: Long, frame_idx: Long,
                              sum_r: Long, sum_g: Long, sum_b: Long)

/** Streaming operators, driven synchronously: the parquet tables are
  * range-split into chunked ingest directories and replayed through the
  * file source one file per trigger (so the engine sees multiple
  * microbatches, exercising state across triggers), and the final
  * answer is checked against the SAME batch DuckDB oracle as the batch
  * operators — the streaming engine must *converge* to the batch
  * result (the reference's own verification idea,
  * JoinSpec.scala:153-154, strengthened from count-equality to full
  * hash-equality). Nothing is driver-resident on any of these paths —
  * sources are file streams, sinks are foreachBatch parquet logs (no
  * `format("memory")` anywhere), and convergence runs as a batch plan
  * over the re-read log before only the small final answer is
  * materialized; MemoryStream-based deterministic replay lives in the
  * sbt harnesses (StreamJoinSpec) only.
  */
object StreamingOps {

  private val chunks = 8

  /** State-store parallelism for the replay runs. Each microbatch
    * writes one checkpoint delta file per state partition, and on a
    * local filesystem without native Hadoop libs every file costs an
    * exec'd `chmod` (measured: the dominant cost of these queries).
    * 8 partitions is ample for ~150 join keys; a real cluster against
    * object storage would size this to executor count instead. */
  private val streamShufflePartitions = "8"

  private def withStreamConf[T](spark: SparkSession)(body: => T): T = {
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
  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(root).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
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

  private val sharedIngestRoot = java.nio.file.Paths
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
    if (java.nio.file.Files.isDirectory(sharedIngestRoot)) {
      import scala.jdk.CollectionConverters._
      val ls = java.nio.file.Files.list(sharedIngestRoot)
      try ls.iterator().asScala
        .filter { d =>
          val n = d.getFileName.toString
          n.startsWith(prefix) && n != key && !n.contains(".tmp.")
        }.toSeq.foreach(deleteRecursively)
      finally ls.close()
    }
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
  private def sharedEventsChunks(spark: SparkSession,
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
  private def chainChunkDirs(spark: SparkSession, dir: String)
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
  private val evReplaySchema = "event_id BIGINT, user_id BIGINT, " +
    "event_type STRING, ts_us BIGINT, value DOUBLE"

  /** File-source streaming harness (the production shape — nothing is
    * EVER driver-resident, sink included): the events table is
    * range-split into `chunks` parquet files (a stand-in for a growing
    * ingest directory — at 100 TB this is the object-store prefix new
    * files land in), then readStream consumes one file per trigger
    * through `build`, and every microbatch's emissions land in a
    * parquet LOG via foreachBatch (append for update/append mode;
    * overwrite for complete mode, where each trigger carries the full
    * current answer). Raw update-mode emission volume (typically 5–10×
    * the converged answer) therefore lives only in executor-written
    * files, never in a driver-side memory sink. `finish` reduces the
    * re-read log to the small converged answer (e.g. the max-seq
    * filter), which is localCheckpointed so the temp log can be
    * deleted. Arrival order varies with file mtimes, but versions are
    * unique per (key, id) so converged state is order-independent. */
  private def runFileStream(spark: SparkSession, dir: String,
                            mode: String = "update")(
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
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "part-*")
          .parquet(in.toString).as[Ev]
        val logMode = if (mode == "complete") "overwrite" else "append"
        val q = build(() => src).writeStream
          .outputMode(mode)
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch { (df: DataFrame, _: Long) =>
            // Bound the log's file count: without this, every microbatch
            // appends one file PER SHUFFLE PARTITION (32 × trigger count
            // small files), and the converge-scan pays the open/footer
            // tax per file. repartition — not coalesce — so the stateful
            // stage keeps its full parallelism and only the (small)
            // emission set funnels through the single write task; a
            // production deployment sizes this to emission volume
            // (one file per few hundred MB) rather than 1.
            df.repartition(1).write.mode(logMode).parquet(log.toString)
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
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
  private def convergedJ1(raw: DataFrame): DataFrame = {
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

  /** s37's scan-local stage: content-defined-chunk each document and
    * count per-doc chunk-hash multiplicities in ONE pass over the
    * SORTED hash array — run starts are the positions where the value
    * changes, run length = distance to the next start (O(n log n) per
    * document vs the O(distinct·n) filter-per-distinct-hash form it
    * replaces). `sorted` and `starts` are materialized columns (each
    * referenced more than once) so Catalyst keeps the staging
    * projections — the RegistrySpec rolling-hash plan guard pins this
    * batch-side. Emits slim (chunk_md5, doc_id, cnt) rows. */
  private[graft] def cdcChunkCountRows(docs: DataFrame): DataFrame =
    graft.multimodal.MultimodalPipeline
      .cdcChunkMd5s(docs, col("text"), window = 16, divisor = 32)
      .withColumn("sorted", array_sort(col("chs")))
      .withColumn("starts",
        filter(sequence(lit(1), size(col("sorted"))), i =>
          (i === 1) ||
            element_at(col("sorted"), i) =!=
              element_at(col("sorted"), i - 1)))
      .select(col("doc_id"), explode(zip_with(
        col("starts"),
        concat(slice(col("starts"), lit(2), size(col("starts"))),
          array(size(col("sorted")) + 1)),
        (s, nxt) => struct(
          element_at(col("sorted"), s).as("h"),
          (nxt - s).cast("long").as("cnt")))).as("hc"))
      .select(col("hc.h").as("chunk_md5"), col("doc_id"),
        col("hc.cnt").as("cnt"))

  private def isX(e: Ev): Boolean =
    (e.event_type == "signup" || e.event_type == "error") && e.user_id % 3 != 0
  private def isY(e: Ev): Boolean =
    (e.event_type == "click" || e.event_type == "purchase" ||
      e.event_type == "view") && e.user_id % 5 != 0

  def entries: Seq[Entry] = Seq(

    // File-source streaming J1: the production shape (see
    // runFileStream); must hash-match the batch J1 oracle.
    Entry("s4_stream_file_join",
      (spark, dir) => { import spark.implicits._
      runFileStream(spark, dir) { src =>
        VersionedStreamJoin.fullOuter[Ev, Ev](
          src().filter(isX _), src().filter(isY _),
          x => x.user_id.toString, y => y.user_id.toString,
          x => x.event_type, y => y.event_type,
          x => x.ts_us, y => y.ts_us).toDF()
      }(convergedJ1) },
      Some(ReferenceJoins.j1OracleSql)),

    // File-source streaming J2 (leftOuter, the per-KEY X dedup quirk):
    // converged result must hash-match the batch j2_left_outer oracle.
    // Determinism note: the per-key latest X is unique — no two
    // latest-per-(user,type) X events share a ts for the same user at
    // any SF (verified), so latest-wins needs no tiebreak here.
    Entry("s5_stream_left_outer",
      (spark, dir) => { import spark.implicits._
      runFileStream(spark, dir) { src =>
        VersionedStreamJoin.leftOuter[Ev, Ev](
          src().filter(isX _), src().filter(isY _),
          x => x.user_id.toString, y => y.user_id.toString,
          x => x.event_type, y => y.event_type,
          x => x.ts_us, y => y.ts_us).toDF()
      }(convergedJ1) },
      Some(ReferenceJoins.j2OracleSql)),

    // File-source streaming J3 (leftOuterSeq, nested Y side): converged
    // rows project the ys array to the same sorted comma-joined string
    // as the batch j3_left_outer_seq entry, so both hash-match the one
    // oracle.
    Entry("s6_stream_left_outer_seq",
      (spark, dir) => {
        import spark.implicits._
        runFileStream(spark, dir) { src =>
          VersionedStreamJoin.leftOuterSeq[Ev, Ev](
            src().filter(isX _), src().filter(isY _),
            x => x.user_id.toString, y => y.user_id.toString,
            x => x.event_type, y => y.event_type,
            x => x.ts_us, y => y.ts_us).toDF()
        } { raw =>
          val wMax = Window.partitionBy(col("key"))
          raw
            .withColumn("max_seq", max(col("seq")).over(wMax))
            .filter(col("seq") === col("max_seq"))
            .select(
              col("key").cast("long").as("user_id"),
              element_at(col("xs"), 1).getField("event_id").as("x_event_id"),
              element_at(col("xs"), 1).getField("event_type").as("x_type"),
              expr("timestamp_micros(element_at(xs, 1).ts_us)").as("x_ts"),
              concat_ws(",", sort_array(expr("transform(ys, y -> y.event_id)"))
                .cast("array<string>")).as("y_event_ids"),
              size(col("ys")).cast("long").as("y_n"))
            .orderBy(col("user_id"))
        }
      },
      Some(ReferenceJoins.j3OracleSql)),

    // File-source streaming J4 (fullOuterSeq, the per-key cogroup):
    // every key's converged row projects both sides' latest versions to
    // the same sorted comma-joined id strings as the batch
    // j4_full_outer_seq entry — completing the J1–J4 streaming matrix
    // against the batch oracles.
    Entry("s7_stream_full_outer_seq",
      (spark, dir) => {
        import spark.implicits._
        runFileStream(spark, dir) { src =>
          VersionedStreamJoin.fullOuterSeq[Ev, Ev](
            src().filter(isX _), src().filter(isY _),
            x => x.user_id.toString, y => y.user_id.toString,
            x => x.event_type, y => y.event_type,
            x => x.ts_us, y => y.ts_us).toDF()
        } { raw =>
          val wMax = Window.partitionBy(col("key"))
          raw
            .withColumn("max_seq", max(col("seq")).over(wMax))
            .filter(col("seq") === col("max_seq"))
            .select(
              col("key").cast("long").as("user_id"),
              concat_ws(",", sort_array(expr("transform(xs, v -> v.event_id)"))
                .cast("array<string>")).as("x_event_ids"),
              concat_ws(",", sort_array(expr("transform(ys, v -> v.event_id)"))
                .cast("array<string>")).as("y_event_ids"))
            .orderBy(col("user_id"))
        }
      },
      Some(ReferenceJoins.j4OracleSql)),

    // Standalone streaming latest-wins dedup (reference D2 as its own
    // operator, not a join side): the whole events stream keyed by
    // user with event_type as the upsert id must converge to the batch
    // d2_latest_by_key_id answer. Deterministic: (user, type, ts) is
    // unique at every SF, so strict latest-wins needs no tiebreak.
    Entry("s8_stream_dedup",
      (spark, dir) => {
        import spark.implicits._
        runFileStream(spark, dir) { src =>
          VersionedStreamDedup.latestPerKeyId[Ev](src(),
            e => e.user_id.toString, e => e.event_type, e => e.ts_us).toDF()
        } { raw =>
          val wMax = Window.partitionBy(col("key"))
          raw
            .withColumn("max_seq", max(col("seq")).over(wMax))
            .filter(col("seq") === col("max_seq"))
            .select(explode(col("xs")).as("x"))
            .select(col("x.user_id").as("user_id"),
              col("x.event_id").as("event_id"),
              col("x.event_type").as("event_type"),
              expr("timestamp_micros(x.ts_us)").as("ts"),
              col("x.value").as("value"))
            .orderBy(col("user_id"), col("event_type"))
        }
      },
      Some(ReferenceJoins.d2OracleSql)),

    // File-source streaming J5 (inner): emits only keys populated on
    // both sides; converged result must hash-match the batch j5_inner
    // oracle — completing driver-verified batch+streaming coverage of
    // every reference cogroup variant (C1–C5,
    // cogroupFunctions.scala:7-87).
    Entry("s10_stream_inner",
      (spark, dir) => { import spark.implicits._
      runFileStream(spark, dir) { src =>
        VersionedStreamJoin.inner[Ev, Ev](
          src().filter(isX _), src().filter(isY _),
          x => x.user_id.toString, y => y.user_id.toString,
          x => x.event_type, y => y.event_type,
          x => x.ts_us, y => y.ts_us).toDF()
      }(convergedJ1) },
      Some(ReferenceJoins.j5OracleSql)),

    // The s4 shape run on the ROCKSDB state store provider — the
    // off-heap, disk-spilling backend that holds at 100 TB state (the
    // default in-memory HDFS-backed provider caps at executor heap).
    // Same J1 oracle: proves the state-backend swap is semantics-
    // preserving end-to-end (upserts, per-key maps, seq counters all
    // round-trip RocksDB serialization), not just sbt-asserted.
    Entry("s14_stream_rocksdb",
      (spark, dir) => { import spark.implicits._
      VersionedStreamJoin.withStateStoreProvider(spark) {
        runFileStream(spark, dir) { src =>
          VersionedStreamJoin.fullOuter[Ev, Ev](
            src().filter(isX _), src().filter(isY _),
            x => x.user_id.toString, y => y.user_id.toString,
            x => x.event_type, y => y.event_type,
            x => x.ts_us, y => y.ts_us).toDF()
        }(convergedJ1)
      } },
      Some(ReferenceJoins.j1OracleSql)),

    // SKEW-SALTED streaming state: the streaming joins' contract says
    // "skewed keys are the caller's concern" — this row demonstrates
    // the fix composed from the existing operators (SkewTools'
    // salt-and-replicate contract in streaming form). The X side salts
    // its key deterministically by id hash (each x lands in exactly one
    // of `salts` sub-keys, so a hot key's X state and emission fan-out
    // spread over `salts` state partitions); the Y side replicates
    // each record to every sub-key. For the INNER join each (x, y)
    // pair then surfaces in exactly one sub-key — no cross-salt dedup
    // needed — and the converged union over sub-keys must hash-match
    // the same unsalted batch j5 oracle. (Outer variants additionally
    // need a cross-salt pass to suppress replicated unmatched-Y rows —
    // the standard extra cost of salting an outer join.)
    Entry("s16_stream_salted_inner",
      (spark, dir) => { import spark.implicits._
        val salts = 4
        runFileStream(spark, dir) { src =>
          val ys = src().filter(isY _)
            .flatMap(y => (0 until salts).map(s => (s, y)))
          VersionedStreamJoin.inner[Ev, (Int, Ev)](
            src().filter(isX _), ys,
            x => x.user_id.toString + "#" +
              math.floorMod(x.event_type.hashCode, salts),
            y => y._2.user_id.toString + "#" + y._1,
            x => x.event_type, y => y._2.event_type,
            x => x.ts_us, y => y._2.ts_us).toDF()
        } { raw =>
          val wMax = Window.partitionBy(col("key"))
          raw
            .withColumn("max_seq", max(col("seq")).over(wMax))
            .filter(col("seq") === col("max_seq"))
            .select(
              col("x.user_id").as("user_id"),
              col("x.event_id").as("x_event_id"),
              col("x.event_type").as("x_type"),
              expr("timestamp_micros(x.ts_us)").as("x_ts"),
              col("y._2.event_id").as("y_event_id"),
              col("y._2.event_type").as("y_type"),
              expr("timestamp_micros(y._2.ts_us)").as("y_ts"))
            .orderBy(col("user_id"), asc_nulls_first("x_type"),
              asc_nulls_first("y_type"))
        }
      },
      Some(ReferenceJoins.j5OracleSql)),

    // The s4 shape under EVENT-TIME TTL — the watermark-aligned state
    // retirement mode (the 100 TB state-bounding story: keys idle
    // while the watermark advances past their TTL are dropped). The
    // version axis here is epoch MICROSECONDS read as the TTL clock's
    // milliseconds, which stretches the corpus's 29-day span ~80
    // years along that axis — so the watermark delay is sized in the
    // same stretched units (a production deployment with real
    // epoch-millis versions would use its real out-of-orderness
    // bound), and the TTL is set beyond the replay horizon: proving
    // the watermarked-union + EventTimeTimeout machinery end-to-end
    // against the unchanged J1 oracle, with retirement semantics
    // themselves sbt-asserted in StreamJoinSpec where arrival order
    // is controllable.
    Entry("s17_stream_ttl_join",
      (spark, dir) => { import spark.implicits._
      VersionedStreamJoin.withEventTimeTtl(ms = 1000L * 365 * 86400 * 1000,
          watermarkDelay = "36500 days") {
        runFileStream(spark, dir) { src =>
          VersionedStreamJoin.fullOuter[Ev, Ev](
            src().filter(isX _), src().filter(isY _),
            x => x.user_id.toString, y => y.user_id.toString,
            x => x.event_type, y => y.event_type,
            x => x.ts_us, y => y.ts_us).toDF()
        }(convergedJ1)
      } },
      Some(ReferenceJoins.j1OracleSql)),

    // INCREMENTAL EXACT-DEDUP over a GROWING documents corpus — the
    // LLM-pipeline operator family (dedup_exact) in streaming form,
    // tying the two halves of the engine together: each parquet drop
    // landing in the ingest prefix upserts into fingerprint-keyed
    // state (VersionedStreamDedup, the reference's D2 as a standalone
    // op), and the compacted view converges to the same batch DuckDB
    // oracle. Only (fp, doc_id) enters streaming state — the text
    // stays in the scan, so state is O(corpus distinct-content), not
    // O(corpus bytes). A production pipeline reads the keep-set off
    // the converged state to admit only first-seen content.
    Entry("s19_stream_doc_dedup",
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_docs_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "docfp", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), md5(col("text")).as("fp"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream.schema("doc_id BIGINT, fp STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString).as[DocFp]
            val dd = VersionedStreamDedup.latestPerKeyId[DocFp](
              src, _.fp, _.doc_id.toString, _.doc_id)
            val q = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("key"))
            raw
              .withColumn("max_seq", max(col("seq")).over(wMax))
              .filter(col("seq") === col("max_seq"))
              .select(col("key").as("fp"), explode(col("xs")).as("x"))
              .groupBy(col("fp"))
              .agg(count(lit(1)).as("n_docs"),
                min(col("x.doc_id")).as("keep_doc_id"))
              .orderBy(col("fp"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(DedupOps.exactDedupOracleSql)),

    // INCREMENTAL NEAR-DUP SIGNATURES over a growing corpus — the
    // minhash half of the streaming dedup story (s19 streams the exact
    // half). A document arrives whole, so its k=8 signature is
    // computed SCAN-LOCALLY in the microbatch (tokens → distinct
    // 3-shingles → shingle hashes → per-permutation minima; no
    // explode + groupBy, which on a stream would be a stateful
    // aggregation), then upserted into signature-keyed state via
    // VersionedStreamDedup — a re-crawled doc (newer version) replaces
    // its signature in place. Only (doc_id, 8 minima) enters state;
    // the converged view must equal the batch dedup_minhash_sig
    // answer, so the LSH banding/bucket join downstream can run
    // incrementally off this state at 100 TB.
    Entry("s21_stream_minhash_sig",
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_sig_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "doctext", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("text"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream.schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            // each projection materializes the previous stage's array
            // so the next HOF reads an attribute (shingles3FromTokens
            // perf note), never a re-evaluated expression
            val sigs = src
              .select(col("doc_id"),
                TextFunctions.tokens(col("text")).as("toks"))
              .select(col("doc_id"), array_distinct(
                TextFunctions.shingles3FromTokens(col("toks"))).as("shs"))
              .select(col("doc_id"), transform(col("shs"),
                s => TextFunctions.tokenHash(s)).as("ths"))
              .select(col("doc_id") +:
                SketchFunctions.rowSignature(col("ths")): _*)
              .as[DocSig]
            val dd = VersionedStreamDedup.latestPerKeyId[DocSig](
              sigs, _.doc_id.toString, _.doc_id.toString, _ => 0L)
            val q = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("key"))
            raw
              .withColumn("max_seq", max(col("seq")).over(wMax))
              .filter(col("seq") === col("max_seq"))
              .select(explode(col("xs")).as("x"))
              .select(col("x.doc_id").as("doc_id") +:
                (0 to 7).map(i => col(s"x.h$i").as(s"h$i")): _*)
              .orderBy(col("doc_id"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(DedupOps.minhashSigOracleSql)),

    // INCREMENTAL LSH CANDIDATE PAIRS — the banding half on top of
    // s21's signatures, completing the streaming near-dup pipeline:
    // each arriving document's signature is banded scan-locally and
    // upserted into BUCKET-keyed state ((band index, band value) →
    // member doc ids via VersionedStreamDedup), so a new document
    // joins exactly the buckets its bands hash to — candidate
    // generation stays an equi-join on buckets, never all-pairs, and
    // the converged buckets reproduce the batch dedup_minhash_pairs
    // answer (shared-band pair counts). At 100 TB the pair projection
    // runs per-bucket off this state; only (bucket, doc_id) rows are
    // ever stateful.
    Entry("s24_stream_lsh_pairs",
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_lsh_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "doctext", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("text"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream.schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val bandStructs = (0 until SketchFunctions.numBands).map { j =>
              struct(lit(j).as("bi"),
                concat_ws("_", col(s"h${2 * j}"), col(s"h${2 * j + 1}"))
                  .as("bv"))
            }
            val bandRows = src
              .select(col("doc_id"),
                TextFunctions.tokens(col("text")).as("toks"))
              .select(col("doc_id"), array_distinct(
                TextFunctions.shingles3FromTokens(col("toks"))).as("shs"))
              .select(col("doc_id"), transform(col("shs"),
                s => TextFunctions.tokenHash(s)).as("ths"))
              .select(col("doc_id") +:
                SketchFunctions.rowSignature(col("ths")): _*)
              .select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
              .select(col("b.bi").as("bi"), col("b.bv").as("bv"),
                col("doc_id"))
              .as[BandRow]
            val dd = VersionedStreamDedup.latestPerKeyId[BandRow](
              bandRows, r => r.bi + "|" + r.bv, _.doc_id.toString, _ => 0L)
            val q = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("key"))
            val members = raw
              .withColumn("max_seq", max(col("seq")).over(wMax))
              .filter(col("seq") === col("max_seq"))
              .select(col("key"), explode(col("xs")).as("x"))
              .select(col("key"), col("x.doc_id").as("doc_id"))
            members.as("a")
              .join(members.as("b"), col("a.key") === col("b.key") &&
                col("a.doc_id") < col("b.doc_id"))
              .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
              .agg(count(lit(1)).as("n_bands"))
              .orderBy(col("d1"), col("d2"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(DedupOps.minhashPairsOracleSql)),

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
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.crossJoin(broadcast(cent))
                  .select(col("vec_id"),
                    round(graft.functions.VectorFunctions.dot(
                      col("e"), col("ce")) / (col("nrm") * col("cn")), 6)
                      .as("csim"),
                    col("cid"))
                  .groupBy(col("vec_id"))
                  .agg(max_by(col("cid"), struct(col("csim"), -col("cid")))
                    .as("cell"))
                  .write.mode("append").parquet(relay.toString)
                ()
              }.start()
            java.nio.file.Files.createDirectories(relay)
            val asgs = spark.readStream.schema("vec_id BIGINT, cell BIGINT")
              .option("maxFilesPerTrigger", streamShufflePartitions.toString)
              .option("pathGlobFilter", "part-*")
              .parquet(relay.toString).as[AsgRow]
            val dd = VersionedStreamDedup.latestPerKeyId[AsgRow](
              asgs, _.cell.toString, _.vec_id.toString, _ => 0L)
            val q2 = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt2.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("append").parquet(log.toString)
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

    // THE PRODUCTION DEPLOYMENT SHAPE: all three 100 TB configs at
    // once — RocksDB state store (state >> heap), event-time TTL
    // (state bounded to watermark-active keys; sized beyond this
    // replay's horizon as in s17), and skew-salted keys — on the FULL
    // OUTER join, against the unchanged batch J1 oracle. Salting an
    // OUTER join needs the cross-salt pass s16's inner variant could
    // skip: a replicated Y emits (None, y) from every salt whose
    // sub-key holds no X, but the row is real only if NO salt holds an
    // X for the base key (each X lives in exactly one sub-key), and
    // the survivors are `salts`-fold replicas needing one dedup.
    // (x, y) and (x, None) rows are already exact: each X is in one
    // sub-key, and Y replicas reach it all.
    Entry("s18_stream_production_join",
      (spark, dir) => { import spark.implicits._
        val salts = 4
        VersionedStreamJoin.withStateStoreProvider(spark) {
          VersionedStreamJoin.withEventTimeTtl(
              ms = 1000L * 365 * 86400 * 1000,
              watermarkDelay = "36500 days") {
            runFileStream(spark, dir) { src =>
              val ys = src().filter(isY _)
                .flatMap(y => (0 until salts).map(s => (s, y)))
              VersionedStreamJoin.fullOuter[Ev, (Int, Ev)](
                src().filter(isX _), ys,
                x => x.user_id.toString + "#" +
                  math.floorMod(x.event_type.hashCode, salts),
                y => y._2.user_id.toString + "#" + y._1,
                x => x.event_type, y => y._2.event_type,
                x => x.ts_us, y => y._2.ts_us).toDF()
            } { raw =>
              val wMax = Window.partitionBy(col("key"))
              val wBase = Window.partitionBy(col("base_key"))
              raw
                .withColumn("max_seq", max(col("seq")).over(wMax))
                .filter(col("seq") === col("max_seq"))
                .withColumn("base_key", substring_index(col("key"), "#", 1))
                // cross-salt suppression: (None, y) survives only when
                // no salt of the base key holds any X
                .withColumn("has_x",
                  max(when(col("x").isNotNull, 1).otherwise(0)).over(wBase))
                .filter(col("x").isNotNull || col("has_x") === 0)
                .select(
                  col("base_key").cast("long").as("user_id"),
                  col("x.event_id").as("x_event_id"),
                  col("x.event_type").as("x_type"),
                  expr("timestamp_micros(x.ts_us)").as("x_ts"),
                  col("y._2.event_id").as("y_event_id"),
                  col("y._2.event_type").as("y_type"),
                  expr("timestamp_micros(y._2.ts_us)").as("y_ts"))
                // collapse the `salts`-fold (None, y) replicas; exact
                // for the rest too — no duplicate rows exist in the J1
                // answer (every row carries its event ids)
                .distinct()
                .orderBy(col("user_id"), asc_nulls_first("x_type"),
                  asc_nulls_first("y_type"))
            }
          }
        }
      },
      Some(ReferenceJoins.j1OracleSql)),

    // The s4 shape on Spark 4's transformWithState (TwsVersionedJoin):
    // typed MapState per (key, id) — an upsert rewrites one RocksDB
    // entry, not the key's whole compacted blob — and TTL as an
    // explicit per-key timer anchored at the key's own event-time
    // frontier (the zero-watermark first-batch hazard is impossible by
    // construction). TTL sized beyond the replay horizon exactly as
    // s17; RocksDB provider is REQUIRED by the API. Same J1 oracle:
    // the two state-API generations must agree bit-for-bit.
    Entry("s20_stream_tws_join",
      (spark, dir) => { import spark.implicits._
        VersionedStreamJoin.withStateStoreProvider(spark) {
          runFileStream(spark, dir) { src =>
            graft.streaming.TwsVersionedJoin.fullOuter[Ev, Ev](
              src().filter(isX _), src().filter(isY _),
              x => x.user_id.toString, y => y.user_id.toString,
              x => x.event_type, y => y.event_type,
              x => x.ts_us, y => y.ts_us,
              ttlMs = Some(1000L * 365 * 86400 * 1000),
              watermarkDelay = "36500 days").toDF()
          }(convergedJ1)
        }
      },
      Some(ReferenceJoins.j1OracleSql)),

    // The J2 per-KEY X dedup quirk (the subtlest semantic in the
    // reference, cogroupFunctions.scala:31-47) on the
    // transformWithState path — so BOTH state-API generations prove
    // the quirk, not just flatMapGroupsWithState (s5). Same RocksDB +
    // beyond-horizon TTL config as s20; converges to the one batch J2
    // oracle.
    Entry("s23_stream_tws_left_outer",
      (spark, dir) => { import spark.implicits._
        VersionedStreamJoin.withStateStoreProvider(spark) {
          runFileStream(spark, dir) { src =>
            graft.streaming.TwsVersionedJoin.leftOuter[Ev, Ev](
              src().filter(isX _), src().filter(isY _),
              x => x.user_id.toString, y => y.user_id.toString,
              x => x.event_type, y => y.event_type,
              x => x.ts_us, y => y.ts_us,
              ttlMs = Some(1000L * 365 * 86400 * 1000),
              watermarkDelay = "36500 days").toDF()
          }(convergedJ1)
        }
      },
      Some(ReferenceJoins.j2OracleSql)),

    // J3 (leftOuterSeq) on the transformWithState path — with s20/s23
    // this completes the J1–J4 matrix on BOTH state-API generations as
    // driver rows, not just sbt specs (TwsJoinSpec). Same per-id
    // MapState + typed-timer TTL rationale as s20; the converged
    // projection is s6's verbatim, and both must hash-match the one
    // batch J3 oracle.
    Entry("s34_stream_tws_left_outer_seq",
      (spark, dir) => { import spark.implicits._
        VersionedStreamJoin.withStateStoreProvider(spark) {
          runFileStream(spark, dir) { src =>
            graft.streaming.TwsVersionedJoin.leftOuterSeq[Ev, Ev](
              src().filter(isX _), src().filter(isY _),
              x => x.user_id.toString, y => y.user_id.toString,
              x => x.event_type, y => y.event_type,
              x => x.ts_us, y => y.ts_us,
              ttlMs = Some(1000L * 365 * 86400 * 1000),
              watermarkDelay = "36500 days").toDF()
          } { raw =>
            val wMax = Window.partitionBy(col("key"))
            raw
              .withColumn("max_seq", max(col("seq")).over(wMax))
              .filter(col("seq") === col("max_seq"))
              .select(
                col("key").cast("long").as("user_id"),
                element_at(col("xs"), 1).getField("event_id").as("x_event_id"),
                element_at(col("xs"), 1).getField("event_type").as("x_type"),
                expr("timestamp_micros(element_at(xs, 1).ts_us)").as("x_ts"),
                concat_ws(",", sort_array(expr("transform(ys, y -> y.event_id)"))
                  .cast("array<string>")).as("y_event_ids"),
                size(col("ys")).cast("long").as("y_n"))
              .orderBy(col("user_id"))
          }
        }
      },
      Some(ReferenceJoins.j3OracleSql)),

    // J4 (fullOuterSeq, the per-key cogroup) on transformWithState —
    // the last cell of the 2-API × 4-variant join matrix. Converged
    // projection is s7's verbatim against the batch J4 oracle.
    Entry("s35_stream_tws_full_outer_seq",
      (spark, dir) => { import spark.implicits._
        VersionedStreamJoin.withStateStoreProvider(spark) {
          runFileStream(spark, dir) { src =>
            graft.streaming.TwsVersionedJoin.fullOuterSeq[Ev, Ev](
              src().filter(isX _), src().filter(isY _),
              x => x.user_id.toString, y => y.user_id.toString,
              x => x.event_type, y => y.event_type,
              x => x.ts_us, y => y.ts_us,
              ttlMs = Some(1000L * 365 * 86400 * 1000),
              watermarkDelay = "36500 days").toDF()
          } { raw =>
            val wMax = Window.partitionBy(col("key"))
            raw
              .withColumn("max_seq", max(col("seq")).over(wMax))
              .filter(col("seq") === col("max_seq"))
              .select(
                col("key").cast("long").as("user_id"),
                concat_ws(",", sort_array(expr("transform(xs, v -> v.event_id)"))
                  .cast("array<string>")).as("x_event_ids"),
                concat_ws(",", sort_array(expr("transform(ys, v -> v.event_id)"))
                  .cast("array<string>")).as("y_event_ids"))
              .orderBy(col("user_id"))
          }
        }
      },
      Some(ReferenceJoins.j4OracleSql)),

    // C5/J5 (inner, the reference's defined-but-never-wired cogroup
    // body promoted first-class) on transformWithState — completing
    // the J1–J5 matrix on BOTH state-API generations as driver rows
    // (s10 proved it on flatMapGroupsWithState). Same RocksDB +
    // beyond-horizon TTL config as s20; converges to the one batch J5
    // oracle through s10's verbatim projection.
    Entry("s49_stream_tws_inner",
      (spark, dir) => { import spark.implicits._
        VersionedStreamJoin.withStateStoreProvider(spark) {
          runFileStream(spark, dir) { src =>
            graft.streaming.TwsVersionedJoin.inner[Ev, Ev](
              src().filter(isX _), src().filter(isY _),
              x => x.user_id.toString, y => y.user_id.toString,
              x => x.event_type, y => y.event_type,
              x => x.ts_us, y => y.ts_us,
              ttlMs = Some(1000L * 365 * 86400 * 1000),
              watermarkDelay = "36500 days").toDF()
          }(convergedJ1)
        }
      },
      Some(ReferenceJoins.j5OracleSql)),

    // STREAMING AS-OF JOIN — q_asof_join's streaming twin, and the
    // versioned-join thesis at its most production-shaped: every
    // signup/error event is enriched with the click/purchase/view IN
    // EFFECT at its own event time (latest y at-or-before x.ts), i.e.
    // leakage-free point-in-time feature attachment over a live
    // stream. Per trigger each touched user re-emits its xs with
    // their in-effect y resolved by binary search over the key's
    // sorted y timeline, so late or out-of-order arrivals on EITHER
    // side retroactively correct exactly the rows they should —
    // the converged view (max seq per key) is arrival-order-free and
    // hash-matches the batch oracle (DuckDB's native ASOF JOIN, a
    // genuinely independent implementation of the semantics). State
    // is latest-per-event_id on both sides, never the stream; the
    // replay's file chunking guarantees xs and ys interleave across
    // microbatches, so the retroactive-correction path actually runs.
    Entry("s48_stream_asof_join",
      (spark, dir) => { import spark.implicits._
        runFileStream(spark, dir) { src =>
          VersionedStreamJoin.asOf[Ev, Ev](
            src().filter((e: Ev) =>
              e.event_type == "signup" || e.event_type == "error"),
            src().filter((e: Ev) => e.event_type == "click" ||
              e.event_type == "purchase" || e.event_type == "view"),
            x => x.user_id.toString, y => y.user_id.toString,
            x => x.event_id.toString, y => y.event_id.toString,
            x => x.ts_us, y => y.ts_us).toDF()
        } { raw =>
          val wMax = Window.partitionBy(col("key"))
          raw.withColumn("max_seq", max(col("seq")).over(wMax))
            .filter(col("seq") === col("max_seq"))
            .select(
              col("key").cast("long").as("user_id"),
              col("x.event_id").as("x_event_id"),
              col("x.event_type").as("x_type"),
              expr("timestamp_micros(x.ts_us)").as("x_ts"),
              col("y.event_id").as("y_event_id"),
              col("y.event_type").as("y_type"),
              expr("timestamp_micros(y.ts_us)").as("y_ts"),
              col("y.value").as("y_value"))
            .orderBy(col("user_id"), col("x_ts"), col("x_event_id"))
        }
      },
      Some(Analytics.asofOracleSql)),

    // STREAMING FORWARD AS-OF — q_asof_forward's streaming twin,
    // completing the as-of matrix (backward × forward, batch ×
    // streaming). Each signup/error resolves to the user's EARLIEST
    // click/purchase/view at-or-after its own event time
    // (next-action attribution: time-to-convert labels, post-signup
    // windows). Forward resolution is inherently retroactive in a
    // stream — a late-arriving y with a smaller qualifying ts must
    // CORRECT already-emitted xs — which is exactly what the
    // per-trigger re-emit + converged (max seq per key) projection
    // already provides; no watermark-delayed hold needed. Oracle is
    // DuckDB's native ASOF with the flipped inequality.
    Entry("s51_stream_asof_forward",
      (spark, dir) => { import spark.implicits._
        runFileStream(spark, dir) { src =>
          VersionedStreamJoin.asOfForward[Ev, Ev](
            src().filter((e: Ev) =>
              e.event_type == "signup" || e.event_type == "error"),
            src().filter((e: Ev) => e.event_type == "click" ||
              e.event_type == "purchase" || e.event_type == "view"),
            x => x.user_id.toString, y => y.user_id.toString,
            x => x.event_id.toString, y => y.event_id.toString,
            x => x.ts_us, y => y.ts_us).toDF()
        } { raw =>
          val wMax = Window.partitionBy(col("key"))
          raw.withColumn("max_seq", max(col("seq")).over(wMax))
            .filter(col("seq") === col("max_seq"))
            .select(
              col("key").cast("long").as("user_id"),
              col("x.event_id").as("x_event_id"),
              col("x.event_type").as("x_type"),
              expr("timestamp_micros(x.ts_us)").as("x_ts"),
              col("y.event_id").as("y_event_id"),
              col("y.event_type").as("y_type"),
              expr("timestamp_micros(y.ts_us)").as("y_ts"),
              col("y.value").as("y_value"))
            .orderBy(col("user_id"), col("x_ts"), col("x_event_id"))
        }
      },
      Some(Analytics.asofForwardOracleSql)),

    // Spark's NATIVE watermarked stream-stream join (the built-in
    // operator family, distinct from the custom versioned-join core):
    // the same bounded range join as q_range_join, run append-mode with
    // both sides streaming. The join condition carries only the key and
    // the event-time range (a non-time inequality in a stream-stream
    // join condition makes StreamingJoinHelper log a caught
    // INTERNAL_ERROR per microbatch while probing it for a state
    // watermark), so each unordered pair is emitted exactly twice —
    // once per orientation — plus once per self-pair; the final BATCH
    // projection over the sink applies e1 < e2, keeping each pair
    // exactly once. Watermark delay is set beyond the replay's total
    // disorder so no buffered row is evicted early — exactness over
    // state size, the right trade for a finite replay; a production
    // deployment sizes it to the stream's real out-of-orderness bound
    // and accepts the documented late-drop.
    Entry("s9_stream_range_join",
      (spark, dir) => {
        runFileStream(spark, dir, mode = "append") { src =>
          val a = src().toDF()
            .select(col("user_id"), col("event_id"), col("ts_us"))
            .withColumn("ats", expr("timestamp_micros(ts_us)"))
            .withWatermark("ats", "400 days")
          val b = src().toDF()
            .select(col("user_id").as("uid2"), col("event_id").as("e2"),
              col("ts_us").as("tus2"))
            .withColumn("bts", expr("timestamp_micros(tus2)"))
            .withWatermark("bts", "400 days")
          a.join(b, expr("user_id = uid2 AND " +
              "bts BETWEEN ats - INTERVAL 30 MINUTES " +
              "AND ats + INTERVAL 30 MINUTES"))
            // NO post-join e1 < e2 filter on the streaming side: the
            // optimizer pushes such a filter INTO the inner-join
            // condition (PushDownPredicates), and StreamingJoinHelper
            // then logs a caught INTERNAL_ERROR per microbatch while
            // probing the non-time predicate for a state watermark.
            // Both orientations + self-pairs are emitted; the batch
            // projection below keeps each unordered pair exactly once.
            .select(col("user_id"), col("event_id").as("e1"), col("e2"),
              (col("tus2") - col("ts_us")).as("dt_us"))
        } { raw =>
          raw.filter(col("e1") < col("e2"))
            .orderBy(col("user_id"), col("e1"), col("e2"))
        }
      },
      Some(Analytics.rangeJoinOracleSql)),

    // CHAINED streaming joins: the reference's full 3-level data model
    // A 1—N B 1—N C (GenJoinInput.scala:32-34) with the second
    // versioned join running over the FIRST's streaming output —
    // driver-verified against the batch j6_chain_abc oracle. Chaining
    // update-mode joins without retractions needs the decomposition
    // proven in StreamJoinSpec ("two chained streaming joins converge"):
    //   - stage 2 consumes only the b-carrying AB rows, keyed and
    //     identified by o_orderkey (STABLE across an AB row's lifetime)
    //     with the stage-1 per-key seq as a monotone version, so
    //     superseded stage-1 emissions upsert cleanly downstream;
    //   - the a-only arm (customers with no orders), whose identity
    //     would MOVE when an order arrived, is taken from stage 1's own
    //     converged (max-seq) view instead.
    // Production shape throughout: both stages are file-source streams,
    // the inter-stage relay is a parquet directory appended per
    // microbatch by foreachBatch (an object-store prefix at scale), and
    // stage 2's sink is another parquet log — nothing is ever collected
    // to the driver. State is hash-partitioned by key per stage
    // (c_custkey, then o_orderkey — Catalyst plans one exchange per
    // stage, the same two-exchange shape as batch j6).
    Entry("s11_stream_chain_abc",
      (spark, dir) => withStreamConf(spark) {
        import spark.implicits._
        val tmp = java.nio.file.Files.createTempDirectory("graft_chain_")
        val abLog = tmp.resolve("ablog")
        val bcLog = tmp.resolve("bclog")
        try {
          // range-split chunked ingest dirs, shared with s22 (read-only)
          val (custDir, ordDir, liDir) = chainChunkDirs(spark, dir)

          def src(d: java.nio.file.Path, schema: String,
                  filesPerTrigger: Int = 1): DataFrame =
            spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", filesPerTrigger.toString)
              .option("pathGlobFilter", "part-*")
              .parquet(d.toString)

          // stage 1: customer ⋈ orders keyed by custkey; every
          // microbatch's emissions land in the relay log PARTITIONED
          // (one file per shuffle partition per batch — no single-task
          // coalesce funnel; at scale this is the ingest prefix the
          // next stage tails). Stage 2 absorbs the higher file count by
          // taking up to a full stage-1 batch's files per trigger —
          // sound because the converged max-seq view is batching-
          // independent (upsert versions are monotone per key).
          val q1 = VersionedStreamJoin.fullOuter[CustRow, OrdRow](
              src(custDir, "c_custkey BIGINT, c_name STRING").as[CustRow],
              src(ordDir, "o_orderkey BIGINT, o_custkey BIGINT, " +
                "o_ver BIGINT, o_totalprice DOUBLE").as[OrdRow],
              _.c_custkey.toString, _.o_custkey.toString,
              _.c_custkey.toString, _.o_orderkey.toString,
              _ => 0L, _.o_ver) // one customer version per id: ts moot
            .toDF()
            .writeStream.outputMode("update")
            .foreachBatch { (df: DataFrame, _: Long) =>
              df.select(col("key"), col("seq"),
                  col("x.c_custkey").as("c_custkey"),
                  col("x.c_name").as("c_name"),
                  col("y.o_orderkey").as("o_orderkey"),
                  col("y.o_totalprice").as("o_totalprice"))
                .write.mode("append").parquet(abLog.toString)
              ()
            }.start()

          val abSchema = "key STRING, seq BIGINT, c_custkey BIGINT, " +
            "c_name STRING, o_orderkey BIGINT, o_totalprice DOUBLE"

          // stage 2: (b-carrying AB rows) ⋈ lineitem keyed by orderkey,
          // itself a file-source stream over the relay log. It starts
          // WHILE stage 1 is still emitting — the production topology
          // (stage 2 tails stage 1's log live) — which is sound
          // because the converged max-seq view is interleaving-
          // independent: however stage-1 emissions land in microbatches,
          // the final upsert state is the same. The dir must exist
          // before the source starts listing it.
          java.nio.file.Files.createDirectories(abLog)
          val q2 = VersionedStreamJoin.fullOuter[AbRel, LiRow](
              src(abLog, abSchema, filesPerTrigger = streamShufflePartitions.toInt)
                .where(col("o_orderkey").isNotNull)
                .select(col("seq"), col("c_custkey"), col("c_name"),
                  col("o_orderkey"), col("o_totalprice")).as[AbRel],
              src(liDir, "l_orderkey BIGINT, l_linenumber INT, " +
                "l_ver BIGINT, l_extendedprice DOUBLE").as[LiRow],
              _.o_orderkey.toString, _.l_orderkey.toString,
              _.o_orderkey.toString,
              li => li.l_orderkey.toString + "_" + li.l_linenumber,
              _.seq, _.l_ver)
            .toDF()
            .writeStream.outputMode("update")
            .foreachBatch { (df: DataFrame, _: Long) =>
              df.select(col("key"), col("seq"),
                  col("x.c_custkey").as("c_custkey"),
                  col("x.c_name").as("c_name"),
                  col("x.o_orderkey").as("o_orderkey"),
                  col("x.o_totalprice").as("o_totalprice"),
                  col("y.l_linenumber").as("l_linenumber"),
                  col("y.l_extendedprice").as("l_extendedprice"))
                .write.mode("append").parquet(bcLog.toString)
              ()
            }.start()
          // drain stage 1 first (it feeds the relay), then stage 2;
          // both have been processing concurrently since start
          try {
            q1.processAllAvailable()
            q2.processAllAvailable()
          } finally {
            // nested so a throwing q1.stop() cannot leak q2
            try q1.stop() finally q2.stop()
          }

          val wMax = Window.partitionBy(col("key"))
          // converged stage-2 view: the b-carrying + c-orphan arms
          val viaBc = spark.read
            .schema(abSchema + ", l_linenumber INT, l_extendedprice DOUBLE")
            .parquet(bcLog.toString)
            .withColumn("max_seq", max(col("seq")).over(wMax))
            .filter(col("seq") === col("max_seq"))
            .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
              col("o_totalprice"), col("l_linenumber"),
              col("l_extendedprice"))
          // converged stage-1 view: the a-only arm (no order ever came)
          val aOnly = spark.read.schema(abSchema).parquet(abLog.toString)
            .withColumn("max_seq", max(col("seq")).over(wMax))
            .filter(col("seq") === col("max_seq") &&
              col("o_orderkey").isNull)
            .select(col("c_custkey"), col("c_name"),
              lit(null).cast("long").as("o_orderkey"),
              lit(null).cast("double").as("o_totalprice"),
              lit(null).cast("int").as("l_linenumber"),
              lit(null).cast("double").as("l_extendedprice"))
          // localCheckpoint materializes the answer so the tmp logs can
          // be deleted in the finally below (the result is small — the
          // converged chain — while the logs carry every emission)
          viaBc.unionByName(aOnly)
            .orderBy(asc_nulls_first("c_custkey"),
              asc_nulls_first("o_orderkey"),
              asc_nulls_first("l_linenumber"))
            .localCheckpoint()
        } finally deleteRecursively(tmp)
      },
      Some(ReferenceJoins.j6OracleSql)),

    // THE CHAIN UNDER THE PRODUCTION CONFIG — s11's two-stage topology
    // (decomposition proof there) with the three 100 TB state knobs
    // s18 proved on a single join: RocksDB state store on BOTH stages,
    // event-time TTL (watermarked unions + per-key retirement timers;
    // the delay must cover the chain's MIXED version axes — stage-2
    // versions span stage-1 seqs to packed shipdate·1e10 values, so
    // the watermark stays at zero through the replay and timers are
    // armed but never fire, exactly the beyond-horizon sizing of
    // s17/s18; retirement itself is sbt-asserted where arrival order
    // is controllable), and a 4-way SALTED stage 2. Salting composes
    // with the relay because stage 1 stays unsalted: a salted stage 1
    // would relay its per-sub-key (None, order) rows as AB versions of
    // the same o_orderkey identity, colliding with the true
    // (customer, order) row under stage 2's upsert — the converged
    // suppression that removes them cannot run per-microbatch. Stage
    // 2's X side (AB rows, identity = o_orderkey) lands in exactly one
    // sub-key; lineitem replicas reach all of them; the converged view
    // applies s18's cross-salt (None, y) suppression + replica dedup.
    Entry("s22_stream_production_chain",
      (spark, dir) => withStreamConf(spark) {
        import spark.implicits._
        // 2, not s18's 4: the salt factor multiplies the biggest
        // table's state writes (lineitem replicas × RocksDB upserts),
        // and two sub-keys already prove the cross-salt composition;
        // a deployment sizes this to its real hot-key fan-in
        val salts = 2
        VersionedStreamJoin.withStateStoreProvider(spark) {
          VersionedStreamJoin.withEventTimeTtl(
              ms = 1000L * 365 * 86400 * 1000,
              watermarkDelay = "36500000 days") {
            val tmp = java.nio.file.Files.createTempDirectory("graft_pchain_")
            val abLog = tmp.resolve("ablog")
            val bcLog = tmp.resolve("bclog")
            try {
              val (custDir, ordDir, liDir) = chainChunkDirs(spark, dir)

              def src(d: java.nio.file.Path, schema: String,
                      filesPerTrigger: Int = 1): DataFrame =
                spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", filesPerTrigger.toString)
                  .option("pathGlobFilter", "part-*")
                  .parquet(d.toString)

              val q1 = VersionedStreamJoin.fullOuter[CustRow, OrdRow](
                  src(custDir, "c_custkey BIGINT, c_name STRING").as[CustRow],
                  src(ordDir, "o_orderkey BIGINT, o_custkey BIGINT, " +
                    "o_ver BIGINT, o_totalprice DOUBLE").as[OrdRow],
                  _.c_custkey.toString, _.o_custkey.toString,
                  _.c_custkey.toString, _.o_orderkey.toString,
                  // NOT 0: the watermarked union drops rows whose event
                  // time is ≤ the watermark, and the watermark floor is
                  // epoch 0 — a constant version of 0 silently deletes
                  // the whole side once TTL mode watermarks the stream
                  // (s11's unwatermarked stage can use 0; here it must
                  // be positive)
                  _ => 1L, _.o_ver)
                .toDF()
                .writeStream.outputMode("update")
                .foreachBatch { (df: DataFrame, _: Long) =>
                  df.select(col("key"), col("seq"),
                      col("x.c_custkey").as("c_custkey"),
                      col("x.c_name").as("c_name"),
                      col("y.o_orderkey").as("o_orderkey"),
                      col("y.o_totalprice").as("o_totalprice"))
                    .write.mode("append").parquet(abLog.toString)
                  ()
                }.start()

              val abSchema = "key STRING, seq BIGINT, c_custkey BIGINT, " +
                "c_name STRING, o_orderkey BIGINT, o_totalprice DOUBLE"

              java.nio.file.Files.createDirectories(abLog)
              val lis = src(liDir, "l_orderkey BIGINT, l_linenumber INT, " +
                  "l_ver BIGINT, l_extendedprice DOUBLE").as[LiRow]
                .flatMap(li => (0 until salts).map(s => (s, li)))
              val q2 = VersionedStreamJoin.fullOuter[AbRel, (Int, LiRow)](
                  src(abLog, abSchema,
                    filesPerTrigger = streamShufflePartitions.toInt)
                    .where(col("o_orderkey").isNotNull)
                    .select(col("seq"), col("c_custkey"), col("c_name"),
                      col("o_orderkey"), col("o_totalprice")).as[AbRel],
                  lis,
                  ab => ab.o_orderkey.toString + "#" +
                    math.floorMod(ab.o_orderkey, salts),
                  li => li._2.l_orderkey.toString + "#" + li._1,
                  _.o_orderkey.toString,
                  li => li._2.l_orderkey.toString + "_" + li._2.l_linenumber,
                  _.seq, _._2.l_ver)
                .toDF()
                .writeStream.outputMode("update")
                .foreachBatch { (df: DataFrame, _: Long) =>
                  df.select(col("key"), col("seq"),
                      col("x.c_custkey").as("c_custkey"),
                      col("x.c_name").as("c_name"),
                      col("x.o_orderkey").as("o_orderkey"),
                      col("x.o_totalprice").as("o_totalprice"),
                      col("y._2.l_linenumber").as("l_linenumber"),
                      col("y._2.l_extendedprice").as("l_extendedprice"))
                    .write.mode("append").parquet(bcLog.toString)
                  ()
                }.start()
              try {
                q1.processAllAvailable()
                q2.processAllAvailable()
              } finally {
                try q1.stop() finally q2.stop()
              }

              val wMax = Window.partitionBy(col("key"))
              val wBase = Window.partitionBy(col("base_key"))
              // converged stage-2 view with cross-salt suppression: a
              // (None, lineitem) row is real only if NO sub-key of its
              // base o_orderkey holds an AB row (none here — every
              // lineitem's order exists — but the plan must not assume
              // that), and survivors are salts-fold replicas → distinct
              val viaBc = spark.read
                .schema(abSchema + ", l_linenumber INT, l_extendedprice DOUBLE")
                .parquet(bcLog.toString)
                .withColumn("max_seq", max(col("seq")).over(wMax))
                .filter(col("seq") === col("max_seq"))
                .withColumn("base_key", substring_index(col("key"), "#", 1))
                // x present ⟺ o_orderkey non-null: AbRel.o_orderkey is
                // mandatory, so (None, li) emissions are the only rows
                // where it is null
                .withColumn("has_x",
                  max(when(col("o_orderkey").isNotNull, 1).otherwise(0))
                    .over(wBase))
                .filter(col("o_orderkey").isNotNull || col("has_x") === 0)
                .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
                  col("o_totalprice"), col("l_linenumber"),
                  col("l_extendedprice"))
                .distinct()
              val aOnly = spark.read.schema(abSchema).parquet(abLog.toString)
                .withColumn("max_seq", max(col("seq")).over(wMax))
                .filter(col("seq") === col("max_seq") &&
                  col("o_orderkey").isNull)
                .select(col("c_custkey"), col("c_name"),
                  lit(null).cast("long").as("o_orderkey"),
                  lit(null).cast("double").as("o_totalprice"),
                  lit(null).cast("int").as("l_linenumber"),
                  lit(null).cast("double").as("l_extendedprice"))
              viaBc.unionByName(aOnly)
                .orderBy(asc_nulls_first("c_custkey"),
                  asc_nulls_first("o_orderkey"),
                  asc_nulls_first("l_linenumber"))
                .localCheckpoint()
            } finally deleteRecursively(tmp)
          }
        }
      },
      Some(ReferenceJoins.j6OracleSql)),

    // Streaming windowed aggregation (complete mode): per-day,
    // per-type counts/sums accumulated across the file-source
    // microbatches must equal the batch group-by. (Historical note:
    // through round 4 this replayed a driver-collected array through
    // MemoryStream; the file source removes the last non-harness
    // `.collect()` from the library — MemoryStream-based replay now
    // lives only in the sbt determinism harnesses.)
    Entry("s2_stream_window_agg",
      (spark, dir) => {
        import spark.implicits._
        runFileStream(spark, dir, mode = "complete") { src =>
          src().toDF()
            .withColumn("ts", expr("timestamp_micros(ts_us)"))
            .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
            .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        }(_.orderBy(col("day"), col("event_type")))
      },
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin)),

    // True file-source streaming: readStream over the events parquet
    // (one file per trigger), watermarked event-time windowed count,
    // complete mode — converges to the same batch group-by. This is
    // the production shape: at scale the source is a growing directory
    // and maxFilesPerTrigger bounds each microbatch.
    Entry("s3_stream_file_agg",
      (spark, dir) => withStreamConf(spark) {
        // MUST precede the raw-footer sniff below: on the
        // TIMESTAMP(NANOS) vintage an unguarded spark.read.parquet
        // throws PARQUET_TYPE_ILLEGAL — this set keeps s3
        // order-independent (no reliance on an earlier Registry.table
        // call having set the conf session-wide)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val tmp = java.nio.file.Files.createTempDirectory("graft_s3_")
        val log = tmp.resolve("log"); val ckpt = tmp.resolve("ckpt")
        try {
          // readStream needs an explicit schema, and the testdata has
          // shipped events.ts in two vintages (TIMESTAMP(NANOS) → read
          // as BIGINT under the legacy conf; TIMESTAMP(MICROS) → NTZ).
          // Sniff the dtype the batch reader actually loads (a footer
          // read, no data scan) and declare the matching stream schema
          // instead of assuming one vintage.
          val tsIsLong = spark.read.parquet(s"$dir/events.parquet")
            .schema("ts").dataType == org.apache.spark.sql.types.LongType
          val tsDecl = if (tsIsLong) "ts BIGINT" else "ts TIMESTAMP_NTZ"
          val schema = s"event_id BIGINT, $tsDecl, user_id BIGINT, " +
            "event_type STRING, value DOUBLE, props STRING"
          val src0 = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "events.parquet")
            .parquet(dir)
          val src =
            if (tsIsLong) src0.withColumn("ets", expr("timestamp_micros(ts div 1000)"))
            else src0.withColumn("ets", col("ts").cast("timestamp"))
          val agg = src
            .withWatermark("ets", "1 hour")
            .groupBy(window(col("ets"), "1 day").getField("start").as("day"),
              col("event_type"))
            .agg(count(lit(1)).as("n"))
          // complete mode → each trigger's foreachBatch carries the full
          // current answer; overwrite keeps the log at exactly one copy
          // (the runFileStream discipline — no memory sink anywhere)
          val q = agg.writeStream.outputMode("complete")
            .option("checkpointLocation", ckpt.toString)
            .foreachBatch { (df: DataFrame, _: Long) =>
              df.write.mode("overwrite").parquet(log.toString)
              ()
            }.start()
          try q.processAllAvailable() finally q.stop()
          spark.read.parquet(log.toString)
            .orderBy(col("day"), col("event_type"))
            .localCheckpoint()
        } finally deleteRecursively(tmp)
      },
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin)),

    // Streaming SESSION windows: the stateful merging window operator —
    // Spark's session-window state tracks open sessions per user and
    // MERGES them when a bridging event arrives, which no fixed-window
    // agg exercises. Complete mode (no watermark) keeps every session
    // in state and re-emits the full current session set per trigger,
    // so out-of-order file arrival needs no convergence gymnastics:
    // the final sink content IS the answer and must hash-match the
    // batch q_session_window oracle. At 100 TB the same query runs
    // with `.withWatermark` + append mode — closed sessions emit once
    // and state stays bounded by OPEN sessions (the complete-mode form
    // here is the oracle-checkable twin; the watermark form is
    // s3_stream_file_agg's pattern applied to session_window).
    Entry("s12_stream_session_window",
      (spark, dir) => {
        import spark.implicits._
        runFileStream(spark, dir, mode = "complete") { src =>
          src().toDF()
            .withColumn("ts", expr("timestamp_micros(ts_us)"))
            .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
            .agg(count(lit(1)).as("n_events"),
              round(sum(col("value")), 4).as("sum_value"))
            .select(col("user_id"),
              col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("n_events"), col("sum_value"))
        }(_.orderBy(col("user_id"), col("session_start")))
      },
      Some(Analytics.sessionWindowOracleSql)),

    // APPEND-mode watermarked windowed agg with a real FILE sink —
    // the production output mode: each closed window is emitted
    // exactly once to parquet (a downstream consumer needs no upsert
    // handling), and state for closed windows is dropped. Window
    // closure needs the watermark to pass the window end, which
    // processAllAvailable alone never forces for the LAST windows —
    // the standard flush is a sentinel event far past the data (the
    // "punctuation" idea): with a 35-day delay (> the corpus's 29-day
    // span) no real window can close before the sentinel arrives, so
    // file arrival order is irrelevant (no late-drop risk), and the
    // sentinel's own window never closes so it is never emitted. The
    // flushed parquet must hash-match the batch q_time_window oracle.
    Entry("s13_stream_append_window",
      (spark, dir) => runAppendReplay(spark, dir) { src =>
        // append mode requires grouping by the window STRUCT (the
        // watermark tracking rides on it); .start projects after
        src().groupBy(window(col("ets"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value")), 4).as("sum_value"))
          .select(col("window.start").as("day"), col("event_type"),
            col("n"), col("sum_value"))
      }(_.orderBy(col("day"), col("event_type"))),
      Some(Analytics.timeWindowOracleSql)),

    // APPEND-mode watermarked SESSION windows with a real file sink —
    // the production output mode for the MERGING window state (s12 is
    // the complete-mode twin): an open session per user is held in
    // state, merged when a bridging event arrives, and emitted exactly
    // once when the watermark passes its end. The sentinel flush
    // closes every real session (watermark reaches max event time
    // + 5 days > any session end = last event + 30 min) while the
    // sentinel's own session — keyed under user_id = -1 — never closes
    // and is never emitted. Must hash-match the batch q_session_window
    // oracle, proving merging-window state in append mode end-to-end.
    Entry("s15_stream_session_append",
      (spark, dir) => runAppendReplay(spark, dir) { src =>
        src().groupBy(session_window(col("ets"), "30 minutes"),
            col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value")), 4).as("sum_value"))
          .select(col("user_id"),
            col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"),
            col("n_events"), col("sum_value"))
      }(_.orderBy(col("user_id"), col("session_start"))),
      Some(Analytics.sessionWindowOracleSql)),

    // Spark's NATIVE stream-stream join in its OUTER form: matched
    // pairs emit immediately, but an unmatched left row emits its
    // null-extended form only once the watermark proves no future
    // right match can arrive — the delayed-null contract a production
    // outer join lives by (state for the row is dropped at the same
    // moment). Asymmetric sides (signup/error lefts probing
    // click/purchase/view rights) so genuinely unmatched lefts exist;
    // the sentinel advances BOTH streams' watermarks past every match
    // window, flushing the nulls; the quiet-poll then waits for the
    // post-sentinel no-data batch. The join condition carries only
    // key equality + the event-time range (the stream-stream state
    // watermark contract, as in s9); both the matched and the
    // null-extended rows must hash-match the batch left-outer range
    // oracle.
    Entry("s26_stream_range_left_outer",
      (spark, dir) => runAppendReplay(spark, dir, stableTarget = 4) { src =>
        val a = src()
          .filter(expr("event_type IN ('signup','error') " +
            "AND user_id % 3 != 0"))
          .select(col("user_id"), col("event_id"), col("ts_us"),
            col("ets").as("ats"))
        val b = src()
          .filter(expr("event_type IN ('click','purchase','view') " +
            "AND user_id % 5 != 0"))
          .select(col("user_id").as("uid2"), col("event_id").as("e2"),
            col("ts_us").as("tus2"), col("ets").as("bts"))
        a.join(b, expr("user_id = uid2 AND " +
            "bts BETWEEN ats - INTERVAL 30 MINUTES " +
            "AND ats + INTERVAL 30 MINUTES"), "left_outer")
          .select(col("user_id"), col("event_id").as("e1"), col("e2"),
            (col("tus2") - col("ts_us")).as("dt_us"))
      }(_.filter(col("user_id") >= 0) // belt-and-braces vs sentinels
        .orderBy(col("user_id"), col("e1"), col("e2"))),
      Some(Analytics.rangeLeftOuterOracleSql)),

    // s26's NATIVE outer join under the PRODUCTION state backend:
    // RocksDB provider + changelog checkpointing. The custom joins
    // prove the backend swap on flatMapGroupsWithState state (s14,
    // s18); this proves it on Spark's symmetric-hash-join state AND
    // the watermark bookkeeping behind the delayed null flush — the
    // two structures a 100 TB native outer join actually keeps off
    // heap. Unmatched-left nulls must still flush exactly when the
    // watermark closes the match window, hash-matching the same batch
    // left-outer oracle.
    Entry("s31_stream_native_rocksdb",
      (spark, dir) => VersionedStreamJoin.withStateStoreProvider(spark) {
        runAppendReplay(spark, dir, stableTarget = 4) { src =>
          val a = src()
            .filter(expr("event_type IN ('signup','error') " +
              "AND user_id % 3 != 0"))
            .select(col("user_id"), col("event_id"), col("ts_us"),
              col("ets").as("ats"))
          val b = src()
            .filter(expr("event_type IN ('click','purchase','view') " +
              "AND user_id % 5 != 0"))
            .select(col("user_id").as("uid2"), col("event_id").as("e2"),
              col("ts_us").as("tus2"), col("ets").as("bts"))
          a.join(b, expr("user_id = uid2 AND " +
              "bts BETWEEN ats - INTERVAL 30 MINUTES " +
              "AND ats + INTERVAL 30 MINUTES"), "left_outer")
            .select(col("user_id"), col("event_id").as("e1"), col("e2"),
              (col("tus2") - col("ts_us")).as("dt_us"))
        }(_.filter(col("user_id") >= 0)
          .orderBy(col("user_id"), col("e1"), col("e2")))
      },
      Some(Analytics.rangeLeftOuterOracleSql)),

    // The FULL-outer form: unmatched rows on EITHER side flush
    // null-extended once the watermark closes their match window
    // (state for both sides is watermark-bounded). The output key is
    // the coalesced user id since right-only rows carry no left
    // columns. Same oracle discipline: matched + left-null +
    // right-null rows together hash-match the batch full-outer range
    // join.
    Entry("s27_stream_range_full_outer",
      (spark, dir) => runAppendReplay(spark, dir, stableTarget = 4) { src =>
        val a = src()
          .filter(expr("event_type IN ('signup','error') " +
            "AND user_id % 3 != 0"))
          .select(col("user_id"), col("event_id"), col("ts_us"),
            col("ets").as("ats"))
        val b = src()
          .filter(expr("event_type IN ('click','purchase','view') " +
            "AND user_id % 5 != 0"))
          .select(col("user_id").as("uid2"), col("event_id").as("e2"),
            col("ts_us").as("tus2"), col("ets").as("bts"))
        a.join(b, expr("user_id = uid2 AND " +
            "bts BETWEEN ats - INTERVAL 30 MINUTES " +
            "AND ats + INTERVAL 30 MINUTES"), "full_outer")
          .select(coalesce(col("user_id"), col("uid2")).as("user_id"),
            col("event_id").as("e1"), col("e2"),
            (col("tus2") - col("ts_us")).as("dt_us"))
      }(_.filter(col("user_id") >= 0)
        .orderBy(col("user_id"), col("e1"), col("e2"))),
      Some(Analytics.rangeFullOuterOracleSql)),

    // The LEFT-SEMI form: a left row emits exactly once — when its
    // first in-range match arrives (or never, if none does, the state
    // again dropped at the watermark). The streaming answer is the
    // EXISTS shape a feed filter runs ("keep signups that saw
    // activity within 30 minutes").
    Entry("s28_stream_range_semi",
      (spark, dir) => runAppendReplay(spark, dir, stableTarget = 4) { src =>
        val a = src()
          .filter(expr("event_type IN ('signup','error') " +
            "AND user_id % 3 != 0"))
          .select(col("user_id"), col("event_id"), col("ts_us"),
            col("ets").as("ats"))
        val b = src()
          .filter(expr("event_type IN ('click','purchase','view') " +
            "AND user_id % 5 != 0"))
          .select(col("user_id").as("uid2"), col("event_id").as("e2"),
            col("ets").as("bts"))
        a.join(b, expr("user_id = uid2 AND " +
            "bts BETWEEN ats - INTERVAL 30 MINUTES " +
            "AND ats + INTERVAL 30 MINUTES"), "left_semi")
          .select(col("user_id"), col("event_id").as("e1"), col("ts_us"))
      }(_.filter(col("user_id") >= 0)
        .orderBy(col("user_id"), col("e1"))),
      Some(Analytics.rangeSemiOracleSql)),

    // Spark's NATIVE streaming deduplication operator
    // (dropDuplicatesWithinWatermark): state-store-backed first-seen
    // dedup whose per-key state expires at the event-time watermark —
    // the built-in counterpart to the custom latest-wins
    // [[graft.streaming.VersionedStreamDedup]] (s8/s19). First
    // occurrences emit immediately in append mode (the watermark only
    // bounds STATE, not emission), and the 400-day delay exceeds the
    // corpus span, so the streamed answer is the exact distinct key
    // set — hash-matched against a batch DISTINCT oracle. At 100 TB
    // the state holds one slim entry per distinct in-horizon key
    // (never payloads) and is dropped by the watermark — the operator
    // a production feed runs to suppress replayed/at-least-once
    // duplicates. Completes native-streaming-operator coverage:
    // joins (s9/s26–s28), windows (s13/s12/s15), dedup (here).
    Entry("s29_stream_native_dedup",
      (spark, dir) =>
        runFileStream(spark, dir, mode = "append") { src =>
          src().toDF()
            .withColumn("ets", expr("timestamp_micros(ts_us)"))
            .withWatermark("ets", "400 days")
            .dropDuplicatesWithinWatermark("user_id", "event_type")
            .select(col("user_id"), col("event_type"))
        }(_.orderBy(col("user_id"), col("event_type"))),
      Some("""SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin)),

    // STREAM-STATIC ENRICHMENT JOIN — the remaining native streaming
    // join form: a stream joined to a STATIC dimension inside the
    // streaming query itself (not per-batch in foreachBatch). It is
    // stateless — each microbatch hash/broadcast-joins against the
    // dimension and emits immediately, no watermark, no state store —
    // which is exactly the 100 TB enrichment shape: the dimension
    // broadcasts to every executor once per batch (or bucket-joins
    // when too big) while the fact stream never shuffles. Every event
    // enriched exactly once across batches, so the converged log
    // hash-matches the batch join oracle with no upsert handling.
    Entry("s33_stream_static_enrich",
      (spark, dir) => {
        val dim = broadcast(Registry.table(spark, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment")))
        runFileStream(spark, dir, mode = "append") { src =>
          src().toDF()
            .join(dim, col("user_id") === col("c_custkey"))
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("c_name"), col("c_mktsegment"))
        }(_.orderBy(col("event_id")))
      },
      Some("""SELECT event_id, user_id, event_type, c_name, c_mktsegment
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin)),

    // INCREMENTAL SEMANTIC DEDUP (streaming SemDeDup) — the admission
    // pipeline a training-data ingest runs: each arriving embedding is
    // coarse-quantized (stage 1, the s25 stateless relay shape), then
    // judged against its CELL's members only
    // ([[graft.streaming.SemanticStreamDedup]]): admitted if no
    // earlier-id near-duplicate exists in the cell, and RETRACTED
    // (kept=false superseding the earlier kept=true, CDC-style) if an
    // earlier-id near-dup arrives late — the batch rule is an
    // order-independent EXISTS, so the converged decisions match the
    // batch dedup_semantic kept set for ANY arrival order. Work per
    // batch is O(new × cell members), never cross-cell; state is
    // cell-partitioned. Converges to the same oracle as
    // dedup_semantic.
    Entry("s30_stream_semantic_dedup",
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_sem_")
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
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.crossJoin(broadcast(cent))
                  .select(col("vec_id"), col("e"), col("nrm"),
                    round(graft.functions.VectorFunctions.dot(
                      col("e"), col("ce")) / (col("nrm") * col("cn")), 6)
                      .as("csim"),
                    col("cid"))
                  .groupBy(col("vec_id"))
                  .agg(max_by(col("cid"), struct(col("csim"), -col("cid")))
                    .as("cell"),
                    first(col("e")).as("e"), first(col("nrm")).as("nrm"))
                  .write.mode("append").parquet(relay.toString)
                ()
              }.start()
            java.nio.file.Files.createDirectories(relay)
            val asgs = spark.readStream
              .schema("vec_id BIGINT, cell BIGINT, e ARRAY<DOUBLE>, " +
                "nrm DOUBLE")
              .option("maxFilesPerTrigger", streamShufflePartitions.toString)
              .option("pathGlobFilter", "part-*")
              .parquet(relay.toString)
              .as[graft.streaming.AssignedVec]
            val dec = graft.streaming.SemanticStreamDedup.decisions(
              asgs, VectorOps.nearDupThreshold)
            val q2 = dec.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt2.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try {
              q1.processAllAvailable()
              q2.processAllAvailable()
            } finally {
              try q1.stop() finally q2.stop()
            }
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("vec_id"))
            raw
              .withColumn("max_seq", max(col("seq")).over(wMax))
              .filter(col("seq") === col("max_seq") && col("kept"))
              .select(col("vec_id"), col("cell"))
              .orderBy(col("vec_id"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(VectorOps.semanticKeptOracleSql)),

    // THE STREAMING CURATION PIPELINE — pipe_curation's incremental
    // half: documents arrive as a stream, embeddings join in as the
    // STATIC side (computed upstream, the realistic shape), and the
    // admission manifest converges over three queries:
    //   q1 (stateless per batch): quality gate + content fingerprint +
    //      split bucket + id-keyed static join to (cell, e, nrm),
    //      relayed as slim rows;
    //   q2 (stateful, keyed by fingerprint): exact-dup admission —
    //      [[graft.streaming.SemanticStreamDedup]] at threshold −1,
    //      where EVERY same-key pair is a duplicate, degenerates to
    //      min-id-per-content admission with CDC retraction;
    //   q3 (stateful, keyed by cell): semantic admission, the s30 op.
    // COMPOSITION CONTRACT: the two drop-lists are computed
    // INDEPENDENTLY over the gated corpus and ANDed (parallel
    // composition) — each stage stays a monotone order-independent
    // EXISTS rule, so late arrivals can only retract, never revive,
    // and the converged manifest is arrival-order-free. (pipe_curation
    // is the sequential composition — semantic pairs among exact
    // survivors; the two differ only when an exact-dropped doc is
    // itself a semantic dropper, and each is checked against its own
    // oracle.) At 100 TB: one stateless pass + two cell/fp-keyed
    // decision states holding slim members, the relay an object-store
    // prefix.
    Entry("s32_stream_curation",
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_cur_")
          val relay = tmp.resolve("relay")
          val logE = tmp.resolve("logE")
          val logS = tmp.resolve("logS")
          val ckpt1 = tmp.resolve("ckpt1")
          val ckpt2 = tmp.resolve("ckpt2")
          val ckpt3 = tmp.resolve("ckpt3")
          try {
            val in = sharedChunkDir(dir, "doctext", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("text"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            // the static sides, slim and materialized once
            val emb = VectorOps.embSlim(spark, dir).localCheckpoint()
            val asg = graft.core.VectorTools.assignCells(
                emb.select(col("vec_id").as("id"), col("e")),
                VectorOps.ivfSeedCentroids(spark, dir))
              .select(col("id").as("vec_id"), col("cell"))
              .localCheckpoint()
            val docsMeta = Registry.table(spark, dir, "documents")
              .select(col("doc_id").as("mid"), col("lang"),
                TextFunctions.qualityScore(col("text")).as("quality"))
              .localCheckpoint()
            val q1 = spark.readStream
              .schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
              .writeStream.outputMode("append")
              .option("checkpointLocation", ckpt1.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.select(col("doc_id"),
                    TextFunctions.qualityScore(col("text")).as("quality"),
                    TextFunctions.fingerprint64(col("text")).as("fp64"),
                    TextFunctions.splitBucket(col("doc_id")).as("bucket"))
                  .filter(col("quality") >= lit(0.6))
                  .join(emb, col("vec_id") === col("doc_id"))
                  .join(asg.withColumnRenamed("vec_id", "avid"),
                    col("avid") === col("doc_id"))
                  .select(col("doc_id"), col("bucket"), col("fp64"),
                    col("cell"), col("e"), col("nrm"))
                  .write.mode("append").parquet(relay.toString)
                ()
              }.start()
            java.nio.file.Files.createDirectories(relay)
            val relaySchema = "doc_id BIGINT, bucket BIGINT, " +
              "fp64 BIGINT, cell BIGINT, e ARRAY<DOUBLE>, nrm DOUBLE"
            def tail(): DataFrame = spark.readStream.schema(relaySchema)
              .option("maxFilesPerTrigger", streamShufflePartitions)
              .option("pathGlobFilter", "part-*")
              .parquet(relay.toString)
            val exactIn = tail()
              .select(col("doc_id").as("vec_id"),
                col("fp64").as("cell"), col("e"), col("nrm"))
              .as[graft.streaming.AssignedVec]
            val q2 = graft.streaming.SemanticStreamDedup
              .decisions(exactIn, -1.0)
              .toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt2.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("append").parquet(logE.toString)
                ()
              }.start()
            val semIn = tail()
              .select(col("doc_id").as("vec_id"), col("cell"),
                col("e"), col("nrm"))
              .as[graft.streaming.AssignedVec]
            val q3 = graft.streaming.SemanticStreamDedup
              .decisions(semIn, VectorOps.nearDupThreshold)
              .toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt3.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("append").parquet(logS.toString)
                ()
              }.start()
            try {
              q1.processAllAvailable()
              q2.processAllAvailable()
              q3.processAllAvailable()
            } finally {
              try q1.stop() finally { try q2.stop() finally q3.stop() }
            }
            def latestKept(log: java.nio.file.Path): DataFrame = {
              val w = Window.partitionBy(col("vec_id"))
              spark.read.parquet(log.toString)
                .withColumn("mx", max(col("seq")).over(w))
                .filter(col("seq") === col("mx") && col("kept"))
                .select(col("vec_id"))
            }
            spark.read.parquet(relay.toString)
              .select(col("doc_id"), col("bucket"), col("cell"))
              .join(latestKept(logE)
                .withColumnRenamed("vec_id", "ke"), col("ke") === col("doc_id"))
              .join(latestKept(logS)
                .withColumnRenamed("vec_id", "ks"), col("ks") === col("doc_id"))
              .join(docsMeta, col("mid") === col("doc_id"))
              .select(col("doc_id"), col("lang"),
                TextFunctions.splitFromBucket(col("bucket")).as("split"),
                col("quality"), col("cell"))
              .orderBy(col("doc_id"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(s"""WITH g AS (SELECT doc_id, lang,
        |    round(0.5 * (len(list_distinct(string_split(text, ' ')))::DOUBLE
        |        / len(string_split(text, ' '))::DOUBLE)
        |      + 0.5 * least(1.0, length(text)::DOUBLE / 200.0), 6) AS quality,
        |    ${TextFunctions.fp64Sql("text")} AS fp64,
        |    ${TextFunctions.splitBucketSql("doc_id")} AS bucket
        |  FROM documents),
        |gated AS (SELECT * FROM g WHERE quality >= 0.6),
        |v AS (${VectorOps.embSql}),
        |c AS (SELECT vec_id AS cid, e AS ce FROM v
        |  WHERE vec_id < ${VectorOps.ivfCells}),
        |s AS (SELECT v.vec_id, c.cid,
        |    round(${VectorOps.cosSql("v.e", "c.ce")}, 6) AS csim
        |  FROM v CROSS JOIN c),
        |asg AS (SELECT vec_id, cid AS cell FROM (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY csim DESC, cid) AS r FROM s) WHERE r = 1),
        |drop_e AS (SELECT DISTINCT b.doc_id
        |  FROM gated a JOIN gated b
        |    ON a.fp64 = b.fp64 AND a.doc_id < b.doc_id),
        |sv AS (SELECT gated.*, asg.cell FROM gated
        |  JOIN asg ON asg.vec_id = gated.doc_id),
        |drop_s AS (SELECT DISTINCT b.doc_id
        |  FROM sv a JOIN sv b ON a.cell = b.cell AND a.doc_id < b.doc_id
        |  JOIN v va ON va.vec_id = a.doc_id
        |  JOIN v vb ON vb.vec_id = b.doc_id
        |  WHERE round(${VectorOps.cosSql("va.e", "vb.e")}, 6)
        |    >= ${VectorOps.nearDupThreshold})
        |SELECT doc_id, lang,
        |  ${TextFunctions.splitCaseSql("bucket")} AS split,
        |  quality, cell
        |FROM sv
        |WHERE doc_id NOT IN (SELECT doc_id FROM drop_e)
        |  AND doc_id NOT IN (SELECT doc_id FROM drop_s)
        |ORDER BY doc_id""".stripMargin)),

    // INCREMENTAL EXACT-SUBSTRING DUPLICATION —
    // dedup_substring_spans' stateful half over a growing corpus
    // (completing the streaming dedup family alongside s19/s21/s24):
    // each arriving document's 8-token windows are fingerprinted and
    // counted scan-locally, then upserted into GRAM-keyed state
    // (VersionedStreamDedup: gram → member docs with window counts —
    // exactly the batch shuffle rows, never the text). A gram's df IS
    // its converged member count, so duplicated-span status derives
    // at read time: a later document repeating an earlier document's
    // span flips that span duplicated for BOTH without any retraction
    // machinery, because the per-doc rollup is a projection over
    // converged state — arrival-order-free by construction. At 100 TB
    // the rollup runs per gram partition off this state; only
    // (gram, doc_id, cnt) rows are ever stateful.
    Entry("s36_stream_substring_spans",
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_sub_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "doctext", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("text"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream.schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val k = DedupOps.substringGramLen
            // window fingerprints materialized as an attribute before
            // the counting HOF reads it twice (shingles3FromTokens
            // perf note); per-distinct-gram counts are scan-local
            val gramRows = src
              .select(col("doc_id"),
                TextFunctions.tokens(col("text")).as("t"))
              .filter(size(col("t")) >= k)
              .select(col("doc_id"),
                transform(sequence(lit(1), size(col("t")) - (k - 1)),
                  i => md5(concat_ws(" ", slice(col("t"), i, lit(k)))))
                  .as("gs"))
              .select(col("doc_id"),
                explode(transform(array_distinct(col("gs")), g =>
                  struct(g.as("g"),
                    size(filter(col("gs"), x => x === g)).cast("long")
                      .as("cnt")))).as("gc"))
              .select(col("gc.g").as("g"), col("doc_id"),
                col("gc.cnt").as("cnt"))
              .as[GramRow]
            val dd = VersionedStreamDedup.latestPerKeyId[GramRow](
              gramRows, _.g, _.doc_id.toString, _ => 0L)
            val q = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("key"))
            val members = raw
              .withColumn("max_seq", max(col("seq")).over(wMax))
              .filter(col("seq") === col("max_seq"))
              .select(col("key"), explode(col("xs")).as("x"))
              .select(col("key"), col("x.doc_id").as("doc_id"),
                col("x.cnt").as("cnt"))
            val df2 = members.groupBy(col("key"))
              .agg(count(lit(1)).as("nd"))
            members.join(df2, "key")
              .groupBy(col("doc_id"))
              .agg(sum(col("cnt")).as("n_grams"),
                sum(when(col("nd") >= 2, col("cnt")).otherwise(0L))
                  .as("dup_grams"))
              .withColumn("dup_coverage",
                round(col("dup_grams").cast("double") / col("n_grams"), 6))
              .orderBy(col("doc_id"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(DedupOps.substringSpansOracleSql)),

    // INCREMENTAL CDC CHUNK DEDUP — the multimodal storage-dedup
    // pipeline's stateful half (m_chunk_cdc over a growing media
    // lake): each arriving payload is content-defined-chunked
    // scan-locally (the same Rabin-style boundary rule and codegen'd
    // rolling hash as the batch row), its chunk-hash multiplicities
    // counted per document, and the slim (chunk_md5, doc_id, cnt)
    // rows upserted into CHUNK-keyed state. The converged sharing
    // report (chunks held by >1 document — what a media lake
    // single-instances) is a projection over that state, so it is
    // arrival-order-free and converges to the batch m_chunk_cdc
    // oracle. At 100 TB the state holds 16-byte hashes with counts,
    // never payload bytes; an arriving near-duplicate video re-chunks
    // only its edited neighborhood (the CDC property), so its
    // unchanged chunks land on existing state keys.
    Entry("s37_stream_cdc_chunk_dedup",
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "doctext", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("text"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream.schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val chunkRows = cdcChunkCountRows(src).as[ChunkRow]
            val dd = VersionedStreamDedup.latestPerKeyId[ChunkRow](
              chunkRows, _.chunk_md5, _.doc_id.toString, _ => 0L)
            val q = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("key"))
            raw
              .withColumn("max_seq", max(col("seq")).over(wMax))
              .filter(col("seq") === col("max_seq"))
              .select(col("key").as("chunk_md5"), explode(col("xs")).as("x"))
              .groupBy(col("chunk_md5"))
              .agg(sum(col("x.cnt")).as("n_chunks"),
                count(lit(1)).as("n_docs"))
              .filter(col("n_docs") > 1)
              .orderBy(col("chunk_md5"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(MultimodalOps.cdcChunkOracleSql)),

    // STREAMING CARDINALITY MONITORING — the KMV mergeable sketch
    // ([[graft.functions.KmvSketchAgg]]) as a streaming AGGREGATION:
    // the engine itself persists the aggregate buffer (the k=64
    // smallest distinct hashes per event_type — 512 bytes, never the
    // values) across microbatches, so per-key distinct-user estimates
    // are maintained incrementally over the replayed ingest with no
    // custom state code at all. Because the KMV estimate is a pure
    // function of the hash set, the converged streaming answer equals
    // the batch sketch bit-for-bit AND the DuckDB oracle re-derives
    // the same number — a determinism HLL++-based monitoring cannot
    // offer. At 100 TB this is the feed-health dashboard query: state
    // is O(groups · k) regardless of traffic.
    Entry("s38_stream_kmv_users",
      (spark, dir) => {
        import graft.functions.{KmvSketch, TextFunctions}
        runFileStream(spark, dir, mode = "complete") { src =>
          src().toDF()
            .select(col("event_type"),
              TextFunctions.fingerprint64(col("user_id").cast("string"))
                .as("h"))
            .groupBy(col("event_type"))
            .agg(KmvSketch.kmvSketch(col("h")).as("sk"))
            .select(col("event_type"),
              KmvSketch.estimate(col("sk")).as("n_kmv"))
        }(_.orderBy(col("event_type")))
      },
      Some(s"""WITH th AS (SELECT event_type,
        |  ${TextFunctions.fp64Sql("CAST(user_id AS VARCHAR)")} AS h
        |  FROM events),
        |kmv AS ${graft.functions.KmvSketch.oracleEstimateSql(
               "th", "event_type", "h")}
        |SELECT event_type, n_kmv FROM kmv
        |ORDER BY event_type""".stripMargin)),

    // CONTINUOUS DECONTAMINATION MONITORING — t_kmv_contamination's
    // streaming twin: as document chunks land, each split's KMV k-min
    // hash SET is maintained as engine-managed streaming-agg state
    // (2 KB per split, never the shingles), and the converged sketches
    // feed the same union/Jaccard/intersection estimator. Because the
    // sketch is a pure function of the hash set, the streamed
    // estimates must equal the batch row's kmv columns BIT-FOR-BIT —
    // the oracle is the same re-derivation. At 100 TB this runs
    // against the live ingest: overlap between the growing train feed
    // and a frozen eval set, continuously, from 4 KB of state.
    Entry("s39_stream_kmv_contamination",
      (spark, dir) => { import spark.implicits._
        import graft.functions.KmvSketch
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_kmvc_")
          val log = tmp.resolve("log"); val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "doctext", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("text"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream.schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val k = 256
            val sketches = src
              .withColumn("split", TextFunctions.splitAssign(col("doc_id")))
              .filter(col("split") =!= "val")
              .select(col("split"), TextFunctions.tokens(col("text")).as("toks"))
              .select(col("split"), explode(array_distinct(
                TextFunctions.shingles3FromTokens(col("toks")))).as("sh"))
              .select(col("split"),
                TextFunctions.fingerprint64(col("sh")).as("fp"))
              .groupBy(col("split"))
              .agg(KmvSketch.kmvHashes(col("fp"), k).as("hs"))
            val q = sketches.writeStream.outputMode("complete")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("overwrite").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            val conv = spark.read.parquet(log.toString)
            val tr = conv.filter(col("split") === "train")
              .select(col("hs").as("train_hs"))
            val te = conv.filter(col("split") === "test")
              .select(col("hs").as("test_hs"))
            tr.crossJoin(te)
              .withColumn("u",
                KmvSketch.unionMin(col("train_hs"), col("test_hs"), k))
              .select(
                KmvSketch.estimateFromHashes(
                  sort_array(col("train_hs")), k).as("n_train_kmv"),
                KmvSketch.estimateFromHashes(
                  sort_array(col("test_hs")), k).as("n_test_kmv"),
                KmvSketch.estimateFromHashes(col("u"), k).as("n_union_kmv"),
                KmvSketch.coincidences(col("u"), col("train_hs"),
                  col("test_hs")).as("c"),
                size(col("u")).as("nu"))
              .select(col("n_train_kmv"), col("n_test_kmv"),
                col("n_union_kmv"), col("c"),
                when(col("nu") === 0, lit(0.0))
                  .otherwise(round(col("c") / col("nu"), 6))
                  .as("jaccard_kmv"),
                when(col("nu") === 0, lit(0L)).otherwise(
                  floor(col("c") * col("n_union_kmv") / col("nu"))
                    .cast("long")).as("n_inter_kmv"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(s"""WITH b AS (SELECT doc_id, text,
        |  ${TextFunctions.splitCaseSql(
             TextFunctions.splitBucketSql("doc_id"))} AS split
        |  FROM documents),
        |sh AS (SELECT DISTINCT split, ${TextFunctions.fp64Sql("sh")} AS fp
        |  FROM (SELECT split,
        |    unnest(list_distinct(${DedupOps.shinglesListSql})) AS sh
        |    FROM b WHERE split <> 'val')),
        |tr AS (SELECT fp FROM sh WHERE split = 'train'),
        |te AS (SELECT fp FROM sh WHERE split = 'test'),
        |trk AS (SELECT fp, row_number() OVER (ORDER BY fp) AS rn FROM tr),
        |tek AS (SELECT fp, row_number() OVER (ORDER BY fp) AS rn FROM te),
        |un AS (SELECT fp, row_number() OVER (ORDER BY fp) AS rn
        |  FROM (SELECT fp FROM tr UNION SELECT fp FROM te)),
        |uk AS (SELECT fp FROM un WHERE rn <= 256),
        |est AS (SELECT
        |  (SELECT CASE WHEN max(rn) < 256 THEN max(rn)
        |     ELSE CAST(floor(255.0 * 1152921504606846976.0 /
        |       CAST(GREATEST(max(CASE WHEN rn = 256 THEN fp END), 1) AS DOUBLE)) AS BIGINT) END
        |   FROM trk) AS n_train_kmv,
        |  (SELECT CASE WHEN max(rn) < 256 THEN max(rn)
        |     ELSE CAST(floor(255.0 * 1152921504606846976.0 /
        |       CAST(GREATEST(max(CASE WHEN rn = 256 THEN fp END), 1) AS DOUBLE)) AS BIGINT) END
        |   FROM tek) AS n_test_kmv,
        |  (SELECT CASE WHEN max(rn) < 256 THEN max(rn)
        |     ELSE CAST(floor(255.0 * 1152921504606846976.0 /
        |       CAST(GREATEST(max(CASE WHEN rn = 256 THEN fp END), 1) AS DOUBLE)) AS BIGINT) END
        |   FROM un) AS n_union_kmv,
        |  (SELECT count(*) FROM uk
        |   WHERE fp IN (SELECT fp FROM tr) AND fp IN (SELECT fp FROM te))
        |    AS c,
        |  (SELECT count(*) FROM uk) AS nu)
        |SELECT n_train_kmv, n_test_kmv, n_union_kmv, c,
        |  CASE WHEN nu = 0 THEN 0.0 ELSE round(c / nu, 6) END AS jaccard_kmv,
        |  CASE WHEN nu = 0 THEN 0 ELSE
        |    CAST(floor(c * n_union_kmv / nu) AS BIGINT) END AS n_inter_kmv
        |FROM est""".stripMargin)),

    // STREAMING FREQUENCY MONITORING — t_cms_heavy_hitters' streaming
    // twin: the d×w count-min counter matrix maintained as
    // engine-managed streaming-aggregation state over the replayed
    // ingest. Counter matrices merge by ADDITION, which is precisely
    // what streaming count state does across microbatches — so the
    // sketch needs no custom state code and its converged value is
    // BATCH-IDENTICAL (counts are exact integers; the estimate is a
    // pure function of the matrix). State is 4,096 counters regardless
    // of traffic or vocabulary — the token-frequency dashboard a
    // 100 TB feed runs. The probe set (exact top-20) joins in from the
    // static table at convergence; same oracle as the batch row.
    Entry("s40_stream_cms_heavy_hitters",
      (spark, dir) => { import spark.implicits._
        import graft.functions.SketchFunctions
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_cms_")
          val log = tmp.resolve("log"); val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "doctext", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("text"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream.schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val cmsStream = src
              .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
              .select(explode(SketchFunctions.cmsCoords(
                TextFunctions.tokenHash(col("tok")))).as("rb"))
              .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
              .agg(count(lit(1)).as("cnt"))
            val q = cmsStream.writeStream.outputMode("complete")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("overwrite").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            val cms = spark.read.parquet(log.toString)
            val top = Registry.table(spark, dir, "documents")
              .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
              .groupBy(col("tok"))
              .agg(count(lit(1)).as("n_exact"))
              .orderBy(col("n_exact").desc, col("tok"))
              .limit(20)
            top
              .select(col("tok"), col("n_exact"),
                explode(SketchFunctions.cmsCoords(
                  TextFunctions.tokenHash(col("tok")))).as("rb"))
              .select(col("tok"), col("n_exact"),
                col("rb.r").as("r"), col("rb.b").as("b"))
              .join(cms, Seq("r", "b"))
              .groupBy(col("tok"), col("n_exact"))
              .agg(min(col("cnt")).as("n_cms"))
              .withColumn("overestimate", col("n_cms") - col("n_exact"))
              .orderBy(col("n_exact").desc, col("tok"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some {
        import graft.functions.SketchFunctions.{P, cmsCoeffSql, cmsWidth}
        s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |h AS (SELECT tok,
        |  CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS th
        |  FROM t),
        |cms AS (SELECT c.r, (c.a * th + c.b) % $P % $cmsWidth AS b,
        |    count(*) AS cnt
        |  FROM h CROSS JOIN $cmsCoeffSql AS c(r, a, b)
        |  GROUP BY 1, 2),
        |top AS (SELECT tok, count(*) AS n_exact FROM t
        |  GROUP BY tok ORDER BY n_exact DESC, tok LIMIT 20),
        |probe AS (SELECT top.tok, top.n_exact, c.r,
        |    (c.a * CAST(concat('0x', substr(md5(top.tok), 1, 8)) AS BIGINT)
        |      + c.b) % $P % $cmsWidth AS b
        |  FROM top CROSS JOIN $cmsCoeffSql AS c(r, a, b))
        |SELECT probe.tok, probe.n_exact, min(cms.cnt) AS n_cms,
        |  min(cms.cnt) - probe.n_exact AS overestimate
        |FROM probe JOIN cms ON cms.r = probe.r AND cms.b = probe.b
        |GROUP BY probe.tok, probe.n_exact
        |ORDER BY probe.n_exact DESC, probe.tok""".stripMargin
      }),

    // STREAMING BLOOM MEMBERSHIP — t_bloom_contamination's streaming
    // twin, closing the batch+streaming pairing for every sketch
    // family (KMV: s38/s39, CMS: s40, bloom: here): the TRAIN side's
    // set-bit set grows as ingest chunks land — streaming distinct
    // state keyed by bit position, ≤ m = 65,536 slim rows no matter
    // the corpus — and at convergence the static test split screens
    // against it. Set bits only ever turn ON (bloom filters are
    // monotone), so arrival order is irrelevant and the converged
    // screen equals the batch row exactly — same oracle. At 100 TB
    // this is the incremental dedup pre-filter: the filter keeps
    // absorbing the feed without rebuilds.
    Entry("s41_stream_bloom_contamination",
      (spark, dir) => { import spark.implicits._
        import graft.functions.SketchFunctions
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_blm_")
          val log = tmp.resolve("log"); val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "doctext", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("text"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream.schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            def shingleHashes(df: DataFrame): DataFrame = df
              .withColumn("split", TextFunctions.splitAssign(col("doc_id")))
              .select(col("doc_id"), col("split"),
                TextFunctions.tokens(col("text")).as("toks"))
              .select(col("doc_id"), col("split"), explode(array_distinct(
                TextFunctions.shingles3FromTokens(col("toks")))).as("sh"))
              .select(col("doc_id"), col("split"),
                TextFunctions.tokenHash(col("sh")).as("th"))
            // train bits as streaming DISTINCT state (monotone: set
            // bits only turn on) — groupBy(pos).count in complete mode
            val bitsStream = shingleHashes(src.toDF())
              .filter(col("split") === "train")
              .select(explode(SketchFunctions.bloomPositions(col("th")))
                .as("pos"))
              .groupBy(col("pos")).agg(count(lit(1)).as("n"))
            val q = bitsStream.writeStream.outputMode("complete")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("overwrite").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            val bits = spark.read.parquet(log.toString)
              .select(col("pos")).withColumn("set", lit(1))
            val sh = shingleHashes(
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("text")))
            val test = sh.filter(col("split") === "test")
            val trainTh = sh.filter(col("split") === "train")
              .select(col("th")).distinct()
            val bloomHits = test
              .select(col("doc_id"), col("th"),
                explode(SketchFunctions.bloomPositions(col("th"))).as("pos"))
              .join(broadcast(bits), Seq("pos"), "left")
              .groupBy(col("doc_id"), col("th"))
              .agg((count(col("set")) === SketchFunctions.bloomK)
                .cast("int").as("hit"))
              .groupBy(col("doc_id"))
              .agg(count(lit(1)).as("n_shingles"),
                sum(col("hit")).as("n_bloom_hits"))
            val exactHits = test
              .join(trainTh.withColumn("intrain", lit(1)), Seq("th"), "left")
              .groupBy(col("doc_id"))
              .agg(count(col("intrain")).as("n_contaminated"))
            bloomHits.join(exactHits, Seq("doc_id"))
              .select(col("doc_id"), col("n_shingles"),
                col("n_contaminated"), col("n_bloom_hits"),
                (col("n_bloom_hits") - col("n_contaminated"))
                  .as("bloom_false_pos"))
              .orderBy(col("doc_id"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some {
        import graft.functions.SketchFunctions.{P, bloomCoeffSql, bloomK, bloomM}
        s"""WITH b AS (SELECT doc_id, text,
        |  ${TextFunctions.splitCaseSql(
             TextFunctions.splitBucketSql("doc_id"))} AS split
        |  FROM documents),
        |sh AS (SELECT doc_id, split,
        |  CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS th
        |  FROM (SELECT doc_id, split,
        |    unnest(list_distinct(${DedupOps.shinglesListSql})) AS sh
        |    FROM b WHERE split <> 'val')),
        |tr AS (SELECT DISTINCT th FROM sh WHERE split = 'train'),
        |bits AS (SELECT DISTINCT (c.a * th + c.b) % $P % $bloomM AS pos
        |  FROM tr CROSS JOIN $bloomCoeffSql AS c(r, a, b)),
        |te AS (SELECT doc_id, th FROM sh WHERE split = 'test'),
        |hits AS (SELECT doc_id, th,
        |    CASE WHEN count(bits.pos) = $bloomK THEN 1 ELSE 0 END AS hit
        |  FROM (SELECT te.doc_id, te.th,
        |          (c.a * te.th + c.b) % $P % $bloomM AS pos
        |        FROM te CROSS JOIN $bloomCoeffSql AS c(r, a, b)) p
        |  LEFT JOIN bits ON bits.pos = p.pos
        |  GROUP BY doc_id, th),
        |bl AS (SELECT doc_id, count(*) AS n_shingles,
        |    CAST(sum(hit) AS BIGINT) AS n_bloom_hits
        |  FROM hits GROUP BY doc_id),
        |ex AS (SELECT te.doc_id, count(tr.th) AS n_contaminated
        |  FROM te LEFT JOIN tr ON tr.th = te.th GROUP BY te.doc_id)
        |SELECT bl.doc_id, n_shingles, n_contaminated, n_bloom_hits,
        |  n_bloom_hits - n_contaminated AS bloom_false_pos
        |FROM bl JOIN ex ON ex.doc_id = bl.doc_id
        |ORDER BY bl.doc_id""".stripMargin
      }),

    // INCREMENTAL EXACT-SUBSTRING TRIM — dedup_substring_trim's
    // streaming twin, completing the Lee et al. pipeline incrementally
    // (s36 SCORES duplicated spans; this row CUTS them). Each arriving
    // document's k-token windows are fingerprinted scan-locally and
    // the per-gram window-start POSITIONS (not just counts — the trim
    // needs to know where a duplicated span sits) are upserted into
    // GRAM-keyed state. The removable-window rule — gram held by ≥2
    // distinct docs, and this doc is not the lowest-id holder — is a
    // pure function of the converged membership, so the trimmed corpus
    // derives as a projection over final state with zero retraction
    // machinery: a later doc repeating an earlier doc's span flips
    // that span removable for the LATER doc only (the first holder
    // keeps its copy), arrival-order-free by construction. The text
    // re-enters only at the final projection, joined back from the
    // static table by doc_id — state holds (gram, doc_id, positions)
    // rows, never the corpus, exactly the s24 slim-state /
    // re-fetch-payload-post-dedup pattern. Converges to the batch
    // dedup_substring_trim oracle bit-for-bit.
    Entry("s42_stream_substring_trim",
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_trim_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "doctext", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("text"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream.schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val k = DedupOps.substringGramLen
            // Per-distinct-gram position lists in ONE O(n log n) pass
            // over the SORTED (gram, pos) pairs (the cdcChunkCountRows
            // run-detection shape): run starts are where the gram
            // changes, a run's positions slice out contiguously and
            // ascending. Scan-local and LINEAR in document length —
            // replaces the filter-per-distinct-gram extraction that
            // rescanned the full window array once per distinct gram
            // (O(|windows| × |distinct grams|), quadratic on a
            // long-document ingest). Each staged array is a
            // materialized column consumed by reference (the
            // shingles3FromTokens inlining note).
            val gramRows = src
              .select(col("doc_id"),
                TextFunctions.tokens(col("text")).as("t"))
              .filter(size(col("t")) >= k)
              .select(col("doc_id"),
                transform(sequence(lit(1), size(col("t")) - (k - 1)),
                  i => struct(
                    md5(concat_ws(" ", slice(col("t"), i, lit(k)))).as("g"),
                    i.cast("long").as("p"))).as("gp"))
              .withColumn("sorted", array_sort(col("gp")))
              .withColumn("starts",
                filter(sequence(lit(1), size(col("sorted"))), i =>
                  (i === 1) ||
                    element_at(col("sorted"), i).getField("g") =!=
                      element_at(col("sorted"), i - 1).getField("g")))
              .select(col("doc_id"), explode(zip_with(
                col("starts"),
                concat(slice(col("starts"), lit(2), size(col("starts"))),
                  array(size(col("sorted")) + 1)),
                (s, nxt) => struct(
                  element_at(col("sorted"), s).getField("g").as("g"),
                  transform(sequence(s, nxt - 1), j =>
                    element_at(col("sorted"), j).getField("p"))
                    .as("ps")))).as("gp"))
              .select(col("gp.g").as("g"), col("doc_id"),
                col("gp.ps").as("ps"))
              .as[GramPosRow]
            val dd = VersionedStreamDedup.latestPerKeyId[GramPosRow](
              gramRows, _.g, _.doc_id.toString, _ => 0L)
            val q = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("key"))
            val members = raw
              .withColumn("max_seq", max(col("seq")).over(wMax))
              .filter(col("seq") === col("max_seq"))
              .select(col("key").as("g"), explode(col("xs")).as("x"))
              .select(col("g"), col("x.doc_id").as("doc_id"),
                col("x.ps").as("ps"))
            val gstat = members.groupBy(col("g"))
              .agg(count(lit(1)).as("nd"), min(col("doc_id")).as("mind"))
            val covered = members.join(gstat, "g")
              .filter(col("nd") >= 2 && col("doc_id") > col("mind"))
              .select(col("doc_id"), explode(col("ps")).as("i"))
              .select(col("doc_id"),
                explode(sequence(col("i"), col("i") + (k - 1))).as("p"))
              .groupBy(col("doc_id"))
              .agg(collect_set(col("p")).as("cov"))
            val toks = Registry.table(spark, dir, "documents")
              .select(col("doc_id"),
                TextFunctions.tokens(col("text")).as("t"))
            toks.join(covered, Seq("doc_id"), "left")
              .select(col("doc_id"), col("t"),
                coalesce(col("cov"), array().cast("array<long>")).as("cov"))
              .select(col("doc_id"),
                size(col("t")).cast("long").as("n_tokens"),
                filter(col("t"), (_, idx) =>
                  !array_contains(col("cov"), idx.cast("long") + 1L))
                  .as("kept"))
              .select(col("doc_id"), col("n_tokens"),
                size(col("kept")).cast("long").as("n_kept"),
                concat_ws(" ", col("kept")).as("trimmed_text"))
              .orderBy(col("doc_id"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(DedupOps.substringTrimOracleSql)),

    // STREAMING QUANTILE MONITORING — q_quantile_sketch's streaming
    // twin, closing the sketch family's streaming symmetry (KMV
    // s38/s39, CMS s40, Bloom s41, priority sample here): the per-type
    // bottom-k-by-hash value sample ([[graft.functions
    // .PrioritySampleAgg]]) is engine-managed streaming-agg state
    // (≤ k (hash, value) pairs per event type, never the stream), so
    // p50/p90/p99 latency-style monitoring is maintained incrementally
    // with no custom state code. Because the sample is a pure function
    // of the row SET, the converged streamed quantiles equal the batch
    // row's bit-for-bit — arrival order, microbatch boundaries, and
    // merge trees all cancel — and the DuckDB oracle re-derives them.
    // At 100 TB this is the live p99 dashboard from 2 KB per group.
    Entry("s43_stream_quantile_sketch",
      (spark, dir) => {
        import graft.functions.{PrioritySample, TextFunctions}
        runFileStream(spark, dir, mode = "complete") { src =>
          src().toDF()
            .select(col("event_type"), col("value"),
              TextFunctions.fingerprint64(col("event_id").cast("string"))
                .as("h"))
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n_events"),
              PrioritySample.sample(col("h"), col("value")).as("xs"))
            .withColumn("sxs", array_sort(col("xs")))
            .select(col("event_type"), col("n_events"),
              size(col("sxs")).cast("long").as("n_sample"),
              PrioritySample.discQuantile(col("sxs"), 0.5).as("p50_sketch"),
              PrioritySample.discQuantile(col("sxs"), 0.9).as("p90_sketch"),
              PrioritySample.discQuantile(col("sxs"), 0.99).as("p99_sketch"))
        }(_.orderBy(col("event_type")))
      },
      Some {
        import graft.functions.PrioritySample
        val fp = TextFunctions.fp64Sql("CAST(event_id AS VARCHAR)")
        s"""WITH th AS (SELECT event_type, value, $fp AS h FROM events),
        |s AS ${PrioritySample.oracleSampleSql("th", "event_type", "h", "value")},
        |ex AS (SELECT event_type, count(*) AS n_events FROM events
        |  GROUP BY event_type)
        |SELECT ex.event_type, ex.n_events,
        |  CAST(len(s.xs) AS BIGINT) AS n_sample,
        |  ${PrioritySample.discQuantileSql("s.xs", 0.5)} AS p50_sketch,
        |  ${PrioritySample.discQuantileSql("s.xs", 0.9)} AS p90_sketch,
        |  ${PrioritySample.discQuantileSql("s.xs", 0.99)} AS p99_sketch
        |FROM s JOIN ex USING (event_type)
        |ORDER BY event_type""".stripMargin
      }),

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
            val in = kmeansIngestChunks(spark, dir)
            val cent = VectorOps.ivfSeedCentroids(spark, dir)
              .localCheckpoint()
            val q1 = startIvfAssignStream(spark, in.toString, cent,
              ckpt1, relay)
            java.nio.file.Files.createDirectories(relay)
            val q2 = startIvfMembershipStream(spark, relay, ckpt2, log)
            try {
              q1.processAllAvailable()
              q2.processAllAvailable()
            } finally {
              try q1.stop() finally q2.stop()
            }
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
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
              .writeStream.outputMode("append")
              .option("checkpointLocation", ckpt1.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                VectorOps.pqEncode(spark,
                    df.select(col("vec_id"), col("e")), cb)
                  .write.mode("append").parquet(relay.toString)
                ()
              }.start()
            java.nio.file.Files.createDirectories(relay)
            val codesIn = spark.readStream
              .schema("vec_id BIGINT, s INT, code BIGINT")
              .option("maxFilesPerTrigger", streamShufflePartitions.toString)
              .option("pathGlobFilter", "part-*")
              .parquet(relay.toString).as[PqCodeRow]
            val dd = VersionedStreamDedup.latestPerKeyId[PqCodeRow](
              codesIn, _.vec_id.toString, _.s.toString, _ => 0L)
            val q2 = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt2.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try {
              q1.processAllAvailable()
              q2.processAllAvailable()
            } finally {
              try q1.stop() finally q2.stop()
            }
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

    // STREAMING CONNECTED COMPONENTS — the dedup graph maintained
    // incrementally, closing the one dedup-family member without a
    // streamed twin: near-dup candidate edges arrive in chunks and
    // merge into a label FOREST (doc → component) held as the state
    // table — incremental union-find semantics, distributed. Each
    // microbatch contracts (current star edges ∪ new edges) back to a
    // star forest via the same min-label propagation the batch row
    // runs (GraphTools.connectedComponents); because the carried
    // stars are depth-1, the per-batch round count is bounded by the
    // NEW edges' diameter after contraction, not the accumulated
    // graph's — the streaming analog of path compression. The union
    // of connectivity is order-insensitive and the fixpoint (min
    // reachable id) unique, so arrival order cannot change the
    // result; the converged labels serve the exact batch kept-corpus
    // tail, hash-matching the dedup_canonical oracle. At 100 TB the
    // state is two longs per clustered doc (docs with no near-dup
    // never enter it) and per-batch work is proportional to touched
    // components — in COMPUTE (only touched components re-contract)
    // AND in WRITE (the snapshot is label-bucketed; only touched
    // buckets are rewritten, untouched buckets carry over as
    // hardlinks). The forest is RESTART-SAFE: each batch commits an
    // atomically-renamed _SUCCESS-gated snapshot (the compacted state
    // table a production deployment keeps in Delta) and recovery
    // seeds the fold from the latest committed one —
    // StreamCcRecoverySpec drives stop/restart, the partial-write
    // fallback, and the untouched-bucket byte-identity.
    Entry("s62_stream_dedup_clusters",
      (spark, dir) => withStreamConf(spark) {
        val tmp = java.nio.file.Files.createTempDirectory("graft_cc_")
        val ckpt = tmp.resolve("ckpt")
        val state = tmp.resolve("state")
        try {
          val in = sharedChunkDir(dir, "duppairs", "documents") { p =>
            DedupOps.jaccardPairs(spark, dir)
              .select(col("d1"), col("d2"))
              .repartitionByRange(chunks, col("d1"))
              .write.parquet(p.toString)
          }
          val q = incrementalCcQuery(spark, in.toString,
            ckpt.toString, state.toString)
          try q.processAllAvailable() finally q.stop()
          DedupOps.canonicalFrom(spark, dir,
              loadStarForest(spark, state.toString)
                .select(col("d1").as("doc_id"), col("d2").as("cluster_id")))
            .localCheckpoint()
        } finally deleteRecursively(tmp)
      },
      Some(DedupOps.canonicalOracleSql)),

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
              .option("maxFilesPerTrigger", "1")
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
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(streamShufflePartitions.toInt, col("key"))
                  .write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
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
          val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "doctext", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("text"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream
              .schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val counts = TextOps.bpePreTokens(src)
              .groupBy(col("w"))
              .agg(count(lit(1)).as("cnt"))
            val q = counts.writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, bid: Long) =>
                df.withColumn("bid", lit(bid))
                  .repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            // converged vocabulary = each word's LAST emitted count
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("w"))
            val converged = raw
              .withColumn("max_bid", max(col("bid")).over(wMax))
              .filter(col("bid") === col("max_bid"))
              .select(col("w"), col("cnt"))
            TextOps.bpeTrainFromCounts(spark, converged.localCheckpoint())
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(TextOps.bpeTrainSharedOracleSql)),

    // STREAMED K-MEANS SUFFICIENT STATISTICS — the last trained
    // statistic without a streamed twin: Lloyd's M-step needs only
    // per-(cell, dim) (Σv, n), a pure sum, so arriving vectors assign
    // to the broadcast seed centroids SCAN-LOCALLY in their
    // microbatch (the exact batch assignment — rounded cosine,
    // lower-cid argmax) and fan out to slim (cell, pos, v) rows whose
    // native streaming aggregation IS the training-set state
    // (16 cells × 64 dims of (sum, count) regardless of corpus
    // size — the s47 moment-matrix argument applied to k-means). The
    // converged stats produce the round-1 centroids exactly as the
    // batch updateCentroids does (round(Σv/n, 6) per component) and
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
          // SERVE: the final assignment against the streamed-trained
          // round-1 centroids (the batch v_kmeans_assign tail)
          graft.core.VectorTools.assignCells(
              VectorOps.embSlim(spark, dir)
                .select(col("vec_id").as("id"), col("e")),
              streamedLloydRound(spark, in, cent))
            .select(col("id").as("vec_id"), col("cell"), col("csim"))
            .orderBy(col("vec_id"))
            .localCheckpoint()
        }
      },
      Some(VectorOps.kmeansAssignOracleSql)),

    // STREAMED FULL LLOYD TRAJECTORY — s65's sufficient-statistics
    // pass RE-SEEDED per round (the s64 merge-round discipline applied
    // to Lloyd): round r replays the embedding chunks through a fresh
    // streaming pass whose scan-local assignment broadcasts round
    // r-1's streamed-trained centroids, maintains the per-(cell, dim)
    // (Σv, n) state, and hands its round(Σv/n, 6) centroids to round
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
          var cent = VectorOps.ivfSeedCentroids(spark, dir)
            .select(col("cid"), col("ce")).localCheckpoint()
          for (_ <- 1 to 3)
            cent = streamedLloydRound(spark, in, cent)
          graft.core.VectorTools.assignCells(
              VectorOps.embSlim(spark, dir)
                .select(col("vec_id").as("id"), col("e")),
              cent)
            .select(col("id").as("vec_id"), col("cell"), col("csim"))
            .orderBy(col("vec_id"))
            .localCheckpoint()
        }
      },
      Some(VectorOps.kmeansLloyd3OracleSql)),

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
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_afeat_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "docid", "documents") { p =>
              Registry.table(spark, dir, "documents").select(col("doc_id"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream.schema("doc_id BIGINT")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val featRows = src
              .withColumn("payload",
                graft.multimodal.MultimodalPipeline.encodeWav(col("doc_id")))
              .select(col("doc_id"),
                graft.multimodal.MultimodalPipeline
                  .poolWav(col("payload"), 16).as("f"))
              .as[MediaFeatRow]
            val dd = VersionedStreamDedup.latestPerKeyId[MediaFeatRow](
              featRows, _.doc_id.toString, _ => "f", _ => 0L)
            val q = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("key"))
            val feats = raw
              .withColumn("max_seq", max(col("seq")).over(wMax))
              .filter(col("seq") === col("max_seq"))
              .select(explode(col("xs")).as("x"))
              .select(col("x.doc_id").as("doc_id"), col("x.f").as("f"))
            MultimodalOps.mediaTopkFrom(feats)
              .orderBy(col("query_id"), col("rank"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(MultimodalOps.audioTopkOracleSql)),

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
              .option("maxFilesPerTrigger", "1")
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
                df.withColumn("bid", lit(bid))
                  .repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
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

    // EVENT-TIME TTL TIMERS, ACTUALLY FIRING — the one TTL behavior no
    // other driver row exercises end-to-end (s14/s17/s18/s22 size the
    // TTL beyond the replay horizon, so their timers arm but never
    // fire). The purchase stream is replayed in six TIME-ORDERED
    // chunks (one file = one microbatch, mtime-ordered — the
    // runAppendReplay listing trick), keyed by user under a TTL of
    // 1/32 of the event-time span (~22 h of the 30-day corpus): a user
    // idle while the watermark advances past last-activity + TTL is
    // RETIRED mid-replay, emitting a TOMBSTONE (empty xs, the
    // retraction a downstream copy needs), and a later purchase
    // rebuilds the key from scratch — so the converged view excludes
    // everything the user did before a long gap. A final sentinel file
    // (ets pinned to the global max, so the watermark never moves past
    // the last real batch's frontier — no nondeterministic extra
    // firings) fires the remaining timers in a guaranteed data batch:
    // users idle at end-of-replay are tombstoned entirely. Because
    // chunks are time-ordered and timers are pure watermark functions,
    // the full firing schedule is deterministic, and the oracle
    // replays it in SQL: per-chunk watermark table → per-(user, chunk)
    // timer anchor → retirement between consecutive active chunks iff
    // the last pre-rebuild watermark passed the timer → survivors =
    // events after the user's last retirement, keys retired at the
    // end excluded. Converged readback orders by SINK BATCH ID (seq
    // restarts at 1 on rebuild, so per-key seq alone cannot order
    // pre/post-retirement emissions). At 100 TB this is the state
    //-bounding contract: state holds only watermark-active keys, and
    // the tombstone stream is the change feed that keeps downstream
    // materializations consistent with the retirements.
    Entry("s45_stream_ttl_retirement",
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_ttlr_")
          val in = tmp.resolve("in")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            java.nio.file.Files.createDirectories(in)
            val ev = Registry.table(spark, dir, "events")
              .filter(col("event_type") === "purchase")
              .select(col("user_id"), col("event_id"),
                expr("unix_micros(ts)").as("ts_us"))
            val bounds = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
            val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
            val nCh = 6
            val ttlMs = (mx / 1000 - mn / 1000) / 32
            val chunked = ev.withColumn("c", expr(
              s"least(${nCh - 1}, ((ts_us - ${mn}L) * $nCh) div ${mx - mn + 1}L)"))
              .localCheckpoint()
            // one file per time-ordered chunk + the sentinel, with
            // strictly increasing mtimes so the file source replays
            // them in event-time order (batch = chunk)
            val base = System.currentTimeMillis() - 3600000L
            def writeChunk(df: DataFrame, idx: Int): Unit = {
              val stage = tmp.resolve(s"stage$idx")
              df.coalesce(1).write.parquet(stage.toString)
              import scala.jdk.CollectionConverters._
              val part = java.nio.file.Files.list(stage).iterator().asScala
                .find(_.getFileName.toString.startsWith("part-")).get
              val dst = in.resolve(f"chunk$idx%02d.parquet")
              java.nio.file.Files.move(part, dst)
              java.nio.file.Files.setLastModifiedTime(dst,
                java.nio.file.attribute.FileTime.fromMillis(
                  base + idx * 10000L))
            }
            for (c <- 0 until nCh)
              writeChunk(chunked.filter(col("c") === c)
                .select(col("user_id"), col("event_id"), col("ts_us")), c)
            writeChunk(Seq(TtlEv(-1L, -1L, mx)).toDF(), nCh)
            val src = spark.readStream
              .schema("user_id BIGINT, event_id BIGINT, ts_us BIGINT")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "chunk*")
              .parquet(in.toString).as[TtlEv]
            val dd = VersionedStreamDedup.latestPerKeyIdWithEventTimeTtl[TtlEv](
              src, _.user_id.toString, _.event_id.toString, _.ts_us,
              _.ts_us / 1000, ttlMs)
            val q = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, bid: Long) =>
                df.withColumn("bid", lit(bid))
                  .repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("key"))
            raw
              .withColumn("max_bid", max(col("bid")).over(wMax))
              .filter(col("bid") === col("max_bid"))
              .filter(size(col("xs")) > 0) // end-retired keys: tombstoned
              .select(col("key").cast("long").as("user_id"),
                explode(col("xs")).as("x"))
              .filter(col("user_id") >= 0) // drop the sentinel key
              .select(col("user_id"), col("x.event_id").as("event_id"),
                col("x.ts_us").as("ts_us"))
              .orderBy(col("user_id"), col("event_id"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'purchase'),
        |mm AS (SELECT min(ts_us) AS mn, max(ts_us) AS mx FROM ev),
        |prm AS (SELECT mn, mx,
        |  ((mx // 1000) - (mn // 1000)) // 32 AS ttl,
        |  (mx // 1000) - 10000 AS wfire FROM mm),
        |ch AS (SELECT e.*, e.ts_us // 1000 AS ts_ms,
        |  LEAST(5, ((e.ts_us - mm.mn) * 6) // (mm.mx - mm.mn + 1)) AS c
        |  FROM ev e, mm),
        |cmx AS (SELECT c, max(ts_ms) AS cmax FROM ch GROUP BY c),
        |wt AS (SELECT g.c,
        |  CASE WHEN g.c = 0 THEN 0
        |       ELSE (SELECT max(cmax) FROM cmx WHERE cmx.c < g.c) - 10000
        |  END AS w
        |  FROM (SELECT unnest(generate_series(0, 5)) AS c) g),
        |kb AS (SELECT user_id, c, max(ts_ms) AS kmax FROM ch GROUP BY 1, 2),
        |anc AS (SELECT kb.user_id, kb.c,
        |  GREATEST(wt.w, kb.kmax) + prm.ttl AS timer,
        |  lead(kb.c) OVER (PARTITION BY kb.user_id ORDER BY kb.c) AS nc
        |  FROM kb JOIN wt USING (c), prm),
        |ret AS (SELECT a.user_id, a.c, a.nc,
        |  CASE WHEN a.nc IS NULL THEN prm.wfire > a.timer
        |       ELSE (SELECT w FROM wt WHERE wt.c = a.nc - 1) > a.timer
        |  END AS retired
        |  FROM anc a, prm),
        |dead AS (SELECT user_id FROM ret WHERE nc IS NULL AND retired),
        |cut AS (SELECT user_id,
        |  max(CASE WHEN retired AND nc IS NOT NULL THEN c ELSE -1 END) AS cutc
        |  FROM ret GROUP BY user_id)
        |SELECT ch.user_id, ch.event_id, ch.ts_us
        |FROM ch JOIN cut USING (user_id)
        |WHERE ch.c > cut.cutc
        |  AND ch.user_id NOT IN (SELECT user_id FROM dead)
        |ORDER BY user_id, event_id""".stripMargin)),

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
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val codeRows = VectorOps.signPackedFrom(src).as[SignCodeRow]
            val dd = VersionedStreamDedup.latestPerKeyId[SignCodeRow](
              codeRows, _.vec_id.toString, _ => "c", _ => 0L)
            val q = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
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

    // STREAMING DOMAIN MIX — the data-mixture decision maintained
    // incrementally: per-language corpus counts are a pure sum, so
    // Spark's NATIVE streaming aggregation holds them (the s47
    // zero-custom-state argument, applied to the mixing statistic —
    // state is ≤5 rows regardless of corpus size), and the CONVERGED
    // counts drive the exact batch quota chain (capacity → per-domain
    // md5 threshold → selection), hash-matching the t_domain_mix
    // oracle. At 100 TB this is how a live ingest keeps its mixture
    // current: counts update as documents land, re-deriving quotas is
    // arithmetic on a 5-row table, and the selection predicate stays
    // a deterministic per-doc hash test — no resampling pass over
    // what's already ingested.
    Entry("s54_stream_domain_mix",
      (spark, dir) => {
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_dmix_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "doclang", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("lang"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream
              .schema("doc_id BIGINT, lang STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val counts = src.groupBy(col("lang"))
              .agg(count(lit(1)).as("c"))
            val q = counts.writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, bid: Long) =>
                df.withColumn("bid", lit(bid))
                  .repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            // converged counts = each language's LAST emitted running sum
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("lang"))
            val converged = raw
              .withColumn("max_bid", max(col("bid")).over(wMax))
              .filter(col("bid") === col("max_bid"))
              .select(col("lang"), col("c"))
            TextOps.domainMixFrom(spark, dir,
                converged.localCheckpoint())
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(TextOps.domainMixOracleSql)),

    // STREAMING LM TRAINING → QUALITY FILTER — the perplexity filter's
    // MODEL maintained incrementally: unigram counts are a pure sum,
    // so native streaming aggregation holds the (tok, cnt) vocabulary
    // as documents arrive (state is vocabulary-sized — bounded by the
    // language, not the corpus; the corpus total derives from the
    // model itself, Σcnt), and the CONVERGED model drives the exact
    // batch banding tail, hash-matching the t_perplexity_filter
    // oracle. The fourth trained statistic with a streamed twin (IVF
    // s25/s44, PQ s46, PCA s47, mixture s54 — now the CCNet filter
    // LM): at 100 TB the quality model retrains continuously as the
    // crawl lands, and re-banding the corpus is a re-run of the
    // scoring pass against a model that is already current.
    Entry("s55_stream_lm_filter",
      (spark, dir) => {
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_lmf_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "doctext", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("text"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream
              .schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val vocab = src
              .select(explode(
                graft.functions.TextFunctions.tokens(col("text")))
                .as("tok"))
              .groupBy(col("tok"))
              .agg(count(lit(1)).as("cnt"))
            val q = vocab.writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, bid: Long) =>
                df.withColumn("bid", lit(bid))
                  .repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            // converged model = each token's LAST emitted running count
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("tok"))
            val converged = raw
              .withColumn("max_bid", max(col("bid")).over(wMax))
              .filter(col("bid") === col("max_bid"))
              .select(col("tok"), col("cnt"))
            TextOps.perplexityBandsFrom(spark, dir,
                converged.localCheckpoint())
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(TextOps.perplexityBandsOracleSql)),

    // STREAMING SOURCE REPUTATION — the coarse curation statistic
    // maintained incrementally: per-source (n_docs, q_sum, sum_ids)
    // is a pure sum over scan-side fixed-point doc qualities, so
    // Spark's NATIVE streaming aggregation holds it (the s54/s55
    // shape — state is one row per source, ~20 rows regardless of
    // corpus size), and the CONVERGED stats drive the exact batch
    // keep rule (corpus-total broadcast + integer cross-multiply),
    // hash-matching the t_source_filter oracle. At 100 TB this is how
    // a live crawl keeps source reputations current: qualities
    // quantize where the documents land, ~20 rows of state update per
    // microbatch, and re-deciding which sources pass the bar is
    // arithmetic on that table — never a re-scan of what's ingested.
    Entry("s56_stream_source_filter",
      (spark, dir) => {
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_srcf_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "docsrc", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("source"), col("text"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream
              .schema("doc_id BIGINT, source STRING, text STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val per = TextOps.sourceQmicro(src)
              .groupBy(col("source"))
              .agg(count(lit(1)).as("n_docs"),
                sum(col("qmicro")).as("q_sum"),
                sum(col("doc_id")).as("sum_ids"))
            val q = per.writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, bid: Long) =>
                df.withColumn("bid", lit(bid))
                  .repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            // converged stats = each source's LAST emitted running sums
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("source"))
            val converged = raw
              .withColumn("max_bid", max(col("bid")).over(wMax))
              .filter(col("bid") === col("max_bid"))
              .select(col("source"), col("n_docs"), col("q_sum"),
                col("sum_ids"))
            TextOps.sourceFilterFrom(converged.localCheckpoint())
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(TextOps.sourceFilterOracleSql)),

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
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_scut_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "docid", "documents") { p =>
              Registry.table(spark, dir, "documents").select(col("doc_id"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream.schema("doc_id BIGINT")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val statRows = MultimodalOps.videoFrameStats(src)
              .as[FrameStatRow]
            val dd = VersionedStreamDedup.latestPerKeyId[FrameStatRow](
              statRows, _.doc_id.toString, _.frame_idx.toString, _ => 0L)
            val q = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
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
            MultimodalOps.sceneCutFrom(stats.localCheckpoint())
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
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
      (spark, dir) => { import spark.implicits._
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_vserve_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "docid", "documents") { p =>
              Registry.table(spark, dir, "documents").select(col("doc_id"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream.schema("doc_id BIGINT")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val statRows = MultimodalOps.videoFrameStats(src)
              .as[FrameStatRow]
            val dd = VersionedStreamDedup.latestPerKeyId[FrameStatRow](
              statRows, _.doc_id.toString, _.frame_idx.toString, _ => 0L)
            val q = dd.toDF().writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, _: Long) =>
                df.repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
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
            MultimodalOps.videoTopkFrom(stats.localCheckpoint())
              .orderBy(col("query_id"), col("rank"))
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(MultimodalOps.videoTopkOracleSql)),

    // STREAMING TEMPERATURE MIXING — s54's incremental-mixture proof
    // for the α = 0.5 rebalancing rule: the SAME ≤5-row per-language
    // count state (native streaming aggregation, pure sums), with the
    // converged counts driving the temperature quota chain instead —
    // w = floor(sqrt(count)) stays integer-exact on the streamed
    // counts, so the whole capacity → threshold → md5-selection tail
    // hash-matches the t_domain_mix_temp oracle. Both mixing rules a
    // pretraining pipeline runs (proportional and temperature-scaled)
    // now re-derive live from one maintained count table; switching α
    // at 100 TB is arithmetic on 5 rows, not a corpus pass.
    Entry("s59_stream_temp_mix",
      (spark, dir) => {
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_tmix_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "doclang", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("lang"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream
              .schema("doc_id BIGINT, lang STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val counts = src.groupBy(col("lang"))
              .agg(count(lit(1)).as("c"))
            val q = counts.writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, bid: Long) =>
                df.withColumn("bid", lit(bid))
                  .repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("lang"))
            val converged = raw
              .withColumn("max_bid", max(col("bid")).over(wMax))
              .filter(col("bid") === col("max_bid"))
              .select(col("lang"), col("c"))
            TextOps.tempMixFrom(spark, dir, converged.localCheckpoint())
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(TextOps.tempMixOracleSql)),

    // STREAMING DF MODEL → TF-IDF KEYWORDS — the retrieval-side
    // trained statistic maintained incrementally: document frequency
    // is a pure sum over per-doc DISTINCT tokens, and distinctness is
    // established SCAN-LOCALLY in the microbatch (per-doc
    // array_distinct — each document arrives exactly once, so its df
    // contribution is complete at ingest; no stateful dedup, no
    // second aggregation), with the corpus size riding INSIDE the
    // model as a per-doc sentinel token's count (multiple streaming
    // aggregations are unsupported — the s55 Σcnt trick applied to
    // document counting). The converged (tok, df) state drives the
    // exact batch BM25-ish scoring + per-doc top-5 tail,
    // hash-matching the t_tfidf_top oracle. At 100 TB this is a live
    // keyword/retrieval index's idf side: the model updates as
    // documents land, and re-scoring is a re-run of the tf pass
    // against a model that is already current.
    Entry("s60_stream_tfidf_model",
      (spark, dir) => {
        withStreamConf(spark) {
          val tmp = java.nio.file.Files.createTempDirectory("graft_tfidf_")
          val log = tmp.resolve("log")
          val ckpt = tmp.resolve("ckpt")
          try {
            val in = sharedChunkDir(dir, "doctext", "documents") { p =>
              Registry.table(spark, dir, "documents")
                .select(col("doc_id"), col("text"))
                .repartitionByRange(chunks, col("doc_id"))
                .write.parquet(p.toString)
            }
            val src = spark.readStream
              .schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "part-*")
              .parquet(in.toString)
            val model = TextOps.tfidfDocTokens(src)
              .groupBy(col("tok"))
              .agg(count(lit(1)).as("df"))
            val q = model.writeStream.outputMode("update")
              .option("checkpointLocation", ckpt.toString)
              .foreachBatch { (df: DataFrame, bid: Long) =>
                df.withColumn("bid", lit(bid))
                  .repartition(1).write.mode("append").parquet(log.toString)
                ()
              }.start()
            try q.processAllAvailable() finally q.stop()
            // converged model = each token's LAST emitted running df
            val raw = spark.read.parquet(log.toString)
            val wMax = Window.partitionBy(col("tok"))
            val converged = raw
              .withColumn("max_bid", max(col("bid")).over(wMax))
              .filter(col("bid") === col("max_bid"))
              .select(col("tok"), col("df"))
            TextOps.tfidfTopFrom(spark, dir,
                converged.localCheckpoint())
              .localCheckpoint()
          } finally deleteRecursively(tmp)
        }
      },
      Some(TextOps.tfidfTopOracleSql))
  )

  /** Bucket count of the star-forest snapshot layout: component labels
    * hash into `pmod(label, ccForestBuckets)` directory partitions so a
    * microbatch REWRITES ONLY the buckets whose components it touched
    * (all rows of a component share its label, hence its bucket). 16 is
    * sized to the test corpus; at 100 TB this is thousands — the knob
    * trades per-bucket file size against rewrite amplification from
    * untouched components sharing a touched bucket. Must stay stable
    * across restarts: it is baked into the committed snapshot layout. */
  private[graft] val ccForestBuckets = 16

  /** Immediate children of `root`, with the listing stream CLOSED
    * (an unclosed Files.list leaks a directory fd per call — this is
    * invoked every microbatch of the s62 stream). */
  private def listDir(root: java.nio.file.Path): Seq[java.nio.file.Path] =
    if (!java.nio.file.Files.isDirectory(root)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(root)
      try s.iterator().asScala.toVector finally s.close()
    }

  private def isSnapshotName(n: String): Boolean =
    n.length > 1 && n.startsWith("b") && n.drop(1).forall(_.isDigit)

  /** The latest COMMITTED star-forest snapshot dir under `stateDir`
    * (highest b<bid> carrying a _SUCCESS marker), if any. Partial
    * writes — `.stage_b*` dirs or a b<bid> without the marker — are
    * never selected, so recovery always seeds from a complete forest. */
  private[graft] def latestCommittedForest(
      stateDir: String): Option[java.nio.file.Path] =
    listDir(java.nio.file.Paths.get(stateDir))
      .filter { p =>
        isSnapshotName(p.getFileName.toString) &&
          java.nio.file.Files.exists(p.resolve("_SUCCESS"))
      }
      .sortBy(_.getFileName.toString.drop(1).toLong).lastOption

  /** The committed snapshot's label-bucketed forest with its `bucket`
    * partition column (for partition-pruned touched-bucket reads), or
    * None when no committed snapshot with data exists. */
  private def loadBucketedForest(spark: SparkSession,
                                 stateDir: String): Option[DataFrame] =
    latestCommittedForest(stateDir)
      .filter(p => listDir(p)
        .exists(_.getFileName.toString.startsWith("bucket=")))
      .map(p => spark.read.parquet(p.toString))

  /** The latest committed star forest as (d1 = doc, d2 = component
    * label), or the empty forest. */
  private[graft] def loadStarForest(spark: SparkSession,
                                    stateDir: String): DataFrame =
    loadBucketedForest(spark, stateDir)
      .map(_.select(col("d1"), col("d2")))
      .getOrElse(spark.range(0)
        .select(col("id").as("d1"), col("id").as("d2")))

  /** s62's incremental connected-components engine, RESTART-SAFE and
    * TOUCHED-BUCKET INCREMENTAL: edges stream from `edgesDir`; each
    * microbatch re-contracts ONLY the components its edges touch (via
    * the batch min-label propagation) and commits a label-bucketed
    * parquet snapshot under `stateDir/b<bid>` in which only touched
    * buckets are rewritten — untouched buckets are HARDLINKED from the
    * previous committed snapshot, so their files are byte-identical
    * (same inodes) and per-batch write work is proportional to touched
    * components, not accumulated state. (Hardlinks are the local-FS
    * analog of a Delta/manifest commit that references unchanged files;
    * a production deployment keeps this table in Delta and this commit
    * step IS that transaction.) The snapshot is assembled in a
    * `.stage_b<bid>` sibling and atomically renamed into place with its
    * _SUCCESS marker inside, so recovery (latest b<bid> WITH _SUCCESS)
    * can never observe a partial multi-bucket write. On restart the
    * latest committed forest seeds the fold — driver loss cannot lose
    * accumulated connectivity — and a foreachBatch re-delivery of an
    * already-committed bid is detected by its marker and skipped
    * (connectivity union is idempotent anyway; the skip just avoids
    * the rewrite). StreamCcRecoverySpec drives stop/restart, the
    * partial-write fallback, and the untouched-bucket byte-identity. */
  private[graft] def incrementalCcQuery(spark: SparkSession,
      edgesDir: String, ckpt: String, stateDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema("d1 BIGINT, d2 BIGINT")
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "part-*")
      .parquet(edgesDir)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        applyCcBatch(df.sparkSession, df, bid, stateDir)
        ()
      }.start()

  /** One microbatch of the incremental CC engine (see
    * [[incrementalCcQuery]]). The only driver-resident values are the
    * touched BUCKET ids (≤ 2·ccForestBuckets ints after distinct —
    * bounded by the layout constant, never by data). */
  private[graft] def applyCcBatch(spark: SparkSession, newEdges: DataFrame,
                                  bid: Long, stateDir: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = Paths.get(stateDir)
    Files.createDirectories(root)
    val bdir = root.resolve(s"b$bid")
    // exactly-once: a committed b<bid> already contains this batch's
    // edges (the marker is written before the checkpoint advances), so
    // a post-crash re-delivery only needs to re-prune
    if (Files.exists(bdir.resolve("_SUCCESS"))) {
      pruneStarForest(stateDir, bid); return
    }
    val bucketOf = pmod(col("d2"), lit(ccForestBuckets.toLong)).cast("int")
    val forest = loadBucketedForest(spark, stateDir) // (d1, d2, bucket)
    val edges = newEdges.select(col("d1"), col("d2")).localCheckpoint()
    // current labels of the batch's endpoints: a broadcast-hash probe of
    // the forest (no state shuffle; one scan — a production Delta table
    // would add a doc-keyed secondary index / file-level bloom to prune
    // this lookup too). Endpoints per batch are small by construction.
    val endpoints = edges.select(col("d1").as("ep"))
      .unionAll(edges.select(col("d2").as("ep"))).distinct()
    val touchedLabels = forest match {
      case Some(f) => f.join(broadcast(endpoints), f("d1") === col("ep"))
        .select(f("d2").as("lab")).distinct().localCheckpoint()
      case None => spark.range(0).select(col("id").as("lab"))
    }
    val labelBuckets = touchedLabels
      .select(pmod(col("lab"), lit(ccForestBuckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    // rows of the touched components only — partition-pruned to their
    // label buckets, then semi-joined on the (small) touched label set
    val touchedRows = forest match {
      case Some(f) => f
        .filter(col("bucket").isin(labelBuckets.toSeq: _*))
        .join(broadcast(touchedLabels), col("d2") === col("lab"), "left_semi")
        .select(col("d1"), col("d2"))
      case None => spark.range(0)
        .select(col("id").as("d1"), col("id").as("d2"))
    }
    // contract (new edges ∪ touched stars) back to depth-1 stars: the
    // carried rows are depth-1, so rounds track the NEW edges'
    // post-contraction diameter, not the accumulated graph's.
    // connectedComponents materializes eagerly (localCheckpoint), so
    // every read of the old snapshot completes before any mutation.
    val newStars = graft.core.GraphTools
      .connectedComponents(edges.unionAll(touchedRows), "d1", "d2")
      .select(col("id").as("d1"), col("component").as("d2"))
      .localCheckpoint()
    val starBuckets = newStars.select(bucketOf.as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val touched = labelBuckets ++ starBuckets
    // stage the new snapshot: touched buckets = survivors (rows of
    // UNtouched components that share a touched bucket) + the new stars
    val stage = root.resolve(s".stage_b$bid")
    if (Files.exists(stage)) deleteRecursively(stage)
    val survivors = forest match {
      case Some(f) => f
        .filter(col("bucket").isin(touched.toSeq: _*))
        .join(broadcast(touchedLabels), col("d2") === col("lab"), "left_anti")
        .select(col("d1"), col("d2"))
      case None => spark.range(0)
        .select(col("id").as("d1"), col("id").as("d2"))
    }
    survivors.unionAll(newStars)
      .withColumn("bucket", bucketOf)
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(stage.toString)
    // untouched buckets carry over as hardlinks from the previous
    // committed snapshot (same inode — zero copy, byte-identical)
    latestCommittedForest(stateDir).foreach { prev =>
      listDir(prev)
        .filter(_.getFileName.toString.startsWith("bucket="))
        .foreach { bk =>
          val k = bk.getFileName.toString.stripPrefix("bucket=").toInt
          if (!touched(k)) {
            val dst = stage.resolve(bk.getFileName.toString)
            Files.createDirectories(dst)
            listDir(bk).filter(Files.isRegularFile(_)).foreach { f =>
              Files.createLink(dst.resolve(f.getFileName.toString), f)
            }
          }
        }
    }
    // commit: the marker rides INSIDE the staged dir (Spark's committer
    // wrote it; create it defensively if not), and the rename is the
    // atomic commit point — a crash anywhere before it leaves only a
    // `.stage_*` dir that recovery ignores
    if (!Files.exists(stage.resolve("_SUCCESS")))
      Files.createFile(stage.resolve("_SUCCESS"))
    if (Files.exists(bdir)) deleteRecursively(bdir) // uncommitted remnant
    Files.move(stage, bdir, StandardCopyOption.ATOMIC_MOVE)
    pruneStarForest(stateDir, bid)
  }

  /** Drop everything under `stateDir` except the just-committed
    * b<keepBid> — superseded committed snapshots (their hardlinked
    * inodes live on in the new snapshot), uncommitted b* remnants, and
    * stale stage dirs. State stays one snapshot deep. */
  private def pruneStarForest(stateDir: String, keepBid: Long): Unit =
    listDir(java.nio.file.Paths.get(stateDir))
      .filter { p =>
        val n = p.getFileName.toString
        (isSnapshotName(n) && n.drop(1).toLong != keepBid) ||
          (n.startsWith(".stage_") && n != s".stage_b$keepBid")
      }
      .foreach(deleteRecursively)

  /** The shared slim-embedding replay chunks for the streamed k-means
    * rows (s65, s66). */
  private def kmeansIngestChunks(spark: SparkSession,
                                 dir: String): java.nio.file.Path =
    sharedChunkDir(dir, "embvec", "embeddings") { p =>
      VectorOps.embSlim(spark, dir)
        .repartitionByRange(chunks, col("vec_id"))
        .write.parquet(p.toString)
    }

  /** s44's stage 1 (also driven stop/restart by StreamAnnRecoverySpec):
    * arriving vectors assign to the broadcast `cent` cells SCAN-LOCALLY
    * in their microbatch (exact batch arithmetic — rounded cosine,
    * lower-cid argmax) and relay slim (vec_id, cell) rows; the vectors
    * themselves never enter streaming state. */
  private[graft] def startIvfAssignStream(spark: SparkSession, in: String,
      cent: DataFrame, ckpt: java.nio.file.Path, relay: java.nio.file.Path)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema("vec_id BIGINT, e ARRAY<DOUBLE>, nrm DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "part-*")
      .parquet(in)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.crossJoin(broadcast(cent))
          .select(col("vec_id"),
            round(graft.functions.VectorFunctions.dot(
              col("e"), col("ce")) / (col("nrm") * col("cn")), 6)
              .as("csim"),
            col("cid"))
          .groupBy(col("vec_id"))
          .agg(max_by(col("cid"), struct(col("csim"), -col("cid")))
            .as("cell"))
          .write.mode("append").parquet(relay.toString)
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
      .option("pathGlobFilter", "part-*")
      .parquet(relay.toString).as[AsgRow]
    val dd = VersionedStreamDedup.latestPerKeyId[AsgRow](
      asgs, _.cell.toString, _.vec_id.toString, _ => 0L)
    dd.toDF().writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.repartition(1).write.mode("append").parquet(log.toString)
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

  /** ONE streamed Lloyd round (shared by s65 and s66): replay the
    * embedding chunks, assign each arriving vector to the broadcast
    * `cent` table SCAN-LOCALLY in its microbatch (the exact batch
    * assignment — rounded cosine, lower-cid argmax), fan out to slim
    * (cell, pos, v) rows whose native streaming aggregation maintains
    * the per-(cell, dim) (Σv, n) sufficient statistics — 16 cells ×
    * 64 dims of state regardless of corpus size — and return the
    * updated centroid table (cid, ce) via the batch updateCentroids
    * arithmetic round(Σv/n, 6) over the converged sums. */
  private def streamedLloydRound(spark: SparkSession,
      in: java.nio.file.Path, cent: DataFrame): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_kmeans_")
    val relay = tmp.resolve("relay")
    val log = tmp.resolve("log")
    val ckpt1 = tmp.resolve("ckpt1")
    val ckpt2 = tmp.resolve("ckpt2")
    try {
      val q1 = spark.readStream
        .schema("vec_id BIGINT, e ARRAY<DOUBLE>, nrm DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "part-*")
        .parquet(in.toString)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt1.toString)
        .foreachBatch { (df: DataFrame, _: Long) =>
          val b = df.select(col("vec_id").as("id"), col("e"))
          graft.core.VectorTools.assignCells(b, cent)
            .select(col("id"), col("cell"))
            .join(b, "id")
            .select(col("cell"), posexplode(col("e")).as(Seq("pos", "v")))
            .write.mode("append").parquet(relay.toString)
          ()
        }.start()
      java.nio.file.Files.createDirectories(relay)
      val stats = spark.readStream
        .schema("cell BIGINT, pos INT, v DOUBLE")
        .option("maxFilesPerTrigger", streamShufflePartitions.toString)
        .option("pathGlobFilter", "part-*")
        .parquet(relay.toString)
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      val q2 = stats.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt2.toString)
        .foreachBatch { (df: DataFrame, bid: Long) =>
          df.withColumn("bid", lit(bid))
            .repartition(1).write.mode("append").parquet(log.toString)
          ()
        }.start()
      // Sequencing: q1.processAllAvailable() is a BARRIER — it returns
      // only after every q1 microbatch has committed, i.e. after every
      // relay part-file is fully written and visible (the NIO manager
      // renames completed files into place; the directory listing is
      // deterministic). Only then does q2.processAllAvailable() run,
      // so q2's file source cannot list a half-written relay file or
      // miss q1's last one. A refactor that overlaps the two calls
      // (or swaps their order) silently breaks this.
      try {
        q1.processAllAvailable()
        q2.processAllAvailable()
      } finally {
        try q1.stop() finally q2.stop()
      }
      // converged stats → updated centroids (the batch updateCentroids
      // arithmetic over maintained sums). Summation-order tolerance
      // (the s47 moment-matrix argument): the streamed Σv accumulates
      // in microbatch arrival order while the batch oracle's avg()
      // sums in partition order, so the doubles can differ in the last
      // ulps; round(·, 6) absorbs that except for a component sitting
      // EXACTLY on a 6-decimal rounding boundary — measured green
      // across all SFs (including three compounded rounds in s66), and
      // were it ever to flake, the fix is an integer/fixed-point lane
      // for the sums, not a wider round.
      val raw = spark.read.parquet(log.toString)
      val wMax = Window.partitionBy(col("cell"), col("pos"))
      raw
        .withColumn("max_bid", max(col("bid")).over(wMax))
        .filter(col("bid") === col("max_bid"))
        .select(col("cell"), col("pos"),
          round(col("s") / col("n"), 6).as("c"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("c"))))
          .as("pc"))
        .select(col("cell").as("cid"),
          expr("transform(pc, x -> x.c)").as("ce"))
        .localCheckpoint() // materialize before tmp is deleted
    } finally deleteRecursively(tmp)
  }

  /** The streamed media featurize→index loop shared by s50 and s61:
    * document ids replay as chunked files, each arriving asset is
    * BMP-decoded and mean-pooled SCAN-LOCALLY in its microbatch (the
    * exact batch featurizer — no shuffle touches pixels), the 48-long
    * feature vector upserts into doc-keyed state, and `serve` runs an
    * arbitrary batch scoring tail over the CONVERGED feature table
    * (brute panel for s50, the IVF index layout for s61). */
  private def runMediaFeatureStream(spark: SparkSession, dir: String)(
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
        val src = spark.readStream.schema("doc_id BIGINT")
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "part-*")
          .parquet(in.toString)
        val featRows = src
          .withColumn("payload",
            graft.multimodal.MultimodalPipeline.encodeBmp(col("doc_id")))
          .select(col("doc_id"),
            graft.multimodal.MultimodalPipeline
              .poolBmp(col("payload"), 4, 4).as("f"))
          .as[MediaFeatRow]
        val dd = VersionedStreamDedup.latestPerKeyId[MediaFeatRow](
          featRows, _.doc_id.toString, _ => "f", _ => 0L)
        // key-bucketed like s63's log: these rows carry the 48-long
        // pooled feature per asset, so the payload — not the row
        // count — is the per-batch write cost
        val q = dd.toDF().writeStream.outputMode("update")
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch { (df: DataFrame, _: Long) =>
            df.repartition(streamShufflePartitions.toInt, col("key"))
              .write.mode("append").parquet(log.toString)
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
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
  private def runAppendReplay(spark: SparkSession, dir: String,
                              stableTarget: Int = 1)(
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
      locally {
        import scala.jdk.CollectionConverters._
        val shared = sharedEventsChunks(spark, dir)
        java.nio.file.Files.list(shared).iterator().asScala
          .filter(_.getFileName.toString.startsWith("part-"))
          .foreach { p =>
            java.nio.file.Files.createLink(in.resolve(p.getFileName), p)
          }
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
      import scala.jdk.CollectionConverters._
      def parts() = java.nio.file.Files.list(in).iterator().asScala
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
      def src(): DataFrame = spark.readStream.schema(evReplaySchema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "part-*")
        .parquet(in.toString)
        .withColumn("ets", expr("timestamp_micros(ts_us)"))
        .withWatermark("ets", "35 days")
      val q = agg(() => src())
        .writeStream.outputMode("append")
        .format("parquet").option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .start()
      try {
        q.processAllAvailable()
        // the append emission happens in the no-data batch AFTER the
        // sentinel advances the watermark (nothing at all is emitted
        // before the sentinel); processAllAvailable can return before
        // that batch commits, so poll until the sink exists, is
        // non-empty, and has gone quiet
        def sinkCount(): Long =
          try spark.read.parquet(out.toString).count()
          catch { case _: Exception => -1L } // sink not created yet
        // `stableTarget` consecutive stable non-empty samples: the
        // window rows land everything in the one post-sentinel batch
        // (one stable pair suffices, the default), but an outer join
        // emits matched rows across many batches and its null flush
        // arrives in a LATER no-data batch — those rows demand a 2 s
        // observed-quiet window so a lucky stable pair can never end
        // the poll between the matched rows and the flush
        var prev = -2L
        var cur = sinkCount()
        var stable = 0
        var spins = 0
        while ((stable < stableTarget || cur <= 0) && spins < 120) {
          Thread.sleep(500)
          prev = cur
          cur = sinkCount()
          stable = if (cur == prev && cur > 0) stable + 1 else 0
          spins += 1
        }
      } finally q.stop()
      finish(spark.read.parquet(out.toString))
        .localCheckpoint() // materialize before the tmp dir is deleted
    } finally deleteRecursively(tmp)
  }
}
