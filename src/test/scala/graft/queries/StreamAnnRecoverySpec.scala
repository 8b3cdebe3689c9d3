package graft.queries

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

/** Fault-tolerance contract of the converged-state ANN serving twin
  * (s44, streamed IVF membership): the two-stage pipeline (scan-local
  * cell assignment → cell-keyed membership upsert state) STOPPED after
  * half the corpus and RESTARTED from its checkpoints must converge to
  * the same membership table and serve the same answers as an
  * uninterrupted run — the batch index, exactly. The proof is real:
  * after the restart the file source does NOT re-read the phase-1
  * chunk files (their offsets are committed), so every phase-1 vector
  * can appear in the final membership only via recovered state. This
  * upgrades the s44/s46/s50 family's checkpoint + append-log
  * idempotence from argued to stop/restart-tested. */
class StreamAnnRecoverySpec extends graft.SparkTestBase {

  private val sfDir = sys.props.getOrElse("graft.testdata.dir",
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001"))

  private def rmTree(p: Path): Unit =
    StreamingHarness.deleteRecursively(p)

  private def partFiles(dir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    try s.iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .toSeq.sortBy(_.getFileName.toString)
    finally s.close()
  }

  test("streamed IVF membership survives a stop/restart and still " +
    "serves the batch answer") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val tmp = Files.createTempDirectory("graft_annrec_")
    try {
      val stage = tmp.resolve("stage")
      val in = Files.createDirectories(tmp.resolve("in"))
      val relay = Files.createDirectories(tmp.resolve("relay"))
      val log = tmp.resolve("log")
      val ckpt1 = tmp.resolve("ckpt1")
      val ckpt2 = tmp.resolve("ckpt2")

      // the corpus as 4 range chunks; phase 1 ingests the first half
      VectorOps.embSlim(spark, sfDir)
        .repartitionByRange(4, col("vec_id"))
        .write.parquet(stage.toString)
      val parts = partFiles(stage)
      assert(parts.size >= 2, s"need >=2 chunk files, got ${parts.size}")
      val (firstHalf, secondHalf) = parts.splitAt(parts.size / 2)
      def arrive(fs: Seq[Path]): Unit =
        fs.foreach(f => Files.createLink(in.resolve(f.getFileName), f))

      val cent = VectorOps.ivfSeedCentroids(spark, sfDir).localCheckpoint()
      def runOnce(): Unit = {
        val q1 = StreamServingTwins.startIvfAssignStream(
          spark, in.toString, cent, ckpt1, relay)
        val q2 = StreamServingTwins.startIvfMembershipStream(
          spark, relay, ckpt2, log)
        try {
          q1.processAllAvailable() // barrier: all relay files committed
          q2.processAllAvailable()
        } finally {
          try q1.stop() finally q2.stop()
        }
      }

      // ---- phase 1: half the corpus, then the "crash" (stop) ----
      arrive(firstHalf)
      runOnce()
      val midCount = StreamServingTwins.convergedMembershipFrom(spark, log).count()
      val total = VectorOps.embSlim(spark, sfDir).count()
      assert(midCount > 0 && midCount < total,
        s"phase 1 should hold a strict subset: $midCount of $total")

      // ---- phase 2: the rest arrives, NEW queries resume the ckpts ----
      arrive(secondHalf)
      runOnce()
      val asg = StreamServingTwins.convergedMembershipFrom(spark, log)
        .localCheckpoint()
      assert(asg.count() == total,
        "restarted membership lost phase-1 vectors (state not recovered)")

      // (a) the recovered membership equals the batch cell assignment
      // (same arithmetic run as ONE batch over the whole corpus)
      val batchAsg = VectorOps.embSlim(spark, sfDir)
        .crossJoin(broadcast(cent))
        .select(col("vec_id"),
          round(graft.functions.VectorFunctions.dot(
            col("e"), col("ce")) / (col("nrm") * col("cn")), 6).as("csim"),
          col("cid"))
        .groupBy(col("vec_id"))
        .agg(max_by(col("cid"), struct(col("csim"), -col("cid"))).as("cell"))
      val gotSet = asg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expSet = batchAsg.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotSet == expSet,
        s"membership diverged: extra=${gotSet -- expSet}, " +
          s"missing=${expSet -- gotSet}")

      // (b) the serving tail over the recovered state matches the
      // batch entry (the same oracle s44 hash-checks against)
      val served = VectorOps.quantScoredTopk(spark, sfDir,
          VectorOps.ivfCandidatesFrom(spark, sfDir, asg))
        .orderBy(col("query_id"), col("rank")).collect().toSeq
      val batch = Registry.all.find(_.name == "ann_ivf_quantized_topk").get
        .fn(spark, sfDir).collect().toSeq
      assert(served == batch,
        "post-restart serving diverged from the batch index answer")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      rmTree(tmp)
    }
  }
}
