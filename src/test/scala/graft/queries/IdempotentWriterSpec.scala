package graft.queries

import java.nio.file.{Files, Path}

/** Contract of [[StreamingHarness.writeBatchIdempotent]] — the one
  * sink primitive every per-microbatch parquet log and relay in
  * src/main writes through (foreachBatch is at-least-once, so the
  * converged max-seq/max-bid folds and the tailing file sources are
  * only exactly-once because of these properties):
  *
  *  - files land under deterministic `b<bid>_p<i>.parquet` names;
  *  - a re-delivered batch REPLACES its first attempt in place (same
  *    names), never appending beside it;
  *  - a re-delivery that produces FEWER part files than the first
  *    attempt (partition-count drift across a restart) deletes the
  *    stale tail files;
  *  - distinct bids coexist;
  *  - no staging remnants survive a completed write.
  *
  * The recovery specs (StreamTrainedRecoverySpec, StreamAnnRecoverySpec)
  * drive these properties end-to-end through real streaming queries;
  * this spec pins them in isolation. */
class IdempotentWriterSpec extends graft.SparkTestBase {

  private def rmTree(p: Path): Unit =
    StreamingHarness.deleteRecursively(p)

  private def names(dir: Path): Set[String] =
    StreamingHarness.listDir(dir).map(_.getFileName.toString).toSet

  test("per-bid idempotent writer replaces, trims stale tails, and " +
    "leaves no staging remnants") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_idem_")
    try {
      val dir = tmp.resolve("log")

      // first attempt of bid 7: several part files. The exact count is
      // Spark's committer's business (round-robin partition fill and
      // one-file-per-non-empty-partition could both shift across an
      // upgrade without any writer bug — r17 ADVICE), so assert the
      // naming contract and content equality, not a literal 3.
      StreamingHarness.writeBatchIdempotent(
        spark.range(0, 90).toDF("v").repartition(3), dir, 7L)
      val first = names(dir)
      assert(first.nonEmpty &&
        first.forall(_.matches("b7_p\\d{5}\\.parquet")), s"got $first")
      assert(spark.read.parquet(dir.toString).as[Long].collect().sorted
        .sameElements(0L until 90L))

      // re-delivery of bid 7 with FEWER parts (drift): same-name files
      // replaced, stale tails deleted, content is the retry's alone
      StreamingHarness.writeBatchIdempotent(
        Seq(1000L, 1001L).toDF("v").repartition(1), dir, 7L)
      assert(names(dir) == Set("b7_p00000.parquet"), s"got ${names(dir)}")
      assert(spark.read.parquet(dir.toString).as[Long].collect().sorted
        .sameElements(Seq(1000L, 1001L)))

      // a different bid coexists next to it
      StreamingHarness.writeBatchIdempotent(
        Seq(2000L).toDF("v").repartition(1), dir, 8L)
      assert(names(dir) == Set("b7_p00000.parquet", "b8_p00000.parquet"))
      assert(spark.read.parquet(dir.toString).as[Long].collect().sorted
        .sameElements(Seq(1000L, 1001L, 2000L)))

      // no .stage_* siblings left behind
      assert(names(tmp) == Set("log"), s"staging remnants: ${names(tmp)}")
    } finally rmTree(tmp)
  }

  test("re-delivery after a MID-RENAME crash reproduces exactly the " +
    "retry's file set") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_idem_")
    try {
      val dir = tmp.resolve("log")

      // complete first attempt of bid 6, then reconstruct the
      // mid-rename crash state: the staged write finished, SOME parts
      // were renamed into the log dir, the rest still sit in the stage
      // dir (a kill between two Files.move calls leaves exactly this)
      StreamingHarness.writeBatchIdempotent(
        spark.range(0, 90).toDF("v").repartition(3), dir, 6L)
      val renamed = names(dir).toSeq.sorted
      assert(renamed.size >= 2, s"need >=2 parts to simulate: $renamed")
      val stage = dir.resolveSibling("log.stage_b6")
      Files.createDirectories(stage)
      // the LAST part never got renamed: move it back into the stage
      // under its pre-rename committer name
      Files.move(dir.resolve(renamed.last),
        stage.resolve("part-00099-leftover.snappy.parquet"))
      assert(names(dir) == renamed.init.toSet) // strict subset renamed
      assert(names(stage).nonEmpty)

      // re-delivery of bid 6 (deterministic recomputation, same rows):
      // must discard the stale stage, restage, and leave exactly the
      // retry's file set with the batch's content intact
      StreamingHarness.writeBatchIdempotent(
        spark.range(0, 90).toDF("v").repartition(3), dir, 6L)
      val after = names(dir)
      assert(after.nonEmpty &&
        after.forall(_.matches("b6_p\\d{5}\\.parquet")), s"got $after")
      assert(spark.read.parquet(dir.toString).as[Long].collect().sorted
        .sameElements(0L until 90L))
      assert(names(tmp) == Set("log"), s"staging remnants: ${names(tmp)}")
    } finally rmTree(tmp)
  }

  test("re-delivery after EVERY k-of-n mid-rename crash point " +
    "reproduces exactly the retry's file set (randomized-crash soak)") {
    import spark.implicits._
    // The single-point spec above pins one crash (last part
    // un-renamed); this soak closes the CLASS: a kill can land between
    // ANY two of the n Files.move calls — k parts renamed, n-k still
    // staged — or before the first rename (stage complete, log dir
    // untouched). Re-delivery from every such state must converge to
    // the same exactly-once file set and content.
    val tmp = Files.createTempDirectory("graft_idem_")
    try {
      val dir = tmp.resolve("log")
      // one complete write to learn the committer's part layout
      StreamingHarness.writeBatchIdempotent(
        spark.range(0, 90).toDF("v").repartition(3), dir, 4L)
      val full = names(dir).toSeq.sorted
      val n = full.size
      assert(n >= 2, s"need >=2 parts to soak crash points: $full")
      val stage = dir.resolveSibling("log.stage_b4")
      for (k <- 0 until n) {
        // reconstruct the crash state "k parts renamed": parts k..n-1
        // moved back into the stage under pre-rename committer names
        // (k = 0 is the crash BEFORE any rename)
        Files.createDirectories(stage)
        full.drop(k).zipWithIndex.foreach { case (f, i) =>
          Files.move(dir.resolve(f),
            stage.resolve(f"part-${90 + i}%05d-leftover.snappy.parquet"))
        }
        assert(names(dir) == full.take(k).toSet)
        // re-delivery: deterministic recomputation of the same batch
        StreamingHarness.writeBatchIdempotent(
          spark.range(0, 90).toDF("v").repartition(3), dir, 4L)
        assert(names(dir) == full.toSet,
          s"crash point k=$k left ${names(dir)} instead of $full")
        assert(spark.read.parquet(dir.toString).as[Long].collect().sorted
          .sameElements(0L until 90L), s"content wrong at crash point k=$k")
        assert(!Files.exists(stage), s"stage survived crash point k=$k")
      }
    } finally rmTree(tmp)
  }

  test("part-count drift across a re-delivery: fresh listers see " +
    "exactly the retry, a mid-batch tailing reader holds the " +
    "documented mixed view, and the drift warning fires") {
    import spark.implicits._
    // End-to-end drive of the hazard the writer's warning names
    // (StreamingHarness drift check): a re-delivery whose part count
    // drifted from the first attempt — possible only if code or conf
    // changed between crash and restart — is reconciled for any FRESH
    // lister by same-name replacement + tail-trim, but a TAILING
    // streaming file source that consumed part of the first attempt
    // mid-batch tracks seen PATHS, so it re-reads nothing for replaced
    // names and still sees never-seen names: its view mixes attempts.
    // This spec constructs exactly that reader and pins both contracts.
    val tmp = Files.createTempDirectory("graft_drift_")
    try {
      val dir = tmp.resolve("log")
      val sink = tmp.resolve("sink")
      val ckpt = tmp.resolve("ckpt")

      // ATTEMPT 1 of bid 3, interrupted mid-rename: only part 0 of 3
      // ever landed in the log dir (the crash-state reconstruction of
      // the soak above, kept at k=1)
      StreamingHarness.writeBatchIdempotent(
        spark.range(0, 90).toDF("v").repartition(3), dir, 3L)
      val first = names(dir).toSeq.sorted
      assume(first.size == 3, s"committer layout changed: $first")
      val stage = dir.resolveSibling("log.stage_b3")
      Files.createDirectories(stage)
      first.drop(1).zipWithIndex.foreach { case (f, i) =>
        Files.move(dir.resolve(f),
          stage.resolve(f"part-${90 + i}%05d-leftover.snappy.parquet"))
      }
      val attempt1Part0 = spark.read
        .parquet(dir.resolve(first.head).toString).as[Long].collect().toSet

      // the TAILING reader consumes the partial first attempt NOW
      val q = spark.readStream.schema("v BIGINT").parquet(dir.toString)
        .writeStream.outputMode("append")
        .format("parquet").option("path", sink.toString)
        .option("checkpointLocation", ckpt.toString)
        .start()
      try {
        q.processAllAvailable()

        // RE-DELIVERY of bid 3 with a DRIFTED layout (2 parts, where
        // the crashed attempt had renamed 1 of its 3) and — drift
        // implies changed code — different content packing; the
        // warning must fire on stderr
        val errBuf = new java.io.ByteArrayOutputStream()
        val realErr = System.err
        System.setErr(new java.io.PrintStream(errBuf, true, "UTF-8"))
        try StreamingHarness.writeBatchIdempotent(
          spark.range(100, 190).toDF("v").repartition(2), dir, 3L)
        finally System.setErr(realErr)
        assert(errBuf.toString("UTF-8").contains("part-count drift"),
          s"drift warning did not fire; stderr: ${errBuf.toString("UTF-8")}")

        // CONTRACT 1 — fresh lister: exactly the retry's file set and
        // content, attempt 1 fully replaced
        assert(names(dir) ==
          Set("b3_p00000.parquet", "b3_p00001.parquet"), s"got ${names(dir)}")
        assert(spark.read.parquet(dir.toString).as[Long].collect().sorted
          .sameElements(100L until 190L))

        // CONTRACT 2 — the tailing reader holds a MIXED view: p0 was
        // already consumed, so its replacement is NEVER re-read (the
        // file source's seen log is path-based), while the retry's
        // never-seen p1 IS read. Its total view is attempt 1's p0 +
        // the retry's p1 — rows from BOTH attempts, equal to neither:
        // exactly why the writer's stable-layout contract (not the
        // tail-trim) is the load-bearing property for tailing
        // consumers.
        q.processAllAvailable()
        val retryPart1 = spark.read
          .parquet(dir.resolve("b3_p00001.parquet").toString)
          .as[Long].collect().toSet
        val seen = spark.read.parquet(sink.toString).as[Long].collect().toSet
        assert(seen == (attempt1Part0 ++ retryPart1),
          s"tailing reader saw ${seen.size} rows, expected attempt 1's " +
            s"p0 (${attempt1Part0.size}) + the retry's p1 " +
            s"(${retryPart1.size})")
        assert((seen -- (100L until 190L).toSet).nonEmpty,
          "the mixed view should hold rows the retry no longer has")
        assert(seen != (100L until 190L).toSet && seen != (0L until 90L).toSet,
          "the mixed view should equal neither attempt alone")
      } finally q.stop()
    } finally rmTree(tmp)
  }

  test("re-delivery under a CHANGED stream width (the restart-with-" +
    "different-SPARK_GRAFT_STREAM_PARTS hazard) surfaces drift and " +
    "keeps fresh listers exactly-once") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // The relay writers keep the upstream shuffle layout, whose width
    // IS streamShufflePartitions — so a crash-restart under a changed
    // knob value re-delivers the same bid with a different part count.
    // Drive exactly that through the real path (a shuffle-terminated
    // plan whose part count follows spark.sql.shuffle.partitions, no
    // explicit repartition), and pin the documented contract: the
    // drift warning fires and a fresh lister of the log sees exactly
    // the retry's content once — the same ROWS either width, since
    // the computation is deterministic.
    val tmp = Files.createTempDirectory("graft_widthdrift_")
    try {
      val dir = tmp.resolve("log")
      def agg = spark.range(0, 500).toDF("v")
        .groupBy((col("v") % 53).as("k")).agg(sum(col("v")).as("s"))
      def writeAt(width: Int): Unit = {
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.shuffle.partitions", width.toString)
        // AQE off so the written part count IS the configured width
        // (with it on, coalescing collapses this tiny shuffle to one
        // partition at either width and the drift never manifests)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try StreamingHarness.writeBatchIdempotent(agg, dir, 5L)
        finally {
          spark.conf.set("spark.sql.shuffle.partitions", prev)
          spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
        }
      }
      val expected = agg.as[(Long, Long)].collect().toSet
      writeAt(8)
      assume(names(dir).size > 4, s"first attempt layout: ${names(dir)}")
      val errBuf = new java.io.ByteArrayOutputStream()
      val realErr = System.err
      System.setErr(new java.io.PrintStream(errBuf, true, "UTF-8"))
      try writeAt(4) finally System.setErr(realErr)
      assert(errBuf.toString("UTF-8").contains("part-count drift"),
        s"drift warning did not fire; stderr: ${errBuf.toString("UTF-8")}")
      assert(names(dir).size <= 4, s"tail not trimmed: ${names(dir)}")
      assert(spark.read.parquet(dir.toString)
        .as[(Long, Long)].collect().toSet == expected,
        "fresh lister must see the retry's content exactly once")
    } finally rmTree(tmp)
  }

  test("a stray non-numeric b<bid>_p* artifact is ignored, not fatal") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_idem_")
    try {
      val dir = tmp.resolve("log")
      Files.createDirectories(dir)
      // a hand-placed/foreign file whose name matches the prefix but
      // has no digit run after it: the tail-trim's index parse must
      // skip it (r17 ADVICE: a fatal NumberFormatException here would
      // fail the whole microbatch)
      Files.write(dir.resolve("b9_pfoo.parquet"),
        Array[Byte](1, 2, 3))
      StreamingHarness.writeBatchIdempotent(
        Seq(5L).toDF("v").repartition(1), dir, 9L)
      assert(names(dir) == Set("b9_p00000.parquet", "b9_pfoo.parquet"),
        s"got ${names(dir)}")
    } finally rmTree(tmp)
  }
}
