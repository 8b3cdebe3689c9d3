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
