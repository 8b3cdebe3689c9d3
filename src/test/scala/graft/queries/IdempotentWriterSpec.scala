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

      // first attempt of bid 7: several part files (round-robin keeps
      // all three partitions non-empty)
      StreamingHarness.writeBatchIdempotent(
        spark.range(0, 90).toDF("v").repartition(3), dir, 7L)
      val first = names(dir)
      assert(first.size == 3 &&
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
}
