package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (guide: one SparkSession per
  * suite, lazy). Shuffle partitions kept small for test speed. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // Route every suite's streaming checkpoints through the fork-free
    // NIO manager — the same one the library's replay harnesses use —
    // so its atomic-rename/recovery behavior is exercised by ALL
    // streaming specs (incl. StreamRecoverySpec's restart-from-
    // checkpoint path), not just its own unit spec.
    .config("spark.sql.streaming.checkpointFileManagerClass",
      classOf[graft.streaming.NioCheckpointFileManager].getName)
    // checksum sidecars double the checkpoint commit count and protect
    // only long-lived checkpoints on remote storage — off for tests,
    // matching the library's withStreamConf
    .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    .getOrCreate()
}
