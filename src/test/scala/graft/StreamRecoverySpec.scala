package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.VersionedStreamJoin

case class RecX(k: Long, xid: Long, ts: Long, xv: String)
case class RecY(k: Long, yid: Long, ts: Long, yv: String)

/** Fault-tolerance contract: a versioned streaming join STOPPED and
  * RESTARTED from its checkpoint resumes with join state intact —
  * keys whose X arrived before the restart still match Ys that arrive
  * after it, latest-wins keeps superseding across the boundary, and
  * the file source does not reprocess already-committed files. This is
  * the recovery semantics a 1000-executor deployment leans on every
  * time an executor or driver is lost mid-stream.
  */
class StreamRecoverySpec extends SparkTestBase {
  import spark.implicits._

  private def rmTree(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
  }

  test("streaming join restarts from checkpoint with state intact") {
    recoveryScenario()
  }

  // The same stop/restart contract under the PRODUCTION state config:
  // RocksDB provider with changelog checkpointing, where restore =
  // load the last snapshot + replay the per-batch changelog. This is
  // the exact recovery path a 100 TB deployment exercises on every
  // executor/driver loss, so it gets its own green light rather than
  // an assumption that the default-provider test transfers.
  test("restart from checkpoint under RocksDB + changelog checkpointing") {
    VersionedStreamJoin.withStateStoreProvider(spark) {
      recoveryScenario()
    }
  }

  private def recoveryScenario(): Unit = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val tmp = Files.createTempDirectory("graft_rec_")
    try {
      val xdir = Files.createDirectories(tmp.resolve("x")).toString
      val ydir = Files.createDirectories(tmp.resolve("y")).toString
      val log = tmp.resolve("log").toString
      val ckpt = tmp.resolve("ckpt").toString

      def appendX(rows: RecX*): Unit =
        rows.toDS().coalesce(1).write.mode("append").parquet(xdir)
      def appendY(rows: RecY*): Unit =
        rows.toDS().coalesce(1).write.mode("append").parquet(ydir)

      def startQuery() = {
        val xs = spark.readStream
          .schema("k BIGINT, xid BIGINT, ts BIGINT, xv STRING")
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "part-*").parquet(xdir).as[RecX]
        val ys = spark.readStream
          .schema("k BIGINT, yid BIGINT, ts BIGINT, yv STRING")
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "part-*").parquet(ydir).as[RecY]
        VersionedStreamJoin.fullOuter[RecX, RecY](xs, ys,
            _.k.toString, _.k.toString,
            _.xid.toString, _.yid.toString,
            _.ts, _.ts).toDF()
          .select(col("key"), col("seq"),
            col("x.xv").as("xv"), col("y.yv").as("yv"))
          .writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: DataFrame, _: Long) =>
            df.coalesce(1).write.mode("append").parquet(log)
            ()
          }.start()
      }

      // ---- phase 1: first half of the input, then STOP ----
      appendX(RecX(1, 10, 1, "a1"), RecX(2, 11, 1, "a2old"),
        RecX(4, 12, 1, "a4"))
      appendY(RecY(2, 21, 1, "b2"), RecY(3, 22, 1, "b3"))
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()

      // pre-restart sanity: k=1 is x-only so far
      val phase1 = spark.read.parquet(log)
      val k1Phase1 = phase1.filter(col("key") === "1")
        .select("xv", "yv").collect().map(r => (r.getString(0), r.getString(1)))
      assert(k1Phase1.nonEmpty && k1Phase1.forall(_ == ("a1", null)),
        s"phase 1 should emit x-only for k=1: ${k1Phase1.toSeq}")
      // counts captured EAGERLY — phase1 re-reads the log directory on
      // every action, and phase 2 appends to it
      val phase1Rows = phase1.count()
      val k4Phase1 = phase1.filter(col("key") === "4").count()

      // ---- phase 2: the rest arrives, a NEW query resumes the ckpt ----
      appendY(RecY(1, 20, 2, "b1")) // joins phase-1 state for k=1
      appendX(RecX(2, 11, 5, "a2new")) // supersedes a2old across restart
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()

      // converged view: latest emission per key
      val raw = spark.read.parquet(log)
      val wMax = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key"))
      val got = raw
        .withColumn("mx", max(col("seq")).over(wMax))
        .filter(col("seq") === col("mx"))
        .select("key", "xv", "yv").collect()
        .map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
        .toSet
      assert(got == Set(
        ("1", Some("a1"), Some("b1")),   // X held in state across restart
        ("2", Some("a2new"), Some("b2")), // latest-wins across restart
        ("3", None, Some("b3")),          // y-only arm preserved
        ("4", Some("a4"), None)),         // untouched key preserved
        s"converged state after restart is wrong: $got")

      // the resumed query must process only the two NEW files: k=4 saw
      // no phase-2 data, so reprocessing would show as extra emissions
      val k4 = raw.filter(col("key") === "4").count()
      assert(k4 == k4Phase1 && k4 >= 1,
        "phase 2 re-emitted a key with no new data — source reprocessed old files")
      assert(raw.count() > phase1Rows, "phase 2 emitted nothing")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      rmTree(tmp)
    }
  }
}
