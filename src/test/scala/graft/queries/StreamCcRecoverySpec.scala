package graft.queries

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

/** Fault-tolerance contract of the incremental connected-components
  * engine behind s62: STOPPED and RESTARTED from its checkpoint, the
  * engine resumes from the last COMMITTED star-forest snapshot —
  * components discovered before the restart survive it, edges arriving
  * after it merge into them, and the final labeling equals the
  * one-shot batch connected components over all edges. This is the
  * property that lets a 100 TB dedup graph accumulate across driver
  * losses without ever replaying the full edge history. */
class StreamCcRecoverySpec extends graft.SparkTestBase {
  import spark.implicits._

  private def rmTree(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
  }

  test("incremental CC restarts from the committed star forest") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val tmp = Files.createTempDirectory("graft_ccrec_")
    try {
      val edges = Files.createDirectories(tmp.resolve("edges")).toString
      val ckpt = tmp.resolve("ckpt").toString
      val state = tmp.resolve("state").toString

      def append(rows: (Long, Long)*): Unit =
        rows.toDF("d1", "d2").coalesce(1).write.mode("append").parquet(edges)

      // phase 1: two separate chains land before the "crash"
      append((1L, 2L), (2L, 3L))
      append((10L, 11L), (11L, 12L))
      val q1 = StreamingOps.incrementalCcQuery(spark, edges, ckpt, state)
      try q1.processAllAvailable() finally q1.stop()
      val mid = StreamingOps.loadStarForest(spark, state)
        .as[(Long, Long)].collect().toMap
      assert(mid == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L),
        s"pre-restart forest wrong: $mid")

      // phase 2: restart from the same checkpoint + state; a bridging
      // edge must MERGE the pre-restart components (provable only if
      // the persisted forest survived), plus a fresh component
      append((3L, 10L), (20L, 21L))
      val q2 = StreamingOps.incrementalCcQuery(spark, edges, ckpt, state)
      try q2.processAllAvailable() finally q2.stop()
      val got = StreamingOps.loadStarForest(spark, state)
        .as[(Long, Long)].collect().toMap
      val oneShot = graft.core.GraphTools
        .connectedComponents(
          Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L),
            (3L, 10L), (20L, 21L)).toDF("d1", "d2"), "d1", "d2")
        .as[(Long, Long)].collect().toMap
      assert(got == oneShot, s"post-restart labels $got != $oneShot")
      // the committed state is exactly one snapshot deep
      import scala.jdk.CollectionConverters._
      val snaps = Files.list(java.nio.file.Paths.get(state))
        .iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("b")).toSeq
      assert(snaps.size == 1, s"stale snapshots not pruned: $snaps")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      rmTree(tmp)
    }
  }
}
