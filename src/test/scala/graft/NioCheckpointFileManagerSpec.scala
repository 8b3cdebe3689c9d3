package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath, PathFilter}

import graft.streaming.NioCheckpointFileManager

/** Contract tests for the fork-free NIO checkpoint file manager: the
  * atomic-rename commit protocol, overwrite/no-overwrite semantics
  * (HDFSMetadataLog detects concurrent writers via Hadoop's
  * FileAlreadyExistsException), cancel, seekable reads, and listing.
  * End-to-end streaming coverage comes from every suite in the repo:
  * SparkTestBase routes all streaming checkpoints through this
  * manager, including StreamRecoverySpec's restart-from-checkpoint. */
class NioCheckpointFileManagerSpec extends SparkTestBase {

  private def mkFm(): (NioCheckpointFileManager, java.nio.file.Path) = {
    val dir = Files.createTempDirectory("nio_cfm_")
    (new NioCheckpointFileManager(new HPath(dir.toUri), new Configuration()), dir)
  }

  private def write(fm: NioCheckpointFileManager, p: HPath, s: String,
                    overwrite: Boolean): Unit = {
    val out = fm.createAtomic(p, overwrite)
    out.write(s.getBytes(UTF_8))
    out.close()
  }

  private def readAll(fm: NioCheckpointFileManager, p: HPath): String = {
    val in = fm.open(p)
    try new String(in.readAllBytes(), UTF_8) finally in.close()
  }

  test("createAtomic publishes on close, nothing visible before") {
    val (fm, dir) = mkFm()
    val target = new HPath(dir.toUri.toString, "wal/0")
    val out = fm.createAtomic(target, false)
    out.write("offsets-v1".getBytes(UTF_8))
    assert(!fm.exists(target), "target must not exist before close")
    out.close()
    assert(fm.exists(target))
    assert(readAll(fm, target) == "offsets-v1")
    // no temp litter after commit
    val leftovers = Files.list(Paths.get(dir.toString, "wal")).iterator()
    var names = List.empty[String]
    while (leftovers.hasNext) names ::= leftovers.next().getFileName.toString
    assert(names == List("0"), s"unexpected files: $names")
  }

  test("no-overwrite close on existing target throws Hadoop's FAEE " +
    "and leaves the original intact") {
    val (fm, dir) = mkFm()
    val target = new HPath(dir.toUri.toString, "commits/7")
    write(fm, target, "winner", overwrite = false)
    val loser = fm.createAtomic(target, false)
    loser.write("loser".getBytes(UTF_8))
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] { loser.close() }
    assert(readAll(fm, target) == "winner")
  }

  test("overwrite close replaces atomically; cancel deletes the temp") {
    val (fm, dir) = mkFm()
    val target = new HPath(dir.toUri.toString, "state/1.delta")
    write(fm, target, "v1", overwrite = true)
    write(fm, target, "v2", overwrite = true)
    assert(readAll(fm, target) == "v2")
    val cancelled = fm.createAtomic(target, true)
    cancelled.write("doomed".getBytes(UTF_8))
    cancelled.cancel()
    cancelled.close() // idempotent after cancel (finally-block pattern)
    assert(readAll(fm, target) == "v2")
    val files = Files.list(Paths.get(dir.toString, "state")).iterator()
    var names = List.empty[String]
    while (files.hasNext) names ::= files.next().getFileName.toString
    assert(names == List("1.delta"), s"temp litter: $names")
  }

  test("racing no-overwrite writers: exactly one wins, the loser gets " +
    "FAEE, no temp litter") {
    val (fm, dir) = mkFm()
    val target = new HPath(dir.toUri.toString, "wal/5")
    // both streams open BEFORE either closes — the interleaving a
    // check-then-rename protocol gets wrong (rename(2) replaces
    // silently; the link(2)-based publish must fail the loser)
    val w1 = fm.createAtomic(target, false)
    val w2 = fm.createAtomic(target, false)
    w1.write("alpha".getBytes(UTF_8))
    w2.write("beta".getBytes(UTF_8))
    w1.close()
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] { w2.close() }
    assert(readAll(fm, target) == "alpha")
    val files = Files.list(Paths.get(dir.toString, "wal")).iterator()
    var names = List.empty[String]
    while (files.hasNext) names ::= files.next().getFileName.toString
    assert(names == List("5"), s"temp litter: $names")
  }

  test("open serves seekable + positioned reads (state-store recovery shape)") {
    val (fm, dir) = mkFm()
    val target = new HPath(dir.toUri.toString, "snap/1.snapshot")
    write(fm, target, "0123456789", overwrite = true)
    val in = fm.open(target)
    try {
      in.seek(4)
      assert(in.getPos == 4)
      val tail = new Array[Byte](3)
      in.readFully(in.getPos, tail) // positioned read must not move cursor
      assert(new String(tail, UTF_8) == "456")
      assert(in.getPos == 4)
      assert(in.read() == '4'.toInt)
      val buf = new Array[Byte](2)
      in.readFully(8, buf, 0, 2)
      assert(new String(buf, UTF_8) == "89")
      intercept[java.io.EOFException] { in.readFully(9, new Array[Byte](2)) }
    } finally in.close()
  }

  test("list filters and reports sizes; delete is recursive + idempotent") {
    val (fm, dir) = mkFm()
    val d = new HPath(dir.toUri.toString, "log")
    fm.mkdirs(d)
    write(fm, new HPath(d, "1"), "aa", overwrite = true)
    write(fm, new HPath(d, "2"), "bbbb", overwrite = true)
    write(fm, new HPath(d, ".2.xyz.tmp"), "junk", overwrite = true)
    val visible = fm.list(d, new PathFilter {
      def accept(p: HPath): Boolean = !p.getName.startsWith(".")
    }).map(s => s.getPath.getName -> s.getLen).sortBy(_._1)
    assert(visible.toSeq == Seq("1" -> 2L, "2" -> 4L))
    fm.delete(d)
    assert(!fm.exists(d))
    fm.delete(d) // idempotent on missing
    intercept[java.io.FileNotFoundException] {
      fm.list(d, new PathFilter { def accept(p: HPath) = true })
    }
  }

  test("non-file scheme is rejected at construction") {
    intercept[IllegalArgumentException] {
      new NioCheckpointFileManager(new HPath("hdfs://nn/ckpt"), new Configuration())
    }
  }

  test("a streaming query checkpoints end-to-end through the NIO manager " +
    "and forks no chmod for state commits") {
    import spark.implicits._
    val dir = Files.createTempDirectory("nio_cfm_e2e_")
    val in = dir.resolve("in"); val out = dir.resolve("out")
    val ckpt = dir.resolve("ckpt")
    spark.range(0, 100).selectExpr("id % 10 AS k", "id AS v")
      .coalesce(1).write.mode("overwrite").parquet(in.toString)
    val q = spark.readStream.schema("k BIGINT, v BIGINT")
      .parquet(in.toString)
      .groupBy($"k").count()
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("overwrite").parquet(out.toString); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out.toString).as[(Long, Long)].collect().toMap
    assert(got == (0L until 10L).map(_ -> 10L).toMap)
    // the state dir was written by the NIO manager: delta files exist
    // and no Hadoop .crc litter accompanies them
    val stateFiles = Files.walk(ckpt.resolve("state")).iterator()
    var deltas = 0; var crcs = 0
    while (stateFiles.hasNext) {
      val n = stateFiles.next().getFileName.toString
      if (n.endsWith(".delta")) deltas += 1
      if (n.endsWith(".crc")) crcs += 1
    }
    assert(deltas > 0, "state store wrote no delta files through the manager")
    assert(crcs == 0, "Hadoop checksum litter => default manager was used")
  }
}
