package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{AssignedVec, SemDecision, SemanticStreamDedup}

/** Order-independence of the incremental SemDeDup decision stream
  * (s30): the batch rule — drop v iff ANY same-cell u with a lower id
  * has cos ≥ τ — is an order-free EXISTS, so the streamed decisions
  * must converge to it under ADVERSARIAL arrival orders, including the
  * retraction case the driver's in-id-order replay never exercises: an
  * earlier-id near-duplicate arriving AFTER a later-id vector was
  * already admitted must flip that vector to kept=false. */
class SemanticDedupSpec extends SparkTestBase {

  private val tau = 0.9

  // unit vectors: a ∥ b (sim 1.0), c orthogonal to both
  private def vec(x: Double, y: Double): Seq[Double] =
    Seq(x, y) ++ Seq.fill(6)(0.0)

  private def av(id: Long, cell: Long, e: Seq[Double]): AssignedVec = {
    val n = math.sqrt(e.map(d => d * d).sum)
    AssignedVec(id, cell, e, n)
  }

  private def run(batches: Seq[Seq[AssignedVec]]): Seq[SemDecision] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[AssignedVec]
    val q = SemanticStreamDedup.decisions(src.toDS(), tau)
      .toDF().writeStream.outputMode("update")
      .format("memory").queryName("sem_dec").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table("sem_dec").as[SemDecision].collect().toSeq
  }

  private def converged(dec: Seq[SemDecision]): Map[Long, Boolean] =
    dec.groupBy(_.vec_id).map { case (id, ds) =>
      id -> ds.maxBy(_.seq).kept
    }

  test("late-arriving earlier-id near-dup retracts an admitted vector") {
    val u = av(1, 0, vec(1, 0)) // earlier id, parallel to v
    val v = av(5, 0, vec(1, 0))
    val w = av(3, 0, vec(0, 1)) // orthogonal: kept regardless
    val dec = run(Seq(Seq(v, w), Seq(u)))
    // v admitted in batch 1, retracted in batch 2
    val vDecs = dec.filter(_.vec_id == 5).sortBy(_.seq)
    assert(vDecs.map(_.kept) == Seq(true, false))
    assert(converged(dec) == Map(1L -> true, 3L -> true, 5L -> false))
  }

  test("arrival order never changes the converged answer") {
    val all = Seq(
      av(1, 0, vec(1, 0)), av(5, 0, vec(1, 0)), av(3, 0, vec(0, 1)),
      av(7, 0, vec(1, 0.01)), // near-dup of ids 1 and 5
      av(2, 1, vec(1, 0)), av(4, 1, vec(1, 0))) // second cell
    // batch expectation from the EXISTS rule
    def sim(a: AssignedVec, b: AssignedVec): Double = {
      val d = a.e.zip(b.e).map { case (x, y) => x * y }.sum
      BigDecimal(d / (a.nrm * b.nrm))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = all.map { x =>
      x.vec_id -> !all.exists(u => u.cell == x.cell &&
        u.vec_id < x.vec_id && sim(u, x) >= tau)
    }.toMap
    val orders = Seq(
      all.sortBy(_.vec_id).map(Seq(_)),            // in order, 1/batch
      all.sortBy(-_.vec_id).map(Seq(_)),           // exact reverse
      Seq(all),                                    // all at once
      Seq(Seq(all(1), all(3)), Seq(all(0), all(5)),
        Seq(all(2), all(4))))                      // interleaved
    orders.foreach { o => assert(converged(run(o)) == expected) }
  }

  test("re-delivered vector is idempotent (no duplicate decisions)") {
    val u = av(1, 0, vec(1, 0))
    val dec = run(Seq(Seq(u), Seq(u)))
    assert(dec.filter(_.vec_id == 1).map(_.kept) == Seq(true))
  }

  // Fault tolerance: the cell state (members + decisions) must survive
  // a stop/restart from checkpoint — a vector admitted BEFORE the
  // restart must be retracted by an earlier-id near-dup arriving AFTER
  // it, which requires the restored state to still hold the admitted
  // vector's embedding. Run on the default provider and under the
  // production RocksDB + changelog config.
  test("retraction works across a checkpoint restart") {
    recoveryScenario()
  }
  test("retraction across restart under RocksDB + changelog") {
    graft.streaming.VersionedStreamJoin.withStateStoreProvider(spark) {
      recoveryScenario()
    }
  }

  private def recoveryScenario(): Unit = {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val tmp = java.nio.file.Files.createTempDirectory("graft_semrec_")
    try {
      val in = java.nio.file.Files.createDirectories(tmp.resolve("in"))
      val log = tmp.resolve("log").toString
      val ckpt = tmp.resolve("ckpt").toString
      def append(rows: AssignedVec*): Unit =
        rows.toDS().coalesce(1).write.mode("append").parquet(in.toString)
      def startQuery() =
        SemanticStreamDedup.decisions(
          spark.readStream
            .schema("vec_id BIGINT, cell BIGINT, e ARRAY<DOUBLE>, nrm DOUBLE")
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "part-*")
            .parquet(in.toString).as[AssignedVec], tau)
          .toDF().writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.coalesce(1).write.mode("append").parquet(log)
            ()
          }.start()

      // phase 1: v5 admitted, v3 orthogonal admitted, then STOP
      append(av(5, 0, vec(1, 0)), av(3, 0, vec(0, 1)))
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()
      val phase1 = spark.read.parquet(log)
        .as[SemDecision].collect().toSeq
      assert(converged(phase1) == Map(5L -> true, 3L -> true))
      val phase1Rows = phase1.size

      // phase 2: earlier-id near-dup of v5 arrives; a NEW query resumes
      append(av(1, 0, vec(1, 0)))
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()
      val all = spark.read.parquet(log).as[SemDecision].collect().toSeq
      assert(converged(all) == Map(1L -> true, 3L -> true, 5L -> false),
        s"restored state failed to retract: ${all.sortBy(d => (d.vec_id, d.seq))}")
      // the retraction must be a NEW phase-2 emission, and the restarted
      // source must not have reprocessed the phase-1 file (v3 untouched)
      assert(all.size > phase1Rows)
      assert(all.count(_.vec_id == 3) == 1,
        "phase 2 re-emitted an untouched key — source reprocessed old files")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
