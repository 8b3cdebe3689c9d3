package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev harness (guide §1: measure first): runs named queries with a
  * StreamingQueryListener that dumps every microbatch's progress —
  * batchId, numInputRows, and the durationMs breakdown (addBatch,
  * getBatch, latestOffset, queryPlanning, walCommit, commitOffsets,
  * triggerExecution) plus stateOperators' commit times — so the
  * per-microbatch fixed cost of the replay rows is attributable to a
  * phase instead of guessed at. Timing wrapper prints total seconds
  * per query. Not part of any driver-checked path. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val listener = new StreamingQueryListener {
      import StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        System.err.println(s"[prof] started ${e.id}")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dur = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        val st = p.stateOperators.map(s =>
          s"${s.operatorName}:commit=${s.allUpdatesTimeMs}+${s.commitTimeMs}ms rows=${s.numRowsTotal}")
          .mkString(" | ")
        System.err.println(
          f"[prof] bid=${p.batchId}%3d rows=${p.numInputRows}%6d $dur  $st")
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    // JIT/codegen warm-up, as in Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (q <- args) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[prof] $q%-28s $dt%8.2fs rows=$n")
    }
    spark.stop()
  }
}
