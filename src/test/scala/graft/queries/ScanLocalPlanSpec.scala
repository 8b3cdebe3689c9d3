package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Plan-shape pins for the round-19 scan-local fusions (the
  * assignFull discipline applied to the IVF/PQ rungs and the jaccard
  * CC input): the DuckDB oracle already hash-checks every consumer's
  * RESULT at three SFs, so these specs pin the PLAN property each
  * optimization bought — corpus rows never cross a shuffle exchange
  * on the assignment/encoding path, and the CC pair input is pinned
  * — so a refactor cannot silently reintroduce the data-sized
  * exchange while staying result-green (the PqPcaSpec "moment stage
  * is join-free" discipline). Tiny broadcast-build exchanges (the
  * 128-row codebook roll-up, the 8-row subspace table) are expected
  * and allowed: the assertion is about what sits ABOVE the corpus
  * scan, not about exchanges existing at all. */
class ScanLocalPlanSpec extends graft.SparkTestBase {

  private val sfDir = sys.props.getOrElse("graft.testdata.dir",
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001"))

  /** Shuffle exchanges whose subtree scans the UNBOUNDED embeddings
    * corpus — exactly the data-sized exchanges the fusions removed.
    * Excluded by design: the deliberate RoundRobin scan-parallelize
    * repartition (emb()'s first op — it carries no grouping), and
    * exchanges over the centroid/codebook branches, which scan a
    * `vec_id <` bounded slice of the same file (16/128 rows). AQE is
    * disabled around plan capture so the executed plan is a plain
    * walkable tree (AQE wraps the plan in an adaptive root whose
    * inner tree is not visible to collect); AQE on/off does not
    * change whether an exchange exists. */
  /** The ONLY corpus-scan range predicates a shuffle may sit above:
    * the bounded centroid/codebook/query-panel slices (vec_id <
    * ivfCells / pqSubspaces·pqCentroids / queryCount), built from the
    * same constants the queries use. A bare `contains("<")` exemption
    * would let any future corpus-sized range predicate slip past the
    * pin (r19 ADVICE). */
  private val boundedSlice = {
    val bounds = Seq(VectorOps.ivfCells,
      VectorOps.pqSubspaces * VectorOps.pqCentroids,
      VectorOps.queryCount).distinct.mkString("|")
    (s"vec_id#\\d+L? < ($bounds)\\b").r
  }

  private def corpusShuffles(mkDf: => DataFrame): Seq[ShuffleExchangeExec] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      mkDf.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec
          if !e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical
              .RoundRobinPartitioning] && e.child.find {
            case f: FileSourceScanExec =>
              f.relation.location.rootPaths.mkString(",")
                .contains("embeddings") &&
                !f.dataFilters.exists(d => boundedSlice.findFirstIn(
                  d.toString).isDefined)
            case _ => false
          }.isDefined => e
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("IVF cell assignment never shuffles corpus rows " +
    "(scan-local argmax against the broadcast centroid array)") {
    val bad = corpusShuffles(
      VectorOps.assignScan(VectorOps.embSlim(spark, sfDir),
        VectorOps.ivfSeedCentroids(spark, sfDir)))
    assert(bad.isEmpty,
      s"assignment gained a corpus-sized shuffle:\n${bad.mkString("\n")}")
    // and it still assigns the whole corpus, one cell per vector
    val asg = VectorOps.assignScan(VectorOps.embSlim(spark, sfDir),
      VectorOps.ivfSeedCentroids(spark, sfDir))
    val n = Registry.table(spark, sfDir, "embeddings").count()
    assert(asg.count() == n)
    assert(asg.groupBy(col("vec_id")).count()
      .filter(col("count") > 1).count() == 0)
  }

  test("PQ encoding never shuffles corpus rows and matches the " +
    "distance-matrix argmin bit-for-bit") {
    def vecs = Registry.table(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
    val bad = corpusShuffles(
      VectorOps.pqEncode(spark, vecs, VectorOps.pqCodebook(spark, sfDir)))
    assert(bad.isEmpty,
      s"PQ encoding gained a corpus-sized shuffle:\n${bad.mkString("\n")}")
    // exactly the codes the explicit (test-only) distance matrix +
    // groupBy argmin produces — the semantics the scan-local form
    // must reproduce bit-for-bit
    val codes = VectorOps.pqEncode(spark, vecs,
      VectorOps.pqCodebook(spark, sfDir))
    val viaMatrix = VectorOps.pqCodes(VectorOps.pqDist(spark, sfDir))
    assert(codes.exceptAll(viaMatrix).count() == 0 &&
      viaMatrix.exceptAll(codes).count() == 0,
      "scan-local codes differ from the distance-matrix argmin")
  }

  test("the CC entries' pair input is materialized exactly once " +
    "(a checkpointed scan, not a re-derivable pipeline)") {
    val pairs = DedupOps.jaccardPairs(spark, sfDir, materialize = true)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"),
      s"materialize=true no longer pins the pair set:\n$plan")
    // and the pinned set equals the lazy pipeline's answer
    val lazyPairs = DedupOps.jaccardPairs(spark, sfDir)
    assert(pairs.exceptAll(lazyPairs).count() == 0 &&
      lazyPairs.exceptAll(pairs).count() == 0)
  }
}
