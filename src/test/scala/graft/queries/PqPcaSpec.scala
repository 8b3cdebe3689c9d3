package graft.queries

import org.apache.spark.sql.functions._

/** Behavioral invariants of the PQ and PCA training rungs beyond
  * their oracle-hashed driver rows — the mathematical guarantees the
  * algorithms carry, checked on the real corpus. Lives in the
  * `graft.queries` package to reach the `private[queries]` builders
  * (the same intermediate tables the queries compose). */
class PqPcaSpec extends graft.SparkTestBase {

  private val sfDir = sys.props.getOrElse("graft.testdata.dir",
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001"))

  test("PQ codes: exactly one code per (vector, subspace), all in [0, k)") {
    val codes = VectorOps.pqCodes(VectorOps.pqDist(spark, sfDir))
    val n = Registry.table(spark, sfDir, "embeddings").count()
    assert(codes.count() == n * VectorOps.pqSubspaces)
    val bad = codes.filter(col("code") < 0 ||
      col("code") >= VectorOps.pqCentroids).count()
    assert(bad == 0, "code outside the codebook range")
    val dup = codes.groupBy(col("vec_id"), col("s")).count()
      .filter(col("count") > 1).count()
    assert(dup == 0, "duplicate code for a (vector, subspace)")
  }

  // The moment stage must stay JOIN-FREE: each vector fans out to its
  // (i, j, xi·xj) cells inside the scan and only the 4,096-group
  // partial agg exchanges. The join shape it replaces (posexploded
  // self-join on vec_id) was linear too but shuffled 2×(n·64) slim
  // rows before the agg — this pins the better plan so a refactor
  // cannot silently reintroduce the data-sized shuffle.
  test("PCA moment matrix plan is join-free (scan-local outer product)") {
    val m = VectorOps.momentMatrix(spark, sfDir)
    val plan = m.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"moment stage gained a join:\n$plan")
    // and it still carries the full fixed-size matrix
    assert(m.count() == 64L)
  }

  test("k-means monotonicity: one M-step does not increase total " +
    "PQ quantization distortion") {
    def assignedDistortion(dist: org.apache.spark.sql.DataFrame): Double =
      dist.groupBy(col("vec_id"), col("s"))
        .agg(min(col("d2")).as("best"))
        .agg(sum(col("best"))).head.getDouble(0)
    val seeded = assignedDistortion(
      VectorOps.pqDist(spark, sfDir).withColumn("d2", col("d2").cast("double")))
    // trained distances are micro-quantized (x1e6); rescale, and allow
    // the half-up quantization slack (0.5e-6 per (vector, subspace))
    val trained = assignedDistortion(
      VectorOps.pqTrainedDist(spark, sfDir)
        .withColumn("d2", col("d2").cast("double"))) / 1e6
    val n = Registry.table(spark, sfDir, "embeddings").count()
    val slack = 0.5e-6 * n * VectorOps.pqSubspaces
    assert(trained <= seeded + slack,
      f"M-step increased distortion: $trained%.3f > $seeded%.3f")
    assert(trained > 0, "degenerate zero distortion")
  }

  test("power iteration: Rayleigh quotient is non-decreasing in rounds " +
    "and the returned direction is unit-norm") {
    def rayleigh(iters: Int): Long =
      VectorOps.pcaPowerFromMoment(spark,
          VectorOps.momentMatrix(spark, sfDir).localCheckpoint(), iters)
        .select(col("rayleigh")).head.getLong(0)
    val r1 = rayleigh(1); val r3 = rayleigh(3)
    assert(r3 >= r1, s"Rayleigh decreased across power rounds: $r1 -> $r3")
    assert(r1 > 0, "non-positive Rayleigh on a non-degenerate corpus")
    // unit norm: sum of squared micro-quantized components ≈ 1
    val comps = Registry.all.find(_.name == "v_pca_power3").get
      .fn(spark, sfDir)
      .agg(sum(col("comp") * col("comp"))).head.getDouble(0)
    assert(math.abs(comps - 1.0) < 1e-3,
      f"direction not unit-norm: |y|^2 = $comps%.6f")
  }

  test("all-but-the-top: residual norms never exceed the original norms") {
    val out = Registry.all.find(_.name == "v_pca_remove_top").get
      .fn(spark, sfDir)
    val gv = Registry.table(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.norm(
          transform(col("embedding").cast("array<double>"),
            x => floor(x * VectorOps.pqGrid + lit(0.5)).cast("double")))
          .as("gnorm"))
    val joined = out.join(gv, "vec_id")
    val bad = joined.filter(col("resid_norm_milli") >
      col("gnorm") + lit(0.001)).count()
    assert(bad == 0, "a residual norm exceeded its original norm")
    val shrunk = joined.filter(col("resid_norm_milli") <
      col("gnorm") - lit(0.001)).count()
    assert(shrunk > 0, "removing the top direction changed nothing")
  }
}
