package graft

import org.apache.spark.sql.SparkSession

import graft.plans.GraftExtensions

/** Both wirings of the native-function surface: runtime registration
  * on a live session, and a session built with
  * `withExtensions(new GraftExtensions)` (what
  * `spark.sql.extensions=graft.plans.GraftExtensions` does on a
  * cluster). The SQL result must be bit-identical to the Scala API's
  * Column form (same DotProductExpr underneath). */
class ExtensionsSpec extends SparkTestBase {

  test("graft_dot registers on a live session and matches the Column API") {
    val s = spark.newSession()
    GraftExtensions.register(s)
    import s.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    df.createOrReplaceTempView("ext_vs")
    val viaSql = s.sql("SELECT graft_dot(a, b) AS d FROM ext_vs")
      .collect().head.getDouble(0)
    assert(viaSql == 32.0)
    val viaColumn = df.select(
      graft.functions.VectorFunctions.dot($"a", $"b").as("d"))
      .collect().head.getDouble(0)
    assert(viaSql == viaColumn)
  }

  test("a session built withExtensions sees graft_dot") {
    val before = SparkSession.getDefaultSession
    val beforeActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // reuses the suite's SparkContext; builds a NEW session whose
      // SessionState ran our extensions — the cluster-config path
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne spark, "expected a fresh session, got the shared one")
      import s.implicits._
      Seq((Array(0.5, 0.5), Array(2.0, 2.0))).toDF("a", "b")
        .createOrReplaceTempView("ext_vs2")
      val d = s.sql("SELECT graft_dot(a, b) AS d FROM ext_vs2")
        .collect().head.getDouble(0)
      assert(d == 2.0)
    } finally {
      before.foreach(SparkSession.setDefaultSession)
      beforeActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("naive interval join auto-bucketizes to an equi-join under the extensions") {
    import org.apache.spark.sql.functions._
    // the naive plan, on the un-extended shared session: nested loop
    import spark.implicits._
    // spans negative values: floor-division bucketing must stay
    // aligned across zero (floor(-1.5) = -2, not trunc's -1)
    val aRows = (0L until 300L).map(i => (i, i * 7L - 1000L))
    val bRows = (0L until 300L).map(i => (i, i * 11L - 997L))
    val naive = aRows.toDF("aid", "at").join(bRows.toDF("bid", "bt"),
      abs(col("at") - col("bt")) <= 50L)
    assert(naive.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "precondition: the naive interval join should be a nested loop")
    val expected = naive.select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)

    val before = SparkSession.getDefaultSession
    val beforeActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions).getOrCreate()
      import s.implicits._
      val joined = aRows.toDF("aid", "at").join(bRows.toDF("bid", "bt"),
        abs(col("at") - col("bt")) <= 50L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"interval join not bucketized:\n$plan")
      assert(plan.contains("Generate"),
        "expected the bucket explode on the right side")
      val got = joined.select("aid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, "rewritten join changed the answer")
    } finally {
      before.foreach(SparkSession.setDefaultSession)
      beforeActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("the rule also engages via experimental.extraOptimizations (the q_interval_join_auto wiring)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val a = (0L until 100L).map(i => (i, i * 7L)).toDF("e1", "t1")
    val b = (0L until 100L).map(i => (i, i * 11L + 3L)).toDF("e2", "t2")
    val naive = a.join(b, abs(col("t1") - col("t2")) <= 25L)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev :+ graft.plans.IntervalJoinBucketize
    try {
      val plan = naive.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        plan.contains("Generate"),
        s"rule did not fire through extraOptimizations:\n$plan")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("bucketization is exact beyond 2^53 (nanosecond-epoch magnitudes)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // ~1.7e18 values: a double-division floor rounds the bucket index
    // (ulp ≈ 256 there) and would drop qualifying pairs; the integer
    // floor-div must reproduce the naive join exactly
    val base = 1700000000000000000L
    val aRows = (0L until 200L).map(i => (i, base + i * 7L))
    val bRows = (0L until 200L).map(i => (i, base + i * 11L + 3L))
    val naive = aRows.toDF("e1", "t1").join(bRows.toDF("e2", "t2"),
      abs(col("t1") - col("t2")) <= 25L)
    val expected = naive.select("e1", "e2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev :+ graft.plans.IntervalJoinBucketize
    try {
      val got = naive.select("e1", "e2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"precision loss in bucketization: missing ${expected -- got}")
    } finally spark.experimental.extraOptimizations = prev
  }
}
