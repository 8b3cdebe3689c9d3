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
}
