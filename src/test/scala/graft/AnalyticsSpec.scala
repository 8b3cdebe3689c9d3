package graft

import org.apache.spark.sql.functions._

/** Checks on the analytics surface beyond what the DuckDB-oracle gate
  * covers — here, the scale substitution the q_percentiles entry
  * documents: approx_percentile (single-pass, mergeable — the 100 TB
  * shape) must satisfy its rank-error guarantee against the raw data.
  * Value-equality with the interpolating exact percentile is NOT the
  * sketch's contract (it returns an actual sample), so the assertion
  * is on the empirical rank of the returned value. */
class AnalyticsSpec extends SparkTestBase {

  private val sfDir = sys.props.getOrElse("graft.testdata.dir",
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001"))

  test("approx_percentile lands within 2% rank error of the requested quantile") {
    val ev = graft.queries.Registry.table(spark, sfDir, "events")
    val approx = ev.groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, 0.5, 10000)").as("a50"),
        expr("approx_percentile(value, 0.99, 10000)").as("a99"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.nonEmpty)
    val byType = ev.select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    approx.foreach { case (et, (a50, a99)) =>
      val vs = byType(et)
      def rankOf(a: Double): Double = vs.count(_ <= a).toDouble / vs.length
      assert(math.abs(rankOf(a50) - 0.5) <= 0.02, s"$et: p50=$a50 rank=${rankOf(a50)}")
      assert(rankOf(a99) >= 0.97, s"$et: p99=$a99 rank=${rankOf(a99)}")
    }
  }
}
