package graft

import org.apache.spark.sql.functions._

import graft.functions.{PrioritySample, TextFunctions}

/** Contracts of the hash-priority bottom-k sample aggregate:
  * exactness below the sample width, partition-layout invariance (the
  * merge is a set union-then-trim — the property that makes map-side
  * partials and streaming state correct), statistical accuracy of the
  * quantile estimates above the width, and null handling. The
  * cross-engine bit-equality contract is held by the driver rows
  * (q_quantile_sketch / s43_stream_quantile_sketch vs the DuckDB
  * oracle). */
class PrioritySampleSpec extends SparkTestBase {

  import spark.implicits._

  // value = id (so quantiles of the sample are checkable against the
  // uniform 0..n-1 ladder), priority = fingerprint of the unique id
  private def rows(n: Long) =
    spark.range(n).select(
      TextFunctions.fingerprint64($"id".cast("string")).as("h"),
      $"id".cast("double").as("v"))

  test("below k the sample IS the whole group and quantiles are exact") {
    val df = rows(100) // < k=256
    val got = df.agg(PrioritySample.sample($"h", $"v").as("xs"))
      .withColumn("sxs", array_sort($"xs"))
      .select(size($"sxs"),
        PrioritySample.discQuantile($"sxs", 0.5),
        PrioritySample.discQuantile($"sxs", 0.99))
      .as[(Int, Double, Double)].head()
    // disc quantile over the full 0..99 ladder: rank ceil(q*100)
    assert(got == ((100, 49.0, 98.0)))
  }

  test("sample is invariant to partition layout (mergeable bottom-k)") {
    val base = rows(30000)
    val samples = Seq(1, 4, 13).map { p =>
      base.repartition(p)
        .agg(PrioritySample.sample($"h", $"v").as("xs"))
        .select($"xs").as[Seq[Double]].head()
    }
    assert(samples.distinct.size == 1,
      s"layout-dependent samples: sizes ${samples.map(_.size)}")
    assert(samples.head.size == 256) // saturated at k
  }

  test("above k the quantile estimates land within the rank error band") {
    val n = 50000L
    val (p50, p90) = rows(n)
      .agg(PrioritySample.sample($"h", $"v").as("xs"))
      .withColumn("sxs", array_sort($"xs"))
      .select(PrioritySample.discQuantile($"sxs", 0.5),
        PrioritySample.discQuantile($"sxs", 0.9))
      .as[(Double, Double)].head()
    // rank rse ~ sqrt(q(1-q)/k) ≤ 3.2% at k=256; assert 4 sigma ≈ 13%
    assert(math.abs(p50 / n - 0.5) < 0.13, s"p50 $p50 off for n=$n")
    assert(math.abs(p90 / n - 0.9) < 0.13, s"p90 $p90 off for n=$n")
  }

  test("nulls are skipped; an empty group yields an empty sample") {
    val df = Seq((Some(1L), Some(1.0)), (None, Some(2.0)),
      (Some(3L), None), (Some(4L), Some(4.0)))
      .toDF("h", "v")
    val got = df.agg(PrioritySample.sample($"h", $"v").as("xs"))
      .select(array_sort($"xs")).as[Seq[Double]].head()
    assert(got == Seq(1.0, 4.0))
    val empty = spark.range(0)
      .select($"id".as("h"), $"id".cast("double").as("v"))
      .agg(PrioritySample.sample($"h", $"v").as("xs"))
      .select(size($"xs")).as[Int].head()
    assert(empty == 0)
  }

  test("graft_priority_sample is SQL-registered and matches a window re-derivation") {
    graft.plans.GraftExtensions.register(spark)
    rows(40000).createOrReplaceTempView("ps_probe")
    val viaAgg = spark.sql(
      """SELECT sort_array(graft_priority_sample(h, v, 64)) AS xs
        |FROM ps_probe""".stripMargin).as[Seq[Double]].head()
    val viaRank = spark.sql(
      """SELECT sort_array(collect_list(v)) AS xs
        |FROM (SELECT v, row_number() OVER (ORDER BY h, v) AS rn
        |      FROM (SELECT DISTINCT h, v FROM ps_probe))
        |WHERE rn <= 64""".stripMargin).as[Seq[Double]].head()
    assert(viaAgg == viaRank)
  }
}
