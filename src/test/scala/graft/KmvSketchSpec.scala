package graft

import org.apache.spark.sql.functions._

import graft.functions.{KmvSketch, TextFunctions}

/** Contracts of the KMV distinct-count sketch aggregate: exactness
  * below the sketch width, partition-layout invariance (the merge is a
  * set union — the property that makes map-side partials and streaming
  * state correct), statistical accuracy above the width, null
  * handling, and the SQL-function registration. The cross-engine
  * bit-equality contract is held by the driver rows (t_kmv_distinct /
  * s38_stream_kmv_users vs the DuckDB oracle). */
class KmvSketchSpec extends SparkTestBase {

  import spark.implicits._

  private def hashed(n: Long, dup: Int) =
    spark.range(n).selectExpr(s"id % ${n / dup} AS v")
      .select(TextFunctions.fingerprint64($"v".cast("string")).as("h"))

  test("below k the estimate IS the exact distinct count") {
    val df = hashed(200, 5) // 40 distinct < k=64
    val got = df.agg(KmvSketch.estimate(
      KmvSketch.kmvSketch($"h")).as("est")).as[Long].head()
    assert(got == 40L)
  }

  test("estimate is invariant to partition layout (mergeable set union)") {
    val base = hashed(30000, 3)
    val ests = Seq(1, 4, 13).map { p =>
      base.repartition(p)
        .agg(KmvSketch.kmvSketch($"h").as("sk"))
        .select($"sk.n_min", $"sk.kth").as[(Long, Long)].head()
    }
    assert(ests.distinct.size == 1, s"layout-dependent sketches: $ests")
    assert(ests.head._1 == 64L) // saturated at k
  }

  test("above k the estimate lands within the 4-sigma KMV error band") {
    val exact = 10000L
    val est = hashed(exact * 2, 2)
      .agg(KmvSketch.estimate(KmvSketch.kmvSketch($"h")).as("est"))
      .as[Long].head()
    // relative std error ~ 1/sqrt(k-2) = 12.7%; 4 sigma ≈ ±51%
    assert(math.abs(est - exact).toDouble / exact < 0.51,
      s"estimate $est vs exact $exact out of band")
  }

  test("nulls are skipped; an all-null/empty group estimates 0") {
    val df = Seq(Some(1L), None, Some(2L), None).toDF("h")
    val got = df.agg(KmvSketch.estimate(
      KmvSketch.kmvSketch($"h")).as("est")).as[Long].head()
    assert(got == 2L)
    val empty = spark.range(0).select($"id".as("h"))
      .agg(KmvSketch.estimate(KmvSketch.kmvSketch($"h")).as("est"))
      .as[Long].head()
    assert(empty == 0L)
  }

  test("duplicate-heavy input cannot inflate the sketch (distinct semantics)") {
    // one value repeated 100k times plus 9 singletons = 10 distinct
    val df = spark.range(100009)
      .selectExpr("CASE WHEN id < 100000 THEN 0 ELSE id - 99999 END AS v")
      .select(TextFunctions.fingerprint64($"v".cast("string")).as("h"))
    val got = df.agg(KmvSketch.estimate(
      KmvSketch.kmvSketch($"h")).as("est")).as[Long].head()
    assert(got == 10L)
  }

  test("set operations: below k the union/Jaccard/intersection " +
    "estimates are exact") {
    // A = {0..29}, B = {20..49}: |A|=30, |B|=30, |A∪B|=50 < k=64,
    // |A∩B|=10, J = 0.2 — the estimator must return these exactly
    val a = spark.range(0, 30)
      .select(TextFunctions.fingerprint64($"id".cast("string")).as("h"))
      .agg(KmvSketch.kmvHashes($"h").as("ah"))
    val b = spark.range(20, 50)
      .select(TextFunctions.fingerprint64($"id".cast("string")).as("h"))
      .agg(KmvSketch.kmvHashes($"h").as("bh"))
    val got = a.crossJoin(b)
      .withColumn("u", KmvSketch.unionMin($"ah", $"bh"))
      .select(
        KmvSketch.estimateFromHashes($"u").as("un"),
        KmvSketch.coincidences($"u", $"ah", $"bh").as("c"),
        size($"u").as("nu"))
      .as[(Long, Long, Int)].head()
    assert(got == ((50L, 10L, 50)))
  }

  test("set operations: above k the union estimate stays in band and " +
    "coincidences are bounded by k") {
    val a = hashed(8000, 2).agg(KmvSketch.kmvHashes($"h").as("ah"))
    val b = spark.range(2000, 6000) // overlaps 2000..3999 of A's 0..3999
      .select(TextFunctions.fingerprint64($"id".cast("string")).as("h"))
      .agg(KmvSketch.kmvHashes($"h").as("bh"))
    val (un, c, nu) = a.crossJoin(b)
      .withColumn("u", KmvSketch.unionMin($"ah", $"bh"))
      .select(KmvSketch.estimateFromHashes($"u").as("un"),
        KmvSketch.coincidences($"u", $"ah", $"bh").as("c"),
        size($"u").as("nu"))
      .as[(Long, Long, Int)].head()
    assert(nu == 64 && c <= 64)
    // true union 6000; 4-sigma band ±51%
    assert(math.abs(un - 6000L).toDouble / 6000 < 0.51, s"union est $un")
    // true J = 2000/6000 = 1/3; C ~ Binomial(64, 1/3) → 4-sigma ≈ ±24
    assert(math.abs(c - 64.0 / 3) < 24, s"coincidence count $c")
  }

  test("graft_kmv is SQL-registered and matches a window re-derivation") {
    graft.plans.GraftExtensions.register(spark)
    hashed(40000, 4).createOrReplaceTempView("kmv_probe")
    val viaAgg = spark.sql(
      """SELECT sk.n_min AS n_min, sk.kth AS kth FROM
        |  (SELECT graft_kmv(h, 64) AS sk FROM kmv_probe)""".stripMargin)
      .as[(Long, Long)].head()
    // the oracle formulation: k-th smallest distinct hash by window rank
    val viaRank = spark.sql(
      """SELECT count(*) AS n, max(CASE WHEN rn = 64 THEN h END) AS kth
        |FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
        |      FROM (SELECT DISTINCT h FROM kmv_probe))
        |WHERE rn <= 64""".stripMargin).as[(Long, Long)].head()
    assert(viaAgg == viaRank)
  }
}
