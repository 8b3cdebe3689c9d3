package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKPairsAgg

/** Contracts of the mergeable top-k aggregate that replaced the
  * `row_number` window in the ANN serving tails: correct (score, id)
  * ordering with ties broken by id, partition-layout invariance (the
  * merge is union-then-trim — the property that makes map-side
  * partials correct), null skipping, descending-by-negation round
  * trip, and the PLAN shape the swap was for — a partial
  * ObjectHashAggregate BEFORE the exchange, so k·queries·partitions
  * pairs shuffle instead of every scored row. The cross-engine
  * bit-equality contract is held by the driver rows (every `*_topk`
  * query vs its DuckDB window oracle). */
class TopKPairsSpec extends SparkTestBase {

  import spark.implicits._

  private def pairs(n: Int) =
    spark.range(n)
      .selectExpr("id % 4 AS query_id",
        "CAST((id * 37) % 101 AS DOUBLE) AS score", "id AS neighbor_id")

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"query_id")
      .agg(TopKPairsAgg.topkPairs($"score", $"neighbor_id", k).as("tk"))
      .select($"query_id", posexplode($"tk").as(Seq("pos", "x")))
      .select($"query_id", ($"pos" + 1).as("rank"),
        $"x.id".as("neighbor_id"), $"x.score".as("score"))

  test("matches the row_number window on (score ASC, id ASC) incl. ties") {
    val df = pairs(400) // 101 distinct scores over 100 rows/group: ties
    val viaAgg = topk(df, 7).as[(Long, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))
    val viaWin = df
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"score", $"neighbor_id")))
      .filter($"rank" <= 7)
      .select($"query_id", $"rank", $"neighbor_id", $"score")
      .as[(Long, Int, Long, Double)]
      .collect().map(r => (r._1, r._2.toLong, r._3, r._4))
      .sortBy(r => (r._1, r._2))
    assert(viaAgg.toSeq == viaWin.toSeq)
  }

  test("result is invariant to partition layout (mergeable union-trim)") {
    val base = pairs(4000)
    val runs = Seq(1, 5, 17).map { p =>
      topk(base.repartition(p), 5)
        .as[(Long, Long, Long, Double)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    }
    assert(runs.distinct.size == 1, "layout-dependent top-k")
  }

  test("null scores and ids are skipped, not ranked") {
    val df = Seq(
      (0L, Some(3.0), Some(10L)), (0L, None, Some(11L)),
      (0L, Some(1.0), None), (0L, Some(2.0), Some(12L)))
      .toDF("query_id", "score", "neighbor_id")
    val got = topk(df, 5).as[(Long, Long, Long, Double)].collect()
      .sortBy(_._2).toSeq
    assert(got == Seq((0L, 1L, 12L, 2.0), (0L, 2L, 10L, 3.0)))
  }

  test("descending rank via negation round-trips scores bit-for-bit") {
    val df = Seq((0L, 0.123456, 1L), (0L, 0.0, 2L), (0L, 7.25, 3L))
      .toDF("query_id", "score", "neighbor_id")
    val got = df.groupBy($"query_id")
      .agg(TopKPairsAgg.topkPairs(-$"score", $"neighbor_id", 2).as("tk"))
      .select(posexplode($"tk").as(Seq("pos", "x")))
      .select($"x.id", (-$"x.score").as("score"))
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((3L, 7.25), (1L, 0.123456)))
  }

  test("the aggregate reduces map-side: partial ObjectHashAggregate " +
    "precedes the exchange") {
    val plan = topk(pairs(1000), 5).queryExecution.executedPlan.toString
    val objAggIdx = plan.indexOf("ObjectHashAggregate")
    // anchor the SHUFFLE exchange: a bare "Exchange" could match a
    // BroadcastExchange/ReusedExchange line first and weaken the pin
    val exchIdx = plan.indexOf("Exchange hashpartitioning")
    assert(objAggIdx >= 0, s"no ObjectHashAggregate in plan:\n$plan")
    assert(exchIdx >= 0, s"no shuffle exchange in plan:\n$plan")
    // executedPlan prints top-down: the FINAL agg sits above the
    // exchange and the PARTIAL agg below it — a partial below the
    // exchange means the k-trim ran before any row shuffled.
    val below = plan.substring(exchIdx)
    assert(below.contains("ObjectHashAggregate") &&
      below.contains("partial_graft_topk_pairs"),
      s"no partial top-k aggregate below the exchange:\n$plan")
  }
}
