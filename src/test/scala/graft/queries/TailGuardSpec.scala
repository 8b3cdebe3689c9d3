package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Guards added in round 15 around the serving-tail and streamed-CC
  * machinery, beyond the driver's oracle rows. Lives in
  * `graft.queries` to reach the `private[queries]` helpers.
  *
  * 1. topkTail's NULL/NaN invariant must fail LOUDLY: the aggregate
  *    silently drops nulls and a desc sort would rank NaN opposite to
  *    the window it replaced, so a zero-norm vector reaching a cosine
  *    tail has to be an error, not a silent reorder.
  * 2. s62's incremental contraction algebra: folding edge chunks into
  *    a carried star forest — in ANY arrival order — must reach the
  *    same labeling as one-shot connected components over all edges.
  *    This is the property that makes the streamed twin's convergence
  *    independent of chunking/replay order.
  */
class TailGuardSpec extends graft.SparkTestBase {

  import spark.implicits._

  test("topkTail raises on a NaN score instead of silently reordering") {
    val scored = Seq((0L, 1L, 0.5), (0L, 2L, Double.NaN))
      .toDF("query_id", "neighbor_id", "sim")
    val ex = intercept[Exception] {
      VectorOps.topkTail(scored, 2, "sim", desc = true).collect()
    }
    assert(ex.getMessage != null &&
      (ex.getMessage.contains("topkTail") ||
        Option(ex.getCause).exists(_.getMessage.contains("topkTail"))),
      s"expected the topkTail guard, got: $ex")
  }

  test("topkTail raises on a NULL score instead of silently dropping") {
    val scored = Seq((0L, 1L, Some(0.5)), (0L, 2L, None))
      .toDF("query_id", "neighbor_id", "sim")
    val ex = intercept[Exception] {
      VectorOps.topkTail(scored, 2, "sim", desc = false).collect()
    }
    assert(ex.getMessage != null &&
      (ex.getMessage.contains("topkTail") ||
        Option(ex.getCause).exists(_.getMessage.contains("topkTail"))),
      s"expected the topkTail guard, got: $ex")
  }

  test("topkTail on clean scores matches the row_number window") {
    val scored = spark.range(200)
      .selectExpr("id % 5 AS query_id", "id AS neighbor_id",
        "CAST((id * 37) % 101 AS DOUBLE) / 100 AS sim")
    val viaTail = VectorOps.topkTail(scored, 3, "sim", desc = true)
      .select("query_id", "rank", "neighbor_id", "sim")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val viaWin = scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"query_id")
          .orderBy($"sim".desc, $"neighbor_id")))
      .filter($"rank" <= 3)
      .select("query_id", "rank", "neighbor_id", "sim")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(viaTail.toSeq == viaWin.toSeq)
  }

  // the s62 per-batch step, verbatim: contract (new edges ∪ carried
  // stars) back to a star forest
  private def contract(stars: DataFrame, batch: DataFrame): DataFrame =
    graft.core.GraphTools
      .connectedComponents(batch.unionAll(stars), "d1", "d2")
      .select(col("id").as("d1"), col("component").as("d2"))
      .localCheckpoint()

  test("incremental star-forest contraction is arrival-order invariant " +
    "and equals one-shot CC") {
    // two components joined late, a chain split across chunks, a
    // singleton edge — shapes where a naive incremental scheme breaks
    val edges = Seq(
      (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (3L, 10L),
      (20L, 21L), (30L, 31L), (31L, 32L), (32L, 33L), (21L, 30L))
    val oneShot = graft.core.GraphTools
      .connectedComponents(edges.toDF("d1", "d2"), "d1", "d2")
      .as[(Long, Long)].collect().toMap
    val empty = spark.range(0).select(col("id").as("d1"), col("id").as("d2"))
    for (chunks <- Seq(edges.grouped(2).toSeq, edges.grouped(3).toSeq,
        edges.reverse.grouped(4).toSeq)) {
      val folded = chunks.foldLeft(empty) { (stars, chunk) =>
        contract(stars, chunk.toDF("d1", "d2"))
      }.as[(Long, Long)].collect().toMap
      assert(folded == oneShot,
        s"incremental labels diverged for chunking $chunks")
    }
  }
}
