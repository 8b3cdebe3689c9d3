package graft

import org.apache.spark.sql.functions._

import graft.core.{VersionedJoins, VersionedTable}

/** The null-FK skew shape (j6's second join): a full outer whose left
  * key is null for most rows — every null hashes to the same shuffle
  * partition, and AQE's OptimizeSkewedJoin cannot split a FULL OUTER
  * join, so the engine's fix is the static null-split union plan
  * ([[VersionedJoins.fullOuterNullSplit]]). This spec pins (1) value
  * equality with the plain full outer on a synthetic skewed chain,
  * (2) the plan shape: a Union whose join arms carry isnotnull
  * filters on the keys (so no null row reaches the join exchange). */
class NullKeySkewSpec extends SparkTestBase {
  import spark.implicits._

  // synthetic skewed AB side: 10k rows, 90% with a null FK (the
  // "customers without orders" arm), plus versioned churn on both
  private def sides: (VersionedTable, VersionedTable) = {
    val ab = spark.range(10000).toDF("id")
      .select(col("id").as("ab_id"),
        when(col("id") % 10 === 0, col("id") % 100).as("fk"),
        (col("id") % 3).as("ver"))
    val c = spark.range(200).toDF("cid")
      .select((col("cid") % 100).as("ckey"), col("cid").as("c_id"),
        (col("cid") % 2).as("cver"), col("cid").as("payload"))
    (VersionedTable(ab, Seq(col("fk")), Seq(col("ab_id")),
      col("ver"), col("ab_id")),
      VersionedTable(c, Seq(col("ckey")), Seq(col("c_id")),
        col("cver"), col("c_id")))
  }

  test("null-split full outer equals the plain full outer") {
    val (x, y) = sides
    val plain = VersionedJoins.fullOuter(x, y, Seq("fk"), Seq("ckey"))
    val split = VersionedJoins.fullOuterNullSplit(x, y, Seq("fk"), Seq("ckey"))
    assert(plain.columns.toSeq === split.columns.toSeq)
    val pc = plain.collect().map(_.toSeq).toSet
    val sc = split.collect().map(_.toSeq).toSet
    assert(sc === pc)
    // the skew is real in the synthetic data: 9000 null-FK rows
    assert(split.filter(col("fk").isNull && col("ab_id").isNotNull)
      .count() === 9000L)
  }

  test("null rows bypass the join: union plan with isnotnull join arms") {
    val (x, y) = sides
    val split = VersionedJoins.fullOuterNullSplit(x, y, Seq("fk"), Seq("ckey"))
    val optimized = split.queryExecution.optimizedPlan.toString
    assert(optimized.contains("Union"),
      s"expected a Union of join + null arms, got:\n$optimized")
    // the not-null filters push through the key-defining projections all
    // the way to the scans (Catalyst rewrites isnotnull(fk) through the
    // CASE WHEN alias, so match the pushed form, not the column name)
    assert(optimized.linesIterator.count(l =>
        l.contains("Filter") && l.contains("isnotnull")) >= 2,
      s"expected both join arms' isnotnull filters at the scans:\n$optimized")
    // the null arm's dedup shuffles on the ids, NOT the (all-null) keys
    assert(optimized.contains("RepartitionByExpression [ab_id"),
      s"expected the left null arm clustered by its ids:\n$optimized")
    // and the join itself must survive in the optimized plan (the null
    // arms bypass it, they must not replace it)
    assert(optimized.contains("Join FullOuter"),
      s"expected the non-null arms still FULL OUTER joined:\n$optimized")
  }
}
