package graft

/** Demonstrates the co-located join path: two tables bucketed on the
  * join key produce a sort-merge join with NO exchange on either side —
  * the pre-shuffle that makes repeated big-fact joins affordable at
  * 100 TB (shuffle once at write time, never again at read time). */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed tables join without any exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path: a broadcast join would insert a
    // BroadcastExchange and prove nothing about co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      df.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("graft_bucket_a")
      df.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("graft_bucket_b")
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }
}
