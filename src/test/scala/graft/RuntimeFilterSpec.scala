package graft

import org.apache.spark.sql.functions._

/** Runtime row-level filtering on shuffle joins — the third pruning
  * layer beside static pushdown (PartitionPruningSpec) and bucketing
  * (BucketingSpec). When a fact⋈dim join cannot broadcast (both sides
  * big at 100 TB), Catalyst's InjectRuntimeFilter can still build a
  * bloom filter from the dim side's selective predicate and apply it
  * to the fact scan, discarding non-joining fact rows BEFORE the
  * shuffle — at scale this is the difference between shuffling the
  * full fact table and shuffling the matching fraction. The conf
  * thresholds exist because building the filter costs a pass over the
  * dim side; the spec drops them to zero to exercise the plan shape
  * on test data. */
class RuntimeFilterSpec extends SparkTestBase {

  private val dir = sys.props.getOrElse("graft.testdata.dir",
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001"))

  test("a selective dim predicate injects a bloom filter into the " +
    "fact-side scan of a shuffle join, preserving results") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force the non-broadcast plan the optimization exists for
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def query = {
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_partkey"), col("l_quantity"))
        val pa = spark.read.parquet(s"$dir/part.parquet")
          .filter(col("p_size") <= 5) // selective: builds the filter
          .select(col("p_partkey"), col("p_size"))
        li.join(pa, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_size"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      }
      val plan = query.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter in plan:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        "expected a shuffle join (broadcast disabled)")
      val filtered = query.orderBy(col("p_size")).collect().toSeq
      // same query with the optimization off must agree exactly
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val baseline = query.orderBy(col("p_size")).collect().toSeq
      assert(filtered == baseline)
      assert(filtered.nonEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
