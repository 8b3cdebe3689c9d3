package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** The sink-side scale contract: a corpus written `partitionBy` a
  * low-cardinality curation column is PRUNED at read time — a filtered
  * query lists only the matching directories, so at 100 TB a
  * per-language (or per-split, per-date) read touches that partition's
  * bytes and nothing else. Complements BucketingSpec (join-side
  * pre-shuffle) on the write path.
  */
class PartitionPruningSpec extends SparkTestBase {

  private val sfDir = sys.props.getOrElse("graft.testdata.dir",
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001"))

  test("partitionBy write is partition-pruned on filtered read") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part_").toString
    try {
      val docs = queries.Registry.table(spark, sfDir, "documents")
      docs.write.mode("overwrite").partitionBy("lang").parquet(tmp)
      val nLangs = docs.select("lang").distinct().count()
      assert(nLangs > 1, "need multiple partitions for pruning to mean anything")

      val filtered = spark.read.parquet(tmp).filter(col("lang") === "en")
      val scans = filtered.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "expected a file scan")
      // the scan must carry the partition filter and list ONE directory
      assert(scans.head.partitionFilters.nonEmpty,
        s"lang filter did not reach partition pruning:\n${filtered.queryExecution}")
      assert(scans.head.selectedPartitions.partitionCount == 1,
        s"expected 1 of $nLangs partitions, scanned ${scans.head.selectedPartitions.partitionCount}")
      // and the data still round-trips
      val expected = docs.filter(col("lang") === "en").count()
      assert(filtered.count() == expected)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator()
        .asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
