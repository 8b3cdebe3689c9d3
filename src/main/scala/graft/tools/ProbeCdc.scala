package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Temporary diagnostic for the CDC chunker plan (deleted after use). */
object ProbeCdc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.queries.Registry.table(spark, "/root/testdata/sf0.01", "documents")
    val q = graft.multimodal.MultimodalPipeline.cdcChunkHashes(d, col("text"), 16, 32)
    val t0 = System.nanoTime
    val n = q.count()
    println(s"count=$n time=${(System.nanoTime - t0) / 1e9}s")
    println(q.queryExecution.optimizedPlan.toString.take(4000))
    spark.stop()
  }
}
