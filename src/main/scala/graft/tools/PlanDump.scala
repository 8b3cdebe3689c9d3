package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness (guide §1.2/§7.2): writes `explain("formatted")` of the
  * named queries to one file each under the directory given by
  * SPARK_GRAFT_PLAN_DIR (default /tmp/graft_plans), suffixed by
  * SPARK_GRAFT_PLAN_TAG (e.g. "before"/"after"). Bench-identical
  * session conf so the captured plans are the ones the bench runs. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "/tmp/graft_plans"))
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "plan")
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${q}_$tag.txt"),
        txt.getBytes("UTF-8"))
      System.err.println(s"[plandump] $q -> ${q}_$tag.txt")
    }
    spark.stop()
  }
}
