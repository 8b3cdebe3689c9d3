package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: prints join/exchange nodes of named queries' executed
  * plans (used to audit for BroadcastNestedLoopJoin/CartesianProduct). */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      println(s"== $q: BNLJ=${plan.contains("BroadcastNestedLoopJoin")} cartesian=${plan.contains("CartesianProduct")}")
      println(plan.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange"))
        .map(_.take(120)).mkString("\n"))
    }
    spark.stop()
  }
}
