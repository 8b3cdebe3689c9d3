package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** One driver-checkable query: a Spark implementation plus (usually) an
  * equivalent DuckDB oracle SQL over the same parquet tables. Queries
  * without an expressible SQL oracle (`oracle = None`) get the driver's
  * weaker rows-only check. */
final case class Entry(name: String,
                       fn: (SparkSession, String) => DataFrame,
                       oracle: Option[String])

object Registry {
  lazy val all: Seq[Entry] = {
    val entries =
      ReferenceJoins.entries ++ Analytics.entries ++
        DecisionSupport.entries ++ TextOps.entries ++
        DedupOps.entries ++ VectorOps.entries ++ MultimodalOps.entries ++
        PipelineOps.entries ++ StreamingOps.entries
    val dup = entries.groupBy(_.name).collect { case (n, es) if es.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate query names would be silently dropped by the driver's Map: $dup")
    entries
  }

  /** Shared parquet loader for the driver testdata layout.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses to read as a timestamp ([PARQUET_TYPE_ILLEGAL]); we read it
    * as raw nanos via the legacy conf and convert to a microsecond
    * TimestampType — the values are exact µs multiples, and DuckDB's
    * TIMESTAMP is µs as well, so the two engines see identical instants.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events") {
      // set-if-unset avoids redundant conf writes; every caller writes
      // the same value, so the benign check-then-set race cannot
      // produce a wrong setting
      if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(path)
  }
}
