package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the
  * training-data-pipeline extensions) is declared in
  * [[graft.queries.Registry]] as a Spark implementation paired with an
  * equivalent DuckDB oracle SQL; this object just adapts that registry
  * to the driver's shape.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0: the J1 versioned full-outer join (the reference's primary
    * operator, joins.scala:10-23). */
  def entry(spark: SparkSession): DataFrame =
    queries("j1_full_outer")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(e => e.name -> e.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
