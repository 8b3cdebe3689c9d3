package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{VersionedDedup, VersionedJoins, VersionedTable}

/** The reference's operator surface (SURVEY.md §2.1–§2.3: J1–J5, D1, D2)
  * instantiated over the driver's `events` table, which plays the
  * versioned-upsert stream: join key = `user_id`, primary id =
  * `event_type` (so the latest event of each type supersedes earlier
  * ones — a per-user upsert register), version = (`ts`, `event_id`).
  *
  * The X side is signup/error events, the Y side click/purchase/view;
  * modulo filters on `user_id` carve out keys that exist on only one
  * side so the outer-join arms are exercised
  * (reference cogroupFunctions.scala:13-18 — the (None, Some(y)) /
  * (Some(x), None) emission).
  */
object ReferenceJoins {

  /** X side: deduped versioned view of signup/error events. */
  private def xTable(spark: SparkSession, dir: String): VersionedTable = {
    val df = Registry.table(spark, dir, "events")
      .filter(col("event_type").isin("signup", "error") &&
        col("user_id") % 3 =!= 0)
      .select(col("user_id"),
        col("event_id").as("x_event_id"),
        col("event_type").as("x_type"),
        col("ts").as("x_ts"),
        col("value").as("x_value"))
    VersionedTable(df, Seq(col("user_id")), Seq(col("x_type")),
      col("x_ts"), col("x_event_id"))
  }

  /** Y side: deduped versioned view of click/purchase/view events. */
  private def yTable(spark: SparkSession, dir: String): VersionedTable = {
    val df = Registry.table(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase", "view") &&
        col("user_id") % 5 =!= 0)
      .select(col("user_id").as("y_user_id"),
        col("event_id").as("y_event_id"),
        col("event_type").as("y_type"),
        col("ts").as("y_ts"),
        col("value").as("y_value"))
    VersionedTable(df, Seq(col("y_user_id")), Seq(col("y_type")),
      col("y_ts"), col("y_event_id"))
  }

  private val xSql =
    """SELECT user_id, event_id AS x_event_id, event_type AS x_type, ts AS x_ts, value AS x_value
      |FROM events WHERE event_type IN ('signup','error') AND user_id % 3 <> 0
      |QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1""".stripMargin

  private val xKeySql = // D1 X-side quirk: latest per key, not per (key,id)
    """SELECT user_id, event_id AS x_event_id, event_type AS x_type, ts AS x_ts, value AS x_value
      |FROM events WHERE event_type IN ('signup','error') AND user_id % 3 <> 0
      |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin

  private val ySql =
    """SELECT user_id AS y_user_id, event_id AS y_event_id, event_type AS y_type, ts AS y_ts, value AS y_value
      |FROM events WHERE event_type IN ('click','purchase','view') AND user_id % 5 <> 0
      |QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1""".stripMargin

  /** Shared with StreamingOps: the streaming J1/J2/J3 variants must
    * converge to exactly these batch answers. */
  private[queries] val j1OracleSql: String =
    s"""WITH x AS ($xSql), y AS ($ySql)
       |SELECT coalesce(x.user_id, y.y_user_id) AS user_id,
       |  x_event_id, x_type, x_ts, y_event_id, y_type, y_ts
       |FROM x FULL OUTER JOIN y ON x.user_id = y.y_user_id
       |ORDER BY user_id, x_type ASC NULLS FIRST, y_type ASC NULLS FIRST""".stripMargin

  private[queries] val j2OracleSql: String =
    s"""WITH x AS ($xKeySql), y AS ($ySql)
       |SELECT x.user_id, x_event_id, x_type, x_ts, y_event_id, y_type, y_ts
       |FROM x LEFT OUTER JOIN y ON x.user_id = y.y_user_id
       |ORDER BY user_id, y_type ASC NULLS FIRST""".stripMargin

  private[queries] val j3OracleSql: String =
    s"""WITH x AS ($xKeySql), y AS ($ySql),
       |ya AS (SELECT y_user_id, list(y_event_id ORDER BY y_event_id) AS y_event_ids
       |       FROM y GROUP BY y_user_id)
       |SELECT x.user_id, x_event_id, x_type, x_ts,
       |  coalesce(array_to_string(y_event_ids, ','), '') AS y_event_ids,
       |  coalesce(len(y_event_ids), 0) AS y_n
       |FROM x LEFT OUTER JOIN ya ON x.user_id = ya.y_user_id
       |ORDER BY user_id""".stripMargin

  private[queries] val j4OracleSql: String =
    s"""WITH x AS ($xSql), y AS ($ySql),
       |xa AS (SELECT user_id, list(x_event_id ORDER BY x_event_id) AS x_event_ids
       |       FROM x GROUP BY user_id),
       |ya AS (SELECT y_user_id, list(y_event_id ORDER BY y_event_id) AS y_event_ids
       |       FROM y GROUP BY y_user_id)
       |SELECT coalesce(xa.user_id, ya.y_user_id) AS user_id,
       |  coalesce(array_to_string(x_event_ids, ','), '') AS x_event_ids,
       |  coalesce(array_to_string(y_event_ids, ','), '') AS y_event_ids
       |FROM xa FULL OUTER JOIN ya ON xa.user_id = ya.y_user_id
       |ORDER BY user_id""".stripMargin

  /** Shared with StreamingOps: the streaming inner join (s10) must
    * converge to exactly this batch answer. */
  private[queries] val j5OracleSql: String =
    s"""WITH x AS ($xSql), y AS ($ySql)
       |SELECT x.user_id, x_event_id, x_type, x_ts, y_event_id, y_type, y_ts
       |FROM x JOIN y ON x.user_id = y.y_user_id
       |ORDER BY user_id, x_type, y_type""".stripMargin

  def entries: Seq[Entry] = Seq(

    Entry("j1_full_outer",
      (spark, dir) => {
        VersionedJoins.fullOuter(xTable(spark, dir), yTable(spark, dir),
            Seq("user_id"), Seq("y_user_id"))
          .select(coalesce(col("user_id"), col("y_user_id")).as("user_id"),
            col("x_event_id"), col("x_type"), col("x_ts"),
            col("y_event_id"), col("y_type"), col("y_ts"))
          .orderBy(col("user_id"), asc_nulls_first("x_type"),
            asc_nulls_first("y_type"))
      },
      Some(j1OracleSql)),

    Entry("j2_left_outer",
      (spark, dir) => {
        VersionedJoins.leftOuter(xTable(spark, dir), yTable(spark, dir),
            Seq("user_id"), Seq("y_user_id"))
          .select(col("user_id"), col("x_event_id"), col("x_type"),
            col("x_ts"), col("y_event_id"), col("y_type"), col("y_ts"))
          .orderBy(col("user_id"), asc_nulls_first("y_type"))
      },
      Some(j2OracleSql)),

    // The nested Seq output is serialized to a comma-joined string in
    // the final projection: the driver's comparator sorts rows with
    // pandas and cannot hash array cells. The arrays are sort_array'd
    // first, so the string is deterministic and order-faithful.
    Entry("j3_left_outer_seq",
      (spark, dir) => {
        VersionedJoins.leftOuterSeq(xTable(spark, dir), yTable(spark, dir),
            Seq("user_id"), Seq("y_user_id"),
            sort_array(collect_list(col("y_event_id"))), "y_event_ids")
          .withColumn("y_n", size(col("y_event_ids")).cast("long"))
          .select(col("user_id"), col("x_event_id"), col("x_type"),
            col("x_ts"),
            concat_ws(",", col("y_event_ids").cast("array<string>"))
              .as("y_event_ids"),
            col("y_n"))
          .orderBy(col("user_id"))
      },
      Some(j3OracleSql)),

    Entry("j4_full_outer_seq",
      (spark, dir) => {
        VersionedJoins.fullOuterSeq(xTable(spark, dir), yTable(spark, dir),
            Seq("user_id"), Seq("y_user_id"),
            sort_array(collect_list(col("x_event_id"))), "x_event_ids",
            sort_array(collect_list(col("y_event_id"))), "y_event_ids")
          .select(coalesce(col("user_id"), col("y_user_id")).as("user_id"),
            concat_ws(",", col("x_event_ids").cast("array<string>"))
              .as("x_event_ids"),
            concat_ws(",", col("y_event_ids").cast("array<string>"))
              .as("y_event_ids"))
          .orderBy(col("user_id"))
      },
      Some(j4OracleSql)),

    Entry("j5_inner",
      (spark, dir) => {
        VersionedJoins.inner(xTable(spark, dir), yTable(spark, dir),
            Seq("user_id"), Seq("y_user_id"))
          .select(col("user_id"), col("x_event_id"), col("x_type"),
            col("x_ts"), col("y_event_id"), col("y_type"), col("y_ts"))
          .orderBy(col("user_id"), col("x_type"), col("y_type"))
      },
      Some(j5OracleSql)),

    // J6: the reference's 3-level chain A 1—N B 1—N C
    // (GenJoinInput.scala:32-34, dissociateABC JoinSpec.scala:42-56)
    // as two CHAINED versioned full-outer joins in one pipeline, over
    // the driver's real FK chain customer → orders → lineitem. The
    // customer/orders versions are degenerate (one version per id),
    // but the driver's lineitem table carries REAL churn: duplicate
    // (l_orderkey, l_linenumber) identities with different payloads
    // (11,785 dup groups at sf0.01). The C side therefore versions
    // lineitem by l_shipdate with l_extendedprice as the deterministic
    // tiebreak — (l_orderkey, l_linenumber, l_shipdate,
    // l_extendedprice) is verified unique at sf0.01 AND sf0.1, so the
    // survivor is well-defined — and the oracle mirrors the identical
    // dedup in a QUALIFY CTE. What this exercises beyond J1–J5: the
    // operator algebra closing over its own output — the AB result
    // feeds the second join as a VersionedTable keyed on a DIFFERENT
    // column (o_orderkey), so Catalyst plans two key-partitioned
    // exchanges — exactly the chain shape at 100 TB. Customers without
    // orders carry a null o_orderkey through the second join
    // (never matching, preserved by the outer arm); at scale such
    // null-FK rows all land in one shuffle partition, and AQE cannot
    // split a skewed FULL OUTER join — so the second join uses the
    // null-split plan (VersionedJoins.fullOuterNullSplit): null-key
    // rows bypass the join exchange entirely and are unioned in
    // null-padded, with NullKeySkewSpec pinning both the plan shape
    // and value-equality with the plain full outer.
    Entry("j6_chain_abc",
      (spark, dir) => {
        val cust = Registry.table(spark, dir, "customer")
          .select(col("c_custkey"), col("c_name"))
        val ord = Registry.table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
            col("o_totalprice"))
        val li = Registry.table(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
            col("l_extendedprice"))
        val a = VersionedTable(cust, Seq(col("c_custkey")),
          Seq(col("c_custkey")), col("c_custkey"), col("c_custkey"))
        val b = VersionedTable(ord, Seq(col("o_custkey")),
          Seq(col("o_orderkey")), col("o_orderdate"), col("o_orderkey"))
        val ab = VersionedJoins.fullOuter(a, b, Seq("c_custkey"), Seq("o_custkey"))
        val abT = VersionedTable(ab, Seq(col("o_orderkey")),
          Seq(col("c_custkey"), col("o_orderkey")), col("o_orderdate"),
          col("c_custkey"))
        val c = VersionedTable(li, Seq(col("l_orderkey")),
          Seq(col("l_orderkey"), col("l_linenumber")), col("l_shipdate"),
          col("l_extendedprice"))
        VersionedJoins.fullOuterNullSplit(abT, c,
            Seq("o_orderkey"), Seq("l_orderkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_totalprice"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy(asc_nulls_first("c_custkey"), asc_nulls_first("o_orderkey"),
            asc_nulls_first("l_linenumber"))
      },
      Some(j6OracleSql)),

    Entry("d1_latest_by_key",
      (spark, dir) => {
        val ev = Registry.table(spark, dir, "events")
        VersionedDedup.latestPerKey(ev, Seq(col("user_id")),
            col("ts"), col("event_id"))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts"), col("value"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, event_id, event_type, ts, value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin)),

    Entry("d2_latest_by_key_id",
      (spark, dir) => {
        val ev = Registry.table(spark, dir, "events")
        VersionedDedup.latestPerKeyId(ev, Seq(col("user_id")),
            Seq(col("event_type")), col("ts"), col("event_id"))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts"), col("value"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some(d2OracleSql))
  )

  /** Shared with StreamingOps: the chained streaming join (s11) must
    * converge to exactly this batch answer. */
  private[queries] val j6OracleSql: String =
    """WITH ab AS (
      |  SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      |  FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey),
      |li AS (
      |  SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |  QUALIFY row_number() OVER (PARTITION BY l_orderkey, l_linenumber
      |    ORDER BY l_shipdate DESC, l_extendedprice DESC) = 1)
      |SELECT c_custkey, c_name, o_orderkey, o_totalprice,
      |  l_linenumber, l_extendedprice
      |FROM ab FULL OUTER JOIN li ON o_orderkey = l_orderkey
      |ORDER BY c_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST,
      |  l_linenumber ASC NULLS FIRST""".stripMargin

  /** Shared with StreamingOps: the streaming dedup (s8) must converge
    * to exactly this batch answer. */
  private[queries] val d2OracleSql: String =
    """SELECT user_id, event_id, event_type, ts, value
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
      |ORDER BY user_id, event_type""".stripMargin
}
