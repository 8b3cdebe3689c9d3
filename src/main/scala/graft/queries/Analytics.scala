package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions

/** General analytics surface over the TPC-H-ish driver tables —
  * aggregation, multi-way joins, window functions, sort/limit,
  * semi/anti joins, set operations, rollup, and event-time windowed
  * aggregation. The reference has none of these (SURVEY.md §2.9);
  * they are required for a complete engine and are all expressed
  * declaratively so Catalyst plans them (broadcast for the small
  * dimensions, partial aggregation map-side, pushdown to parquet).
  *
  * Float-safety for the DuckDB oracle: every aggregated double is
  * wrapped in round(_, N) so accumulation-order differences between
  * engines (≈1e-9 relative) cannot flip the hash; raw unaggregated
  * doubles pass through untouched (bit-identical in parquet).
  */
object Analytics {

  /** Shared with StreamingOps: the native stream-stream range join
    * (s9) must converge to exactly this batch answer. */
  private[queries] val rangeJoinOracleSql: String =
    """SELECT a.user_id, a.event_id AS e1, b.event_id AS e2,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 1800000000
      |ORDER BY a.user_id, e1, e2""".stripMargin

  /** Shared with StreamingOps: the native left-outer stream-stream
    * range join (s26) — matched pairs plus watermark-flushed
    * null-extended lefts — must hash-match exactly this batch
    * answer. Sides are asymmetric (signup/error lefts vs
    * click/purchase/view rights, each with a user-id stride) so
    * unmatched lefts genuinely exist. */
  private[queries] val rangeLeftOuterOracleSql: String =
    """WITH a AS (SELECT user_id, event_id, ts FROM events
      |  WHERE event_type IN ('signup', 'error') AND user_id % 3 != 0),
      |b AS (SELECT user_id, event_id, ts FROM events
      |  WHERE event_type IN ('click', 'purchase', 'view')
      |    AND user_id % 5 != 0)
      |SELECT a.user_id, a.event_id AS e1, b.event_id AS e2,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
      |FROM a LEFT JOIN b ON a.user_id = b.user_id
      |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 1800000000
      |ORDER BY a.user_id, e1, e2 NULLS FIRST""".stripMargin

  /** Shared with StreamingOps: the full-outer twin (s27) — unmatched
    * rows on either side flush null-extended at the watermark. */
  private[queries] val rangeFullOuterOracleSql: String =
    """WITH a AS (SELECT user_id, event_id, ts FROM events
      |  WHERE event_type IN ('signup', 'error') AND user_id % 3 != 0),
      |b AS (SELECT user_id, event_id, ts FROM events
      |  WHERE event_type IN ('click', 'purchase', 'view')
      |    AND user_id % 5 != 0)
      |SELECT coalesce(a.user_id, b.user_id) AS user_id,
      |  a.event_id AS e1, b.event_id AS e2,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
      |FROM a FULL JOIN b ON a.user_id = b.user_id
      |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 1800000000
      |ORDER BY user_id, e1 NULLS FIRST, e2 NULLS FIRST""".stripMargin

  /** Shared with StreamingOps: the left-semi form (s28) — each left
    * row exactly once iff an in-range match exists. */
  private[queries] val rangeSemiOracleSql: String =
    """WITH b AS (SELECT user_id, ts FROM events
      |  WHERE event_type IN ('click', 'purchase', 'view')
      |    AND user_id % 5 != 0)
      |SELECT a.user_id, a.event_id AS e1, epoch_us(a.ts) AS ts_us
      |FROM events a
      |WHERE a.event_type IN ('signup', 'error') AND a.user_id % 3 != 0
      |  AND EXISTS (SELECT 1 FROM b WHERE b.user_id = a.user_id
      |    AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 1800000000)
      |ORDER BY a.user_id, e1""".stripMargin

  /** Shared with StreamingOps: the append-mode streaming window agg
    * (s13) must flush exactly this batch answer. */
  /** Shared by the batch q_asof_join and its streaming twin
    * (s48_stream_asof_join): DuckDB's native ASOF JOIN is a genuinely
    * independent implementation of the point-in-time semantics, and
    * (user_id, ts) is unique in the driver data at every SF, so it is
    * an exact oracle for both engines' results. */
  private[queries] val asofOracleSql: String =
    """SELECT x.user_id, x.event_id AS x_event_id,
    |  x.event_type AS x_type, x.ts AS x_ts,
    |  y.event_id AS y_event_id, y.event_type AS y_type,
    |  y.ts AS y_ts, y.value AS y_value
    |FROM (SELECT * FROM events
    |      WHERE event_type IN ('signup','error')) x
    |ASOF LEFT JOIN (SELECT * FROM events
    |      WHERE event_type IN ('click','purchase','view')) y
    |  ON x.user_id = y.user_id AND x.ts >= y.ts
    |ORDER BY x.user_id, x_ts, x_event_id""".stripMargin

  /** Shared by the batch q_asof_forward and its streaming twin
    * (s51_stream_asof_forward): same independent-oracle argument as
    * [[asofOracleSql]] with the inequality flipped. */
  private[queries] val asofForwardOracleSql: String =
    """SELECT x.user_id, x.event_id AS x_event_id,
    |  x.event_type AS x_type, x.ts AS x_ts,
    |  y.event_id AS y_event_id, y.event_type AS y_type,
    |  y.ts AS y_ts, y.value AS y_value
    |FROM (SELECT * FROM events
    |      WHERE event_type IN ('signup','error')) x
    |ASOF LEFT JOIN (SELECT * FROM events
    |      WHERE event_type IN ('click','purchase','view')) y
    |  ON x.user_id = y.user_id AND x.ts <= y.ts
    |ORDER BY x.user_id, x_ts, x_event_id""".stripMargin

  private[queries] val timeWindowOracleSql: String =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |  count(*) AS n, round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** Shared with StreamingOps: the streaming session-window agg (s12)
    * must converge to exactly this batch answer. */
  private[queries] val sessionWindowOracleSql: String =
    """WITH f AS (SELECT user_id, event_id, ts, value,
      |  CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |       THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid FROM f)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM g GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Shared by q_json_props (per-query path extraction) and
    * q_json_struct (parse-once into a typed struct): same answer,
    * different parse strategy. The outer CAST keeps DuckDB's
    * sum(BIGINT)→HUGEINT from hash-mismatching Spark's int64. */
  private val jsonPropsOracleSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  def entries: Seq[Entry] = Seq(

    // TPC-H Q1-shaped pricing summary: single-table scan+agg, the
    // canonical partial-agg / codegen benchmark query.
    Entry("q1_pricing_summary",
      (spark, dir) => {
        val li = Registry.table(spark, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
              (lit(1) + col("l_tax"))), 2).as("sum_charge"),
            round(avg(col("l_quantity")), 6).as("avg_qty"),
            round(avg(col("l_extendedprice")), 6).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // TPC-H Q3-shaped: 3-way join + agg + top-k with deterministic
    // tiebreak. customer is broadcast-size relative to lineitem.
    Entry("q3_top_orders",
      (spark, dir) => {
        val c = Registry.table(spark, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        val o = Registry.table(spark, dir, "orders")
        val li = Registry.table(spark, dir, "lineitem")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_orderdate,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    // TPC-H Q5-shaped: 6-table join through the full star schema.
    // region/nation/supplier/customer all broadcast under AQE.
    Entry("q5_nation_revenue",
      (spark, dir) => {
        val r = Registry.table(spark, dir, "region")
        val n = Registry.table(spark, dir, "nation")
        val c = Registry.table(spark, dir, "customer")
        val o = Registry.table(spark, dir, "orders")
        val li = Registry.table(spark, dir, "lineitem")
        val s = Registry.table(spark, dir, "supplier")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
            col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin)),

    // Distinct aggregation (exact) per group.
    Entry("q_distinct_agg",
      (spark, dir) => {
        Registry.table(spark, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Analytic window function: most expensive lineitem per order.
    // max_by over a struct instead of a row_number window: the
    // aggregate gets a map-side partial (no per-partition full sort),
    // one shuffle on the group key only. Tiebreak (-l_linenumber)
    // mirrors the window's `price DESC, linenumber ASC`.
    Entry("q_window_rank",
      (spark, dir) => {
        Registry.table(spark, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(max_by(
            struct(col("l_linenumber"), col("l_extendedprice")),
            struct(col("l_extendedprice"), -col("l_linenumber"))).as("top"))
          .select(col("l_orderkey"),
            col("top.l_linenumber").as("l_linenumber"),
            col("top.l_extendedprice").as("l_extendedprice"))
          .orderBy(col("l_orderkey"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber) = 1
        |ORDER BY l_orderkey""".stripMargin)),

    // Global sort + limit with deterministic tiebreak.
    Entry("q_sort_limit",
      (spark, dir) => {
        Registry.table(spark, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 20""".stripMargin)),

    // Left-semi join (EXISTS).
    Entry("q_semi_join",
      (spark, dir) => {
        val c = Registry.table(spark, dir, "customer")
        val o = Registry.table(spark, dir, "orders")
          .filter(col("o_orderstatus") === "F")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)),

    // Left-anti join (NOT EXISTS) — customers with no open ('P')
    // orders (every customer has *some* order, so the unfiltered
    // variant would be degenerate).
    Entry("q_anti_join",
      (spark, dir) => {
        val c = Registry.table(spark, dir, "customer")
        val o = Registry.table(spark, dir, "orders")
          .filter(col("o_orderstatus") === "P")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin)),

    // Set operations: EXCEPT / INTERSECT over high-value event
    // audiences (value thresholds keep the sets partial — at sf>=0.01
    // every user has every event type, so unfiltered audiences would
    // make these trivially empty/total).
    Entry("q_except",
      (spark, dir) => {
        val ev = Registry.table(spark, dir, "events")
        val bigBuyers = ev.filter(col("event_type") === "purchase" &&
          col("value") > 300).select(col("user_id"))
        val bigClickers = ev.filter(col("event_type") === "click" &&
          col("value") > 300).select(col("user_id"))
        bigBuyers.except(bigClickers).orderBy(col("user_id"))
      },
      Some("""SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 300
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'click' AND value > 300
        |ORDER BY user_id""".stripMargin)),

    Entry("q_intersect",
      (spark, dir) => {
        val ev = Registry.table(spark, dir, "events")
        val signups = ev.filter(col("event_type") === "signup" &&
          col("value") > 100).select(col("user_id"))
        val errors = ev.filter(col("event_type") === "error" &&
          col("value") > 100).select(col("user_id"))
        signups.intersect(errors).orderBy(col("user_id"))
      },
      Some("""SELECT user_id FROM events WHERE event_type = 'signup' AND value > 100
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'error' AND value > 100
        |ORDER BY user_id""".stripMargin)),

    // Hierarchical rollup over the region→nation dimension.
    Entry("q_rollup",
      (spark, dir) => {
        val r = Registry.table(spark, dir, "region")
        val n = Registry.table(spark, dir, "nation")
        val c = Registry.table(spark, dir, "customer")
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_customers"),
            round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
          .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
      },
      Some("""SELECT r_name, n_name, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)),

    // TPC-H Q14 shape (promo revenue share): fact-to-dimension join
    // with conditional aggregation — the part table broadcast against
    // a date-pruned lineitem scan (the filter pushes to parquet, so a
    // three-month slice never reads the other years' row groups).
    Entry("q14_promo_revenue",
      (spark, dir) => {
        val li = Registry.table(spark, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .select(col("l_partkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        val p = Registry.table(spark, dir, "part")
          .select(col("p_partkey"), col("p_type"))
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .agg(
            round(sum(when(col("p_type") === "ECONOMY", col("rev"))
              .otherwise(lit(0.0))), 2).as("economy_revenue"),
            round(sum(col("rev")), 2).as("total_revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT
        |  round(sum(CASE WHEN p_type = 'ECONOMY'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS economy_revenue,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin)),

    // Semi-structured JSON properties: extract a typed field from the
    // events' props JSON column and aggregate it — the metadata-
    // handling shape every ingest pipeline needs. get_json_object is a
    // codegen'd path expression evaluated inside the scan (scan-local,
    // one partial-agg shuffle); at 100 TB prefer parsing ONCE into a
    // struct column (from_json at ingest) over re-parsing per query —
    // that twin plan is q_json_struct below.
    Entry("q_json_props",
      (spark, dir) => {
        Registry.table(spark, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy(col("event_type"))
      },
      Some(jsonPropsOracleSql)),

    // The parse-at-ingest twin of q_json_props: one from_json turns
    // the JSON string into a TYPED struct column, and everything
    // downstream is ordinary columnar access — the shape to
    // materialize at ingest so 100 TB of queries never re-parse the
    // string. Per-query the two plans tie (one field); the struct wins
    // as soon as a second field or a second query touches props, and
    // it carries the schema (a malformed document becomes a NULL
    // struct here, not a silent per-field NULL). Same oracle as
    // q_json_props — identical answer, different parse strategy.
    Entry("q_json_struct",
      (spark, dir) => {
        Registry.table(spark, dir, "events")
          .select(col("event_type"),
            from_json(col("props"),
              org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).as("p"))
          .select(col("event_type"), col("p.k").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy(col("event_type"))
      },
      Some(jsonPropsOracleSql)),

    // Bounded range join: all event pairs of the same user within
    // ±30 minutes. A naive |t1−t2| ≤ B join predicate plans as a
    // nested-loop blowup; the scale shape is time-BUCKETIZATION: tag
    // the left side with its 30-min bucket, explode the right side to
    // its bucket ±1 (any qualifying pair differs by at most one
    // bucket, and matches exactly once since the left bucket is
    // unique), equi-join on (user, bucket), then apply the exact range
    // filter. One shuffle on the composite key, 3× right-side
    // duplication — the standard interval-join trade at 100 TB.
    Entry("q_range_join",
      (spark, dir) => {
        val bUs = 1800000000L // 30 min in µs
        val ev = Registry.table(spark, dir, "events")
          .select(col("user_id"), col("event_id"),
            expr("unix_micros(ts)").as("tus"))
        val a = ev.withColumn("bkt", floor(col("tus") / bUs))
        val b = ev.select(col("user_id").as("uid2"),
            col("event_id").as("e2"), col("tus").as("tus2"))
          .withColumn("bkt2", explode(array(
            floor(col("tus2") / bUs) - 1,
            floor(col("tus2") / bUs),
            floor(col("tus2") / bUs) + 1)))
        a.join(b, col("user_id") === col("uid2") &&
            col("bkt") === col("bkt2") &&
            col("event_id") < col("e2") &&
            abs(col("tus") - col("tus2")) <= bUs)
          .select(col("user_id"), col("event_id").as("e1"), col("e2"),
            (col("tus2") - col("tus")).as("dt_us"))
          .orderBy(col("user_id"), col("e1"), col("e2"))
      },
      Some(rangeJoinOracleSql)),

    // The SAME interval-join problem written NAIVELY — just
    // abs(t1 − t2) <= B with no equi conjunct, the plan Spark can only
    // nested-loop — but run under the library's optimizer rule
    // (plans.IntervalJoinBucketize, the SparkSessionExtensions deploy
    // path), which rewrites it to q_range_join's bucketized equi-join
    // automatically. The rule is applied via
    // spark.experimental.extraOptimizations for the duration of the
    // materialization (localCheckpoint forces planning + execution
    // inside the window, then the session is restored), and the result
    // is hash-checked against DuckDB evaluating the naive SQL — the
    // end-to-end proof that the rewrite preserves semantics: signup →
    // error events within ±2 minutes, across ALL users.
    Entry("q_interval_join_auto",
      (spark, dir) => {
        val bUs = 120000000L // 2 min in µs
        val ev = Registry.table(spark, dir, "events")
        val a = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("e1"), expr("unix_micros(ts)").as("t1"))
        val b = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("e2"), expr("unix_micros(ts)").as("t2"))
        val naive = a.join(b, abs(col("t1") - col("t2")) <= bUs)
          .select(col("e1"), col("e2"), (col("t2") - col("t1")).as("dt_us"))
          .orderBy(col("e1"), col("e2"))
        val prev = spark.experimental.extraOptimizations
        spark.experimental.extraOptimizations =
          prev :+ graft.plans.IntervalJoinBucketize
        try naive.localCheckpoint() // plans + runs under the rule
        finally spark.experimental.extraOptimizations = prev
      },
      Some("""SELECT a.event_id AS e1, b.event_id AS e2,
        |  epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
        |FROM events a JOIN events b
        |  ON a.event_type = 'signup' AND b.event_type = 'error'
        |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 120000000
        |ORDER BY e1, e2""".stripMargin)),

    // Cube: all four grouping combinations in one pass (Expand + one
    // partial-agg shuffle — NOT four scans; at 100 TB the Expand factor
    // is the row multiplier to budget for).
    Entry("q_cube",
      (spark, dir) => {
        val n = Registry.table(spark, dir, "nation")
        val s = Registry.table(spark, dir, "supplier")
        s.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .cube(col("n_name"), col("s_nationkey"))
          .agg(count(lit(1)).as("n_suppliers"),
            round(sum(col("s_acctbal")), 2).as("sum_acctbal"))
          .orderBy(asc_nulls_first("n_name"), asc_nulls_first("s_nationkey"))
      },
      Some("""SELECT n_name, s_nationkey, count(*) AS n_suppliers,
        |  round(sum(s_acctbal), 2) AS sum_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY CUBE (n_name, s_nationkey)
        |ORDER BY n_name ASC NULLS FIRST, s_nationkey ASC NULLS FIRST""".stripMargin)),

    // Pivot: per-day event counts spread across one column per event
    // type (explicit value list so the output schema is static — the
    // scale-safe form; an unlisted pivot needs a driver-side distinct
    // pass first). Oracle = conditional aggregation, the portable SQL
    // spelling of the same plan.
    Entry("q_pivot",
      (spark, dir) => {
        Registry.table(spark, dir, "events")
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy(col("day"))
      },
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin)),

    // SQL surface: the same engine through spark.sql over registered
    // views (TPC-H Q6 shape — scan + tight filter + agg; the predicate
    // set pushes fully into the parquet scan).
    Entry("q6_sql_revenue",
      (spark, dir) => {
        Registry.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
        spark.sql("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
          |  count(*) AS n_items
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          |  AND l_shipdate < TIMESTAMP '1997-01-01'
          |  AND l_discount BETWEEN 0.05 AND 0.07
          |  AND l_quantity < 24""".stripMargin)
      },
      Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin)),

    // Skew-salted join: must produce exactly the plain-join answer
    // (the oracle IS the unsalted join) while spreading each hot
    // orderkey over 8 reducers — the explicit skew-mitigation pattern
    // for known-pathological keys at scale.
    Entry("q_salted_join",
      (spark, dir) => {
        val li = Registry.table(spark, dir, "lineitem")
        val o = Registry.table(spark, dir, "orders")
        graft.core.SkewTools.saltedEquiJoin(li, o,
            Seq("l_orderkey"), Seq("o_orderkey"),
            spread = col("l_linenumber"), factor = 8)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice")), 2).as("sum_price"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n_items,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Event-time tumbling-window aggregation (the batch shape of the
    // streaming windowed agg; see graft.streaming for the readStream
    // form).
    Entry("q_time_window",
      (spark, dir) => {
        Registry.table(spark, dir, "events")
          .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value")), 4).as("sum_value"))
          .orderBy(col("day"), col("event_type"))
      },
      Some(timeWindowOracleSql)),

    // Exact percentiles (linear interpolation) of event value per type
    // — the distribution-cutoff computation quality-filter pipelines
    // run before thresholding. Exact percentile needs a per-group sort;
    // at 100 TB the same query swaps percentile() for
    // approx_percentile() (one pass, mergeable partials) — its
    // rank-error guarantee is asserted in AnalyticsSpec.
    Entry("q_percentiles",
      (spark, dir) => {
        Registry.table(spark, dir, "events")
          .groupBy(col("event_type"))
          .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
            round(expr("percentile(value, 0.9)"), 4).as("p90"),
            round(expr("percentile(value, 0.99)"), 4).as("p99"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // Point-in-time (as-of) join: each signup/error event picks the
    // latest click/purchase/view of the same user at-or-before its own
    // timestamp — the canonical leakage-free feature-attachment shape
    // for training data. Expressed as ONE scan + ONE shuffle: tag both
    // sides, sort each user's timeline once, and carry the last-seen Y
    // forward with an ignore-nulls window — no range join, no
    // per-row probe, which is what survives 100 TB (a sort-merge range
    // join would re-scan Y per X row; this is linear after the
    // partition sort). Ties (x.ts == y.ts) count as "before": the
    // is_x sort key orders Y rows first. Deterministic because
    // (user_id, ts) is unique in the driver data at every SF
    // (verified), which also makes DuckDB's native ASOF JOIN — a
    // genuinely independent implementation — an exact oracle.
    Entry("q_asof_join",
      (spark, dir) => {
        val ev = Registry.table(spark, dir, "events")
        val ypay = struct(col("event_id").as("event_id"),
          col("event_type").as("event_type"), col("ts").as("ts"),
          col("value").as("value"))
        val xs = ev.filter(col("event_type").isin("signup", "error"))
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), lit(1).as("is_x"),
            lit(null).cast(
              "struct<event_id:bigint,event_type:string,ts:timestamp,value:double>")
              .as("y"))
        val ys = ev.filter(col("event_type").isin("click", "purchase", "view"))
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), lit(0).as("is_x"), ypay.as("y"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("is_x"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        xs.unionByName(ys)
          .withColumn("last_y", last(col("y"), ignoreNulls = true).over(w))
          .filter(col("is_x") === 1)
          .select(col("user_id"), col("event_id").as("x_event_id"),
            col("event_type").as("x_type"), col("ts").as("x_ts"),
            col("last_y.event_id").as("y_event_id"),
            col("last_y.event_type").as("y_type"),
            col("last_y.ts").as("y_ts"),
            col("last_y.value").as("y_value"))
          .orderBy(col("user_id"), col("x_ts"), col("x_event_id"))
      },
      Some(asofOracleSql)),

    // FORWARD as-of: each signup/error picks the EARLIEST
    // click/purchase/view of the same user at-or-AFTER its own
    // timestamp — the next-action attribution shape (time-to-convert
    // labels, post-signup behavior windows). Same single-scan
    // single-shuffle plan as q_asof_join with the timeline walked in
    // DESCENDING ts order, so the carried "last seen y" at each x is
    // the smallest qualifying y.ts; ties (x.ts == y.ts) count as
    // "after" via the is_x sort key (y first at equal ts). DuckDB's
    // native ASOF with the <= inequality is again an independent
    // exact oracle.
    Entry("q_asof_forward",
      (spark, dir) => {
        val ev = Registry.table(spark, dir, "events")
        val ypay = struct(col("event_id").as("event_id"),
          col("event_type").as("event_type"), col("ts").as("ts"),
          col("value").as("value"))
        val xs = ev.filter(col("event_type").isin("signup", "error"))
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), lit(1).as("is_x"),
            lit(null).cast(
              "struct<event_id:bigint,event_type:string,ts:timestamp,value:double>")
              .as("y"))
        val ys = ev.filter(col("event_type").isin("click", "purchase", "view"))
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), lit(0).as("is_x"), ypay.as("y"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("is_x"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        xs.unionByName(ys)
          .withColumn("next_y", last(col("y"), ignoreNulls = true).over(w))
          .filter(col("is_x") === 1)
          .select(col("user_id"), col("event_id").as("x_event_id"),
            col("event_type").as("x_type"), col("ts").as("x_ts"),
            col("next_y.event_id").as("y_event_id"),
            col("next_y.event_type").as("y_type"),
            col("next_y.ts").as("y_ts"),
            col("next_y.value").as("y_value"))
          .orderBy(col("user_id"), col("x_ts"), col("x_event_id"))
      },
      Some(asofForwardOracleSql)),

    // Time-series resampling: densify each user's activity onto a
    // regular daily grid (missing days zero-filled) between their
    // first and last event — the regular-grid preparation step
    // sequence models require. The grid is GENERATED per user
    // (sequence + explode — rows proportional to user-days, built
    // executor-side), then one left join attaches the sparse
    // aggregates; no driver-side calendar, no cross join with a
    // global date table.
    Entry("q_resample_daily",
      (spark, dir) => {
        val daily = Registry.table(spark, dir, "events")
          .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value")), 4).as("sum_value"))
        val grid = daily.groupBy(col("user_id"))
          .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
          .select(col("user_id"), explode(
            sequence(col("mn"), col("mx"),
              expr("interval 1 day"))).as("day"))
        grid.join(daily, Seq("user_id", "day"), "left")
          .na.fill(Map("n" -> 0L, "sum_value" -> 0.0))
          .orderBy(col("user_id"), col("day"))
      },
      Some("""WITH d AS (SELECT user_id,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    count(*) AS n, round(sum(value), 4) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT user_id, min(day) AS mn, max(day) AS mx
        |  FROM d GROUP BY 1),
        |g AS (SELECT user_id,
        |    unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
        |  FROM s)
        |SELECT g.user_id, g.day, coalesce(d.n, 0) AS n,
        |  coalesce(d.sum_value, 0.0) AS sum_value
        |FROM g LEFT JOIN d ON d.user_id = g.user_id AND d.day = g.day
        |ORDER BY g.user_id, g.day""".stripMargin)),

    // Offset window functions (lag/lead): per-user inter-arrival gap
    // and next-event lookahead — the sequence-feature shape (time
    // deltas, next-action labels) feature pipelines derive per entity.
    // One shuffle on the partition key; the frame is row-offset, so no
    // buffering beyond adjacent rows.
    Entry("q_lag_lead",
      (spark, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Registry.table(spark, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type"))
          .withColumn("gap_us",
            expr("unix_micros(ts)") - lag(expr("unix_micros(ts)"), 1).over(w))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("gap_us"), col("next_type"))
          .orderBy(col("user_id"), col("ts"), col("event_id"))
      },
      Some("""SELECT user_id, event_id, event_type,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
        |  lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin)),

    // COHORT RETENTION — the other staple of event analytics next to
    // the funnel: users grouped by signup week (both engines truncate
    // weeks to Monday), and for each cohort the count of users active
    // in each week offset from signup. Two user-keyed aggregations +
    // one distinct on slim (user, cohort, offset) rows — per-cohort
    // matrices never materialize anywhere; pure date arithmetic
    // (Monday-aligned week starts make the day-diff an exact multiple
    // of 7), so cross-engine equality is structural.
    Entry("q_retention_cohorts",
      (spark, dir) => {
        val ev = Registry.table(spark, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        val su = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("sts"))
          .select(col("user_id"), col("sts"),
            to_date(date_trunc("week", col("sts"))).as("cohort_week"))
        val act = ev.join(su, "user_id")
          .filter(col("ts") >= col("sts"))
          .select(col("user_id"), col("cohort_week"),
            (datediff(to_date(date_trunc("week", col("ts"))),
              col("cohort_week")) / 7).cast("int").as("week_offset"))
          .distinct()
        act.groupBy(col("cohort_week"), col("week_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""WITH su AS (SELECT user_id, min(ts) AS sts FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |sc AS (SELECT user_id, sts,
        |    date_trunc('week', sts) AS cohort_week FROM su),
        |act AS (SELECT DISTINCT e.user_id, sc.cohort_week,
        |    CAST(date_diff('day', sc.cohort_week,
        |      date_trunc('week', e.ts)) // 7 AS INT) AS week_offset
        |  FROM events e JOIN sc USING (user_id) WHERE e.ts >= sc.sts)
        |SELECT cohort_week, week_offset, count(*) AS n_users
        |FROM act GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // EVENT FUNNEL (the ClickHouse windowFunnel shape): per user the
    // earliest view → the earliest LATER click → the earliest
    // still-later purchase, all within 7 days of the first view, and
    // the max step reached. Each step is one conditional min-agg on
    // the user key plus an equi-join back — never a per-user sort or
    // a collected event array, so the plan is three small
    // user-keyed aggregations at any scale. Pure timestamp
    // comparisons throughout: no float anywhere, so cross-engine
    // equality is structural.
    Entry("q_window_funnel",
      (spark, dir) => {
        val ev = Registry.table(spark, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id")
          .filter(col("ts") > col("t1") &&
            col("ts") <= col("t1") + expr("INTERVAL 7 DAYS"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(v, "user_id").join(c, "user_id")
          .filter(col("ts") > col("t2") &&
            col("ts") <= col("t1") + expr("INTERVAL 7 DAYS"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .select(col("user_id"), col("t1"), col("t2"), col("t3"),
            when(col("t3").isNotNull, 3)
              .when(col("t2").isNotNull, 2)
              .otherwise(1).cast("int").as("max_step"))
          .orderBy(col("user_id"))
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.t1
        |    AND e.ts <= v.t1 + INTERVAL 7 DAY GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN v USING (user_id) JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |    AND e.ts <= v.t1 + INTERVAL 7 DAY GROUP BY 1)
        |SELECT v.user_id, v.t1, c.t2, p.t3,
        |  CAST(CASE WHEN p.t3 IS NOT NULL THEN 3
        |    WHEN c.t2 IS NOT NULL THEN 2 ELSE 1 END AS INT) AS max_step
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin)),

    // SCD TYPE-2 INTERVAL BUILD — the warehouse-side twin of this
    // library's versioned-join core: each user's event stream, ordered
    // by (ts, event_id), becomes the validity-interval history a
    // slowly-changing dimension table stores (valid_from = the
    // version's ts, valid_to = the NEXT version's ts or NULL for the
    // current row, is_current flag) — the as-of join's storage-side
    // counterpart, and what a batch backfill of the streaming upsert
    // state materializes. One window pass over one hash exchange on
    // the dimension key (row_number + lead share the same sort); at
    // 100 TB the SCD2 build is exactly this shape — no self-join, no
    // correlated subquery.
    Entry("q_scd2_intervals",
      (spark, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Registry.table(spark, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .withColumn("version_seq", row_number().over(w))
          .withColumn("valid_to", lead(col("ts"), 1).over(w))
          .select(col("user_id"), col("version_seq"),
            col("event_id"), col("value"),
            col("ts").as("valid_from"), col("valid_to"),
            when(col("valid_to").isNull, 1).otherwise(0)
              .cast("int").as("is_current"))
          .orderBy(col("user_id"), col("version_seq"))
      },
      Some("""SELECT user_id,
        |  CAST(row_number() OVER w AS INT) AS version_seq,
        |  event_id, value,
        |  ts AS valid_from,
        |  lead(ts, 1) OVER w AS valid_to,
        |  CAST(CASE WHEN lead(ts, 1) OVER w IS NULL THEN 1 ELSE 0 END
        |    AS INT) AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version_seq""".stripMargin)),

    // RANGE-frame rolling window: trailing-24h event count and value
    // sum per user at every event — the rolling-rate feature (and the
    // abuse/velocity check) computed with an event-time RANGE frame,
    // not a row frame: the window adapts to irregular event spacing.
    // Same one-shuffle shape as any per-key window; at 100 TB the sort
    // within each user partition is the only extra cost.
    Entry("q_rolling_window",
      (spark, dir) => {
        val dayUs = 86400000000L
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"))
          .rangeBetween(-dayUs, 0)
        Registry.table(spark, dir, "events")
          .select(col("user_id"), col("event_id"),
            expr("unix_micros(ts)").as("tus"), col("value"))
          .withColumn("n_24h", count(lit(1)).over(w))
          .withColumn("sum_24h", round(sum(col("value")).over(w), 4))
          .select(col("user_id"), col("event_id"), col("n_24h"),
            col("sum_24h"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
        |  count(*) OVER w AS n_24h,
        |  round(sum(value) OVER w, 4) AS sum_24h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin)),

    // ntile decile stats: the distribution-bucketing quality pipelines
    // use to set percentile cutoffs (e.g. "drop the bottom decile by
    // quality score"). Total order (value, event_id) makes the tiling
    // deterministic; both engines distribute remainders to the leading
    // buckets, so the decile boundaries agree exactly.
    Entry("q_ntile",
      (spark, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        Registry.table(spark, dir, "events")
          .withColumn("decile", ntile(10).over(w).cast("long"))
          .groupBy(col("event_type"), col("decile"))
          .agg(count(lit(1)).as("n"),
            round(min(col("value")), 4).as("min_v"),
            round(max(col("value")), 4).as("max_v"))
          .orderBy(col("event_type"), col("decile"))
      },
      Some("""WITH d AS (SELECT event_type, value,
        |  ntile(10) OVER (PARTITION BY event_type
        |    ORDER BY value, event_id) AS decile
        |  FROM events)
        |SELECT event_type, decile, count(*) AS n,
        |  round(min(value), 4) AS min_v, round(max(value), 4) AS max_v
        |FROM d GROUP BY 1, 2 ORDER BY event_type, decile""".stripMargin)),

    // Sliding windows (2-day window, 1-day slide): every event lands in
    // exactly two epoch-aligned windows; the oracle unrolls that
    // membership explicitly.
    Entry("q_sliding_window",
      (spark, dir) => {
        Registry.table(spark, dir, "events")
          .groupBy(window(col("ts"), "2 days", "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("wstart"), col("event_type"), col("n"))
          .orderBy(col("wstart"), col("event_type"))
      },
      Some("""SELECT wstart, event_type, count(*) AS n FROM (
        |  SELECT unnest([CAST(date_trunc('day', ts) AS TIMESTAMP),
        |                 CAST(date_trunc('day', ts) AS TIMESTAMP) - INTERVAL 1 DAY]) AS wstart,
        |         event_type
        |  FROM events)
        |GROUP BY wstart, event_type ORDER BY wstart, event_type""".stripMargin)),

    // Session windows (30-minute inactivity gap) per user — Spark's
    // session_window vs the classic gaps-and-islands derivation in the
    // oracle (new session iff the gap since the previous event >= 30
    // min; session end = last event + gap, exclusive).
    Entry("q_session_window",
      (spark, dir) => {
        Registry.table(spark, dir, "events")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value")), 4).as("sum_value"))
          .select(col("user_id"),
            col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"),
            col("n_events"), col("sum_value"))
          .orderBy(col("user_id"), col("session_start"))
      },
      Some(sessionWindowOracleSql)),

    // APPROX sketch in BOUNDS mode — the driver-verifiable form of a
    // sketch result: HLL++ values are engine-specific (DuckDB's HLL
    // can never hash-match Spark's), but the GUARANTEE is checkable —
    // the row carries the exact count plus a boolean asserting the
    // approx landed within 3×rsd of it, and the oracle asserts TRUE
    // with its own exact count. A red row means Spark's sketch broke
    // its bound (or the exact counts diverged); deterministic because
    // HLL++ on the same input is deterministic. At 100 TB the approx
    // column is the one that survives (mergeable partials, one pass,
    // no exact-distinct shuffle) — this row keeps its error contract
    // under driver check instead of only in AnalyticsSpec.
    Entry("q_approx_distinct",
      (spark, dir) => {
        Registry.table(spark, dir, "events")
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_exact"),
            approx_count_distinct(col("user_id"), 0.05).as("n_approx"))
          .select(col("event_type"), col("n_exact"),
            (abs(col("n_approx") - col("n_exact")) <=
              lit(0.15) * col("n_exact")).as("within_bounds"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |  TRUE AS within_bounds
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // approx_percentile in bounds mode, same idea: with accuracy
    // 10000 the rank error is ≤0.01%, so the approx median must land
    // between the exact p45 and p55 values (inclusive — on plateaus
    // all three coincide). The Spark side recomputes the exact rank
    // envelope beside the sketch; the oracle asserts TRUE.
    Entry("q_approx_percentile",
      (spark, dir) => {
        Registry.table(spark, dir, "events")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            expr("percentile(value, 0.45)").as("p45"),
            expr("percentile(value, 0.55)").as("p55"),
            expr("approx_percentile(value, 0.5, 10000)").as("ap50"))
          .select(col("event_type"), col("n"),
            (col("ap50") >= col("p45") && col("ap50") <= col("p55"))
              .as("within_bounds"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n, TRUE AS within_bounds
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // DETERMINISTIC quantile sketch — q_approx_percentile's
    // hash-matchable counterpart, completing the sketch family's
    // quantile axis (KMV = distinct, CMS = frequency, Bloom =
    // membership, priority sample = order statistics). approx_
    // percentile's KLL sketch is merge-order-dependent, so its value
    // can only be bounds-checked; the bottom-k-by-hash sample
    // ([[graft.functions.PrioritySampleAgg]]) is a pure function of
    // the input set, so p50/p90/p99 computed from it are identical
    // under any partitioning AND in DuckDB — the oracle re-derives
    // every column bit-for-bit. The quantile estimates are raw input
    // doubles (element selection, no interpolation), immune to
    // float-arithmetic drift. At 100 TB: map-side partials ship ≤ k
    // (hash, value) pairs per group per partition — the event stream
    // itself is never shuffled; the exact n_events count rides along
    // for the driver's cross-check.
    Entry("q_quantile_sketch",
      (spark, dir) => {
        import graft.functions.PrioritySample
        val k = PrioritySample.DefaultK
        Registry.table(spark, dir, "events")
          .select(col("event_type"), col("value"),
            TextFunctions.fingerprint64(col("event_id").cast("string"))
              .as("h"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            PrioritySample.sample(col("h"), col("value"), k).as("xs"))
          // the aggregate emits (hash, value)-ascending; sort by VALUE
          // once, select three ranks from the sorted attribute
          .withColumn("sxs", array_sort(col("xs")))
          .select(col("event_type"), col("n_events"),
            size(col("sxs")).cast("long").as("n_sample"),
            PrioritySample.discQuantile(col("sxs"), 0.5).as("p50_sketch"),
            PrioritySample.discQuantile(col("sxs"), 0.9).as("p90_sketch"),
            PrioritySample.discQuantile(col("sxs"), 0.99).as("p99_sketch"))
          .orderBy(col("event_type"))
      },
      Some {
        import graft.functions.PrioritySample
        val fp = TextFunctions.fp64Sql("CAST(event_id AS VARCHAR)")
        s"""WITH th AS (SELECT event_type, value, $fp AS h FROM events),
        |s AS ${PrioritySample.oracleSampleSql("th", "event_type", "h", "value")},
        |ex AS (SELECT event_type, count(*) AS n_events FROM events
        |  GROUP BY event_type)
        |SELECT ex.event_type, ex.n_events,
        |  CAST(len(s.xs) AS BIGINT) AS n_sample,
        |  ${PrioritySample.discQuantileSql("s.xs", 0.5)} AS p50_sketch,
        |  ${PrioritySample.discQuantileSql("s.xs", 0.9)} AS p90_sketch,
        |  ${PrioritySample.discQuantileSql("s.xs", 0.99)} AS p99_sketch
        |FROM s JOIN ex USING (event_type)
        |ORDER BY event_type""".stripMargin
      })
  )
}
