package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Classic decision-support (TPC-H-shaped) queries beyond the q1/q3/
  * q5/q6/q14 set in [[Analytics]] — each exercises a distinct planner
  * capability the engine must get right at 100 TB:
  *
  *   - q10: selective fact filter + 4-way join + top-k by aggregate
  *   - q18: having-on-aggregate subquery feeding a join (two-phase agg)
  *   - q17: correlated per-group average (manual decorrelation: the
  *     subquery becomes a partial agg joined back on the group key)
  *   - q2:  correlated min (min-per-group then equality back-join,
  *     expressed as one window pass — no re-scan of the fact)
  *   - q19: disjunction-of-conjunctions predicate — pushes the OR into
  *     the scan and keeps the join equi-only
  *   - grouping sets: two independent grouping columns in one Expand
  *     pass (neither a rollup nor a full cube)
  *
  * The driver schema has no partsupp table and no l_shipmode /
  * l_commitdate columns, so q2/q12/q4 keep their planner SHAPE with the
  * columns that exist (unit price from lineitem for q2; q12/q4 are
  * unexpressible without their columns and intentionally absent).
  *
  * Float-safety: aggregated doubles round to 2; raw mins/maxes of
  * stored doubles are bit-identical across engines and pass unrounded.
  */
object DecisionSupport {

  def entries: Seq[Entry] = Seq(

    // TPC-H Q10 shape: revenue lost to returned items per customer.
    // l_returnflag = 'R' prunes ~2/3 of lineitem at the scan; customer
    // and nation broadcast; one shuffle for the group-by; top-20 with
    // key tiebreak.
    Entry("q10_returned_revenue",
      (spark, dir) => {
        val li = Registry.table(spark, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
        val o = Registry.table(spark, dir, "orders")
        val c = Registry.table(spark, dir, "customer")
        val n = Registry.table(spark, dir, "nation")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q18 shape: customers with any order totalling > 200 units.
    // The HAVING subquery is a first-phase partial aggregate over
    // lineitem whose SURVIVORS (a few % of orders) drive the join —
    // at 100 TB the filter on the aggregate, not the join, does the
    // data reduction, and the tiny survivor set broadcasts.
    Entry("q18_large_orders",
      (spark, dir) => {
        val li = Registry.table(spark, dir, "lineitem")
        val o = Registry.table(spark, dir, "orders")
        val c = Registry.table(spark, dir, "customer")
        // filter on the RAW sum (as the oracle's HAVING does), round
        // only in the projection — rounding first would move orders
        // near the threshold across it
        val big = li.groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("raw_qty"))
          .filter(col("raw_qty") > 200)
          .select(col("l_orderkey"), round(col("raw_qty"), 2).as("total_qty"))
        o.join(big, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  o_totalprice, round(total_qty, 2) AS total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(l_quantity) > 200) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // TPC-H Q17 shape: revenue from small-quantity lineitems of one
    // brand, where "small" is relative to that PART's own average —
    // the correlated-average subquery. Decorrelated by hand into the
    // plan Catalyst would want anyway: one partial agg per part key
    // over the brand-pruned lineitem slice, joined back on the key.
    // The brand filter cuts parts 25× BEFORE the fact join, so both
    // the agg and the back-join run on ~4% of lineitem.
    // (l_quantity is integer-valued and group sizes are small, so the
    // 0.5*avg threshold is bit-identical across engines.)
    Entry("q17_small_qty_revenue",
      (spark, dir) => {
        val pp = Registry.table(spark, dir, "part")
          .filter(col("p_brand") === "Brand#4")
          .select(col("p_partkey"))
        val li = Registry.table(spark, dir, "lineitem")
          .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
        val halfAvg = li.groupBy(col("l_partkey").as("avg_partkey"))
          .agg((avg(col("l_quantity")) * 0.5).as("half_avg"))
        li.join(halfAvg, col("l_partkey") === col("avg_partkey"))
          .filter(col("l_quantity") < col("half_avg"))
          .agg(round(sum(col("l_extendedprice")), 2).as("small_qty_revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT round(sum(l_extendedprice), 2) AS small_qty_revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#4'
        |  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)),

    // TPC-H Q2 shape: for each SMALL part under size 10, the supplier
    // quoting the minimum unit price (extendedprice/quantity from
    // lineitem — the driver schema has no partsupp). The correlated
    // "= (SELECT min ...)" becomes ONE window pass over the pruned
    // fact slice: rank by (unit price, suppkey) per part and keep the
    // first — no second scan, no self-join, which is the shape that
    // survives when the fact side is 100 TB.
    Entry("q2_min_price_supplier",
      (spark, dir) => {
        val pp = Registry.table(spark, dir, "part")
          .filter(col("p_type") === "SMALL" && col("p_size") < 10)
          .select(col("p_partkey"), col("p_name"))
        val s = Registry.table(spark, dir, "supplier")
        val n = Registry.table(spark, dir, "nation")
        val li = Registry.table(spark, dir, "lineitem")
          .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
          .withColumn("unit_price",
            round(col("l_extendedprice") / col("l_quantity"), 4))
        val w = Window.partitionBy(col("p_partkey"))
          .orderBy(col("unit_price"), col("l_suppkey"))
        li.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .select(col("p_partkey"), col("p_name"), col("s_name"),
            col("n_name"), col("unit_price"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_name, s_name, n_name, unit_price
        |FROM (SELECT p_partkey, p_name, l_suppkey,
        |        round(l_extendedprice / l_quantity, 4) AS unit_price,
        |        row_number() OVER (PARTITION BY p_partkey
        |          ORDER BY round(l_extendedprice / l_quantity, 4), l_suppkey) AS rn
        |      FROM lineitem JOIN part ON l_partkey = p_partkey
        |      WHERE p_type = 'SMALL' AND p_size < 10)
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE rn = 1
        |ORDER BY p_partkey""".stripMargin)),

    // TPC-H Q8 shape: market share — the share of each region's yearly
    // revenue coming from SMALL-type parts. Conditional-sum ratio over
    // a 5-dimension star join: all dimensions broadcast, the fact
    // shuffles once for the (region, year) aggregate; the ratio is
    // computed from the two partial sums in the same pass (never a
    // self-join of two aggregated subqueries).
    Entry("q8_market_share",
      (spark, dir) => {
        val li = Registry.table(spark, dir, "lineitem")
        val o = Registry.table(spark, dir, "orders")
        val c = Registry.table(spark, dir, "customer")
        val n = Registry.table(spark, dir, "nation")
        val r = Registry.table(spark, dir, "region")
        val p = Registry.table(spark, dir, "part")
          .select(col("p_partkey"), col("p_type"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .withColumn("rev", col("l_extendedprice") * (lit(1) - col("l_discount")))
          .groupBy(col("r_name"), year(col("o_orderdate")).as("o_year"))
          .agg(
            round(sum(when(col("p_type") === "SMALL", col("rev"))
              .otherwise(lit(0.0))) / sum(col("rev")), 6).as("small_share"),
            round(sum(col("rev")), 2).as("total_revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("o_year"))
      },
      Some("""SELECT r_name, CAST(year(o_orderdate) AS INT) AS o_year,
        |  round(sum(CASE WHEN p_type = 'SMALL'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |    / sum(l_extendedprice * (1 - l_discount)), 6) AS small_share,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2 ORDER BY r_name, o_year""".stripMargin)),

    // TPC-H Q19 shape: disjunction of brand×size×quantity conjunctions.
    // The whole OR is a single scan-level predicate on each side plus
    // an equi-join — Catalyst pushes the part-only and lineitem-only
    // conjunct unions down to the scans, so at 100 TB the join inputs
    // are pre-pruned instead of filtering post-join.
    Entry("q19_disjunctive",
      (spark, dir) => {
        val li = Registry.table(spark, dir, "lineitem")
        val p = Registry.table(spark, dir, "part")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "Brand#5" && col("p_size").between(10, 30) &&
              col("l_quantity").between(10, 35)) ||
            (col("p_brand") === "Brand#7" && col("p_size").between(25, 50) &&
              col("l_quantity").between(25, 50)))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#5' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 35)
        |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 25 AND 50
        |       AND l_quantity BETWEEN 25 AND 50)""".stripMargin)),

    // GROUPING SETS ((r_name), (n_name)): per-region AND per-nation
    // customer stats in ONE Expand + one partial-agg shuffle — two
    // independent groupings that are neither a rollup prefix chain nor
    // a full cube (those are q_rollup / q_cube). Expressed through the
    // SQL surface like q6 — grouping sets are a SQL-level construct.
    Entry("q_grouping_sets",
      (spark, dir) => {
        Registry.table(spark, dir, "customer").createOrReplaceTempView("customer")
        Registry.table(spark, dir, "nation").createOrReplaceTempView("nation")
        Registry.table(spark, dir, "region").createOrReplaceTempView("region")
        spark.sql("""SELECT r_name, n_name, count(*) AS n_customers,
          |  round(sum(c_acctbal), 2) AS sum_acctbal
          |FROM customer
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY GROUPING SETS ((r_name), (n_name))
          |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT r_name, n_name, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (n_name))
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin))
  )
}
