package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Core relational surface (SURVEY §2.3/§2.5/§2.6): scans with pushed-down
  * predicates and pruned columns, broadcast dimension joins, semi/anti
  * joins, hash aggregations. These exercise the same Spark primitives the
  * observation pipeline uses (P1-P3, J1, J5-J7, A6-A8) on the driver's
  * TPC-H-ish tables.
  */
object Relational extends QueryPack {

  override val queries: Map[String, Q] = Map(

    // P1/P3 + A8 + two-phase hash agg — TPC-H Q1-shaped pricing summary.
    "q01_pricing_summary" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          // oracle-stable means: exact integer sums (order-independent)
          // divided once — raw output is bit-identical across engines
          (sum(round(col("l_quantity"))) / count(col("l_quantity"))).as("avg_qty"),
          (sum(round(col("l_discount") * 100)) / (count(col("l_discount")) * 100)).as("avg_disc"),
          count(lit(1)).as("count_order")),
      Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                        AS sum_qty,
               round(sum(l_extendedprice), 2)                   AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               sum(round(l_quantity)) / count(l_quantity)       AS avg_qty,
               sum(round(l_discount * 100)) / (count(l_discount) * 100) AS avg_disc,
               count(*)                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1999-12-31'
        GROUP BY l_returnflag, l_linestatus""")),

    // P3 selective predicate → single-scalar agg (pushdown visible in scan).
    "q02_revenue_window" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
                col("l_discount").between(0.03, 0.07) &&
                col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue")),
      Some("""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24""")),

    // J1-style broadcast dimension lookup joins + group on dim attribute.
    // Distinct-count via per-order pre-aggregation instead of
    // countDistinct's expand (halves the shuffled rows; same exact result
    // since revenue re-associates before the 2dp rounding).
    "q03_segment_revenue" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("orev"))
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("orev")), 2).as("revenue"),
             count(lit(1)).as("n_orders")),
      Some("""
        SELECT c_mktsegment,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(DISTINCT o_orderkey) AS n_orders
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment""")),

    // 5-way star join through broadcast dims (region→nation→customer).
    "q04_nation_revenue" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
             count(lit(1)).as("n_items")),
      Some("""
        SELECT r_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey   = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name""")),

    // P2 — membership as LEFT SEMI join (EXISTS).
    "q05_semi_join" -> Q(
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 49),
              col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")),
      Some("""
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 49)""")),

    // J7 — negated membership as LEFT ANTI join (NOT EXISTS).
    "q06_anti_join" -> Q(
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 450000),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal")),
      Some("""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 450000)""")),

    // A6 — distinct yyyymm partition keys of a timestamp column.
    "q07_distinct_months" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .select(date_format(col("l_shipdate"), "yyyyMM").as("yyyymm"))
        .distinct(),
      Some("SELECT DISTINCT strftime(l_shipdate, '%Y%m') AS yyyymm FROM lineitem")),

    // J1 — broadcast re-key lookup (station-ID dict map analog).
    "q08_rekey_lookup" -> Q(
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("nation"),
                round(col("c_acctbal"), 2).as("acctbal")),
      Some("""
        SELECT c_custkey, n_name AS nation, round(c_acctbal, 2) AS acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey"""))
  )
}
