package graft.api

import graft.core.Tables
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Engine-level relational queries over the TPC-H-ish tables: these exercise
  * the general scan/filter/aggregate/join machinery the LLM-pipeline
  * operators build on (the reference itself has no joins — SURVEY §2.3 —
  * but a Spark-native engine exposes them as first-class). Small dimensions
  * are broadcast explicitly; fact-side filters are pushed to the parquet
  * scans. */
object TpchQueries {

  private def sumDec(c: Column): Column = sum(c.cast(DecimalType(28, 2))).cast("double")
  private def sumDec6(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast("double")

  /** Pricing summary (TPC-H Q1 shape): wide scan + 4-group hash agg; the
    * whole plan is one WholeStageCodegen span over the parquet scan. */
  private val q1 = QDef(
    "q_tpch_q1",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
      |       COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumDec(col("l_quantity")).as("sum_qty"),
        sumDec(col("l_extendedprice")).as("sum_base_price"),
        sumDec6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Revenue by nation (TPC-H Q5 shape): fact table joined to a chain of
    * small dimensions — every dimension side is broadcast, so the only
    * shuffle is the final group-by. */
  private val q5 = QDef(
    "q_tpch_q5",
    """SELECT n_name,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name IN ('ASIA', 'EUROPE')
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val sup = Tables.load(s, dir, "supplier")
    val nat = Tables.load(s, dir, "nation")
    val reg = Tables.load(s, dir, "region").filter(col("r_name").isin("ASIA", "EUROPE"))
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        sumDec6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Order-priority counts with a semi-join (TPC-H Q4 shape): left-semi
    * keeps the probe side unduplicated — no fact-side blowup. */
  private val q4 = QDef(
    "q_tpch_q4",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val o = Tables.load(s, dir, "orders")
    val li = Tables.load(s, dir, "lineitem")
    o.join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Top-k by aggregate (TPC-H Q18 shape): Spark plans sort+limit as
    * TakeOrderedAndProject — per-partition top-k then a single-partition
    * merge of k·P rows, no global sort. Exact decimal revenue makes the
    * ranking deterministic; orderkey tie-break totalizes it. */
  private val q18 = QDef(
    "q_tpch_q18_topk",
    """SELECT o_orderkey,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS total_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderkey
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(
        sumDec6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        sumDec(col("l_quantity")).as("total_qty"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Forecast-revenue-change (TPC-H Q6 shape): a single selective scan —
    * every predicate (date range, discount band, quantity cap) pushes to
    * the parquet reader, and the whole plan is scan→filter→one-row agg
    * with no shuffle beyond the final partial merge. The canary query for
    * pushdown health: if `PushedFilters` ever regresses, this is where it
    * shows first. */
  private val q6 = QDef(
    "q_tpch_q6",
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        sumDec6(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Unshipped-orders top-k (TPC-H Q3 shape): one broadcast dimension
    * (filtered customers), one fact-fact equi-join, then
    * TakeOrderedAndProject over the grouped revenue — the join+rank
    * composite the dashboard-style queries reduce to. */
  private val q3 = QDef(
    "q_tpch_q3_topk",
    """SELECT l_orderkey,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      |       epoch_ms(o_orderdate) AS o_orderdate_ms
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin) { (s, dir) =>
    val cust = Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sumDec6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Promotion-revenue share (TPC-H Q14 shape): month-sliced fact scan
    * (shipdate bounds push to the parquet row groups) broadcast-joined to
    * `part`, conditional + total exact-DECIMAL sums in ONE aggregation,
    * share as one scalar-double expression over them (no second pass,
    * no self-join). */
  private val q14 = QDef(
    "q_tpch_q14",
    """WITH agg AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
      |      END) AS DOUBLE) AS promo_revenue,
      |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
      |      AS DOUBLE) AS total_revenue,
      |    COUNT(*) AS n_items
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
      |)
      |SELECT promo_revenue, total_revenue,
      |       100 * promo_revenue / total_revenue AS promo_pct, n_items
      |FROM agg""".stripMargin) { (s, dir) =>
    val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >=
          lit(java.sql.Timestamp.valueOf("1995-09-01 00:00:00")) &&
        col("l_shipdate") <
          lit(java.sql.Timestamp.valueOf("1995-10-01 00:00:00")))
      .join(broadcast(Tables.load(s, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sumDec6(when(col("p_type") === "PROMO", disc)).as("promo_revenue"),
        sumDec6(disc).as("total_revenue"),
        count(lit(1)).as("n_items"))
      .select(col("promo_revenue"), col("total_revenue"),
        (lit(100) * col("promo_revenue") / col("total_revenue"))
          .as("promo_pct"),
        col("n_items"))
  }

  /** Disjunctive multi-band predicate (TPC-H Q19 shape): three
    * brand/size/quantity bands OR-ed across the joined row — the shape
    * that proves the optimizer keeps a broadcast hash join under a
    * predicate it cannot split per side (only the common `p_partkey`
    * equi-key and the per-band part-side prunes separate out). */
  private val q19 = QDef(
    "q_tpch_q19",
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
      |    AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
      |       AND l_quantity BETWEEN 10 AND 35)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
      |       AND l_quantity BETWEEN 20 AND 50)""".stripMargin) { (s, dir) =>
    val band = (col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 15) && col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#2" &&
        col("p_size").between(10, 30) && col("l_quantity").between(10, 35)) ||
      (col("p_brand") === "Brand#3" &&
        col("p_size").between(20, 50) && col("l_quantity").between(20, 50))
    Tables.load(s, dir, "lineitem")
      .join(broadcast(Tables.load(s, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .filter(band)
      .agg(
        sumDec6(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val defs: Seq[QDef] = Seq(q1, q5, q4, q18, q6, q3, q14, q19)
}
