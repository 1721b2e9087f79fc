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

  val defs: Seq[QDef] = Seq(q1, q5, q4, q18)
}
