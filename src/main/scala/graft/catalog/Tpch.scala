package graft.catalog

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.core.{QueryDef, Tables}

/** TPC-H-shaped join/aggregate workloads beyond the reference's own
  * surface (Q1/Q3/Q5/Q14/Q18 live in [[Relational]]); this file adds the
  * remaining canonical plan shapes the engine should prove out: pure
  * pushed-filter aggregation (Q6), EXISTS semi-join (Q4), conditional
  * join-side counts (Q12), count-distinct over an anti-joined derived
  * relation (Q16), disjunctive cross-table predicates (Q19), returned-item
  * top-k (Q10), and scalar-subquery + NOT EXISTS anti-join (Q22).
  *
  * The driver testdata carries a trimmed TPC-H schema (no l_shipmode /
  * l_commitdate / l_receiptdate / partsupp / p_container), so queries whose
  * official predicates touch missing columns keep the PLAN SHAPE and swap
  * in present columns: Q4's "received late" becomes "shipped >90 days
  * after ordering", Q12 groups by l_returnflag instead of l_shipmode,
  * Q16 derives supplier×part from distinct lineitem pairs instead of
  * partsupp, Q19 drops the container conjunct, Q22's "no orders at all"
  * becomes "no orders since 2001" (the all-time variant is empty at every
  * SF — every customer has orders).
  *
  * Float discipline matches [[Relational]]: money sums in exact
  * DECIMAL(18,2) cast back to double AFTER the final aggregate, averages
  * as one IEEE division of exact operands, every query ends in a
  * deterministic ORDER BY.
  */
object Tpch {

  /** Exact 2-dp measure sum surfaced as double. */
  private def sumExact(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")
  private def dec(c: String): Column = col(c).cast(DecimalType(18, 2))

  // TPC-H Q6: the pure scan-throughput probe — no join, one aggregate,
  // three single-column predicates that ALL push to the parquet scan
  // (shipdate range, discount band, quantity cut). At 100 TB this is the
  // query whose plan must be scan→partial-agg→1-row exchange and nothing
  // else; any shuffle or unpushed filter here is a bug. Discount/quantity
  // comparisons run on the stored doubles with identical literals on both
  // engines, so the row set is bit-deterministic.
  val forecastRevenue: QueryDef = QueryDef.sql("q_forecast_revenue")(
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |             CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(sum(dec("l_extendedprice") * dec("l_discount"))
        .cast("double").as("revenue"))
  }

  // TPC-H Q4 shape: priority census over orders with an EXISTS-correlated
  // lineitem probe — the canonical LEFT SEMI join. The official predicate
  // (l_commitdate < l_receiptdate) uses columns the testdata lacks; the
  // stand-in "shipped more than 90 days after ordering" keeps the shape:
  // an equi-key semi-join carrying an extra non-equi conjunct. The semi
  // join deduplicates multi-lineitem matches on the join side — no
  // DISTINCT pass — and orders' date filter pushes to its scan before the
  // shuffle. At scale both sides hash-partition on orderkey once.
  val latePriority: QueryDef = QueryDef.sql("q_late_priority")(
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val ords = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1995-07-01 00:00:00").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val items = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
    ords.join(items,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  // TPC-H Q12 shape: per-lineitem-class conditional counts of the joined
  // order's priority — both CASE branches inside ONE partial→final
  // aggregate pass over a single orderkey join (the official query groups
  // by l_shipmode, absent here; l_returnflag plays the 3-value class).
  // Counts surface as BIGINT on both engines.
  val priorityByClass: QueryDef = QueryDef.sql("q_priority_by_class")(
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01 00:00:00").cast("timestamp"))
      .select("l_orderkey", "l_returnflag")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  // TPC-H Q16 shape: supplier diversity per part group. partsupp is absent,
  // so the supplier×part relation derives from DISTINCT lineitem
  // (partkey, suppkey) — same downstream plan: count-distinct suppliers per
  // (brand, type, size) after excluding a supplier denylist (official:
  // complaint comments; here: negative account balance) via LEFT ANTI join.
  // The distinct and the count-distinct both hash-aggregate with map-side
  // partials; the denylist is a filtered scan of the supplier dim, ~constant
  // relative to the fact, but deliberately NOT pinned broadcast (it scales
  // with SF — AQE decides). The final top-50 is a total order: supplier_cnt
  // ties break on the full group key.
  val supplierDiversity: QueryDef = QueryDef.sql("q_supplier_diversity")(
    """WITH ps AS (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
      |            FROM lineitem)
      |SELECT p_brand, p_type, p_size, COUNT(DISTINCT suppkey) AS supplier_cnt
      |FROM ps JOIN part ON p_partkey = partkey
      |WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 50""".stripMargin) { (s, dir) =>
    val ps = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
      .distinct()
    val deny = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val parts = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    ps.join(deny, col("suppkey") === col("s_suppkey"), "left_anti")
      .join(parts, col("p_partkey") === col("partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      .limit(50)
  }

  // TPC-H Q19 shape: revenue under an OR of brand/size/quantity conjunct
  // groups spanning both join sides. The part-side disjuncts
  // (brand ∧ size-range) and the lineitem-side quantity ranges can't be
  // split into independent pushdowns — the test is that Catalyst still
  // pushes the derivable per-table envelopes (size ≤ 15, quantity ≤ 30)
  // while evaluating the full disjunction above the join. Official
  // container/shipmode conjuncts are absent from the schema and dropped.
  val brandRevenue: QueryDef = QueryDef.sql("q_brand_revenue")(
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |             (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity >= 1 AND l_quantity <= 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity >= 10 AND l_quantity <= 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin) { (s, dir) =>
    val j = Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(Tables.part(s, dir).select("p_partkey", "p_brand", "p_size"),
        col("p_partkey") === col("l_partkey"))
    val pred =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
        col("l_quantity") >= 20 && col("l_quantity") <= 30)
    j.filter(pred)
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
        .cast("double").as("revenue"))
  }

  // TPC-H Q10: top-20 customers by revenue lost to returns in a quarter —
  // the 4-way fact join (customer⋈orders⋈lineitem⋈nation) grouped at
  // customer grain with TakeOrderedAndProject for the cut. nation is
  // constant-size (pinned broadcast); customer/orders scale, so their
  // strategy is left to AQE. returnflag and the orderdate window push to
  // the scans; c_acctbal passes through as the stored double.
  val returnedRevenue: QueryDef = QueryDef.sql("q_returned_revenue")(
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  n_name, c_acctbal
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY 1, 2, 4, 5
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
    val ords = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1995-07-01 00:00:00").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val items = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    Tables.customer(s, dir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .join(ords, col("c_custkey") === col("o_custkey"))
      .join(items, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
        .cast("double").as("revenue"))
      .select("c_custkey", "c_name", "revenue", "n_name", "c_acctbal")
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  // TPC-H Q22 shape: rich-but-dormant customers — a scalar aggregate
  // threshold (global average balance) feeding a filter, then NOT EXISTS
  // against recent orders as a LEFT ANTI join, rolled up per nation. The
  // official "no orders ever" is empty at every SF (all customers order),
  // so dormancy is "no orders since 2001-01-01" — same anti-join plan on a
  // narrower build side. The threshold is one IEEE division of an exact
  // DECIMAL sum by the count — bit-identical on both engines — and joins
  // in as a 1-row broadcast, never a driver collect.
  val dormantRich: QueryDef = QueryDef.sql("q_dormant_rich")(
    """WITH avg_bal AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS ab
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer, avg_bal
      |WHERE c_acctbal > ab
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey", "c_acctbal")
    val thresh = cust.filter(col("c_acctbal") > 0)
      .agg((sumExact(col("c_acctbal")) / count(lit(1))).as("ab"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp"))
      .select("o_custkey")
    cust.join(broadcast(thresh))
      .filter(col("c_acctbal") > col("ab"))
      .join(recent, col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), sumExact(col("c_acctbal")).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  val all: Seq[QueryDef] = Seq(
    forecastRevenue, latePriority, priorityByClass, supplierDiversity,
    brandRevenue, returnedRevenue, dormantRich)
}
