package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{QueryDef, Tables}

/** Reference-parity relational operators (SURVEY.md §2) expressed over the
  * driver testdata tables, each paired with its DuckDB oracle SQL.
  *
  * Oracle-parity rules used throughout (see also graft.catalog docs):
  *  - timestamps surface as epoch integers (`unix_timestamp`/`epoch`) —
  *    raw TIMESTAMP columns carry engine-specific tz metadata;
  *  - money/measure sums go through exact DECIMAL arithmetic and are cast
  *    back to DOUBLE (`sum(cast(x as decimal))`) — a raw double sum's
  *    value depends on addition order, which differs across engines;
  *  - averages are exact-decimal-sum / count: one IEEE division of
  *    identical operands is bit-identical on both engines, so no
  *    rounding fudge is needed;
  *  - every query ends in a deterministic ORDER BY.
  */
object Relational {

  /** Exact sum of a 2-decimal-place measure, surfaced as double. */
  private def sumExact(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")
  /** Exact average of a 2-decimal-place measure (sum_dec / n). */
  private def avgExact(c: Column): Column = sumExact(c) / count(lit(1))

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  // ---------------------------------------------------------------------
  // S2/S4 + pushdown: scan with filter + projection (SURVEY §2.1/§2.2).
  // Both the date filter and the 4-column projection reach the parquet
  // reader (PushedFilters / ReadSchema in .explain).
  val scanFilterProject: QueryDef = QueryDef.sql("q_scan_filter_project")(
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-09-01'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") < to_timestamp(lit("1995-09-01")))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  // P1: column-exclusion projection (`dataframe_to_kafka.py:64-66`).
  val dropCols: QueryDef = QueryDef.sql("q_drop_cols")(
    """SELECT p_partkey, p_name, p_brand, p_type FROM part ORDER BY p_partkey""") {
    (s, dir) =>
      Tables.part(s, dir).drop("p_retailprice", "p_size").orderBy("p_partkey")
  }

  // P2: null-row filter (`dataframe_to_kafka.py:61`). Timestamp surfaces
  // as epoch-micros.
  val dropNa: QueryDef = QueryDef.sql("q_dropna")(
    """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
      |FROM events
      |WHERE event_id IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
      |  AND event_type IS NOT NULL AND value IS NOT NULL AND props IS NOT NULL
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir).na.drop()
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .orderBy("event_id")
  }

  // P3: computed literal column (`data_collector.py:26`).
  val litTag: QueryDef = QueryDef.sql("q_lit_tag")(
    """SELECT n_nationkey, n_name, n_regionkey, 'batch' AS ingest_source
      |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
    Tables.nation(s, dir).withColumn("ingest_source", lit("batch"))
      .orderBy("n_nationkey")
  }

  // F5/F6/P4: JSON decode + struct flatten (`spark_streaming_kafka.py:32-34`).
  val jsonFlatten: QueryDef = QueryDef.sql("q_json_flatten")(
    """SELECT event_id, event_type,
      |  CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INTEGER) AS prop_k
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .withColumn("data",
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")))
      .select(col("event_id"), col("event_type"), col("data.k").as("prop_k"))
      .orderBy("event_id")
  }

  // F4/F8: DSV wire encoding + key selection (`dataframe_to_kafka.py:44-53,94-100`).
  val dsvEncode: QueryDef = QueryDef.sql("q_dsv_encode")(
    """SELECT CAST(n_nationkey AS VARCHAR) AS key,
      |  concat_ws('|', CAST(n_nationkey AS VARCHAR), n_name,
      |            CAST(n_regionkey AS VARCHAR)) AS value
      |FROM nation ORDER BY key""".stripMargin) { (s, dir) =>
    val n = Tables.nation(s, dir)
    n.select(
        col("n_nationkey").cast("string").as("key"),
        graft.core.Codecs.dsvEncode(n, "|").as("value"))
      .orderBy("key")
  }

  // J1: multiway equi-join (`data_collector.py:23`). Dims are broadcast —
  // at 100 TB the fact side never shuffles for the dim joins; only the
  // lineitem⋈orders join is a genuine shuffle (co-partitionable on
  // orderkey via bucketing in a real deployment).
  val multiwayJoin: QueryDef = QueryDef.sql("q_multiway_join")(
    """SELECT r_name, n_name, COUNT(*) AS n_items, SUM(l_quantity) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey  = o_orderkey
      |JOIN customer ON o_custkey   = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy("r_name", "n_name")
  }

  // A1: the reference's defining computation — minute-floor + group + mean
  // (`data_collector.py:29-38`), on the events stream table.
  val groupAvgMinute: QueryDef = QueryDef.sql("q_group_avg_minute")(
    """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS ts_min_epoch,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(
        unix_timestamp(date_trunc("minute", col("ts"))).as("ts_min_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), avgExact(col("value")).as("avg_value"))
      .orderBy("ts_min_epoch", "event_type")
  }

  /** A2 generalized: the Kibana date-histogram panel at a caller-chosen
    * interval (`README.md:187-195` — the interval dropdown a dashboard
    * issues with every refresh). One partial→final hash aggregate at
    * any grain; the bucket column is `bucket_epoch`.
    * `q_hourly_stats` is exactly this at "hour", which keeps the serve
    * layer's interval selection pinned to an oracle-gated query.
    */
  def dateHistogram(s: SparkSession, dir: String, grain: String): DataFrame = {
    require(Set("minute", "hour", "day", "week", "month")(grain),
      s"unsupported interval: $grain")
    Tables.events(s, dir)
      .groupBy(
        unix_timestamp(date_trunc(grain, col("ts"))).as("bucket_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_value"),
        max(col("value")).as("max_value"), sumExact(col("value")).as("sum_value"))
      .orderBy("bucket_epoch", "event_type")
  }

  // A2: Kibana-style hourly metric aggregations (`README.md:187-195`).
  val hourlyStats: QueryDef = QueryDef.sql("q_hourly_stats")(
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
      |  event_type, COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    dateHistogram(s, dir, "hour").withColumnRenamed("bucket_epoch", "hour_epoch")
  }

  // O1: union-all of per-source frames (`data_collector.py:46`).
  val unionAll: QueryDef = QueryDef.sql("q_union_all")(
    """SELECT event_id, event_type, value FROM events
      |WHERE event_type = 'purchase' AND value > 150
      |UNION ALL
      |SELECT event_id, event_type, value FROM events WHERE event_type = 'error'
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir).select("event_id", "event_type", "value")
    e.filter(col("event_type") === "purchase" && col("value") > 150)
      .unionByName(e.filter(col("event_type") === "error"))
      .orderBy("event_id")
  }

  // F1/F2/F3: epoch↔timestamp conversions + minute floor
  // (`data_collector.py:29-35`). Round-trips through epoch-seconds.
  val timeFuncs: QueryDef = QueryDef.sql("q_time_funcs")(
    """SELECT event_id, epoch_us(ts) AS ts_us,
      |  CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS ts_min_epoch,
      |  epoch_us(make_timestamp(CAST(epoch(date_trunc('minute', ts)) AS BIGINT) * 1000000)) AS ts_rt_us
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        unix_timestamp(date_trunc("minute", col("ts"))).as("ts_min_epoch"),
        unix_micros(timestamp_seconds(
          unix_timestamp(date_trunc("minute", col("ts"))))).as("ts_rt_us"))
      .orderBy("event_id")
  }

  // P6: deterministic row shuffle — a seeded random permutation the oracle
  // can reproduce (md5-keyed sort replaces pandas `.sample(frac=1)`,
  // `dataframe_to_kafka.py:57-58`).
  val shuffleDet: QueryDef = QueryDef.sql("q_shuffle_det")(
    """SELECT event_id, md5(CAST(event_id AS VARCHAR)) AS shuffle_key
      |FROM events ORDER BY shuffle_key, event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_id"),
        md5(col("event_id").cast("string")).as("shuffle_key"))
      .orderBy("shuffle_key", "event_id")
  }

  // K3 semantics: upsert-by-key / last-write-wins per key — the surprising
  // `es.mapping.id=room` behavior (`spark_streaming_kafka.py:41`,
  // SURVEY §7.4.2) expressed as a relational query.
  val upsertLastWins: QueryDef = QueryDef.sql("q_upsert_last_wins")(
    """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
      |  value AS last_value
      |FROM (SELECT *, row_number() OVER
      |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"), col("value").as("last_value"))
      .orderBy("user_id")
  }

  // Q3 (SURVEY §7.2): top-k groups per hour via rank() — the engine's
  // ranking window function.
  val topkHourly: QueryDef = QueryDef.sql("q_topk_hourly")(
    """WITH h AS (
      |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
      |    event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
      |  FROM events GROUP BY 1, 2)
      |SELECT hour_epoch, event_type, n, avg_value, rnk
      |FROM (SELECT *, RANK() OVER
      |        (PARTITION BY hour_epoch ORDER BY avg_value DESC, event_type) AS rnk
      |      FROM h) t
      |WHERE rnk <= 3 ORDER BY hour_epoch, rnk, event_type""".stripMargin) { (s, dir) =>
    val hourly = Tables.events(s, dir)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), avgExact(col("value")).as("avg_value"))
    val w = Window.partitionBy("hour_epoch")
      .orderBy(col("avg_value").desc, col("event_type"))
    hourly.withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .select("hour_epoch", "event_type", "n", "avg_value", "rnk")
      .orderBy("hour_epoch", "rnk", "event_type")
  }

  // Q4 (SURVEY §7.2): key×hour matrix via pivot.
  val pivotTypeHour: QueryDef = QueryDef.sql("q_pivot_type_hour")(
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val pivoted = Tables.events(s, dir)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
    // pivot leaves null where a (hour, type) combo has no rows; the SQL
    // COUNT(CASE ...) form yields 0 — align on 0.
    pivoted.select(col("hour_epoch") +:
        eventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("hour_epoch")
  }

  // Q6 (SURVEY §7.2): dirty-data / anomaly filter.
  val anomalyFilter: QueryDef = QueryDef.sql("q_anomaly_filter")(
    """SELECT event_id, user_id, event_type, value FROM events
      |WHERE value > 190 OR (event_type = 'error' AND value > 100)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .filter(col("value") > 190 ||
        (col("event_type") === "error" && col("value") > 100))
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  // TPC-H Q3 shape (shipping-priority revenue top-k): selective filters
  // on BOTH join sides reach the parquet scans, the join shuffles (or
  // broadcasts, size-permitting) only surviving rows, revenue is an
  // exact decimal product-sum, and the top-10 is a deterministic
  // (revenue DESC, orderkey) LIMIT that Spark executes as TakeOrdered —
  // no global sort materializes.
  val topRevenue: QueryDef = QueryDef.sql("q_top_revenue")(
    """SELECT l_orderkey,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_epoch, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    val cut = "1995-03-15 00:00:00"
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit(cut).cast("timestamp"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") < lit(cut).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"),
        unix_timestamp(col("o_orderdate")).as("orderdate_epoch"),
        col("o_orderpriority"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // The TPC-H Q5 star-join shape. nation/region are CONSTANT-size
  // dimensions (25/5 rows at any SF) → explicit broadcast; customer and
  // supplier SCALE with the corpus, so they are deliberately NOT pinned
  // broadcast — AQE picks broadcast at bench scale and falls back to a
  // shuffle join when they outgrow the threshold, which is the correct
  // 100 TB behavior (hard-coding broadcast() on an SF-scaled table is
  // the plan that dies first on a real cluster). The supplier join
  // carries the local-supplier condition (s_nationkey = c_nationkey —
  // what makes Q5 a graph, not a chain); the region filter prunes
  // suppliers BEFORE the fact join. Revenue sums in exact DECIMAL, cast
  // back to double after the final aggregate.
  val regionRevenue: QueryDef = QueryDef.sql("q_region_revenue")(
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      |JOIN nation ON n_nationkey = s_nationkey
      |JOIN region ON r_regionkey = n_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    val nations = broadcast(Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name"))
    val suppliers = Tables.supplier(s, dir)
      .join(nations, col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    val fact = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(suppliers,
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
    fact.groupBy("n_name")
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // TPC-H Q14 shape: conditional aggregation over the fact⋈part join —
  // promo revenue share per ship month. One key shuffle (partkey; part
  // is SF-scaled so the join strategy is left to AQE, same policy as
  // q_region_revenue's customer/supplier), then a month rollup. The
  // CASE lives INSIDE the sum so both measures come from the same
  // partial→final aggregate pass; revenue math in exact DECIMAL, the
  // pct is one double division of the two exact sums, rounded.
  val promoRevenue: QueryDef = QueryDef.sql("q_promo_revenue")(
    """WITH m AS (
      |  SELECT CAST(epoch(date_trunc('month', l_shipdate)) AS BIGINT) AS month_epoch,
      |    CAST(SUM(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |             (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1)
      |SELECT month_epoch, promo_revenue, total_revenue,
      |  ROUND(100 * promo_revenue / total_revenue, 6) AS promo_pct
      |FROM m ORDER BY month_epoch""".stripMargin) { (s, dir) =>
    val rev = col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1) - col("l_discount").cast(DecimalType(18, 2)))
    val m = Tables.lineitem(s, dir)
      .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(Tables.part(s, dir).select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(unix_timestamp(date_trunc("month", col("l_shipdate"))).as("month_epoch"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev)
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("promo_revenue"),
        sum(rev).cast("double").as("total_revenue"))
    m.select(col("month_epoch"), col("promo_revenue"), col("total_revenue"),
        round(lit(100) * col("promo_revenue") / col("total_revenue"), 6).as("promo_pct"))
      .orderBy("month_epoch")
  }

  // TPC-H Q3 shape: unshipped-revenue top-k over the 3-way
  // customer⋈orders⋈lineitem join. All three single-table predicates
  // (mktsegment, orderdate, shipdate) push to the parquet scans BEFORE
  // any join; customer and orders are SF-scaled so join strategy is
  // left to AQE (same policy as q_region_revenue). The final top-10 is
  // orderBy+limit → TakeOrderedAndProject: each partition keeps 10 rows
  // and the driver merges k·parts rows — no global sort materializes,
  // which is what makes a top-k over a 100 TB fact join feasible.
  val shipPriority: QueryDef = QueryDef.sql("q_ship_priority")(
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_epoch, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    val cut = lit("1998-06-01 00:00:00").cast("timestamp")
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ords = Tables.orders(s, dir)
      .filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val items = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > cut)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    cust.join(ords, col("c_custkey") === col("o_custkey"))
      .join(items, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"),
        unix_timestamp(col("o_orderdate")).as("orderdate_epoch"),
        col("o_orderpriority"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
        .cast("double").as("revenue"))
      .select("l_orderkey", "revenue", "orderdate_epoch", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // TPC-H Q1, the canonical pricing summary: one scan, six wide
  // aggregates per (returnflag, linestatus) — the benchmark's test of
  // raw partial→final aggregate throughput (map-side combine collapses
  // everything before the 6-group shuffle). All sums in exact DECIMAL
  // (the 3-factor charge product is exact at scale 6), averages are one
  // IEEE division of the exact sum by the count, and the date filter
  // pushes to the scan.
  //
  // Oracle-side cast discipline: DuckDB's DECIMAL(38,s)→DOUBLE goes
  // int128→double→÷10^s — TWO roundings, one ULP off correct nearest
  // once the scaled integer exceeds 2^53 (the sf1.0 parity run caught
  // sum_charge: scale 6, 5.08e10·10^6 ≈ 5e16). Spark's decimal→double
  // cast is correctly rounded, so the oracle routes each sum through
  // VARCHAR (strtod — correctly rounded by spec) to express the same
  // "exact decimal, rounded once" semantics. Engine side unchanged.
  // The scale-4 two-factor revenue sums elsewhere sit orders of
  // magnitude below the 2^53 cliff; re-audit them if a parity run at
  // a larger SF ever flags one.
  val pricingSummary: QueryDef = QueryDef.sql("q_pricing_summary")(
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (1 - CAST(l_discount AS DECIMAL(18,2))) *
      |           (1 + CAST(l_tax AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    val d = (c: String) => col(c).cast(DecimalType(18, 2))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2001-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(d("l_quantity")).cast("double").as("sum_qty"),
        sum(d("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(d("l_extendedprice") * (lit(1) - d("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(d("l_extendedprice") * (lit(1) - d("l_discount")) *
            (lit(1) + d("l_tax")))
          .cast("double").as("sum_charge"),
        (sum(d("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(d("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        (sum(d("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // TPC-H Q18 shape: a HAVING aggregate that then joins BACK to the
  // dimension side — the "large orders" pattern (aggregate-filter as a
  // join input) the catalog otherwise lacks. The quantity sum is exact
  // (integer-valued doubles, |sum| ≪ 2^53) so the >250 cut and the
  // BIGINT surface are deterministic on both engines; after the cut the
  // qualifying set is ~1% of orders, so AQE picks broadcast for the
  // joins back to orders/customer at bench scale and degrades to
  // shuffle joins beyond the threshold. o_totalprice passes through as
  // the raw stored double (no re-rounding — identical bits on both
  // engines); top-100 is again TakeOrderedAndProject.
  val largeOrders: QueryDef = QueryDef.sql("q_large_orders")(
    """WITH big AS (
      |  SELECT l_orderkey AS bkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
      |  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 250)
      |SELECT c_name, c_custkey, o_orderkey,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_epoch,
      |  o_totalprice, total_qty
      |FROM big
      |JOIN orders ON o_orderkey = bkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("bkey"))
      .agg(sum(col("l_quantity")).as("qty_sum"))
      .filter(col("qty_sum") > 250)
      .select(col("bkey"), col("qty_sum").cast("long").as("total_qty"))
    big.join(Tables.orders(s, dir)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("o_orderkey") === col("bkey"))
      .join(Tables.customer(s, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("orderdate_epoch"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  // TPC-H Q21 shape: EXISTS + NOT EXISTS correlated on the SAME fact
  // table — the hardest of the classic join compositions (a semi join
  // and an anti join against two filtered self-views of lineitem).
  // Q21's receipt/commit dates aren't in this schema, so "failed" is
  // the returned flag; the STRUCTURE — sole-blamed supplier in a
  // multi-supplier order — is verbatim: L1 is this supplier's returned
  // line, the semi requires another supplier in the order, the anti
  // requires no OTHER supplier's returned line. Both self-joins hash
  // on l_orderkey with a residual suppkey-inequality condition, so the
  // fact shuffles on one key and the two probes reuse that
  // partitioning; the supplier dim is broadcast. At 100 TB this is
  // exactly the plan you want: no correlated per-row subquery
  // execution, two hash joins over one exchange.
  val soleBlame: QueryDef = QueryDef.sql("q_sole_blame")(
    """WITH l1 AS (SELECT l_orderkey, l_suppkey FROM lineitem
      |            WHERE l_returnflag = 'R')
      |SELECT s_name, COUNT(*) AS numwait
      |FROM l1
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 25""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val l1 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o1"), col("l_suppkey").as("sp1"))
    val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("sp2"))
    val l3 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o3"), col("l_suppkey").as("sp3"))
    l1.join(l2, col("o1") === col("o2") && col("sp1") =!= col("sp2"),
        "left_semi")
      .join(l3, col("o1") === col("o3") && col("sp1") =!= col("sp3"),
        "left_anti")
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
        col("sp1") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(25)
  }

  val all: Seq[QueryDef] = Seq(
    scanFilterProject, dropCols, dropNa, litTag, jsonFlatten, dsvEncode,
    multiwayJoin, groupAvgMinute, hourlyStats, unionAll, timeFuncs,
    shuffleDet, upsertLastWins, topkHourly, pivotTypeHour, anomalyFilter,
    topRevenue, regionRevenue, promoRevenue, shipPriority, largeOrders,
    pricingSummary, soleBlame)
}
