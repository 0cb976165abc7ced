package graft.catalog

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.ops.GlobalIndex

/** Scale-technique operators: each query demonstrates a pattern that
  * keeps working at 1000 executors — distributed global ordering, skew
  * salting, columnar-format round-trips, exact moment statistics — and
  * hash-matches an oracle that states the SAME semantics in the naive
  * (single-node-friendly) form. Correctness is the oracle; the value is
  * the physical shape.
  */
object Scale {

  // Global row numbering WITHOUT the single-partition window.
  // row_number() OVER (ORDER BY ...) — the oracle — is the semantics;
  // the implementation is range-repartition + sort + per-partition
  // offset labeling (ops.GlobalIndex), which has no single-task funnel.
  // Tie-break on o_orderkey makes the total order unique, so the two
  // shapes agree row-for-row.
  val globalRownum: QueryDef = QueryDef.sql("q_global_rownum")(
    """SELECT o_orderkey, o_totalprice,
      |  ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |FROM orders ORDER BY rn""".stripMargin) { (s, dir) =>
    GlobalIndex.withRowNumber(
        Tables.orders(s, dir).select("o_orderkey", "o_totalprice"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), "rn")
      .orderBy("rn")
  }

  // Skew-salted fact⋈dim join: the fact side's hot keys are split into
  // SaltBuckets sub-keys (salt = hash(row id) mod S), the dim side is
  // replicated S× with an explode, and the join runs on (key, salt) —
  // every hot key's rows spread over S tasks instead of one straggler.
  // The oracle is the PLAIN join: salting must be a pure physical
  // rewrite, invisible in the result.
  private val SaltBuckets = 8
  val saltedJoin: QueryDef = QueryDef.sql("q_salted_join")(
    """WITH dim AS (
      |  SELECT user_id, COUNT(*) AS user_events,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS user_purchases
      |  FROM events GROUP BY user_id)
      |SELECT e.event_id, e.user_id, d.user_events, d.user_purchases
      |FROM events e JOIN dim d ON e.user_id = d.user_id
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val dim = ev.groupBy("user_id")
      .agg(count(lit(1)).as("user_events"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).cast("long")
          .as("user_purchases"))
    val salted = ev.select(col("event_id"), col("user_id"),
      pmod(hash(col("event_id")), lit(SaltBuckets)).as("__salt"))
    val dimSalted = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(SaltBuckets - 1))))
    // shuffle_hash hint: at THIS size Spark would broadcast the dim and
    // the salt would never reach a shuffle — force the shuffled path the
    // technique exists for (at 100 TB the dim is past broadcast range)
    salted.join(dimSalted.hint("shuffle_hash"), Seq("user_id", "__salt"))
      .select("event_id", "user_id", "user_events", "user_purchases")
      .orderBy("event_id")
  }

  // ORC source/sink round-trip: events → ORC files → scan → aggregate.
  // Exercises the second columnar format end-to-end (schema + timestamp
  // fidelity through the write/read cycle); the oracle reads the
  // original parquet, so any round-trip corruption breaks the hash.
  val sourceOrc: QueryDef = QueryDef.sql("q_source_orc")(
    """SELECT event_type, COUNT(*) AS n,
      |  min(value) AS min_v, max(value) AS max_v,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    // same per-run unique scratch path as q_source_json (race-free under
    // concurrent bench/verify runs sharing a working directory)
    val path = s"target/tmp/q_source_orc-${java.util.UUID.randomUUID().toString.take(8)}"
    graft.core.Spill.track(path)
    Tables.events(s, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").orc(path)
    s.read.orc(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"))
      .orderBy("event_type")
  }

  // JSON-lines source/sink round-trip: events → JSON files → schema-on-
  // read scan → aggregate. The third storage format end-to-end (after
  // parquet and ORC). Timestamps travel as explicit unix_micros longs —
  // the JSON writer's default timestamp format truncates to millis, so
  // fidelity-critical pipelines put epoch integers on the wire (same
  // rule the oracle-parity discipline applies to outputs). Doubles
  // round-trip exactly (shortest-repr encoding).
  val sourceJson: QueryDef = QueryDef.sql("q_source_json")(
    """SELECT event_type, COUNT(*) AS n,
      |  min(value) AS min_v, max(value) AS max_v,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    // unique per-run scratch path (tracked for Spill.cleanup): a fixed
    // relative path races when concurrent bench/verify runs share a
    // working directory — one run can read another's half-written output
    val path = s"target/tmp/q_source_json-${java.util.UUID.randomUUID().toString.take(8)}"
    graft.core.Spill.track(path)
    Tables.events(s, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").json(path)
    s.read
      .schema("event_id BIGINT, ts_us BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
      .json(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"))
      .orderBy("event_type")
  }

  // Distribution-position window family: percent_rank / cume_dist plus
  // the frame-sensitive value pickers (nth/first/last over the full
  // partition frame — the default RANGE frame would stop at CURRENT ROW
  // and make last_value a no-op). Unique tie-break via event_id keeps
  // every output deterministic; percent_rank's (rank-1)/(n-1) is an
  // exact int/int division on both engines.
  val windowFuncs2: QueryDef = QueryDef.sql("q_window_funcs2")(
    """SELECT event_id, event_type, value,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  nth_value(value, 3) OVER wf AS third_v,
      |  first_value(value) OVER wf AS min_v,
      |  last_value(value) OVER wf AS max_v
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id),
      |  wf AS (PARTITION BY event_type ORDER BY value, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("event_type").orderBy("value", "event_id")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        nth_value(col("value"), 3).over(wf).as("third_v"),
        first(col("value")).over(wf).as("min_v"),
        last(col("value")).over(wf).as("max_v"))
      .orderBy("event_id")
  }

  // Bitwise aggregates — set-membership style folds over integer keys
  // (bit_and/bit_or/bit_xor are all associative+commutative, so they
  // partial-aggregate map-side like sum).
  val bitwiseAgg: QueryDef = QueryDef.sql("q_bitwise_agg")(
    """SELECT user_id,
      |  bit_and(event_id) AS band, bit_or(event_id) AS bor,
      |  bit_xor(event_id) AS bxor, COUNT(*) AS n
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(expr("bit_and(event_id)").as("band"),
        expr("bit_or(event_id)").as("bor"),
        expr("bit_xor(event_id)").as("bxor"),
        count(lit(1)).as("n"))
      .orderBy("user_id")
  }

  // Exact Pearson correlation from exact decimal moment sums: corr()'s
  // streaming double accumulation is partition-order dependent, so the
  // five moments (Sx, Sy, Sxx, Syy, Sxy) accumulate as DECIMAL —
  // associative, order-free — and the final formula runs once per group
  // in double, identical on any partitioning. The moment sums can
  // exceed 2^53 scaled units, where DECIMAL→DOUBLE conversion itself
  // rounds — and the two engines can double-round differently by one
  // ulp (observed on one sf0.001 group), so the final correlation is
  // rounded to 12 decimals (≈10 significant digits at |corr|~0.01,
  // far above the conversion noise) — same ulp-absorption discipline
  // as the ln()/exp() queries.
  val corrExact: QueryDef = QueryDef.sql("q_corr_exact")(
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |       * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 12)
      |    AS corr_qty_price
      |FROM m ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val x = col("l_quantity").cast("decimal(18,2)")
    val y = col("l_extendedprice").cast("decimal(18,2)")
    val m = Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
    val (n, sx, sy, sxx, syy, sxy) = (col("n"),
      col("sx").cast("double"), col("sy").cast("double"),
      col("sxx").cast("double"), col("syy").cast("double"),
      col("sxy").cast("double"))
    m.select(col("l_returnflag"), n,
        round((n * sxy - sx * sy)
          / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12)
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  val all: Seq[QueryDef] = Seq(
    globalRownum, saltedJoin, sourceOrc, sourceJson, windowFuncs2, bitwiseAgg,
    corrExact)
}
