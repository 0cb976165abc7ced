package graft.catalog

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{QueryDef, Tables}
import graft.ops.Text

/** Scalar-function and set-operator coverage: strings, regex extraction,
  * safe math, set ops (intersect/except), cube, exact median — plus the
  * native rolling-hash fingerprint expression with an exact-arithmetic
  * SQL oracle.
  */
object Functions {

  import TextAnalysis.toksSql

  // String functions over nation names.
  val stringFuncs: QueryDef = QueryDef.sql("q_string_funcs")(
    """SELECT n_nationkey, upper(n_name) AS up, lower(n_name) AS lo,
      |  substr(n_name, 1, 3) AS pre, length(n_name) AS len,
      |  concat(n_name, '-', CAST(n_regionkey AS VARCHAR)) AS tagged,
      |  lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS padded,
      |  replace(n_name, 'A', '_') AS repl, reverse(n_name) AS rev,
      |  trim('  ' || n_name || ' ') AS trimmed
      |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
    Tables.nation(s, dir).select(
        col("n_nationkey"),
        upper(col("n_name")).as("up"), lower(col("n_name")).as("lo"),
        substring(col("n_name"), 1, 3).as("pre"), length(col("n_name")).as("len"),
        concat(col("n_name"), lit("-"), col("n_regionkey").cast("string")).as("tagged"),
        lpad(col("n_nationkey").cast("string"), 4, "0").as("padded"),
        regexp_replace(col("n_name"), "A", "_").as("repl"),
        reverse(col("n_name")).as("rev"),
        trim(concat(lit("  "), col("n_name"), lit(" "))).as("trimmed"))
      .orderBy("n_nationkey")
  }

  // Regex extraction (the Spark side of F6's regex cousin).
  val regexExtract: QueryDef = QueryDef.sql("q_regex_extract")(
    """SELECT event_id,
      |  CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INTEGER) AS k_regex,
      |  CASE WHEN regexp_matches(props, '^\{.*\}$') THEN 1 ELSE 0 END AS looks_json
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir).select(
        col("event_id"),
        regexp_extract(col("props"), "\"k\": (-?\\d+)", 1).cast("int").as("k_regex"),
        when(col("props").rlike("^\\{.*\\}$"), 1).otherwise(0).as("looks_json"))
      .orderBy("event_id")
  }

  // Safe math: abs/sqrt/floor/ceil/sign — IEEE-exact on both engines.
  val mathFuncs: QueryDef = QueryDef.sql("q_math_funcs")(
    """SELECT event_id, abs(value - 100) AS dist100, sqrt(value) AS root,
      |  CAST(floor(value) AS BIGINT) AS fl, CAST(ceil(value) AS BIGINT) AS ce,
      |  CAST(sign(value - 100) AS DOUBLE) AS sgn,
      |  greatest(value, 50.0) AS hi, least(value, 50.0) AS lo
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir).select(
        col("event_id"),
        abs(col("value") - 100).as("dist100"), sqrt(col("value")).as("root"),
        floor(col("value")).as("fl"), ceil(col("value")).as("ce"),
        signum(col("value") - 100).cast("double").as("sgn"),
        greatest(col("value"), lit(50.0)).as("hi"),
        least(col("value"), lit(50.0)).as("lo"))
      .orderBy("event_id")
  }

  // Set operators: INTERSECT / EXCEPT (distinct semantics both engines).
  val setOps: QueryDef = QueryDef.sql("q_set_ops")(
    """SELECT user_id, 'both' AS tag FROM (
      |  SELECT user_id FROM events WHERE event_type = 'purchase'
      |  INTERSECT
      |  SELECT user_id FROM events WHERE event_type = 'error') t
      |UNION ALL
      |SELECT user_id, 'purchase_only' AS tag FROM (
      |  SELECT user_id FROM events WHERE event_type = 'purchase'
      |  EXCEPT
      |  SELECT user_id FROM events WHERE event_type = 'error') t
      |ORDER BY tag, user_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase").select("user_id")
    val e = ev.filter(col("event_type") === "error").select("user_id")
    p.intersect(e).withColumn("tag", lit("both"))
      .unionByName(p.except(e).withColumn("tag", lit("purchase_only")))
      .orderBy("tag", "user_id")
  }

  // Cube: all grouping-set combinations of (event_type, hour bucket).
  val cubeCounts: QueryDef = QueryDef.sql("q_cube")(
    """SELECT event_type, hour(ts) AS hod, COUNT(*) AS n
      |FROM events
      |GROUP BY CUBE (event_type, hour(ts))
      |ORDER BY event_type NULLS FIRST, hod NULLS FIRST""".stripMargin) { (s, dir) =>
    // hour(ts), not epoch%24: epoch of an hour-truncated timestamp is a
    // multiple of 3600 and 3600 % 24 == 0, so that form is always 0.
    Tables.events(s, dir)
      .withColumn("hod", hour(col("ts")).cast("long"))
      .cube(expr("event_type"), expr("hod"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type").asc_nulls_first, col("hod").asc_nulls_first)
  }

  // Exact median by explicit rank formulation — identical row_number
  // arithmetic on both engines (no engine-specific median()).
  val medianValue: QueryDef = QueryDef.sql("q_median_value")(
    """WITH r AS (
      |  SELECT event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS median_value
      |FROM r WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("value", "event_id")
    val wn = Window.partitionBy("event_type")
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      // integer division (`div` / `//`) in both engines: picks the
      // middle row (odd n) or the two middle rows (even n)
      .filter(expr("rn = (n + 1) div 2 OR rn = (n + 2) div 2"))
      .groupBy("event_type")
      .agg((sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double") / count(lit(1))).as("median_value"))
      .orderBy("event_type")
  }

  // Native rolling-hash fingerprint (codegen'd expression) with an
  // exact-BIGINT-arithmetic oracle fold over ASCII codepoints.
  val rollingHash: QueryDef = QueryDef.sql("q_rolling_hash")(
    s"""WITH n AS (SELECT doc_id,
       |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
       |  FROM documents)
       |SELECT doc_id,
       |  list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |                 list_transform(range(1, length(norm) + 1),
       |                                i -> CAST(unicode(substr(norm, i, 1)) AS BIGINT))),
       |    (h, c) -> (h * 31 + c) % 2147483648) AS rh
       |FROM n ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.functions.Registry.once(s, "graft_rolling_hash")(
      exprs => graft.functions.RollingHash31(exprs.head))
    // input-sized partitions: the raw scan is ONE task until the file
    // outgrows maxPartitionBytes, and the fixed-width final sort's
    // per-task volume would grow ∝ corpus (Tables.scaledPartitions)
    val nParts = Tables.scaledPartitions(s, dir, "documents")
    Tables.documents(s, dir)
      .repartition(nParts, col("doc_id"))
      .select(col("doc_id"),
        call_function("graft_rolling_hash", Text.normText(col("text"))).as("rh"))
      .repartitionByRange(nParts, col("doc_id"))
      .sortWithinPartitions("doc_id")
  }

  // Unpivot (wide → long) via the stack expression; oracle mirrors with
  // the equivalent UNION ALL (identical semantics in both engines).
  val unpivot: QueryDef = QueryDef.sql("q_unpivot")(
    """SELECT p_partkey, 'retail' AS measure, p_retailprice AS val FROM part
      |UNION ALL
      |SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part
      |ORDER BY p_partkey, measure""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .select(col("p_partkey"),
        expr("stack(2, 'retail', p_retailprice, 'size', CAST(p_size AS DOUBLE))")
          .as(Seq("measure", "val")))
      .orderBy("p_partkey", "measure")
  }

  // min_by / max_by (arg_min / arg_max): per event type, the event id at
  // the extreme value — unique (value, event_id) makes it deterministic.
  val argExtremes: QueryDef = QueryDef.sql("q_arg_extremes")(
    """WITH r AS (
      |  SELECT event_type, value, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rmax,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value ASC, event_id) AS rmin
      |  FROM events)
      |SELECT event_type,
      |  MAX(CASE WHEN rmax = 1 THEN event_id END) AS max_event,
      |  MAX(CASE WHEN rmin = 1 THEN event_id END) AS min_event
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    // formulated as rank-1 picks in BOTH engines rather than native
    // min_by/arg_min: tie-breaking of the native functions is
    // engine-defined, the explicit window is not
    val wmax = Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id"))
    val wmin = Window.partitionBy("event_type").orderBy(col("value").asc, col("event_id"))
    Tables.events(s, dir)
      .withColumn("rmax", row_number().over(wmax))
      .withColumn("rmin", row_number().over(wmin))
      .groupBy("event_type")
      .agg(max(when(col("rmax") === 1, col("event_id"))).as("max_event"),
        max(when(col("rmin") === 1, col("event_id"))).as("min_event"))
      .orderBy("event_type")
  }

  // Date-part extraction: year/month/day identical across engines;
  // weekday aligned on ISO (Spark weekday()+1 == DuckDB isodow).
  val dateParts: QueryDef = QueryDef.sql("q_date_parts")(
    """SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
      |  CAST(day(ts) AS INT) AS d, CAST(isodow(ts) AS INT) AS dow_iso,
      |  COUNT(*) AS n
      |FROM events GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(
        year(col("ts")).as("y"), month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("d"), (weekday(col("ts")) + 1).as("dow_iso"))
      .agg(count(lit(1)).as("n"))
      .orderBy("y", "m", "d", "dow_iso")
  }

  // Exact-arithmetic dispersion statistics: variance/stddev derived
  // from DECIMAL sums (sum x, sum x²) with the textbook formula applied
  // in ONE fixed double-expression tree — engines agree bit-for-bit
  // because the only float ops are the same few multiplications/
  // divisions on identical exact inputs. Spark's own stddev() (Welford
  // accumulation) is shuffle-order-dependent and can't hash-match; this
  // formulation is also what a map-side-combining aggregate wants at
  // scale (two decimal sums + a count, merged associatively).
  val statsExact: QueryDef = QueryDef.sql("q_stats_exact")(
    """WITH s AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
      |      AS DOUBLE) AS sxx
      |  FROM events GROUP BY 1)
      |SELECT event_type, n, sx / n AS mean,
      |  (sxx - sx * sx / n) / (n - 1) AS var_samp,
      |  sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_samp
      |FROM s ORDER BY event_type""".stripMargin) { (s, dir) =>
    val dec = col("value").cast(DecimalType(18, 2))
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(dec).cast("double").as("sx"),
        sum(dec * dec).cast("double").as("sxx"))
      .select(col("event_type"), col("n"),
        (col("sx") / col("n")).as("mean"),
        ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
          .as("var_samp"),
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
          .as("stddev_samp"))
      .orderBy("event_type")
  }

  // Collection-function surface: set collection, sort, and string
  // materialization per group. Output flattened to a joined string so
  // the cross-engine hash never compares raw array columns.
  val collectFuncs: QueryDef = QueryDef.sql("q_collect_funcs")(
    """SELECT user_id,
      |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_str,
      |  COUNT(DISTINCT event_type) AS n_types,
      |  MIN(event_id) AS first_event, MAX(event_id) AS last_event
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(concat_ws(",", array_sort(collect_set(col("event_type")))).as("types_str"),
        countDistinct(col("event_type")).as("n_types"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
      .orderBy("user_id")
  }

  // JSON path extraction WITHOUT a declared schema (the ad-hoc
  // exploration path next to from_json's typed decode): top-level,
  // nested-object, and array-index paths. The document is constructed
  // from real event columns (the stored props carries only one field,
  // which couldn't exercise nesting). get_json_object == json_extract
  // on well-formed input; array paths are 0-based in both engines.
  val jsonPath: QueryDef = QueryDef.sql("q_json_path")(
    """WITH j AS (
      |  SELECT event_id,
      |    '{"meta": {"type": "' || event_type || '", "uid": ' ||
      |    CAST(user_id AS VARCHAR) || '}, "vals": [' || CAST(event_id AS VARCHAR) ||
      |    ', ' || CAST(user_id AS VARCHAR) || '], "k": ' ||
      |    CAST(json_extract(props, '$.k') AS VARCHAR) || '}' AS doc
      |  FROM events)
      |SELECT event_id,
      |  json_extract_string(doc, '$.meta.type') AS mtype,
      |  CAST(json_extract(doc, '$.meta.uid') AS BIGINT) AS muid,
      |  CAST(json_extract(doc, '$.vals[1]') AS BIGINT) AS val1,
      |  CAST(json_extract(doc, '$.k') AS INTEGER) AS k
      |FROM j ORDER BY event_id""".stripMargin) { (s, dir) =>
    // widen the scan first: four get_json_object re-parses per row run
    // in the scan stage, and a one-file table serializes them on one
    // core (no-op once splits >= cores — see ops.Par.widen)
    graft.ops.Par.widen(Tables.events(s, dir))
      .select(col("event_id"),
        concat(lit("{\"meta\": {\"type\": \""), col("event_type"),
          lit("\", \"uid\": "), col("user_id").cast("string"),
          lit("}, \"vals\": ["), col("event_id").cast("string"),
          lit(", "), col("user_id").cast("string"), lit("], \"k\": "),
          get_json_object(col("props"), "$.k"), lit("}")).as("doc"))
      .select(col("event_id"),
        get_json_object(col("doc"), "$.meta.type").as("mtype"),
        get_json_object(col("doc"), "$.meta.uid").cast("long").as("muid"),
        get_json_object(col("doc"), "$.vals[1]").cast("long").as("val1"),
        get_json_object(col("doc"), "$.k").cast("int").as("k"))
      .orderBy("event_id")
  }

  // The VARIANT path through the same nested docs as q_json_path:
  // parse_json once into Spark 4's binary semi-structured type, then
  // typed variant_get extractions. Against string re-parsing (one full
  // JSON parse per get_json_object call), the variant is decoded once
  // per row and each path is an O(path) walk of the binary encoding —
  // the open-schema ingestion shape (and the parquet "shredding" story)
  // for semi-structured corpora at scale. Same oracle semantics as
  // q_json_path: the two representations must extract identical values.
  val variantExtract: QueryDef = QueryDef.sql("q_variant_extract")(
    """WITH j AS (
      |  SELECT event_id,
      |    '{"meta": {"type": "' || event_type || '", "uid": ' ||
      |    CAST(user_id AS VARCHAR) || '}, "vals": [' || CAST(event_id AS VARCHAR) ||
      |    ', ' || CAST(user_id AS VARCHAR) || '], "k": ' ||
      |    CAST(json_extract(props, '$.k') AS VARCHAR) || '}' AS doc
      |  FROM events)
      |SELECT event_id,
      |  json_extract_string(doc, '$.meta.type') AS mtype,
      |  CAST(json_extract(doc, '$.meta.uid') AS BIGINT) AS muid,
      |  CAST(json_extract(doc, '$.vals[1]') AS BIGINT) AS val1,
      |  CAST(json_extract(doc, '$.k') AS INTEGER) AS k
      |FROM j ORDER BY event_id""".stripMargin) { (s, dir) =>
    graft.ops.Par.widen(Tables.events(s, dir))
      .select(col("event_id"),
        concat(lit("{\"meta\": {\"type\": \""), col("event_type"),
          lit("\", \"uid\": "), col("user_id").cast("string"),
          lit("}, \"vals\": ["), col("event_id").cast("string"),
          lit(", "), col("user_id").cast("string"), lit("], \"k\": "),
          get_json_object(col("props"), "$.k"), lit("}")).as("doc"))
      .select(col("event_id"), parse_json(col("doc")).as("v"))
      .select(col("event_id"),
        variant_get(col("v"), "$.meta.type", "string").as("mtype"),
        variant_get(col("v"), "$.meta.uid", "bigint").as("muid"),
        variant_get(col("v"), "$.vals[1]", "bigint").as("val1"),
        variant_get(col("v"), "$.k", "int").as("k"))
      .orderBy("event_id")
  }

  // Array/list operator family over token arrays, surfaced as sorted
  // joined strings (never raw array columns — hash-safe on both
  // engines). Set semantics pinned by explicit distinct + sort.
  val arrayOps: QueryDef = QueryDef.sql("q_array_ops")(
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.toks AS ta, b.toks AS tb
       |  FROM t a JOIN t b ON b.doc_id = a.doc_id + 1),
       |x AS (
       |  SELECT doc_a, doc_b,
       |    COALESCE(array_to_string(list_sort(list_distinct(list_filter(ta,
       |      v -> list_contains(tb, v)))), ','), '') AS inter_str,
       |    COALESCE(array_to_string(list_sort(list_distinct(list_filter(ta,
       |      v -> NOT list_contains(tb, v)))), ','), '') AS except_str,
       |    len(list_distinct(ta)) + len(list_distinct(list_filter(tb,
       |      v -> NOT list_contains(ta, v)))) AS union_n
       |  FROM p)
       |SELECT doc_a, doc_b, inter_str, except_str, union_n FROM x
       |ORDER BY doc_a""".stripMargin) { (s, dir) =>
    // repartition first: the single-file table scans as ONE partition
    // and the regex tokenize chain is CPU-bound per row
    val t = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    val p = t.as("a").join(t.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.toks").as("ta"), col("b.toks").as("tb"))
    // built-in set expressions (array_intersect/except/union all dedup),
    // not filter() lambdas — interpreted HOFs with array_contains inside
    // are O(|ta|·|tb|) per pair with per-element interpreter overhead
    p.select(col("doc_a"), col("doc_b"),
        concat_ws(",", array_sort(array_intersect(col("ta"), col("tb"))))
          .as("inter_str"),
        concat_ws(",", array_sort(array_except(col("ta"), col("tb"))))
          .as("except_str"),
        size(array_union(col("ta"), col("tb"))).as("union_n"))
      .orderBy("doc_a")
  }

  val all: Seq[QueryDef] = Seq(
    stringFuncs, regexExtract, mathFuncs, setOps, cubeCounts, medianValue,
    rollingHash, unpivot, argExtremes, dateParts, statsExact, collectFuncs,
    jsonPath, arrayOps, variantExtract)
}
