package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog is assembled from the per-module catalogs; each
  * `QueryDef` pairs the Spark builder with its DuckDB oracle SQL.
  */
object SparkEntry {

  /** Full catalog, one entry per implemented operator (SURVEY.md §2 +
    * the LLM-pipeline extensions).
    */
  def catalog: Seq[QueryDef] =
    graft.catalog.Relational.all ++
      graft.catalog.Tpch.all ++
      graft.catalog.Analytics.all ++
      graft.catalog.TextAnalysis.all ++
      graft.catalog.SimilaritySearch.all ++
      graft.catalog.Streaming.all ++
      graft.catalog.MultimodalMeta.all ++
      graft.catalog.Advanced.all ++
      graft.catalog.Functions.all ++
      graft.catalog.Sketches.all ++
      graft.catalog.Curation.all ++
      graft.catalog.Scale.all ++
      graft.catalog.Graph.all

  /** Flagship: the reference pipeline end-to-end on sf0.001 — rows are
    * JSON-encoded onto the wire (producer, F7), decoded against the
    * declared schema (F6/P4), then aggregated per minute per key (A1 —
    * the `data_collector.py:38` computation). Driver smoke-checks
    * rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val events = graft.core.Tables.events(spark, dir)
    val wire = events.select(
      col("event_id").cast("string").as("key"),
      graft.core.Codecs.jsonEncode(events).as("value"))
    val decoded = wire
      .withColumn("data", from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")))
      .select(col("data.*"))
    decoded
      .groupBy(date_trunc("minute", col("ts")).as("ts_min"), col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.build).toMap

  /** Correctness-gated exact forms whose plan shape is deliberately not
    * the 100 TB path (each has a scale twin in the catalog); the bench
    * default skips them — see [[graft.core.QueryDef.auditOnly]].
    */
  def auditOnly: Set[String] = catalog.filter(_.auditOnly).map(_.name).toSet

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
