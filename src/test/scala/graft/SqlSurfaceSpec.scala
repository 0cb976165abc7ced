package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** The SQL entry point: everything the engine exposes through the
  * Column API must also work as `spark.sql(...)` text — temp views over
  * the corpus tables plus the `graft_*` native functions registered by
  * [[graft.GraftExtensions]] (here via the per-session registrars, same
  * code path the extension injects).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("catalog semantics reproduce through spark.sql text") {
    graft.functions.ArrayDotProduct.register(spark)
    graft.functions.SimHash60.register(spark)
    graft.core.Tables.documents(spark, dir).createOrReplaceTempView("documents_v")
    graft.core.Tables.events(spark, dir).createOrReplaceTempView("events_v")

    // native expressions resolve in SQL text
    val sqlSim = spark.sql(
      """SELECT doc_id, graft_simhash60(
        |  filter(split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9\\s]', ' '), '\\s+', ' ')), ' '), t -> t != '')) AS s
        |FROM documents_v ORDER BY doc_id""".stripMargin).collect()
    val apiSim = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.SimHash60.simhash60(Text.tokens(col("text"))).as("s"))
      .orderBy("doc_id").collect()
    assert(sqlSim.map(_.toSeq).toSeq == apiSim.map(_.toSeq).toSeq)

    // an aggregation query expressed as SQL matches the DataFrame form
    val sqlAgg = spark.sql(
      """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS u
        |FROM events_v GROUP BY event_type ORDER BY event_type""".stripMargin).collect()
    val apiAgg = graft.core.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"))
      .orderBy("event_type").collect()
    assert(sqlAgg.map(_.toSeq).toSeq == apiAgg.map(_.toSeq).toSeq)

    // graft_dot in SQL == ArrayDotProduct column API
    graft.core.Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings_v")
    val sqlDot = spark.sql(
      """SELECT vec_id, graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                         CAST(embedding AS ARRAY<DOUBLE>)) AS d
        |FROM embeddings_v ORDER BY vec_id LIMIT 50""".stripMargin).collect()
    val apiDot = graft.core.Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        graft.ops.Vectors.dot(
          graft.ops.Vectors.toDouble(col("embedding")),
          graft.ops.Vectors.toDouble(col("embedding"))).as("d"))
      .orderBy("vec_id").limit(50).collect()
    assert(sqlDot.map(_.toSeq).toSeq == apiDot.map(_.toSeq).toSeq)
  }
}
