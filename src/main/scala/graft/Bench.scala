package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every catalog query on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Timing materializes each query through the noop sink — full plan
  * execution including sorts and projections (`.count()` would let
  * Catalyst prune both), which is what a real consumer pays.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "WARN"))
    // untimed warm-up: absorb one-time session costs (codegen + JIT
    // compilation of the hot operator paths, shuffle service, parquet
    // reader, page cache for the input tables, noop sink classloading)
    // so the first measured queries aren't charged for them. Each leg
    // exercises a family the catalog leans on: columnar scan + hash
    // aggregate, regex tokenization, sketch aggregation, window, and a
    // shuffled join — enough iterations that C2 reaches the loops.
    try {
      import org.apache.spark.sql.functions._
      val ev = graft.core.Tables.events(spark, sfDir)
      val docs = graft.core.Tables.documents(spark, sfDir)
      ev.groupBy("event_type")
        .agg(count(lit(1)), approx_count_distinct(col("user_id"), 0.01))
        .write.format("noop").mode("overwrite").save()
      docs.select(explode(graft.ops.Text.tokens(col("text"))).as("t"))
        .groupBy("t").count()
        .write.format("noop").mode("overwrite").save()
      ev.select(col("user_id"), col("value"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("value")).as("rn"))
        .join(ev.groupBy("user_id").agg(sum(col("value")).as("s"))
          .hint("shuffle_hash"), Seq("user_id"))
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // optional comma-separated allowlist for targeted profiling runs.
    // Audit-only exact forms (each with a scale twin in the catalog)
    // are skipped by default so the headline measures the 100 TB plan
    // shapes; an explicit allowlist still runs them for profiling.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        only.fold(!SparkEntry.auditOnly(name))(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    def fmt(v: Double): String = f"$v%.3f"
    val auditSkipped = if (only.isEmpty)
      SparkEntry.auditOnly.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    else "[]"
    def line(entries: Seq[(String, Double)], omitted: Int): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"omitted":$omitted,"audit_skipped":$auditSkipped,"queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    }
    // Full per-query detail goes to a repo file; stdout gets ONE line that
    // must survive the harness's 2000-char output tail — a full 130+-query
    // map at double precision is ~5 KB and has never parsed. Keep the
    // slowest queries (the ones a perf reader needs) up to a hard budget.
    val full = results.map { case (k, v, _) => k -> v }
    // only a FULL run may refresh the repo's detail file — a filtered
    // profiling run would silently clobber the full-catalog record
    if (only.isEmpty)
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_FULL.json"),
        line(full.sortBy(_._1), 0).getBytes("UTF-8"))
    val byCost = full.sortBy(-_._2)
    val keep = Iterator.range(byCost.size, 0, -1)
      .find(n => line(byCost.take(n), byCost.size - n).length <= 1600)
      .getOrElse(0)
    // a failed query must be visible in the JSON, not just on stderr —
    // otherwise a crashed round reads as a fast green one
    println(line(byCost.take(keep), byCost.size - keep))
    graft.core.Spill.cleanup()
    spark.stop()
  }
}
