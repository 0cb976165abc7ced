package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batching invariance of the streaming LSH dedup pipeline
  * (q_stream_dedup_lsh): the per-doc rollup must be identical whether
  * the new docs arrive in one micro-batch or many, and must equal the
  * same chain run as a plain batch job — the claim the catalog query's
  * single-file source can't exercise on its own.
  */
class StreamDedupBatchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) =
    Files.createTempDirectory(Paths.get("target"), p).toString

  // corpus: 6 docs; new docs: 4, two of which near-duplicate corpus
  // text (ids 100/102 share full text with corpus ids 1/3)
  private val corpusRows = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "completely unrelated corpus text about distributed query engines"),
    (3L, "minhash locality sensitive hashing detects near duplicate documents"),
    (4L, "spark structured streaming joins static dimension tables per batch"),
    (5L, "yet another corpus document with its own distinct vocabulary here"),
    (6L, "the final corpus entry talks about watermark driven state eviction"))
  private val newRows = Seq(
    (100L, "the quick brown fox jumps over the lazy dog again and again"),
    (101L, "fresh crawl content sharing no shingles with anything stored"),
    (102L, "minhash locality sensitive hashing detects near duplicate documents"),
    (103L, "novel text unseen before in any batch of the corpus index"))

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src_1").as("source"), length(col("text")).as("n_chars"))

  test("one batch, two batches, and plain batch execution all agree") {
    val corpus = docsDf(corpusRows)
    val srcDir = tmp("sdl_src_")
    docsDf(newRows.take(2)).coalesce(1).write.parquet(s"$srcDir/b0")
    docsDf(newRows.drop(2)).coalesce(1).write.parquet(s"$srcDir/b1")

    def streamed(maxFiles: String) = {
      val stream = spark.readStream
        .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
        .option("maxFilesPerTrigger", maxFiles)
        .parquet(s"$srcDir/*")
      graft.catalog.TextAnalysis.lshDupRollup(
        graft.streaming.Ingest.runToMemory(
          graft.catalog.TextAnalysis.lshStreamPairs(stream, corpus)))
        .collect().map(_.toSeq).toSeq
    }
    val oneBatch = streamed("10")
    val paced = streamed("1")
    val batch = graft.catalog.TextAnalysis.lshDupRollup(
      graft.catalog.TextAnalysis.lshStreamPairs(docsDf(newRows), corpus))
      .collect().map(_.toSeq).toSeq

    assert(oneBatch == batch, "single-micro-batch run diverges from batch run")
    assert(paced == batch, "paced multi-batch run diverges from batch run")
    // the fixture must actually exercise dup detection
    val dupIds = batch.filter(_.apply(3) == true).map(_.head)
    assert(dupIds == Seq(100L, 102L), s"unexpected dup set $dupIds")
  }
}
