package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, Text}

/** Unit behavior of the text/dedup primitives. */
class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("normalization + tokenization") {
    val out = Seq("  Hello,   WORLD!! 42  ").toDF("text")
      .select(Text.normText(col("text")).as("n"), Text.tokens(col("text")).as("t"))
      .collect().head
    assert(out.getAs[String]("n") == "hello world 42")
    assert(out.getSeq[String](1) == Seq("hello", "world", "42"))
  }

  test("identical docs get identical minhash signatures; disjoint docs differ") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely unrelated content here"))
      .toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"),
        Text.minhashSig(Text.wordShingles(Text.tokens(col("text")), 3), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).length == 8)
  }

  test("short doc (< n tokens) falls back to whole-text shingle") {
    val sh = Seq("hi there").toDF("text")
      .select(Text.wordShingles(Text.tokens(col("text")), 3).as("s"))
      .collect().head.getSeq[String](0)
    assert(sh == Seq("hi there"))
  }

  test("simhash16: equal docs equal, hamming ≤ 16") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta eta")).toDF("doc_id", "text")
    val sh = Text.simhash16(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(sh.values.forall(v => v >= 0 && v < (1 << 16)))
  }

  test("scale-path minhash (explode+agg) equals the column-expression form") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
      (2L, "an entirely different document with other words in it"),
      (3L, "hi"))
      .toDF("doc_id", "text")
    val colForm = df.select(col("doc_id"),
        Text.minhashSig(Text.wordShingles(Text.tokens(col("text")), 3), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val dfForm = Text.minhashSigDF(df, "doc_id", "text", 3, 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(i => r.getLong(i)).toSeq).toMap
    assert(colForm == dfForm)
  }

  test("native graft_dot equals the HOF fold bitwise") {
    import graft.ops.Vectors
    Vectors.register(spark)
    val df = Seq((Seq(0.1, -2.5, 3.75, 1e-9), Seq(4.0, 0.3, -1.25, 2e9)))
      .toDF("a", "b")
    val r = df.select(Vectors.dot(col("a"), col("b")).as("fast"),
        Vectors.dotHof(col("a"), col("b")).as("ref"))
      .collect().head
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
  }

  test("language prediction picks the list with most stopword hits") {
    val scores = Text.langScores(Text.tokens(col("text")))
    val out = Seq("the cat and the hat is here", "el gato y la casa es aqui")
      .toDF("text")
      .select(Text.langPredict(scores).as("lang"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("en", "es"))
  }

  test("multimodal stub decode: deterministic dims, frame sampling") {
    val docs = Seq((0L, "x" * 250), (2L, "y" * 250)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val meta = Multimodal.decodeMeta(Multimodal.mediaFromDocuments(spark, docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(0L).media_type == "image" && meta(0L).format == "png")
    assert(meta(0L).n_bytes == 250 && meta(0L).width == 64 + 250 % 577)
    assert(meta(2L).media_type == "video" && meta(2L).n_frames == 3)
    val frames = Multimodal.sampleFrames(
        Multimodal.decodeMeta(Multimodal.mediaFromDocuments(spark, docs)), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(frames.toSeq == Seq((2L, 0L)))
  }

  test("simhash60 expression: bit-for-bit vs independent recomputation, null/empty handling") {
    graft.functions.SimHash60.register(spark)
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, ""),
      (4L, "completely different words entirely unrelated content here"))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        graft.functions.SimHash60.simhash60(Text.tokens(col("text"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent recomputation with java.security + BigInt (no shared code)
    def h60(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def ref(text: String): Long = {
      val toks = text.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").trim
        .split("\\s+").filter(_.nonEmpty)
      val c = new Array[Int](60)
      toks.foreach { t =>
        val h = h60(t)
        (0 until 60).foreach(b => c(b) += (if (((h >> b) & 1L) == 1L) 1 else -1))
      }
      (0 until 60).map(b => if (c(b) > 0) 1L << b else 0L).sum
    }
    assert(got(1L) == ref("the quick brown fox jumps over the lazy dog"))
    assert(got(2L) == ref("the quick brown fox jumps over the lazy cat"))
    assert(got(4L) == ref("completely different words entirely unrelated content here"))
    assert(got(3L) == 0L) // empty token array -> all counters 0 -> 0
    // one-token edit => small hamming; unrelated doc => large
    val ham12 = java.lang.Long.bitCount(got(1L) ^ got(2L))
    val ham14 = java.lang.Long.bitCount(got(1L) ^ got(4L))
    assert(ham12 < ham14)
  }

  test("cleanHtml strips tags/scripts, decodes entities, idempotent on clean text") {
    val dirty = Seq(
      (1L, "<html><head><style>body { color: red }</style></head>" +
        "<body><p>Hello &amp; welcome to <b>Spark</b>!</p>" +
        "<script>alert('x < y');</script>Goodbye&nbsp;now</body></html>"),
      (2L, "already clean text"),
      (3L, "a &lt;tag&gt; literal and a control\u0007char"),
      (4L, "5 &amp;lt; 6"))  // double-escaped: displays as "5 &lt; 6"
      .toDF("doc_id", "text")
    val out = dirty.select(col("doc_id"), Text.cleanHtml(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "Hello & welcome to Spark ! Goodbye now")
    assert(out(2L) == "already clean text")
    assert(out(3L) == "a <tag> literal and a control char")
    // &amp; decodes LAST: one level of escaping is removed, never two
    assert(out(4L) == "5 &lt; 6")
    // idempotent on entity-free text (doc 3's &lt;..&gt; decodes to a
    // tag-like span a second pass would strip — documented non-goal)
    val entityFree = dirty.filter(col("doc_id") < 3)
    val twice = entityFree.select(Text.cleanHtml(Text.cleanHtml(col("text"))).as("c"))
      .collect().map(_.getString(0))
    val once = entityFree.select(Text.cleanHtml(col("text")).as("c"))
      .collect().map(_.getString(0))
    assert(twice.toSeq == once.toSeq)
  }

  test("shingleHash60Distinct == distinct window strings then hash60 (r17 native twin)") {
    graft.functions.ShingleHash60.registerDistinct(spark)
    // real corpus slice: duplicates inside docs, short docs, empties
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
      .limit(400)
    val native = docs
      .select(col("doc_id"),
        graft.functions.ShingleHash60
          .shingleHash60Distinct(Text.tokens(col("text")), 3).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val reference = docs
      .select(col("doc_id"),
        array_distinct(Text.wordShingles(Text.tokens(col("text")), 3)).as("sh"))
      .select(col("doc_id"), transform(col("sh"), s => Text.hash60(s)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet == reference.keySet)
    // order AND multiplicity must match: dedupe is string-level,
    // first-occurrence order (array_distinct keeps first occurrence)
    native.foreach { case (id, h) =>
      assert(h == reference(id), s"distinct shingle hashes differ for doc $id")
    }
  }
}
