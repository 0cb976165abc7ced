package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the large-scale training-data pipeline:
  * normalization, tokenization, shingling, MinHash, SimHash, language
  * ID and quality scoring.
  *
  * Everything is a pure column expression over built-in (codegen'd)
  * functions — no UDFs — so the operators scale with whole-stage
  * codegen and stay shuffle-free until an explicit groupBy/join.
  * Hash functions are md5-based so the DuckDB oracle can reproduce
  * signatures bit-for-bit.
  */
object Text {

  /** Lowercase, strip non-alphanumerics, collapse whitespace. */
  def normText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Web-corpus cleaning (C4/RefinedWeb-style pre-tokenization pass):
    * drop script/style blocks with their payload, strip remaining tags,
    * decode the common HTML entities, remove control characters,
    * collapse whitespace. Pure codegen'd regexp chain — runs in the scan
    * stage's projection at 100 TB. Idempotent on entity-free clean text;
    * NOT on text whose entities decode to tag-like spans (`&lt;x&gt;` →
    * `<x>`, which a second pass would strip) — run it once, at ingest.
    */
  def cleanHtml(text: Column): Column = {
    val noBlocks = regexp_replace(text,
      "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    // &amp; decodes LAST: decoding it first would turn double-escaped
    // text ("5 &amp;lt; 6", displayed as "5 &lt; 6") into "&lt;" that a
    // later rule decodes AGAIN, inventing characters the source never
    // displayed
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(ent), ch)
      }
    val noCtl = regexp_replace(decoded, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", " ")
    trim(regexp_replace(noCtl, "\\s+", " "))
  }

  /** Whitespace tokens of the normalized text (no empties). */
  def tokens(text: Column): Column =
    filter(split(normText(text), " "), t => t =!= "")

  /** Word n-gram shingles; a document shorter than n tokens contributes
    * its whole token string as one shingle.
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))

  /** One md5-derived 60-bit hash: numeric so min-aggregation runs in a
    * primitive HashAggregate buffer (min over strings would fall back
    * to SortAggregate) and the shuffled signature is 8 bytes, not a
    * 32-char string.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** MinHash signature as a single-column expression: k md5-derived
    * hash functions (`h_i(s) = hash60(i || ':' || s)`), each taking the
    * minimum over the shingle set. Fine for small inputs and
    * differential tests; the scale path is [[minhashSigDF]] — array
    * HOFs run interpreted and re-evaluate the shingle expression per
    * hash function.
    */
  def minhashSig(shingles: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingles, s => hash60(concat(lit(s"$i:"), s))))
    }: _*)

  /** MinHash signatures, scale path: explode shingles (tokenize/shingle
    * evaluated ONCE per document in the generator), hash each shingle k
    * ways in one codegen'd projection, then min-aggregate per document —
    * partial aggregation map-side, one shuffle on the doc id, no
    * interpreted HOFs. Output: idCol, sig_0..sig_{k-1} (long).
    */
  def minhashSigDF(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    // repartition first: corpus tables often arrive as few large files,
    // and the signature pass is CPU-bound per row — spread it across
    // the cluster before the narrow chain begins. Explicit partition
    // count: AQE's size-based coalesce would fold small-byte/high-CPU
    // partitions back together.
    val p = df.sparkSession.sparkContext.defaultParallelism
    // the whole k-signature computes projection-locally in one native
    // pass (functions.MinHashSig60) — no shingle generator, no k-column
    // min re-aggregation; PropertySpec pins it against the explode →
    // per-hash md5 → groupBy-min formulation it replaced
    graft.functions.MinHashSig60.register(df.sparkSession)
    df.repartition(p, col(idCol))
      .select(col(idCol),
        graft.functions.MinHashSig60
          .minhashSig60(tokens(col(textCol)), n, k).as("__sig"))
      .select(col(idCol) +:
        (0 until k).map(i => element_at(col("__sig"), i + 1).as(s"sig_$i")): _*)
  }

  /** LSH band keys over [[minhashSigDF]] output columns. */
  def lshBandCols(rowsPerBand: Int, k: Int): Seq[Column] =
    (0 until k / rowsPerBand).map { b =>
      md5(concat_ws("|",
        (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}")): _*))
        .as(s"band_$b")
    }

  /** Skew-guarded LSH candidate edges over an exploded band relation
    * `(idCol, band_idx, band_hash)`.
    *
    * The plain band self-join is quadratic in the bucket: one viral
    * document duplicated B times puts B rows under one
    * (band_idx, band_hash) key and emits B²/2 candidate pairs from a
    * single join key — the classic LSH skew cliff at corpus scale.
    * Guard: per-bucket size + representative (min id) computed with one
    * hash aggregate (partial aggregation collapses the hot key
    * map-side, so no single-task sort — deliberately NOT a window);
    * buckets of ≤ cap rows take the exact all-pairs join, buckets
    * above the cap emit star edges (representative → member) straight
    * off a projection — O(B) edges, the hot bucket never enters the
    * self-join. Star edges preserve connectivity for downstream
    * connected-components clustering, which is what candidate pairs
    * feed; pairs from sub-cap buckets are emitted exactly (pinned by
    * LshSkewSpec's subset property).
    *
    * Output: distinct (doc_a, doc_b) with doc_a < doc_b (the star
    * representative is the bucket minimum, so the invariant holds on
    * both branches).
    */
  def cappedBandEdges(banded: DataFrame, idCol: String, cap: Int): DataFrame = {
    val sz = banded.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("bucket_n"), min(col(idCol)).as("rep_doc"))
    val exn = banded.join(sz, Seq("band_idx", "band_hash"))
    val small = exn.filter(col("bucket_n") <= lit(cap))
    val pairs = small.as("a").join(small.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
    val star = exn
      .filter(col("bucket_n") > lit(cap) && col(idCol) =!= col("rep_doc"))
      .select(col("rep_doc").as("doc_a"), col(idCol).as("doc_b"))
    pairs.union(star).distinct()
  }

  /** LSH band keys: adjacent signature components pair-wise re-hashed.
    * Docs sharing any band key are near-dup candidates; band count =
    * k / rowsPerBand.
    */
  def lshBands(sig: Column, rowsPerBand: Int, k: Int): Column =
    array((0 until k / rowsPerBand).map { b =>
      md5(concat_ws("|",
        (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1)): _*))
    }: _*)

  /** 64-bit fingerprint of the normalized text ([[hash60]] convention). */
  def fingerprint64(text: Column): Column = hash60(normText(text))

  /** Count of tokens present in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** Fixed per-language stopword lists for the n-gram-heuristic language
    * ID. Deterministic and tiny by design — the classifier quality is a
    * function of these lists, the operator is the scoring machinery.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "les", "des", "et", "est"),
    "zh" -> Seq("de", "shi", "he", "zai", "bu"))

  /** Per-language scores + arg-max prediction (ties resolve in
    * `langStopwords` order).
    */
  def langScores(toks: Column): Seq[(String, Column)] =
    langStopwords.map { case (lang, words) => lang -> stopwordHits(toks, words) }

  def langPredict(scores: Seq[(String, Column)]): Column = {
    // fold from the end: ... when(s_fr >= s_zh, fr) otherwise zh
    val (lastLang, _) = scores.last
    scores.init.foldRight(lit(lastLang): Column) { case ((lang, s), rest) =>
      val others = scores.dropWhile(_._1 != lang).tail.map(_._2)
      val best = if (others.size == 1) others.head else greatest(others: _*)
      when(s >= best, lang).otherwise(rest)
    }
  }

  /** SimHash over the first 16 hex nibbles of each token's md5: bit j is
    * set when the frequency-weighted sum of (nibble_j >= '8' ? +1 : -1)
    * over tokens is positive. Returns (doc-level DataFrame) — needs an
    * explode + re-aggregate, so it is a DataFrame transform rather than
    * a single column.
    *
    * The explode keeps partial aggregation: Spark's hash aggregate
    * map-side-combines the ±1 sums per doc before any shuffle.
    */
  def simhash16(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bitSums = (1 to 16).map { j =>
      sum(when(substring(col("h"), j, 1) >= "8", 1).otherwise(-1)).as(s"s_$j")
    }
    val summed = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val value = (1 to 16).map { j =>
      when(col(s"s_$j") > 0, lit(1L << (j - 1))).otherwise(0L)
    }.reduce(_ + _)
    summed.select(col(idCol), value.as("simhash16"))
  }
}
