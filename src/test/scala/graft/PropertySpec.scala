package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** Property tests over the round-2 primitives with seeded scalacheck
  * generators (no scalatestplus bridge in the offline dep set):
  * SimHash60 against an independent reference on random token arrays,
  * cleanHtml idempotence on entity-free text, chunking coverage, and
  * the catalog's driver-contract invariants.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tokenGen = Gen.nonEmptyListOf(
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8)))

  private def samples(n: Int): Seq[List[String]] =
    (0 until n).flatMap(i => tokenGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("simhash60 expression matches independent reference on random token arrays") {
    graft.functions.SimHash60.register(spark)
    def h60(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def ref(toks: Seq[String]): Long = {
      val c = new Array[Int](60)
      toks.foreach { t =>
        val h = h60(t)
        (0 until 60).foreach(b => c(b) += (if (((h >> b) & 1L) == 1L) 1 else -1))
      }
      (0 until 60).map(b => if (c(b) > 0) 1L << b else 0L).sum
    }
    val toksSeq = samples(40)
    val df = toksSeq.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
      .toDF("id", "toks")
    val got = df.select(col("id"),
        graft.functions.SimHash60.simhash60(col("toks")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    toksSeq.zipWithIndex.foreach { case (ts, i) =>
      assert(got(i.toLong) == ref(ts), s"mismatch on sample $i: $ts")
    }
  }

  test("shingleHash60 equals the HOF wordShingles+hash60 formulation on random tokens") {
    graft.functions.ShingleHash60.register(spark)
    for (n <- Seq(1, 3, 8)) {
      val toksSeq = samples(30)
      val df = toksSeq.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
        .toDF("id", "toks")
      val native = df.select(col("id"),
          graft.functions.ShingleHash60.shingleHash60(col("toks"), n).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val hof = df.select(col("id"),
          transform(graft.ops.Text.wordShingles(col("toks"), n),
            s => graft.ops.Text.hash60(s)).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      toksSeq.indices.foreach { i =>
        assert(native(i.toLong) == hof(i.toLong), s"n=$n sample $i: ${toksSeq(i)}")
      }
    }
  }

  test("minhashSig60 equals the explode+md5+groupBy-min formulation on random tokens") {
    graft.functions.MinHashSig60.register(spark)
    for ((n, k) <- Seq((3, 4), (1, 8), (8, 2))) {
      val toksSeq = samples(30)
      val df = toksSeq.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
        .toDF("id", "toks")
      val native = df.select(col("id"),
          graft.functions.MinHashSig60.minhashSig60(col("toks"), n, k).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val legacy = df
        .select(col("id"), explode(Text.wordShingles(col("toks"), n)).as("shingle"))
        .select(col("id") +: (0 until k).map(i =>
          Text.hash60(concat(lit(s"$i:"), col("shingle"))).as(s"h_$i")): _*)
        .groupBy(col("id"))
        .agg(min(col("h_0")).as("sig_0"),
          (1 until k).map(i => min(col(s"h_$i")).as(s"sig_$i")): _*)
        .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong).toSeq).toMap
      toksSeq.indices.foreach { i =>
        assert(native(i.toLong) == legacy(i.toLong),
          s"n=$n k=$k sample $i: ${toksSeq(i)}")
      }
    }
  }

  test("cleanHtml is idempotent on entity-free random text (property)") {
    val textGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const("<b>bold</b>"), Gen.const("<script>x()</script>"),
      Gen.const("  "), Gen.const("plain words")))
      .map(_.mkString(" "))
    val texts = (0 until 30).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(100L + i)))
    val df = texts.toDF("text")
    val once = df.select(Text.cleanHtml(col("text")).as("c")).collect().map(_.getString(0))
    val twice = df.select(Text.cleanHtml(Text.cleanHtml(col("text"))).as("c"))
      .collect().map(_.getString(0))
    assert(once.toSeq == twice.toSeq)
  }

  test("catalog driver-contract invariants: unique names, oracle coverage, name shape") {
    val cat = SparkEntry.catalog
    // no duplicate query names (a dup would silently shadow in the Map)
    val dups = cat.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate catalog names: ${dups.mkString(", ")}")
    // every name is q_-prefixed and filesystem-safe (Verify writes dirs)
    cat.foreach(q => assert(q.name.matches("q_[a-z0-9_]+"), q.name))
    // every oracle must ground in at least one driver-provided table
    // (an oracle referencing only CTEs of nothing would vacuously pass
    // DuckDB but verify nothing)
    val tables = graft.core.Tables.all.toSet
    cat.foreach { q =>
      q.oracle.foreach { sql =>
        val lower = sql.toLowerCase
        assert(tables.exists(t => lower.contains(t)),
          s"${q.name}: oracle references no driver table")
      }
    }
    // every rows-only query must carry a registered accuracy spec, and
    // the registry must not hold stale entries for queries that since
    // gained a hash oracle (see core.AccuracySpecs)
    val rowsOnly = cat.filter(_.oracle.isEmpty).map(_.name).toSet
    val registered = graft.core.AccuracySpecs.registry.keySet
    assert(rowsOnly.diff(registered).isEmpty,
      s"rows-only queries with no accuracy spec: ${rowsOnly.diff(registered)}")
    assert(registered.diff(rowsOnly).isEmpty,
      s"stale accuracy-spec entries: ${registered.diff(rowsOnly)}")
    // each registry pointer must name a real suite AND a real test in it
    // — instantiating the suite registers its test names (sessions are
    // lazy), so a renamed accuracy test breaks here, not silently
    def checkPointer(n: String, spec: String): Unit = {
      val parts = spec.split(":", 2)
      assert(parts.length == 2 && parts.forall(_.nonEmpty),
        s"$n: malformed spec pointer '$spec' (want Suite:test name)")
      val Array(suiteName, testName) = parts
      val suite = Class.forName(s"graft.$suiteName").getDeclaredConstructor()
        .newInstance().asInstanceOf[org.scalatest.Suite]
      assert(suite.testNames.contains(testName),
        s"$n: $suiteName has no test named '$testName'; has ${suite.testNames}")
    }
    graft.core.AccuracySpecs.registry.foreach { case (n, spec) =>
      checkPointer(n, spec) }
    // the ANN family must be floor-registered the same way: every
    // q_ann_* catalog query carries a quality floor (or sits on the
    // explicit exact-by-construction exemption list), every floor
    // points at a real measuring test, and neither side holds strays
    val annQueries = cat.map(_.name).filter(_.startsWith("q_ann_")).toSet
    val floors = graft.core.AccuracySpecs.annFloors
    val covered = floors.keySet ++ graft.core.AccuracySpecs.annExact
    assert(annQueries.diff(covered).isEmpty,
      s"q_ann_* queries with no quality floor: ${annQueries.diff(covered)}")
    assert(covered.diff(annQueries).isEmpty,
      s"stale ANN floor/exemption entries: ${covered.diff(annQueries)}")
    assert(floors.keySet.intersect(graft.core.AccuracySpecs.annExact).isEmpty,
      "a query cannot be both floored and exempt")
    floors.foreach { case (n, fs) =>
      assert(fs.nonEmpty, s"$n: empty floor list is vacuous")
      assert(fs.map(_.regime).distinct.size == fs.size,
        s"$n: duplicate regime entries: ${fs.map(_.regime)}")
      // every floored variant must be measured in BOTH base regimes —
      // a clustered-only or uniform-only entry would leave half the
      // quality claim unenforced; additional SCALE regimes (e.g. the
      // adaptive-nprobe sf10-uniform floor) may stack on top
      assert(Set("uniform", "clustered").subsetOf(fs.map(_.regime).toSet),
        s"$n: regimes ${fs.map(_.regime)} missing uniform+clustered")
      fs.foreach { f =>
        checkPointer(n, f.spec)
        assert(f.floor > 0.0, s"$n/${f.regime}: a non-positive floor is vacuous")
      }
    }
  }
}
