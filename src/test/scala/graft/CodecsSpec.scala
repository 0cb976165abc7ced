package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Codecs, Schemas}

/** Property tests (SURVEY.md §5.2.4): DSV encode→decode and JSON
  * encode→decode are identities for null-free rows; group-average is
  * invariant under row permutation. Uses scalacheck generators with
  * fixed seeds (no scalatestplus bridge in the offline dep set).
  */
class CodecsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val roomGen = Gen.oneOf("413", "644", "656A", "621C")
  private val doubleGen = Gen.chooseNum(-1000000, 1000000).map(_ / 100.0)
  private val rowsGen = Gen.nonEmptyListOf(Gen.zip(roomGen, doubleGen))

  private def samples(n: Int): Seq[List[(String, Double)]] =
    (0 until n).flatMap(i => rowsGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("DSV wire round-trip is the identity (property)") {
    samples(20).foreach { rows =>
      val df = rows.toDF("room", "co2")
      val encoded = df.select(Codecs.dsvEncode(df, "|").as("value"))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "room STRING, co2 DOUBLE")
      val decoded = encoded
        .select(Codecs.dsvDecode(col("value"), schema, "|").as("d"))
        .select(col("d.*"))
      assert(decoded.collect().toSeq.sortBy(_.toString) ==
        df.collect().toSeq.sortBy(_.toString))
    }
  }

  test("JSON wire round-trip is the identity (property)") {
    samples(20).foreach { rows =>
      val df = rows.toDF("room", "co2")
      val encoded = df.select(Codecs.jsonEncode(df).as("value"))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "room STRING, co2 DOUBLE")
      val decoded = encoded
        .select(Codecs.jsonDecode(col("value"), schema).as("d"))
        .select(col("d.*"))
      assert(decoded.collect().toSeq.sortBy(_.toString) ==
        df.collect().toSeq.sortBy(_.toString))
    }
  }

  test("group-average is invariant under row permutation (P6)") {
    val rows = Seq(
      (1377299041L, 400.0, "413"), (1377299059L, 410.0, "413"),
      (1377299101L, 420.0, "413"), (1377299041L, 500.0, "644"))
    val df = rows.toDF("timestamp", "co2", "room")
    def agg(d: org.apache.spark.sql.DataFrame) = d
      .groupBy(date_trunc("minute", timestamp_seconds(col("timestamp"))).as("m"), col("room"))
      .agg(avg("co2").as("co2"))
      .orderBy("room", "m").collect().toSeq
    assert(agg(df) == agg(df.orderBy(rand(seed = 7))))
  }

  test("wire schemas expose the reference column sets") {
    assert(Schemas.wireSchema.fieldNames.toSeq ==
      Seq("timestamp", "room", "co2", "light", "temp", "humidity", "pir"))
    assert(Schemas.wireSchemaExtended.fieldNames.contains("event_ts_min"))
    assert(Schemas.mergedSchema.fieldNames.length == 9)
  }

  test("Avro wire round-trip is the identity, including the optional field") {
    // events-shaped feed with a null prop_k (the ["null","int"] union leg)
    val df = Seq(
      (1L, "2024-01-15 10:00:00", 7L, "click", 12.5, """{"k": 42}"""),
      (2L, "2024-01-15 10:00:01", 8L, "view", -0.25, """{"j": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
    val wire = graft.core.AvroCodec.encodeEvents(df)
    assert(wire.schema("value").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val back = graft.core.AvroCodec.decodeEvents(wire)
      .orderBy("event_id").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(back(0).getInt(5) == 42 && back(1).isNullAt(5))
    assert(back.map(r => (r.getString(3), r.getDouble(4))).toSeq ==
      Seq(("click", 12.5), ("view", -0.25)))
    // binary framing: substantially tighter than the JSON twin (field
    // names travel out-of-band with the schema)
    val avroBytes = wire.select(length(col("value"))).as[Int].collect().sum
    val jsonBytes = graft.streaming.Ingest.toJsonWire(df, "event_id")
      .select(length(col("value"))).as[Int].collect().sum
    assert(avroBytes * 2 < jsonBytes,
      s"avro $avroBytes bytes vs json $jsonBytes — framing regression")
  }

  test("Avro wire round-trip is the identity on random feeds (seeded property)") {
    val typGen = Gen.oneOf("click", "view", "purchase", "ärger-β") // unicode leg
    val rowGen = Gen.zip(Gen.chooseNum(0L, 1L << 40), typGen,
      doubleGen, Gen.option(Gen.chooseNum(-1000, 1000)))
    val feedGen = Gen.nonEmptyListOf(rowGen)
    (0 until 15).flatMap(i => feedGen.apply(Gen.Parameters.default, Seed(100L + i)))
      .foreach { rows =>
        val df = rows.zipWithIndex.map { case ((id, typ, v, k), i) =>
          (id, "2024-01-15 10:00:00", i.toLong, typ, v,
            k.map(n => s"""{"k": $n}""").getOrElse("{}"))
        }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .withColumn("ts", col("ts").cast("timestamp"))
        val back = graft.core.AvroCodec.decodeEvents(
            graft.core.AvroCodec.encodeEvents(df))
          .select("event_id", "user_id", "event_type", "value", "prop_k")
        val expected = rows.zipWithIndex.map { case ((id, typ, v, k), i) =>
          (id, i.toLong, typ, v, k)
        }.sortBy(_.toString)
        val got = back.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
            if (r.isNullAt(4)) None else Some(r.getInt(4))))
          .sortBy(_.toString).toSeq
        assert(got == expected)
      }
  }
}
