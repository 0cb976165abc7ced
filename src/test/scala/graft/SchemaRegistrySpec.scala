package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.kafka.{RegistryAvro, SchemaRegistryClient, SchemaRegistryStub}

/** The Confluent-style schema registry: id-dedup'd registration,
  * BACKWARD-compatibility gating via Avro's own resolution verdict,
  * the 5-byte wire framing (magic + schema id), and reader/writer
  * schema resolution across an evolved topic history.
  */
class SchemaRegistrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withRegistry[A](f: SchemaRegistryClient => A): A =
    withRegistry2((c, _) => f(c))

  private def withRegistry2[A](f: (SchemaRegistryClient, String) => A): A = {
    val stub = new SchemaRegistryStub
    stub.start()
    try f(new SchemaRegistryClient(stub.baseUrl), stub.baseUrl)
    finally stub.stop()
  }

  private def events(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong,
        java.sql.Timestamp.valueOf(s"2026-01-01 00:0${i % 6}:0${i % 6}"),
        (i % 7).toLong, s"t${i % 3}", i * 1.5, s"""{"k": ${i * 11}}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("same canonical schema registers to the same id, across subjects too") {
    withRegistry { c =>
      val id1 = c.register("events-value", RegistryAvro.EventSchemaV1Json)
      val id1b = c.register("events-value", RegistryAvro.EventSchemaV1Json)
      val id1c = c.register("other-value", RegistryAvro.EventSchemaV1Json)
      assert(id1 == id1b && id1 == id1c)
      val id2 = c.register("events-value", RegistryAvro.EventSchemaV2Json)
      assert(id2 != id1)
      assert(c.schemaById(id2).contains("prop_k"))
    }
  }

  test("BACKWARD-incompatible evolution is rejected with the registry's 409") {
    withRegistry { c =>
      c.register("events-value", RegistryAvro.EventSchemaV1Json)
      // a new REQUIRED field (no default): a reader on this schema
      // cannot read the subject's history — the canonical backward break
      val bad =
        """{"type": "record", "name": "Event", "namespace": "graft.wire",
          | "fields": [
          |   {"name": "event_id", "type": "long"},
          |   {"name": "ts_us", "type": "long"},
          |   {"name": "user_id", "type": "long"},
          |   {"name": "event_type", "type": "string"},
          |   {"name": "value", "type": "double"},
          |   {"name": "mandatory_new", "type": "long"}
          | ]}""".stripMargin
      val e = intercept[IllegalArgumentException](c.register("events-value", bad))
      assert(e.getMessage.contains("409"))
      assert(e.getMessage.contains("incompatible"))
      // the compatible evolution (null-default field) still lands
      assert(c.register("events-value", RegistryAvro.EventSchemaV2Json) > 0)
    }
  }

  test("latest() tracks the subject's version history") {
    withRegistry { c =>
      val id1 = c.register("s", RegistryAvro.EventSchemaV1Json)
      assert(c.latest("s") == ((1, id1, c.schemaById(id1))))
      val id2 = c.register("s", RegistryAvro.EventSchemaV2Json)
      val (v, id, _) = c.latest("s")
      assert(v == 2 && id == id2)
      intercept[IllegalArgumentException](c.latest("absent"))
      intercept[IllegalArgumentException](c.schemaById(999))
    }
  }

  test("wire framing round-trips and resolves evolved writer schemas") {
    withRegistry { c =>
      import spark.implicits._
      val df = events(40)
      val id1 = c.register("events-value", RegistryAvro.EventSchemaV1Json)
      val id2 = c.register("events-value", RegistryAvro.EventSchemaV2Json)
      // the topic's history: even ids written in the v1 era (no prop_k
      // on the wire), odd ids under v2
      val wire = RegistryAvro
        .encodeEvents(df.filter(col("event_id") % 2 === 0),
          RegistryAvro.EventSchemaV1Json, id1)
        .unionAll(RegistryAvro.encodeEvents(df.filter(col("event_id") % 2 === 1),
          RegistryAvro.EventSchemaV2Json, id2))
      val ids = RegistryAvro.schemaIds(wire)
      assert(ids == Seq(id1, id2).sorted)
      val writerById = ids.map(i => i -> c.schemaById(i)).toMap
      val decoded = RegistryAvro
        .decodeEvents(wire, RegistryAvro.EventSchemaV2Json, writerById)
        .orderBy("event_id")
        .select("event_id", "prop_k", "value")
        .as[(Long, Option[Int], Double)].collect()
      decoded.foreach { case (id, k, v) =>
        assert(v == id * 1.5)
        if (id % 2 == 0) assert(k.isEmpty,
          s"v1-era record $id must resolve prop_k to the null default")
        else assert(k.contains(id.toInt * 11))
      }
      assert(decoded.length == 40)
    }
  }

  test("executor-side direct resolution matches the broadcast-map decode") {
    withRegistry2 { (c, url) =>
      import spark.implicits._
      val df = events(30)
      val id1 = c.register("events-value", RegistryAvro.EventSchemaV1Json)
      val id2 = c.register("events-value", RegistryAvro.EventSchemaV2Json)
      val wire = RegistryAvro
        .encodeEvents(df.filter(col("event_id") % 2 === 0),
          RegistryAvro.EventSchemaV1Json, id1)
        .unionAll(RegistryAvro.encodeEvents(df.filter(col("event_id") % 2 === 1),
          RegistryAvro.EventSchemaV2Json, id2))
      val byMap = RegistryAvro.decodeEvents(wire, RegistryAvro.EventSchemaV2Json,
          RegistryAvro.schemaIds(wire).map(i => i -> c.schemaById(i)).toMap)
        .orderBy("event_id").collect().toSeq
      val direct = RegistryAvro
        .decodeEventsResolving(wire, RegistryAvro.EventSchemaV2Json, url)
        .orderBy("event_id").collect().toSeq
      assert(direct == byMap && direct.size == 30)
    }
  }

  test("an unresolved schema id fails the decode loudly") {
    withRegistry { c =>
      val id1 = c.register("events-value", RegistryAvro.EventSchemaV1Json)
      val wire = RegistryAvro.encodeEvents(events(3),
        RegistryAvro.EventSchemaV1Json, id1)
      val e = intercept[org.apache.spark.SparkException] {
        RegistryAvro.decodeEvents(wire, RegistryAvro.EventSchemaV2Json,
          Map.empty).collect()
      }
      assert(Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
        .exists(_.getMessage.contains("unresolved schema id")))
    }
  }
}
