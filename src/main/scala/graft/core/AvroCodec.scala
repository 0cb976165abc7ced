package graft.core

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Avro binary wire codec for the events feed — the serialization a
  * production Kafka pipeline actually runs (schema-registry Avro)
  * where the reference demo ships JSON strings
  * (`dataframe_to_kafka.py:85-93`). Built directly on the Avro core
  * library Spark itself bundles (`org.apache.avro`, Generic API) — the
  * `spark-avro` connector's `from_avro`/`to_avro` expressions are not
  * on this classpath, so the codec IS the connector surface here,
  * shaped the same way: schema fixed at plan time, encode/decode as a
  * per-partition batch transform.
  *
  * Scale notes: `mapPartitions` is the right altitude for a binary
  * codec (one parser/writer + one reusable encoder buffer per
  * partition, zero per-row allocation of codec machinery — the same
  * reason media decode lives there, ops/Multimodal.scala). Avro binary
  * encoding is canonical for a fixed schema — no field-order or
  * whitespace ambiguity — so redelivery dedup and CRC checks over the
  * bytes are deterministic, and the payload is substantially smaller
  * than the JSON twin (no repeated field names on the wire; the schema
  * travels out-of-band, exactly the schema-registry contract).
  */
object AvroCodec {

  /** The wire schema: event time travels as explicit epoch-micros (the
    * same fidelity rule as the JSON wire), `prop_k` is an optional
    * field (`["null","int"]` union) — the schema-evolution shape every
    * registry feed carries.
    */
  val EventSchemaJson: String =
    """{"type": "record", "name": "Event", "namespace": "graft.wire",
      | "fields": [
      |   {"name": "event_id", "type": "long"},
      |   {"name": "ts_us", "type": "long"},
      |   {"name": "user_id", "type": "long"},
      |   {"name": "event_type", "type": "string"},
      |   {"name": "value", "type": "double"},
      |   {"name": "prop_k", "type": ["null", "int"], "default": null}
      | ]}""".stripMargin

  // Shared event↔record plumbing: ONE projection, ONE field-put
  // sequence, ONE record-read — reused by the registry-framed twin
  // (graft.kafka.RegistryAvro), so a schema-field change cannot
  // silently diverge the two wire paths.
  private[graft] type EventTuple = (Long, Long, Long, String, Double, Option[Int])

  private[graft] def projectEvents(events: DataFrame): Dataset[EventTuple] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("int").as("prop_k"))
      .as[EventTuple]
  }

  private[graft] def putEvent(rec: org.apache.avro.generic.GenericData.Record,
      t: EventTuple, hasPropK: Boolean): Unit = {
    rec.put("event_id", t._1)
    rec.put("ts_us", t._2)
    rec.put("user_id", t._3)
    rec.put("event_type", t._4)
    rec.put("value", t._5)
    if (hasPropK) rec.put("prop_k", t._6.map(Int.box).orNull)
  }

  private[graft] def eventOf(rec: org.apache.avro.generic.GenericRecord,
      hasPropK: Boolean): EventTuple =
    (rec.get("event_id").asInstanceOf[Long],
      rec.get("ts_us").asInstanceOf[Long],
      rec.get("user_id").asInstanceOf[Long],
      rec.get("event_type").toString,
      rec.get("value").asInstanceOf[Double],
      if (hasPropK) Option(rec.get("prop_k")).map(_.asInstanceOf[Int])
      else None)

  /** events table → Kafka-shaped (key STRING, value BINARY) wire frame;
    * key = event_id (the producer's partitioning key, F8).
    */
  def encodeEvents(events: DataFrame): DataFrame =
    encodeEventsFramed(events, EventSchemaJson, Array.empty)

  /** The ONE encode loop, shared with the registry-framed twin
    * ([[graft.kafka.RegistryAvro]]): an optional constant `header`
    * (the Confluent magic+id prefix there, empty here) precedes each
    * record's Avro binary. Fields absent from `schemaJson` are simply
    * not written.
    */
  private[graft] def encodeEventsFramed(events: DataFrame,
      schemaJson: String, header: Array[Byte]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    projectEvents(events)
      .mapPartitions { it =>
        val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
        val hasPropK = schema.getField("prop_k") != null
        val writer =
          new org.apache.avro.generic.GenericDatumWriter[
            org.apache.avro.generic.GenericRecord](schema)
        val baos = new java.io.ByteArrayOutputStream(64)
        var enc: org.apache.avro.io.BinaryEncoder = null
        it.map { t =>
          baos.reset()
          if (header.nonEmpty) baos.write(header)
          enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(baos, enc)
          val rec = new org.apache.avro.generic.GenericData.Record(schema)
          putEvent(rec, t, hasPropK)
          writer.write(rec, enc)
          enc.flush()
          (t._1.toString, baos.toByteArray)
        }
      }.toDF("key", "value")
  }

  /** (value BINARY) wire frame → typed event columns. */
  def decodeEvents(wire: DataFrame): DataFrame = {
    val spark = wire.sparkSession
    import spark.implicits._
    val values: Dataset[Array[Byte]] =
      wire.select(col("value").cast("binary")).as[Array[Byte]]
    values.mapPartitions { it =>
      val schema = new org.apache.avro.Schema.Parser().parse(EventSchemaJson)
      val reader =
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord](schema)
      var dec: org.apache.avro.io.BinaryDecoder = null
      it.map { bytes =>
        dec = org.apache.avro.io.DecoderFactory.get().binaryDecoder(bytes, dec)
        eventOf(reader.read(null, dec), hasPropK = true)
      }
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "prop_k")
  }
}
