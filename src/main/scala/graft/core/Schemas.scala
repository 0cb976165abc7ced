package graft.core

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** The sensor-stream data model of the reference pipeline.
  *
  * Three schema variants travel through the reference
  * (`data_collector.py:16-20`, `spark_streaming_kafka.py:21-29`,
  * `kafka_to_es.py:25-34` — see SURVEY.md §1.2); all three are declared
  * here once and shared by the batch ETL, the replay producer and the
  * streaming decoder.
  */
object Schemas {

  /** One minute-floored, per-room averaged sensor record — the merged
    * table produced by the batch ETL (reference
    * `merged_sensor_data_grouped.csv`, `data_collector.py:26-49`).
    */
  final case class SensorReading(
      event_ts_min: Timestamp,
      ts_min_bignt: Long,
      room: String,
      timestamp: Double,
      co2: Double,
      light: Double,
      temp: Double,
      humidity: Double,
      pir: Double)

  /** Sensor metric names, in reference column order. */
  val metrics: Seq[String] = Seq("co2", "light", "temp", "humidity", "pir")

  /** (a) Raw KETI-style per-sensor file: headerless CSV, names imposed at
    * read (`data_collector.py:16-20`).
    */
  def rawSensorSchema(metric: String): StructType = StructType(Seq(
    StructField("timestamp", LongType, nullable = true),
    StructField(metric, DoubleType, nullable = true)))

  /** (b) Merged/grouped batch output (`data_collector.py:26-49`). */
  val mergedSchema: StructType = StructType(Seq(
    StructField("event_ts_min", TimestampType),
    StructField("ts_min_bignt", LongType),
    StructField("room", StringType),
    StructField("timestamp", DoubleType),
    StructField("co2", DoubleType),
    StructField("light", DoubleType),
    StructField("temp", DoubleType),
    StructField("humidity", DoubleType),
    StructField("pir", DoubleType)))

  /** (c1) Streaming wire schema, JSON codec, ISO-string timestamp
    * (`spark_streaming_kafka.py:21-29`).
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("room", StringType),
    StructField("co2", FloatType),
    StructField("light", FloatType),
    StructField("temp", FloatType),
    StructField("humidity", FloatType),
    StructField("pir", FloatType)))

  /** (c2) Extended wire schema: adds `event_ts_min`, long `timestamp`
    * (`kafka_to_es.py:25-34`).
    */
  val wireSchemaExtended: StructType = StructType(Seq(
    StructField("event_ts_min", StringType),
    StructField("ts_min_bignt", LongType),
    StructField("room", StringType),
    StructField("timestamp", LongType),
    StructField("co2", FloatType),
    StructField("light", FloatType),
    StructField("temp", FloatType),
    StructField("humidity", FloatType),
    StructField("pir", FloatType)))
}
