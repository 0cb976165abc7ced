package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Wire codecs for the stream exchange.
  *
  * The reference producer writes either JSON (`README.md:108`) or a
  * separator-joined string (`dataframe_to_kafka.py:44-53`) into Kafka;
  * the streaming job decodes with `from_json` in PERMISSIVE mode
  * (`spark_streaming_kafka.py:32-34`). Both codecs are pure column
  * expressions — they stay inside whole-stage codegen, no UDFs.
  */
object Codecs {

  /** F7: encode all columns of a row as one JSON string. */
  def jsonEncode(df: DataFrame): Column =
    to_json(struct(df.columns.map(col).toSeq: _*))

  /** F6: decode a JSON string column against a declared schema.
    * PERMISSIVE semantics: corrupt payloads yield an all-null struct —
    * the reference's implicit dirty-data policy (SURVEY §2.7 T8).
    */
  def jsonDecode(value: Column, schema: StructType): Column =
    from_json(value, schema)

  /** F4: encode a row as a delimiter-joined string
    * (`dataframe_to_kafka.py:44-53`; default sep `,`, `-ks` overrides).
    * Nulls are dropped by `concat_ws` — the producer pre-drops NA rows
    * (P2) so this matches reference behavior on its own input.
    */
  def dsvEncode(df: DataFrame, sep: String = ","): Column =
    dsvEncode(df.columns.toSeq, sep)

  /** Same, over an explicit column list (callers that encode a schema
    * subset, e.g. the streaming DSV wire).
    */
  def dsvEncode(cols: Seq[String], sep: String): Column =
    concat_ws(sep, cols.map(c => col(c).cast("string")): _*)

  /** DSV decode against a declared schema via the built-in CSV reader
    * expression. `from_csv` is PERMISSIVE like `from_json`.
    */
  def dsvDecode(value: Column, schema: StructType, sep: String = ","): Column =
    from_csv(value, schema, Map("sep" -> sep))

  /** F8: the producer's Kafka key — the value of a keyed column, or the
    * row index when `keyCol` is None (`dataframe_to_kafka.py:94-100`,
    * sentinel `-k 1000`). At scale a driver-side row index is
    * meaningless; `monotonically_increasing_id` preserves the
    * "unique-per-row, stable within a run" contract without a global
    * sort.
    */
  def kafkaKey(keyCol: Option[String]): Column = keyCol match {
    case Some(c) => col(c).cast("string")
    case None    => monotonically_increasing_id().cast("string")
  }
}
