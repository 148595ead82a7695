package graft.hfc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed views over the semi-structured blobs (SURVEY.md §1.3 P7).
  *
  * The reference stores `card_data`, `model.config`,
  * `discussion_event.full_data` and `space.runtime_raw` as opaque
  * strings (Python `str()` of dicts, databaseImport.py:642,634,524,806)
  * and gives up on structure. We keep the raw string for fidelity AND
  * expose parsed views — `from_json` into a map for open-schema blobs,
  * into a declared struct where the shape is known. Parsing happens in
  * the projection (codegen'd), so a query touching only one extracted
  * field still prunes everything else.
  */
object HfcViews {

  /** open-schema JSON blob → map<string,string> (null on malformed) */
  def jsonMap(c: Column): Column =
    from_json(c, MapType(StringType, StringType))

  /** model.config's stable top-level fields (the rest stay reachable
    * through [[jsonMap]]) */
  val configType: StructType = StructType(Seq(
    StructField("model_type", StringType),
    StructField("architectures", ArrayType(StringType)),
    StructField("vocab_size", LongType),
    StructField("hidden_size", LongType)))

  /** space runtime payload (S6, get_space_runtime) */
  val runtimeType: StructType = StructType(Seq(
    StructField("stage", StringType),
    StructField("hardware", StructType(Seq(
      StructField("current", StringType),
      StructField("requested", StringType)))),
    StructField("storage", StringType)))

  def withConfigView(model: DataFrame): DataFrame =
    model
      .withColumn("config_parsed", from_json(col("config"), configType))
      .withColumn("config_map", jsonMap(col("config")))

  def withRuntimeView(space: DataFrame): DataFrame =
    space.withColumn("runtime_parsed", from_json(col("runtime_raw"), runtimeType))

  def withEventPayloadView(discussionEvent: DataFrame): DataFrame =
    discussionEvent.withColumn("full_data_map", jsonMap(col("full_data")))

  /** Python-repr blob → JSON text (null on non-repr input). The
    * published dumps store `card_data` / `config` / `full_data` as
    * Python `str()` repr (databaseImport.py:642,634,524) — single
    * quotes, None/True/False — which `from_json` rejects; this compat
    * shim (SURVEY §7.4.3) converts via the native
    * [[graft.functions.expressions.PyReprJson]] expression so every
    * view below works identically on API-built and dump-loaded tables. */
  def pyReprToJson(c: Column): Column = call_function("graft_pyrepr_json", c)

  /** a blob that may be EITHER clean JSON (our extractor's tables) or
    * Python repr (reference dumps): STRICT JSON wins when it parses;
    * otherwise the repr converter runs. The detection must disable
    * from_json's lenient defaults — with allowSingleQuotes on (the
    * default), `{'k': 'v'}` repr parses as a map and would pass
    * through UNconverted, leaving a mixed-encoding column that strict
    * downstream consumers (json.loads, DuckDB json_extract) reject. */
  def jsonOrPyRepr(c: Column): Column = {
    val strict = from_json(c, MapType(StringType, StringType),
      Map("allowSingleQuotes" -> "false", "allowUnquotedFieldNames" -> "false"))
    when(strict.isNotNull, c).otherwise(pyReprToJson(c))
  }

  /** [[withConfigView]] for dump-loaded `model` (repr-encoded config) */
  def withConfigViewCompat(model: DataFrame): DataFrame = {
    val json = jsonOrPyRepr(col("config"))
    model
      .withColumn("config_parsed", from_json(json, configType))
      .withColumn("config_map", jsonMap(json))
  }

  /** [[withEventPayloadView]] for dump-loaded `discussion_event` */
  def withEventPayloadViewCompat(discussionEvent: DataFrame): DataFrame =
    discussionEvent.withColumn("full_data_map",
      jsonMap(jsonOrPyRepr(col("full_data"))))
}
