package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.ErrorFrame

/** JSON ingestion with PER-RECORD error capture — the reference's
  * dead-letter pattern applied at the ingest boundary.
  *
  * `spark.read.json` offers only all-or-nothing modes: PERMISSIVE
  * silently nulls malformed records (losing them), FAILFAST kills the
  * whole job on the first bad line. Routing `from_json(FAILFAST)`
  * through the capture expression instead gives the Kafka
  * dead-letter-queue semantics batch-side: well-formed records parse
  * into a typed struct, malformed ones carry their parse error + raw
  * input to the DLQ, and the job always completes.
  */
object JsonIngest {

  /** Parse a JSON string column against a DDL schema with per-record
    * capture. Returns an [[ErrorFrame]]: `.values` has the `parsed`
    * struct, `.deadLetters(...)` the malformed records in the reference
    * dead-letter shape with the raw line as `input_value`.
    */
  def parseCaptured(df: DataFrame, jsonCol: String, ddl: String,
      options: Map[String, String] = Map.empty): ErrorFrame =
    ErrorFrame.captureErrors(df,
      Map("parsed" -> from_json(col(jsonCol), StructType.fromDDL(ddl),
        options + ("mode" -> "FAILFAST"))),
      input = col(jsonCol))

  /** CSV twin of [[parseCaptured]]: `from_csv(FAILFAST)` under the
    * capture expression — malformed lines dead-letter individually with
    * the raw line as `input_value`, well-formed lines parse into the
    * typed struct, the job always completes.
    */
  def parseCsvCaptured(df: DataFrame, csvCol: String, ddl: String,
      options: Map[String, String] = Map.empty): ErrorFrame =
    ErrorFrame.captureErrors(df,
      Map("parsed" -> from_csv(col(csvCol), StructType.fromDDL(ddl),
        options + ("mode" -> "FAILFAST"))),
      input = col(csvCol))

  /** Schema-drift detection at the JSON ingest boundary: a fixed read
    * schema silently DROPS fields a producer starts adding — the
    * forward-compatibility failure mode FAILFAST cannot see (extra
    * fields are not malformed). Parsing into `map<string,string>` and
    * diffing `map_keys` against the expected set surfaces, per record,
    * the unknown keys (drift) and the missing expected keys — pure
    * per-row expressions, zero shuffle; aggregate the `unknown_keys`
    * explode to rank drifting fields corpus-wide.
    */
  def schemaDrift(df: DataFrame, jsonCol: String,
      expectedKeys: Seq[String]): DataFrame = {
    val expected = array(expectedKeys.map(lit): _*)
    val keys = map_keys(from_json(col(jsonCol), lit("map<string,string>")))
    df.withColumn("unknown_keys", array_except(keys, expected))
      .withColumn("missing_keys", array_except(expected, keys))
      .withColumn("drifted", size(col("unknown_keys")) > 0)
  }

  /** Read a line-delimited JSON corpus as raw text lines, then parse
    * with capture. Line splitting never fails; only per-line parses can,
    * and those dead-letter individually.
    */
  def readJsonl(spark: SparkSession, path: String, ddl: String): ErrorFrame =
    parseCaptured(spark.read.text(path).withColumnRenamed("value", "raw"),
      "raw", ddl)
}
