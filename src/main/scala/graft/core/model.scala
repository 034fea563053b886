package graft.core

import org.apache.spark.sql.types._

/** Data model of the error-handling engine.
  *
  * Mirrors the reference semantics (not code):
  *  - ProcessingError: error-handling-core/src/main/java/com/bakdata/kafka/ProcessingError.java
  *    (the captured (input value, throwable) pair)
  *  - DeadLetter: error-handling-avro/src/main/avro/DeadLetter.avsc and
  *    error-handling-proto/src/main/proto/bakdata/kafka/proto/v1/deadletter.proto
  */
object model {

  /** Cause of a dead letter — DeadLetter.avsc `cause` record. */
  final case class Cause(
      error_class: Option[String],
      message: Option[String],
      stack_trace: Option[String])

  /** The dead-letter record, field-for-field the reference's Avro schema
    * (DeadLetter.avsc). `input_timestamp` is epoch millis (timestamp-millis
    * logical type in the reference).
    */
  final case class DeadLetter(
      input_value: Option[String],
      topic: Option[String],
      partition: Option[Int],
      offset: Option[Long],
      description: String,
      cause: Cause,
      input_timestamp: Option[java.sql.Timestamp])

  /** A captured processing error: the stringified input plus throwable
    * details (ProcessingError.java keeps the live Throwable; a distributed
    * engine must keep a serializable description instead).
    */
  final case class CapturedError(
      input: Option[String],
      error_class: String,
      message: Option[String],
      stack_trace: String)

  /** Result of an error-capturing map over a typed Dataset: exactly one of
    * `value` / `error` is set (ProcessedValue.java / ProcessedKeyValue.java).
    */
  final case class Processed[O](value: Option[O], error: Option[CapturedError])

  /** Schema of the struct produced by the TryCapture expression. */
  def capturedStructType(valueType: DataType): StructType = StructType(Seq(
    StructField("value", valueType, nullable = true),
    StructField("error_class", StringType, nullable = true),
    StructField("error_message", StringType, nullable = true),
    StructField("stack_trace", StringType, nullable = true)))

  /** Spark-SQL schema matching [[DeadLetter]] (and DeadLetter.avsc). */
  val deadLetterSchema: StructType = StructType(Seq(
    StructField("input_value", StringType, nullable = true),
    StructField("topic", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("description", StringType, nullable = false),
    StructField("cause", StructType(Seq(
      StructField("error_class", StringType, nullable = true),
      StructField("message", StringType, nullable = true),
      StructField("stack_trace", StringType, nullable = true))), nullable = false),
    StructField("input_timestamp", TimestampType, nullable = true)))
}

/** Throwable helpers used from both interpreted and generated code. */
object GraftErrors {

  /** Full stack trace as a string (reference uses commons-lang3
    * ExceptionUtils.getStackTrace — DeadLetterProcessor.java:~100).
    */
  def stackTraceString(t: Throwable): String = {
    val sw = new java.io.StringWriter()
    t.printStackTrace(new java.io.PrintWriter(sw))
    sw.toString
  }

  /** Fatal JVM errors must never be swallowed into a dead letter. */
  def isFatal(t: Throwable): Boolean = !scala.util.control.NonFatal(t)

  /** Sneaky rethrow so generated Java can `throw rethrow(t);` without
    * declaring checked exceptions.
    */
  def rethrow(t: Throwable): RuntimeException = throw t
}
