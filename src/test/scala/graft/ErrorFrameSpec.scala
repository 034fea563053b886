package graft

import org.apache.spark.sql.functions._

import graft.core.{ErrorClassifier, ErrorFrame, ErrorHeaders}

/** No-arg-constructible provider for the config-driven classifier test. */
class TestFilterProvider extends graft.core.ErrorFilterProvider {
  override def classifier: ErrorClassifier =
    ErrorClassifier(Seq("org.example.custom."), Set.empty)
}

class ErrorFrameSpec extends SparkSpec {
  import spark.implicits._

  private def captured = ErrorFrame.captureErrors(
    Seq(("a", "1"), ("b", "zap"), ("c", "3")).toDF("id", "s"),
    Map("v" -> expr("cast(s as int)")),
    input = $"s")

  test("values keeps successes with unwrapped result") {
    val v = captured.values.orderBy($"id").collect()
    assert(v.map(_.getString(0)).toSeq == Seq("a", "c"))
    assert(v.map(_.getInt(2)).toSeq == Seq(1, 3))
  }

  test("multi-column capture: one pass, any failing output fails the row") {
    // two transforms captured together (the multi-output mapper shape):
    // "zap" fails the int cast only, "0" fails the division only
    val ef = ErrorFrame.captureErrors(
      Seq(("a", "1"), ("b", "zap"), ("c", "0"), ("d", "4")).toDF("id", "s"),
      Map("v" -> expr("cast(s as int)"), "inv" -> expr("100 div cast(s as int)")),
      input = $"s")
    val v = ef.values.orderBy($"id").collect()
    assert(v.map(_.getString(0)).toSeq == Seq("a", "d"))
    assert(v.map(r => (r.getInt(2), r.getLong(3))).toSeq == Seq((1, 100L), (4, 25L)))
    val e = ef.errors.select($"id", $"error_class").as[(String, String)]
      .collect().toMap
    assert(e.keySet == Set("b", "c"))
    // firstError surfaces the class of the output that actually failed
    assert(e("b").contains("NumberFormat"), s"b: ${e("b")}")
    assert(e("c").contains("Arithmetic"), s"c: ${e("c")}")
  }

  test("observed: one action yields data AND error telemetry") {
    val (ef, obs) = captured.observed("ingest")
    // the values action alone must populate the metrics (no extra job
    // over the error branch)
    assert(ef.values.count() === 2L)
    val m = obs.get
    assert(m("n_rows") === 3L && m("n_errors") === 1L)
    assert(m("errors_by_class").asInstanceOf[Map[String, Long]] ==
      Map("org.apache.spark.SparkNumberFormatException" -> 1L))
  }

  test("observed per-class counts equal the errors-branch groupBy") {
    // two distinct error classes in one frame: cast failure + division
    val ef0 = ErrorFrame.captureErrors(
      Seq(("a", "1", 1), ("b", "zap", 1), ("c", "3", 0), ("d", "junk", 1), ("e", "4", 0))
        .toDF("id", "s", "d"),
      Map("v" -> expr("cast(s as int) div d")),
      input = $"s")
    val expected = ef0.errors.groupBy($"error_class").count()
      .as[(String, Long)].collect().toMap
    val (ef, obs) = ef0.observed("classes")
    ef.annotated.count()
    assert(obs.get("errors_by_class").asInstanceOf[Map[String, Long]] == expected)
  }

  test("errors keeps failures with error columns") {
    val e = captured.errors.collect()
    assert(e.length == 1)
    assert(e.head.getAs[String]("id") == "b")
    assert(e.head.getAs[String]("error_class") ==
      "org.apache.spark.SparkNumberFormatException")
  }

  test("annotated: both branches in one frame, one scan") {
    val ann = captured.annotated.orderBy($"id").collect()
    assert(ann.map(_.getAs[String]("id")).toSeq == Seq("a", "b", "c"))
    assert(ann.map(_.getAs[Boolean]("is_error")).toSeq == Seq(false, true, false))
    assert(ann.filter(!_.getAs[Boolean]("is_error")).map(_.getAs[Int]("v")).toSeq == Seq(1, 3))
    assert(ann.find(_.getAs[Boolean]("is_error")).get.getAs[String]("error_class") ==
      "org.apache.spark.SparkNumberFormatException")
    // single scan: exactly one relation leaf in the plan
    assert(captured.annotated.queryExecution.optimizedPlan.collectLeaves().size == 1)
  }

  test("deadLetters matches the reference DeadLetter.avsc shape") {
    val dl = captured.deadLetters("test pipeline")
    assert(dl.schema.fieldNames.toSeq ==
      Seq("input_value", "topic", "partition", "offset", "description", "cause",
        "input_timestamp"))
    val cause = dl.schema("cause").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(cause.fieldNames.toSeq == Seq("error_class", "message", "stack_trace"))
    val r = dl.collect().head
    assert(r.getAs[String]("input_value") == "zap")
    assert(r.getAs[String]("description") == "test pipeline")
  }

  test("contentLineage: offsets stable across partitioning, unlike batch ids") {
    // the monotonically_increasing_id batch offsets are partition-layout-
    // dependent (documented in lineageOf); contentLineage keys on the
    // input bytes, so ANY layout of the same data yields the same offset
    def dlOffsets(parts: Int): Map[String, Long] = {
      val ef = ErrorFrame.captureErrors(
        Seq(("a", "zap"), ("b", "pow"), ("c", "3")).toDF("id", "s").repartition(parts),
        Map("v" -> expr("cast(s as int)")), input = $"s")
      ef.deadLetters("lineage",
          lineageCols = Some(ErrorFrame.contentLineage($"s", "dlq-store")))
        .select($"input_value", $"offset").as[(String, Long)].collect().toMap
    }
    val one = dlOffsets(1)
    val eight = dlOffsets(8)
    assert(one.keySet == Set("zap", "pow") && one == eight)
    // the offset IS the content hash — recomputable by any reader
    val expected = spark.range(1).select(
      xxhash64(lit("zap")), xxhash64(lit("pow"))).as[(Long, Long)].head()
    assert((one("zap"), one("pow")) == expected)
    // topic carries the store label; partition is null by contract
    val r = ErrorFrame.captureErrors(
        Seq(("a", "zap")).toDF("id", "s"),
        Map("v" -> expr("cast(s as int)")), input = $"s")
      .deadLetters("lineage",
        lineageCols = Some(ErrorFrame.contentLineage($"s", "dlq-store")))
      .select($"topic", $"partition").collect().head
    assert(r.getString(0) == "dlq-store" && r.isNullAt(1))
    // NULL input ⇒ NULL offset, not the xxhash64 seed sentinel: Spark
    // hash functions skip null args and return the seed (42), which
    // would collapse all null-content rows into one identity (ADVICE r11)
    val nullOff = spark.range(1)
      .select(ErrorFrame.contentLineage(lit(null).cast("string"))._3)
      .collect().head
    assert(nullOff.isNullAt(0))
  }

  test("withErrorHeaders emits kafka-style headers with reference keys") {
    val h = captured.withErrorHeaders("desc").select(explode($"headers").as("h"))
      .select($"h.key", $"h.value".cast("string")).as[(String, String)].collect().toMap
    assert(h.keySet == Set(ErrorHeaders.TOPIC, ErrorHeaders.PARTITION, ErrorHeaders.OFFSET,
      ErrorHeaders.EXCEPTION_CLASS_NAME, ErrorHeaders.EXCEPTION_MESSAGE,
      ErrorHeaders.EXCEPTION_STACK_TRACE, ErrorHeaders.DESCRIPTION))
    assert(h(ErrorHeaders.EXCEPTION_CLASS_NAME) == "org.apache.spark.SparkNumberFormatException")
    assert(h(ErrorHeaders.DESCRIPTION) == "desc")
  }

  test("header parity: stackless capture keeps the key set, trace only when requested") {
    val in = Seq(("a", "1"), ("b", "zap")).toDF("id", "s")
    def headers(stackTraces: Boolean): Map[String, String] =
      ErrorFrame.captureErrors(in,
          Map("v" -> expr("cast(s as int)")), input = $"s",
          stackTraces = stackTraces)
        .withErrorHeaders("desc").select(explode($"headers").as("h"))
        .select($"h.key", $"h.value".cast("string")).as[(String, String)].collect().toMap
    val cheap = headers(stackTraces = false)
    val full = headers(stackTraces = true)
    // identical key sets — a consumer sees the same header schema either way
    assert(cheap.keySet == full.keySet)
    assert(cheap(ErrorHeaders.EXCEPTION_CLASS_NAME) ==
      full(ErrorHeaders.EXCEPTION_CLASS_NAME))
    assert(cheap(ErrorHeaders.EXCEPTION_MESSAGE) == full(ErrorHeaders.EXCEPTION_MESSAGE))
    // the trace renders only when the capture was asked for it
    assert(cheap(ErrorHeaders.EXCEPTION_STACK_TRACE) == null)
    assert(full(ErrorHeaders.EXCEPTION_STACK_TRACE) != null &&
      full(ErrorHeaders.EXCEPTION_STACK_TRACE).contains("SparkNumberFormatException"))
  }

  test("kafka-shaped input: record lineage flows into headers and dead letters") {
    // the Spark Kafka source schema carries topic/partition/offset — the
    // record context of ErrorHeaderProcessor.java:54-76
    val kafkaShaped = Seq(
      ("events", 3, 41L, "7"), ("events", 3, 42L, "zap"), ("other", 0, 9L, "1"))
      .toDF("topic", "partition", "offset", "value")
    val ef = ErrorFrame.captureErrors(kafkaShaped,
      Map("v" -> expr("cast(value as int)")), input = $"value")
    val h = ef.withErrorHeaders("desc").select(explode($"headers").as("h"))
      .select($"h.key", $"h.value".cast("string")).as[(String, String)].collect().toMap
    assert(h(ErrorHeaders.TOPIC) == "events")
    assert(h(ErrorHeaders.PARTITION) == "3")
    assert(h(ErrorHeaders.OFFSET) == "42")
    val dl = ef.deadLetters("desc").collect().head
    assert(dl.getAs[String]("topic") == "events")
    assert(dl.getAs[Int]("partition") == 3)
    assert(dl.getAs[Long]("offset") == 42L)
    // round-trip: a Kafka-shaped DLQ record keeps the origin topic routing
    val rec = graft.sources.Sinks.toKafkaRecords(ef.deadLetters("desc"),
      keyCol = col("topic"), valueCol = col("input_value"),
      topicCol = Some(concat(col("topic"), lit("-dlq")))).collect().head
    assert(rec.getAs[String]("topic") == "events-dlq")
    assert(new String(rec.getAs[Array[Byte]]("value")) == "zap")
  }

  test("batch lineage: withLineage headers carry file/partition analogs") {
    val h = captured.withErrorHeaders("desc", withLineage = true)
      .select(explode($"headers").as("h"))
      .select($"h.key", $"h.value".cast("string")).as[(String, String)].collect().toMap
    // local Seq frame: no file name (empty string), but partition/offset
    // analogs are concrete values, not nulls
    assert(h(ErrorHeaders.PARTITION) != null && h(ErrorHeaders.OFFSET) != null)
  }

  test("withTaskContext adds exception-handler task/node headers") {
    val h = captured.withErrorHeaders("desc", withTaskContext = true)
      .select(explode($"headers").as("h")).select($"h.key").as[String].collect().toSet
    assert(h.contains(ErrorHeaders.TASK_ID) && h.contains(ErrorHeaders.PROCESSOR_NODE_ID))
  }

  test("filterRecoverable splits and can fail-fast on recoverable") {
    val split = captured.filterRecoverable(ErrorClassifier.nothingIsRecoverable)
    assert(split.deadLettered.count() == 1 && split.recoverable.count() == 0)

    // fail-fast is lazy and in-expression: constructing the split is free;
    // the raise_error guard fires inside the task on first consumption.
    val allRecoverable = ErrorClassifier(Seq("org.apache.spark."), Set.empty)
    val failing = captured.filterRecoverable(allRecoverable)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val exV = intercept[Exception] { failing.values.count() }
    assert(msgs(exV).exists(_.contains("recoverable error encountered")))
    val exD = intercept[Exception] { failing.deadLettered.count() }
    assert(msgs(exD).exists(_.contains("recoverable error encountered")))
    val s2 = captured.filterRecoverable(allRecoverable, failOnRecoverable = false)
    assert(s2.recoverable.count() == 1 && s2.deadLettered.count() == 0)
  }

  test("recoverable carve-out: nonRecoverableClasses wins over prefix") {
    val c = ErrorClassifier(Seq("org.apache.spark."),
      Set("org.apache.spark.SparkNumberFormatException"))
    assert(!c.isRecoverable("org.apache.spark.SparkNumberFormatException"))
    assert(c.isRecoverable("org.apache.spark.SparkTimeoutException"))
  }

  test("classifier builds from config: named, inline, class, and default") {
    import ErrorClassifier._
    assert(fromConf(Map(FILTER_CONFIG -> "default")) == ErrorClassifier.default)
    assert(fromConf(Map.empty) == ErrorClassifier.nothingIsRecoverable)
    val inline = fromConf(Map(
      RECOVERABLE_PREFIXES_CONFIG -> "java.net., org.example.Transient",
      NON_RECOVERABLE_CLASSES_CONFIG -> "java.net.UnknownHostException"))
    assert(inline.isRecoverable("java.net.SocketTimeoutException"))
    assert(!inline.isRecoverable("java.net.UnknownHostException"))
    val viaClass = fromConf(Map(FILTER_CONFIG -> classOf[TestFilterProvider].getName))
    assert(viaClass.isRecoverable("org.example.custom.Boom"))
    // session-conf wiring under the spark.graft. namespace
    spark.conf.set(SPARK_CONF_PREFIX + FILTER_CONFIG, classOf[TestFilterProvider].getName)
    try assert(ErrorClassifier.fromSession(spark).isRecoverable("org.example.custom.Boom"))
    finally spark.conf.unset(SPARK_CONF_PREFIX + FILTER_CONFIG)
  }

  test("describeErrors rethrows with input context") {
    val ex = intercept[Exception] {
      ErrorFrame.describeErrors(
        Seq(("b", "zap")).toDF("id", "s"),
        Map("v" -> expr("cast(s as int)")), input = $"s").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m => m.contains("zap")))
  }

  test("valuesLoggingErrors drops failures") {
    assert(captured.valuesLoggingErrors().count() == 2)
  }

  test("recovered: per-column fallback substitution, observable flag, cardinality kept") {
    val df = Seq((1L, 10L), (2L, 0L), (3L, 5L)).toDF("id", "d")
    val out = ErrorFrame.captureErrors(df,
        Map("q" -> expr("100 div d"), "ok" -> (col("id") * 2)),
        input = col("id").cast("string"))
      .recovered(Map("q" -> lit(-1L), "ok" -> lit(-99L)))
      .select($"id", $"q", $"ok", $"recovered")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // row 2: q's division fails -> its default; ok SUCCEEDED -> keeps its
    // computed value (substitution is per-column, never whole-row)
    assert(out == Seq((1L, 10L, 2L, false), (2L, -1L, 4L, true),
      (3L, 20L, 6L, false)))
    // defaults must cover the result columns exactly
    intercept[IllegalArgumentException] {
      ErrorFrame.captureErrors(df, Map("q" -> expr("100 div d")),
        input = col("id").cast("string")).recovered(Map("zz" -> lit(0L)))
    }
  }
}
