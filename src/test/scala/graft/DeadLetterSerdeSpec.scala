package graft

import org.apache.spark.sql.functions._

import graft.core.{DeadLetterSerde, ErrorFrame, ProtoWire}

class DeadLetterSerdeSpec extends SparkSpec {
  import spark.implicits._

  private def deadLetters = ErrorFrame.captureErrors(
    Seq(("a", "nope")).toDF("id", "s"),
    Map("v" -> expr("cast(s as int)")), input = $"s")
    .deadLetters("serde test")

  // sub-second precision: .678901 micros survives to millis (Avro) / nanos (proto)
  private val tsLit = lit("2024-01-02 03:04:05.678901").cast("timestamp")
  private def deadLettersWithTs = ErrorFrame.captureErrors(
    Seq(("a", "nope")).toDF("id", "s"),
    Map("v" -> expr("cast(s as int)")), input = $"s")
    .deadLetters("serde test", timestampCol = Some(tsLit))

  test("json serde emits parseable dead letters") {
    val js = DeadLetterSerde.toJsonValue(deadLetters).as[String].collect().head
    assert(js.contains("\"description\":\"serde test\""))
    assert(js.contains("\"input_value\":\"nope\""))
    assert(js.contains("SparkNumberFormatException"))
  }

  test("avro serde round-trips through the reference DeadLetter.avsc") {
    val bytes = DeadLetterSerde.toAvroValue(deadLettersWithTs)
      .as[Array[Byte]].collect().head
    val schema = new org.apache.avro.Schema.Parser().parse(DeadLetterSerde.avroSchemaJson)
    val reader = new org.apache.avro.generic.GenericDatumReader[
      org.apache.avro.generic.GenericRecord](schema)
    val dec = org.apache.avro.io.DecoderFactory.get().binaryDecoder(bytes, null)
    val rec = reader.read(null, dec)
    assert(rec.get("description").toString == "serde test")
    assert(rec.get("input_value").toString == "nope")
    val cause = rec.get("cause").asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(cause.get("error_class").toString ==
      "org.apache.spark.SparkNumberFormatException")
    // timestamp-millis semantics: sub-second precision preserved
    val expectedMs = java.time.Instant.parse("2024-01-02T03:04:05.678901Z").toEpochMilli
    assert(rec.get("input_timestamp") == expectedMs && expectedMs % 1000L == 678L)
  }

  test("proto wire format encodes tags and strings per deadletter.proto") {
    // description=1 (len-delim), cause=2, input_value=3 wrapped StringValue
    val bytes = ProtoWire.deadLetter("d", Some("m"), Some("st"), Some("ec"),
      Some("iv"), Some("topic"), Some(3), Some(42L), Some(1700000000123456L))
    // field 1, wire 2 => tag byte 0x0A, length 1, 'd'
    assert(bytes(0) == 0x0a.toByte && bytes(1) == 1.toByte && bytes(2) == 'd'.toByte)
    // must contain nested StringValue of topic: tag 0x22 (field 4)
    assert(bytes.containsSlice(Array[Byte](0x22, 7, 0x0a, 5) ++ "topic".getBytes))
    // partition Int32Value: field 5 tag 0x2A, len 2, inner tag 0x08, value 3
    assert(bytes.containsSlice(Array[Byte](0x2a, 2, 0x08, 3)))
    // offset Int64Value: field 6 tag 0x32, len 2, inner 0x08, 42
    assert(bytes.containsSlice(Array[Byte](0x32, 2, 0x08, 42)))
  }

  test("proto serde runs over a dead-letter frame") {
    val rows = DeadLetterSerde.toProtoValue(deadLetters).as[Array[Byte]].collect()
    assert(rows.length == 1 && rows.head.nonEmpty)
    // starts with description field tag
    assert(rows.head(0) == 0x0a.toByte)
  }

  test("ProtoWire bytes are byte-identical to a real protobuf runtime") {
    val cases = Seq(
      ("d", Some("m"), Some("st"), Some("ec"), Some("iv"), Some("topic"),
        Some(3), Some(42L), Some(1700000000123456L)),
      ("", None, None, None, None, None, None, None, None),
      // wrapper default values (empty string, 0) serialize as empty messages
      ("wrapper defaults", None, Some(""), None, Some(""), None,
        Some(0), Some(0L), Some(999L)),
      // negative int32/int64 are 10-byte sign-extended varints
      ("neg", Some("m"), None, None, None, None,
        Some(-1), Some(-5L), Some(-1500000L)),
      ("big", Some("x" * 300), None, Some("c" * 200), None, None,
        Some(Int.MaxValue), Some(Long.MaxValue), Some(253402300799999999L)))
    cases.foreach { case (d, m, st, ec, iv, tp, p, o, ts) =>
      val ours = ProtoWire.deadLetter(d, m, st, ec, iv, tp, p, o, ts)
      val ref = ProtoDescriptor.encode(d, m, st, ec, iv, tp, p, o, ts)
      assert(java.util.Arrays.equals(ours, ref),
        s"wire mismatch for ($d, $m, $st, $ec, $iv, $tp, $p, $o, $ts): " +
          s"ours=${ours.map("%02x".format(_)).mkString} ref=${ref.map("%02x".format(_)).mkString}")
    }
  }

  test("proto serde preserves sub-second timestamp precision") {
    val bytes = DeadLetterSerde.toProtoValue(deadLettersWithTs).as[Array[Byte]].collect().head
    val msg = ProtoDescriptor.parse(bytes)
    val ts = msg.getField(ProtoDescriptor.deadLetterType.findFieldByName("input_timestamp"))
      .asInstanceOf[org.sparkproject.connect.protobuf.DynamicMessage]
    val tsType = ts.getDescriptorForType
    assert(ts.getField(tsType.findFieldByName("seconds")) ==
      java.time.Instant.parse("2024-01-02T03:04:05Z").getEpochSecond)
    assert(ts.getField(tsType.findFieldByName("nanos")) == 678901000)
  }
}

/** Builds the reference deadletter.proto descriptor programmatically with
  * the (shaded) protobuf runtime bundled in spark-connect, so ProtoWire's
  * hand-rolled bytes are cross-validated against a REAL protobuf
  * implementation — not against hand-written tag expectations.
  */
object ProtoDescriptor {
  import org.sparkproject.connect.protobuf.{
    DescriptorProtos, Descriptors, DynamicMessage, Int32Value, Int64Value,
    StringValue, Timestamp, TimestampProto, WrappersProto}
  import DescriptorProtos._
  import FieldDescriptorProto.{Type => T}

  private def msgField(name: String, num: Int, typeName: String) =
    FieldDescriptorProto.newBuilder()
      .setName(name).setNumber(num)
      .setType(T.TYPE_MESSAGE).setTypeName(typeName)
      .setLabel(FieldDescriptorProto.Label.LABEL_OPTIONAL)

  val file: Descriptors.FileDescriptor = {
    val cause = DescriptorProto.newBuilder()
      .setName("Cause")
      .addField(msgField("message", 1, ".google.protobuf.StringValue"))
      .addField(msgField("stack_trace", 2, ".google.protobuf.StringValue"))
      .addField(msgField("error_class", 3, ".google.protobuf.StringValue"))
    val deadLetter = DescriptorProto.newBuilder()
      .setName("ProtoDeadLetter")
      .addNestedType(cause)
      .addField(FieldDescriptorProto.newBuilder()
        .setName("description").setNumber(1).setType(T.TYPE_STRING)
        .setLabel(FieldDescriptorProto.Label.LABEL_OPTIONAL))
      .addField(msgField("cause", 2, ".bakdata.kafka.proto.v1.ProtoDeadLetter.Cause"))
      .addField(msgField("input_value", 3, ".google.protobuf.StringValue"))
      .addField(msgField("topic", 4, ".google.protobuf.StringValue"))
      .addField(msgField("partition", 5, ".google.protobuf.Int32Value"))
      .addField(msgField("offset", 6, ".google.protobuf.Int64Value"))
      .addField(msgField("input_timestamp", 7, ".google.protobuf.Timestamp"))
    val fdp = FileDescriptorProto.newBuilder()
      .setName("deadletter.proto")
      .setSyntax("proto3")
      .setPackage("bakdata.kafka.proto.v1")
      .addDependency("google/protobuf/wrappers.proto")
      .addDependency("google/protobuf/timestamp.proto")
      .addMessageType(deadLetter)
      .build()
    Descriptors.FileDescriptor.buildFrom(fdp,
      Array(WrappersProto.getDescriptor, TimestampProto.getDescriptor))
  }

  val deadLetterType: Descriptors.Descriptor = file.findMessageTypeByName("ProtoDeadLetter")
  private val causeType = deadLetterType.findNestedTypeByName("Cause")

  def parse(bytes: Array[Byte]): DynamicMessage =
    DynamicMessage.parseFrom(deadLetterType, bytes)

  /** Reference encoding of the same logical dead letter via protobuf-java. */
  def encode(description: String,
      causeMessage: Option[String], causeStackTrace: Option[String], causeErrorClass: Option[String],
      inputValue: Option[String], topic: Option[String],
      partition: Option[Int], offset: Option[Long], epochMicros: Option[Long]): Array[Byte] = {
    def f(d: Descriptors.Descriptor, n: String) = d.findFieldByName(n)
    val cb = DynamicMessage.newBuilder(causeType)
    causeMessage.foreach(v => cb.setField(f(causeType, "message"), StringValue.of(v)))
    causeStackTrace.foreach(v => cb.setField(f(causeType, "stack_trace"), StringValue.of(v)))
    causeErrorClass.foreach(v => cb.setField(f(causeType, "error_class"), StringValue.of(v)))
    val b = DynamicMessage.newBuilder(deadLetterType)
    if (description.nonEmpty) b.setField(f(deadLetterType, "description"), description)
    b.setField(f(deadLetterType, "cause"), cb.build())
    inputValue.foreach(v => b.setField(f(deadLetterType, "input_value"), StringValue.of(v)))
    topic.foreach(v => b.setField(f(deadLetterType, "topic"), StringValue.of(v)))
    partition.foreach(v => b.setField(f(deadLetterType, "partition"), Int32Value.of(v)))
    offset.foreach(v => b.setField(f(deadLetterType, "offset"), Int64Value.of(v)))
    epochMicros.foreach { us =>
      b.setField(f(deadLetterType, "input_timestamp"), Timestamp.newBuilder()
        .setSeconds(Math.floorDiv(us, 1000000L))
        .setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        .build())
    }
    b.build().toByteArray
  }
}
