package graft

import org.apache.spark.sql.functions._

import graft.core.{DeadLetterSerde, ErrorFrame, ProtoWire}

class DeadLetterSerdeSpec extends SparkSpec {
  import spark.implicits._

  private def deadLetters = ErrorFrame.captureErrors(
    Seq(("a", "nope")).toDF("id", "s"),
    Map("v" -> expr("cast(s as int)")), input = $"s")
    .deadLetters("serde test")

  test("json serde emits parseable dead letters") {
    val js = DeadLetterSerde.toJsonValue(deadLetters).as[String].collect().head
    assert(js.contains("\"description\":\"serde test\""))
    assert(js.contains("\"input_value\":\"nope\""))
    assert(js.contains("SparkNumberFormatException"))
  }

  test("avro serde round-trips through the reference DeadLetter.avsc") {
    val bytes = DeadLetterSerde.toAvroValue(deadLetters)
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
  }

  test("proto wire format encodes tags and strings per deadletter.proto") {
    // description=1 (len-delim), cause=2, input_value=3 wrapped StringValue
    val bytes = ProtoWire.deadLetter("d", Some("m"), Some("st"), Some("ec"),
      Some("iv"), Some("topic"), Some(3), Some(42L), Some(1700000000L))
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
}
