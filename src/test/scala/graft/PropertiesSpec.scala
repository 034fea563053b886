package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.core.ProtoWire
import graft.functions.MinHashSig

/** ScalaCheck properties for the pure (no-Spark) primitives. */
object PropertiesSpec extends Properties("graft.primitives") {

  private def readVarint(bytes: Array[Byte], from: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var i = from
    while ((bytes(i) & 0x80) != 0) {
      v |= (bytes(i) & 0x7fL) << shift; shift += 7; i += 1
    }
    v |= (bytes(i) & 0x7fL) << shift
    (v, i + 1)
  }

  property("proto description round-trips") =
    Prop.forAll(Gen.asciiPrintableStr.suchThat(_.nonEmpty)) { desc =>
      val bytes = ProtoWire.deadLetter(desc, None, None, None, None, None, None, None, None)
      val (len, payloadStart) = readVarint(bytes, 1)
      bytes(0) == 0x0a.toByte &&
        new String(bytes, payloadStart, len.toInt,
          java.nio.charset.StandardCharsets.UTF_8) == desc
    }

  property("proto offset varint round-trips") =
    Prop.forAll(Gen.chooseNum(1L, Long.MaxValue)) { off =>
      val bytes = ProtoWire.deadLetter("d", None, None, None, None, None, None, Some(off), None)
      val idx = bytes.indexOf(0x32.toByte) // field 6 tag
      val (_, innerStart) = readVarint(bytes, idx + 1)
      val (decoded, _) = readVarint(bytes, innerStart + 1)
      idx > 0 && bytes(innerStart) == 0x08.toByte && decoded == off
    }

  property("minhash permutation stays in [0, p) without overflow") =
    Prop.forAll(Gen.chooseNum(0L, (1L << 28) - 1), Gen.chooseNum(0, 255)) { (h, s) =>
      val v = (MinHashSig.coeffA(s) * h + MinHashSig.coeffB(s)) % MinHashSig.P
      v >= 0 && v < MinHashSig.P && MinHashSig.coeffA(s) * ((1L << 28) - 1) > 0
    }

  property("minhash multipliers distinct across seeds") =
    Prop(
      (0 until 64).map(MinHashSig.coeffA).distinct.size == 64)

  // the substring-based native eval must equal the split/sliding/distinct
  // reference on arbitrary strings — multi-spaces, leading/trailing
  // spaces and empty tokens included (split(" ", -1) semantics)
  private def refNGrams(s: String, n: Int): Seq[String] =
    s.split(" ", -1).toSeq.sliding(n, 1).filter(_.length == n)
      .map(_.mkString(" ")).distinct.toSeq

  private val textGen =
    Gen.listOf(Gen.oneOf(Gen.oneOf(' ', ' ', 'a'), Gen.alphaNumChar)).map(_.mkString)

  property("WordNGrams equals split/sliding/distinct reference") =
    Prop.forAll(textGen, Gen.chooseNum(1, 4)) { (s, n) =>
      import org.apache.spark.unsafe.types.UTF8String
      val expr = graft.functions.WordNGrams(
        org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(s)), n)
      val got = expr.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      got == refNGrams(s, n)
    }
}
