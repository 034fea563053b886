package graft

import graft.core.ErrorCapture

object ErrorCaptureTypedSpec {
  def parse(s: String): Int =
    if (s.startsWith("x")) throw new NumberFormatException(s"bad: $s") else s.toInt
}

class ErrorCaptureTypedSpec extends SparkSpec {
  import spark.implicits._
  import ErrorCaptureTypedSpec.parse

  test("map splits values and errors like captureErrors(mapper)") {
    val ds = Seq("1", "x2", "3").toDS()
    val cap = ErrorCapture.map(ds)(parse)
    assert(cap.values.collect().sorted.toSeq == Seq(1, 3))
    val errs = cap.errors.collect()
    assert(errs.length == 1)
    assert(errs.head.input.contains("x2"))
    assert(errs.head.error_class == "java.lang.NumberFormatException")
    assert(errs.head.message.contains("bad: x2"))
    assert(errs.head.stack_trace.contains("NumberFormatException"))
  }

  test("deadLetters carries description and cause") {
    val dl = ErrorCapture.map(Seq("x9").toDS())(parse).deadLetters("typed pipeline").collect()
    assert(dl.length == 1)
    assert(dl.head.description == "typed pipeline")
    assert(dl.head.cause.error_class.contains("java.lang.NumberFormatException"))
    assert(dl.head.input_value.contains("x9"))
  }

  test("mapWithKey exposes the key to the mapper") {
    val cap = ErrorCapture.mapWithKey(Seq((10, "1"), (20, "x2")).toDS()) {
      (k, v) => k + ErrorCaptureTypedSpec.parse(v)
    }
    assert(cap.values.collect().toSeq == Seq(11))
    assert(cap.errors.collect().head.input.contains("(20,x2)"))
  }

  test("flatMap captures failures of the whole expansion") {
    val cap = ErrorCapture.flatMap(Seq("2", "x1").toDS())(s => Seq.fill(parse(s))(s))
    assert(cap.values.collect().toSeq == Seq("2", "2"))
    assert(cap.errors.count() == 1)
  }

  test("mapLoggingErrors drops failures, mapDescribingErrors rethrows with input") {
    val ds = Seq("1", "x2").toDS()
    assert(ErrorCapture.mapLoggingErrors(ds)(parse).collect().toSeq == Seq(1))
    val ex = intercept[Exception] {
      ErrorCapture.mapDescribingErrors(ds)(parse).collect()
    }
    def all(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ all(t.getCause)
    assert(all(ex).exists(_.contains("x2")))
  }
}
