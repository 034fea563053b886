package graft

import org.apache.spark.sql.functions._

import graft.testkit.ErrorCaptureTestKit

/** Written as a DOWNSTREAM user would write it: only the public
  * graft API + the published testkit, no internal spec helpers — the
  * proof that the fixtures are usable outside this repo (the role of the
  * reference's error-handling-core testFixtures consumers).
  */
class TestKitSpec extends SparkSpec {
  import spark.implicits._

  test("a user capture topology splits cleanly through the testkit") {
    val input = Seq(("a", "10"), ("b", "snake"), ("c", "30"), ("d", "4x")).toDF("id", "raw")
    val r = ErrorCaptureTestKit.runCapture(input,
      Map("parsed" -> expr("cast(raw as int)")), inputCol = $"raw", description = "user job")
    assert(r.values.select($"parsed").as[Int].collect().sorted.toSeq == Seq(10, 30))
    assert(r.errors.select($"id").as[String].collect().sorted.toSeq == Seq("b", "d"))
    assert(r.deadLetters.select($"description").distinct().as[String].head() == "user job")
  }

  test("testkit poison column fails exactly the marked rows") {
    val input = Seq(1, 2, 3, 4).toDF("n")
    val r = ErrorCaptureTestKit.runCapture(input,
      Map("out" -> ErrorCaptureTestKit.poison($"n" % 2 === 0, $"n" * 10)), inputCol = $"n")
    assert(r.values.select($"out").as[Int].collect().sorted.toSeq == Seq(10, 30))
    assert(r.errors.count() == 2)
  }

  test("DLQ JSON round trip is lossless via the testkit serde check") {
    val input = Seq(("x", "nope")).toDF("id", "raw")
    val dl = ErrorCaptureTestKit.runCapture(input,
      Map("v" -> expr("cast(raw as int)")), inputCol = $"raw").deadLetters
    val back = ErrorCaptureTestKit.dlqJsonRoundTrip(dl)
    assert(back.select($"input_value").as[String].head() == "nope")
  }

  test("recoverable classifier fixture routes the named class to retry") {
    val c = ErrorCaptureTestKit.recoverableClassifier
    assert(c.isRecoverable(ErrorCaptureTestKit.recoverableErrorClass))
    assert(!c.isRecoverable("org.apache.spark.SparkNumberFormatException"))
  }

  test("streaming capture fixture runs batches through values/DLQ sinks") {
    val (values, dlq) = ErrorCaptureTestKit.runStreamingCapture(spark,
      batches = Seq(Seq("1", "zap"), Seq("3")),
      results = Map("v" -> expr("cast(s as int)")))
    assert(values.select($"v").as[Int].collect().sorted.toSeq == Seq(1, 3))
    assert(dlq.select($"input_value").as[String].collect().toSeq == Seq("zap"))
  }
}
