package graft

import org.apache.spark.sql.functions._

import graft.functions.TryCapture

class TryCaptureSpec extends SparkSpec {
  import spark.implicits._

  test("success rows carry value, error fields null") {
    val df = Seq("1", "2").toDF("s")
      .select(TryCapture(expr("cast(s as int)")).as("c"))
      .select($"c.value", $"c.error_class")
    val rows = df.collect()
    assert(rows.map(_.getInt(0)).toSet == Set(1, 2))
    assert(rows.forall(_.isNullAt(1)))
  }

  test("failing rows carry error_class/message/stack_trace, value null") {
    val df = Seq("1", "boom").toDF("s")
      .select($"s", TryCapture(expr("cast(s as int)")).as("c"))
    val bad = df.filter($"c.error_class".isNotNull).select($"s", $"c.*").collect()
    assert(bad.length == 1)
    val r = bad.head
    assert(r.getString(0) == "boom")
    assert(r.isNullAt(1)) // value
    assert(r.getString(2) == "org.apache.spark.SparkNumberFormatException")
    assert(r.getString(3).contains("boom"))   // message mentions input
    assert(r.getString(4).contains("at "))    // stack trace frames
  }

  test("interpreted eval matches codegen results") {
    val data = Seq("7", "x", "42").toDF("s")
    val capture = TryCapture(expr("100 div cast(s as int)")).as("c")
    val viaCodegen = data.select(capture).select($"c.value", $"c.error_class").collect()
    // force interpreted path by evaluating through a non-codegen context:
    val viaFilterEval = data.select(capture)
      .select($"c.value", $"c.error_class").where(lit(true)).collect()
    assert(viaCodegen.map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq ==
      viaFilterEval.map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq)
  }

  test("direct interpreted eval matches DataFrame (codegen) results") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    import org.apache.spark.sql.types.IntegerType
    // interpreted path: eval() directly, no codegen involved
    val ok = TryCapture(Cast(Literal("7"), IntegerType, ansiEnabled = true))
      .eval(InternalRow.empty).asInstanceOf[InternalRow]
    assert(ok.getInt(0) == 7 && ok.isNullAt(1))
    val bad = TryCapture(Cast(Literal("nope"), IntegerType, ansiEnabled = true))
      .eval(InternalRow.empty).asInstanceOf[InternalRow]
    assert(bad.isNullAt(0))
    assert(bad.getUTF8String(1).toString == "org.apache.spark.SparkNumberFormatException")
    assert(bad.getUTF8String(3).toString.contains("at "))
  }

  test("withStackTrace=false leaves stack_trace null but keeps class/message") {
    val df = Seq("boom").toDF("s")
      .select(TryCapture(expr("cast(s as int)"), withStackTrace = false).as("c"))
      .select($"c.error_class", $"c.stack_trace").collect().head
    assert(df.getString(0) == "org.apache.spark.SparkNumberFormatException")
    assert(df.isNullAt(1))
  }

  test("foldable failing child is captured, not thrown at planning time") {
    Graft.register(spark)
    // child is a constant-foldable expression that throws under ANSI:
    // ConstantFolding must not evaluate it outside the capture.
    val r = spark.sql("SELECT try_capture(cast('xx' as int)) AS c")
      .select($"c.value", $"c.error_class").collect().head
    assert(r.isNullAt(0))
    assert(r.getString(1) == "org.apache.spark.SparkNumberFormatException")
  }

  test("null input propagates as null value, not error") {
    val df = Seq(Some("3"), None).toDF("s")
      .select(TryCapture(expr("cast(s as int)")).as("c"))
      .select($"c.value", $"c.error_class").collect()
    assert(df.count(_.isNullAt(0)) == 1)
    assert(df.forall(_.isNullAt(1)))
  }
}
