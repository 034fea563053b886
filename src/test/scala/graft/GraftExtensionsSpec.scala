package graft

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("try_capture is callable from SQL after registration") {
    Graft.register(spark)
    Seq("5", "junk").toDF("s").createOrReplaceTempView("raw_input")
    val rows = spark.sql(
      """SELECT s, c.value AS v, c.error_class AS ec
        |FROM (SELECT s, try_capture(cast(s AS int)) AS c FROM raw_input)
        |ORDER BY s""".stripMargin).collect()
    assert(rows.length == 2)
    val good = rows.find(_.getString(0) == "5").get
    assert(good.getInt(1) == 5 && good.isNullAt(2))
    val bad = rows.find(_.getString(0) == "junk").get
    assert(bad.isNullAt(1) && bad.getString(2) == "org.apache.spark.SparkNumberFormatException")
  }
}
