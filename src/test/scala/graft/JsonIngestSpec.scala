package graft

import org.apache.spark.sql.functions._
import graft.sources.JsonIngest

class JsonIngestSpec extends SparkSpec {
  import spark.implicits._

  test("parseCaptured: good records parse, malformed ones dead-letter with the raw line") {
    val df = Seq(
      """{"k": 1, "s": "a"}""",
      """{"k": 2}""",
      """{"k": 3""", // unterminated — malformed
      """not json at all""").toDF("raw")
    val ef = JsonIngest.parseCaptured(df, "raw", "k INT, s STRING")

    val ok = ef.values.select($"parsed.k").as[Int].collect().sorted
    assert(ok.toSeq === Seq(1, 2))

    val dl = ef.deadLetters("jsonl ingest")
      .select($"input_value", $"cause.error_class").as[(String, String)]
      .collect().toMap
    assert(dl.keySet === Set("""{"k": 3""", "not json at all"))
    assert(dl.values.forall(_.nonEmpty))
  }

  test("parseCaptured: schema-type mismatch is captured per record, not per job") {
    val df = Seq("""{"k": "notanint"}""", """{"k": 7}""").toDF("raw")
    val ef = JsonIngest.parseCaptured(df, "raw", "k INT")
    // PERMISSIVE would null the field; FAILFAST-under-capture must route
    // the record to errors instead
    assert(ef.values.count() === 1L)
    assert(ef.errors.count() === 1L)
  }

  test("parseCsvCaptured: malformed CSV rows dead-letter individually") {
    val df = Seq(
      "1,en,100",
      "2,fr,200",
      "3,de,notanint", // numeric field malformed
      "4,es").toDF("raw") // missing trailing field — also FAILFAST-malformed
    val ef = JsonIngest.parseCsvCaptured(df, "raw", "id BIGINT, lang STRING, n BIGINT")
    val ok = ef.values.select($"parsed.id").as[Long].collect().sorted
    assert(ok.toSeq === Seq(1L, 2L))
    val dl = ef.deadLetters("csv ingest")
      .select($"input_value", $"cause.error_class").as[(String, String)].collect()
    assert(dl.map(_._1).toSet === Set("3,de,notanint", "4,es"))
    assert(dl.forall(_._2.nonEmpty))
  }

  test("readJsonl: file round-trip splits values and dead letters") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val p = java.nio.file.Paths.get(dir, "part.jsonl")
    java.nio.file.Files.write(p,
      java.util.Arrays.asList("""{"k": 10}""", """broken{"""))
    val ef = JsonIngest.readJsonl(spark, dir, "k INT")
    assert(ef.values.select($"parsed.k").as[Int].collect().toSeq === Seq(10))
    assert(ef.errors.count() === 1L)
  }

  test("schemaDrift flags unknown and missing keys per record") {
    val df = Seq(
      """{"id": 1, "lang": "en"}""",
      """{"id": 2, "lang": "en", "new_field": "x"}""",
      """{"id": 3, "new_field": "x", "other": 1}""").toDF("js")
    val out = JsonIngest.schemaDrift(df, "js", Seq("id", "lang"))
      .select($"unknown_keys", $"missing_keys", $"drifted")
      .as[(Seq[String], Seq[String], Boolean)].collect()
    assert(out(0) == ((Seq(), Seq(), false)))
    assert(out(1) == ((Seq("new_field"), Seq(), true)))
    assert(out(2) == ((Seq("new_field", "other"), Seq("lang"), true)))
  }
}
