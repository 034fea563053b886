package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that don't need a SparkSession. */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle and vice versa") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("oracle SQL has no stray tabs or CRs (driver JSON safety)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("\r"), s"$name contains CR")
      assert(!sql.contains("\t"), s"$name contains tab")
    }
  }

  test("query names are stable snake_case identifiers") {
    SparkEntry.queries.keySet.foreach { n =>
      assert(n.matches("[a-z][a-z0-9_]+"), s"bad query name: $n")
    }
  }

  test("SURVEY §2 inventory and the query registry agree") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    val s2 = survey.substring(survey.indexOf("## §2"), survey.indexOf("## §3"))
    // query ids referenced in §2 tables (shape: prefix + digits + _name)
    val referenced = "\\b([a-z]{1,2}[0-9]{1,2}_[a-z0-9_]+)\\b".r
      .findAllMatchIn(s2).map(_.group(1)).toSet
    val registered = SparkEntry.queries.keySet
    // every §2-declared query must exist in the registry...
    val phantom = referenced -- registered
    assert(phantom.isEmpty, s"SURVEY §2 names unregistered queries: $phantom")
    // ...and every registered query must be claimed in §2
    val unlisted = registered -- referenced
    assert(unlisted.isEmpty, s"queries missing from SURVEY §2: $unlisted")
  }
}
