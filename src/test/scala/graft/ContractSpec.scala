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
}
