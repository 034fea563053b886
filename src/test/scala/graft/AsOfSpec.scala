package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof join picks latest right row at-or-before left time per key") {
    val trades = Seq(
      ("A", ts("2024-01-01 10:00:05"), 1L),
      ("A", ts("2024-01-01 10:00:00"), 2L),   // exactly at a quote time
      ("B", ts("2024-01-01 09:59:00"), 3L))   // before any B quote
      .toDF("sym", "t", "trade_id")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:03"), 101.0),
      ("B", ts("2024-01-01 10:00:00"), 50.0))
      .toDF("qsym", "qt", "px")

    val out = AsOf.join(trades, quotes, "sym", "qsym", $"t", $"qt")
      .select($"trade_id", $"__match.px".as("px"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(101.0))  // latest quote <= 10:00:05
    assert(out(2L).contains(100.0))  // equal time matches (>= semantics)
    assert(out(3L).isEmpty)          // no quote yet -> null match
  }

  test("tie-break picks greatest tiebreak among equal-time right rows") {
    val l = Seq(("k", ts("2024-01-01 12:00:00"), 1L)).toDF("k", "t", "id")
    val r = Seq(("k", ts("2024-01-01 11:00:00"), 7L, "first"),
      ("k", ts("2024-01-01 11:00:00"), 9L, "second"))
      .toDF("rk", "rt", "seq", "tag")
    val m = AsOf.join(l, r, "k", "rk", $"t", $"rt", rightTieBreak = $"seq")
      .select($"__match.tag").as[String].collect()
    assert(m.toSeq == Seq("second"))
  }
}
