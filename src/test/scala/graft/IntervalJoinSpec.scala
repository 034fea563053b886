package graft

import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Reference semantics: plain (quadratic) range join. Returns the
    * MULTISET of matches — duplicate right rows legitimately produce
    * duplicate output tuples.
    */
  private def naive(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long)],
      lower: Long, upper: Long): Seq[(Long, Long, Long)] =
    for {
      (lk, lid, lt) <- left
      (rk, rt) <- right
      if lk == rk && rt - lt >= lower && rt - lt <= upper
    } yield (lid, lt, rt)

  private val left = Seq(
    (1L, 10L, 1000L), (1L, 11L, 1999L), (1L, 12L, 5000L),
    (2L, 20L, 1000L), (3L, 30L, 0L))
  private val right = Seq(
    (1L, 1000L), (1L, 1500L), (1L, 2000L), (1L, 2999L), (1L, 3000L),
    (2L, 5000L), (3L, 999L))

  private def run(lower: Long, upper: Long): Set[(Long, Long, Long)] =
    IntervalJoin.binned(
        left.toDF("lk", "lid", "lt"), right.toDF("rk", "rt"),
        "lk", "rk", "lt", "rt", lower, upper)
      .select($"lid", $"lt", $"rt")
      .as[(Long, Long, Long)].collect().toSet

  test("binned matches the naive range join, pairs exactly once") {
    for ((lo, hi) <- Seq((0L, 1000L), (-500L, 500L), (1L, 1L), (-2000L, -1L))) {
      assert(run(lo, hi) === naive(left, right, lo, hi).toSet, s"bounds [$lo,$hi]")
    }
    // duplicate-producing check: collect with multiplicity
    val withDupes = IntervalJoin.binned(
        left.toDF("lk", "lid", "lt"), right.toDF("rk", "rt"),
        "lk", "rk", "lt", "rt", 0L, 1000L)
      .groupBy($"lid", $"rt").agg(count(lit(1)).as("n"))
      .filter($"n" > 1).count()
    assert(withDupes === 0L, "a pair was emitted more than once")
  }

  test("bucket arithmetic is exact for negative and huge (ns-scale) times") {
    val l = Seq((1L, 1L, -5_000_000_000L), (1L, 2L, 1_700_000_000_000_000_000L))
      .toDF("lk", "lid", "lt")
    val r = Seq((1L, -5_000_000_100L), (1L, -4_999_998_000L),
      (1L, 1_700_000_000_000_000_500L)).toDF("rk", "rt")
    val got = IntervalJoin.binned(l, r, "lk", "rk", "lt", "rt", -500L, 1000L)
      .select($"lid", $"rt").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, -5_000_000_100L), (2L, 1_700_000_000_000_000_500L)))
  }

  test("seeded random bulk: binned equals naive across odd bounds") {
    val rnd = new scala.util.Random(42)
    val bl = Seq.tabulate(300)(i =>
      (rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(10000).toLong - 5000L))
    val br = Seq.tabulate(500)(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong - 5000L))
    for ((lo, hi) <- Seq((-137L, 263L), (0L, 997L), (-1L, 0L), (500L, 501L))) {
      val got = IntervalJoin.binned(
          bl.toDF("lk", "lid", "lt"), br.toDF("rk", "rt"),
          "lk", "rk", "lt", "rt", lo, hi)
        .select($"lid", $"lt", $"rt")
        .as[(Long, Long, Long)].collect()
      // multiset equality: duplicate right rows produce duplicate tuples
      assert(got.sorted.toSeq === naive(bl, br, lo, hi).sorted, s"bounds [$lo,$hi]")
    }
  }

  test("left_outer: one null-extended row per matchless left row, same matches as inner") {
    for ((lo, hi) <- Seq((0L, 1000L), (-500L, 500L), (1L, 1L), (-2000L, -1L))) {
      val outer = IntervalJoin.binned(
          left.toDF("lk", "lid", "lt"), right.toDF("rk", "rt"),
          "lk", "rk", "lt", "rt", lo, hi, joinType = "left_outer")
        .select($"lid", $"lt", $"rt")
        .as[(Long, Long, Option[Long])].collect().toSeq
      val inner = naive(left, right, lo, hi)
      val matchedIds = inner.map(_._1).toSet
      // matched part equals the inner join, with multiplicity
      assert(outer.filter(_._3.isDefined).map(t => (t._1, t._2, t._3.get)).sorted
        === inner.sorted, s"bounds [$lo,$hi]")
      // every matchless left row appears exactly once, null-extended
      val unmatched = outer.filter(_._3.isEmpty).map(_._1).sorted
      assert(unmatched === left.map(_._2).filterNot(matchedIds).sorted, s"bounds [$lo,$hi]")
    }
  }

  test("left_semi / left_anti: each left row at most once, partitioning the left side") {
    for ((lo, hi) <- Seq((0L, 1000L), (-500L, 500L), (1L, 1L))) {
      val matchedIds = naive(left, right, lo, hi).map(_._1).toSet
      val semi = IntervalJoin.binned(
          left.toDF("lk", "lid", "lt"), right.toDF("rk", "rt"),
          "lk", "rk", "lt", "rt", lo, hi, joinType = "left_semi")
        .select($"lid").as[Long].collect().toSeq
      val anti = IntervalJoin.binned(
          left.toDF("lk", "lid", "lt"), right.toDF("rk", "rt"),
          "lk", "rk", "lt", "rt", lo, hi, joinType = "left_anti")
        .select($"lid").as[Long].collect().toSeq
      assert(semi.sorted === left.map(_._2).filter(matchedIds).sorted, s"bounds [$lo,$hi]")
      assert(anti.sorted === left.map(_._2).filterNot(matchedIds).sorted, s"bounds [$lo,$hi]")
      // no duplicates even though the right side is replicated ≤2×
      assert(semi.distinct.length === semi.length && anti.distinct.length === anti.length)
    }
  }

  test("right_outer/right_semi/right_anti: named modes equal the swapped formulation") {
    // the named right-sided modes exist so callers can't hand-flip the
    // bounds wrong (VERDICT r11 task 6): each must equal the
    // oracle-verified swapped formulation binned(right, left, ...,
    // [-hi, -lo], left_*) — same predicate, right side preserved
    val l = left.toDF("lk", "lid", "lt")
    val r = right.toDF("rk", "rt")
    for ((lo, hi) <- Seq((0L, 1000L), (-500L, 500L), (1L, 1L), (-2000L, -1L))) {
      // right_outer ≡ swapped left_outer (columns reordered left-first)
      val ro = IntervalJoin.binned(l, r, "lk", "rk", "lt", "rt", lo, hi,
          joinType = "right_outer")
      assert(ro.columns.toSeq === Seq("lk", "lid", "lt", "rk", "rt"),
        "right_outer must keep left-columns-first order")
      val roRows = ro.select($"lid", $"rk", $"rt")
        .as[(Option[Long], Long, Long)].collect().toSeq
      val swappedOuter = IntervalJoin.binned(r, l, "rk", "lk", "rt", "lt",
          -hi, -lo, joinType = "left_outer")
        .select($"lid", $"rk", $"rt")
        .as[(Option[Long], Long, Long)].collect().toSeq
      assert(roRows.sorted === swappedOuter.sorted, s"bounds [$lo,$hi]")
      // and directly against naive semantics: matched = inner join with
      // multiplicity; each matchless RIGHT row exactly once, null-extended
      val inner = naive(left, right, lo, hi)
      assert(roRows.filter(_._1.isDefined).map(t => (t._1.get, t._3)).sorted
        === inner.map(t => (t._1, t._3)).sorted, s"bounds [$lo,$hi]")
      val matchedR = (for {
        (lk, _, lt) <- left; (rk, rt) <- right
        if lk == rk && rt - lt >= lo && rt - lt <= hi
      } yield (rk, rt)).toSet
      assert(roRows.filter(_._1.isEmpty).map(t => (t._2, t._3)).sorted
        === right.filterNot(matchedR).sorted, s"bounds [$lo,$hi]")
      // right_semi / right_anti partition the right side, each row ≤ once
      val semi = IntervalJoin.binned(l, r, "lk", "rk", "lt", "rt", lo, hi,
          joinType = "right_semi")
        .as[(Long, Long)].collect().toSeq
      val anti = IntervalJoin.binned(l, r, "lk", "rk", "lt", "rt", lo, hi,
          joinType = "right_anti")
        .as[(Long, Long)].collect().toSeq
      assert(semi.sorted === right.filter(matchedR).sorted, s"bounds [$lo,$hi]")
      assert(anti.sorted === right.filterNot(matchedR).sorted, s"bounds [$lo,$hi]")
      assert(semi.distinct.length === semi.length && anti.distinct.length === anti.length)
    }
  }

  test("full_outer: matched part = inner; each matchless row on EITHER side exactly once") {
    for ((lo, hi) <- Seq((0L, 1000L), (-500L, 500L), (1L, 1L), (-2000L, -1L))) {
      val fo = IntervalJoin.binnedFullOuter(
          left.toDF("lk", "lid", "lt"), right.toDF("rk", "rt"),
          "lk", "rk", "lt", "rt", lo, hi)
        .select($"lid", $"lt", $"rk", $"rt")
        .as[(Option[Long], Option[Long], Option[Long], Option[Long])]
        .collect().toSeq
      val inner = naive(left, right, lo, hi)
      // matched rows equal the inner join, with multiplicity
      assert(fo.filter(t => t._1.isDefined && t._4.isDefined)
        .map(t => (t._1.get, t._2.get, t._4.get)).sorted === inner.sorted,
        s"bounds [$lo,$hi]")
      // every matchless left row exactly once, right-null-extended
      val matchedL = inner.map(_._1).toSet
      assert(fo.filter(t => t._1.isDefined && t._4.isEmpty).map(_._1.get).sorted
        === left.map(_._2).filterNot(matchedL).sorted, s"bounds [$lo,$hi]")
      // every matchless right row exactly once, left-null-extended —
      // the ≤2× replication must NOT duplicate the null extension
      val matchedR = (for {
        (lk, _, lt) <- left; (rk, rt) <- right
        if lk == rk && rt - lt >= lo && rt - lt <= hi
      } yield (rk, rt)).toSet
      assert(fo.filter(_._1.isEmpty).map(t => (t._3.get, t._4.get)).sorted
        === right.filterNot(matchedR).sorted, s"bounds [$lo,$hi]")
    }
  }

  test("guards: shared names, reserved prefix, fractional times all fail fast") {
    val l = left.toDF("lk", "lid", "lt")
    val r = right.toDF("rk", "rt")
    intercept[IllegalArgumentException] { // shared column name
      IntervalJoin.binned(l, right.toDF("lk", "rt"), "lk", "lk", "lt", "rt", 0L, 1L)
    }
    intercept[IllegalArgumentException] { // reserved prefix
      IntervalJoin.binned(l.withColumnRenamed("lid", "__ij_x"), r,
        "lk", "rk", "lt", "rt", 0L, 1L)
    }
    intercept[IllegalArgumentException] { // fractional time column
      IntervalJoin.binned(l.withColumn("lt", $"lt".cast("double")), r,
        "lk", "rk", "lt", "rt", 0L, 1L)
    }
  }

  test("plan is an equi-join (hash/merge), not a nested loop") {
    val df = IntervalJoin.binned(
      left.toDF("lk", "lid", "lt"), right.toDF("rk", "rt"),
      "lk", "rk", "lt", "rt", 0L, 1000L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
  }
}
