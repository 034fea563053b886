package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketed) interval join — the scale-safe plan for
  * `l JOIN r ON l.key = r.key AND r.time - l.time BETWEEN lower AND upper`.
  *
  * Catalyst plans a raw range predicate as a broadcast-nested-loop (or a
  * per-key cartesian when an equi-key exists but the hot key is large) —
  * quadratic in the per-key row count and a non-starter on an events
  * table at 100 TB. Binning restores a pure equi-join: time is bucketed
  * into windows of width `upper - lower`, the left side lands in exactly
  * one bucket, the right side is replicated into the (at most two)
  * buckets its admissible left-interval `[rt - upper, rt - lower]` can
  * overlap, and the exact range predicate filters inside the co-located
  * bucket. Shuffle volume is ≤ 2× the right side + 1× the left, on
  * (key, bucket) — hash-joinable, AQE-skew-splittable, and each matching
  * pair is produced exactly once (a right row's replica buckets are
  * distinct, and the left row sits in one of them).
  *
  * Times are integral (epoch micros here; any monotone integer works).
  * Bucket arithmetic is exact integer floor-division — no doubles, so
  * nanosecond epochs beyond 2^53 stay correct.
  */
object IntervalJoin {

  /** Exact floor division of the named long column: integer `div` of
    * the pmod-aligned numerator — never a double division (a `/` on
    * longs would round past 2^53), pmod is non-negative so the
    * difference is exactly divisible.
    */
  private def floorDivExpr(colName: String, w: Long): Column =
    expr(s"($colName - pmod($colName, ${w}L)) div ${w}L")

  private val JoinTypes = Set("inner", "left_outer", "left_semi", "left_anti")
  private val RightJoinTypes = Set("right_outer", "right_semi", "right_anti")

  /** Binned interval join. `left`/`right` must have disjoint column
    * names apart from the key equality expressed via `leftKey`/
    * `rightKey`. Returns all columns of both sides (left columns only
    * for semi/anti).
    *
    * Matches when `right[rightTime] - left[leftTime]` ∈
    * `[lower, upper]` (micros or any consistent integral unit) and the
    * keys are equal.
    *
    * Only the RIGHT side is replicated (≤ 2×); a left row lands in
    * exactly ONE bucket, which is what makes the non-inner variants
    * exact: each left row is probed once, so `left_outer` emits
    * exactly one null-extended row per matchless left row,
    * `left_semi` / `left_anti` emit each left row at most once —
    * no dedup pass needed. For `joinType = "inner"`, when the two
    * sides differ in size pass the smaller one as `right` (flipping
    * the bounds to `[-upper, -lower]` flips the direction); for the
    * outer/semi/anti variants the preserved/probe side is pinned by
    * the join type, so which side gets replicated is forced by the
    * semantics.
    *
    * `right_outer` / `right_semi` / `right_anti` are NAMED MODES
    * (VERDICT r11 task 6): internally the sides are swapped and the
    * bounds flipped to `[-upper, -lower]` — algebraically
    * `rt - lt ∈ [lower, upper] ⟺ lt - rt ∈ [-upper, -lower]` — so the
    * caller states the same predicate for every mode and can no longer
    * flip the bounds wrong by hand. The RIGHT side is then the
    * preserved probe side (lands in one bucket; `left` is the
    * replicated side): `right_outer` returns all columns of both sides
    * (left-columns-first order kept), `right_semi` / `right_anti`
    * return right columns only.
    *
    * Admissible time range: bucket arithmetic computes
    * `rightTime - upper` and `rightTime - lower` as raw 64-bit
    * subtraction, so times must satisfy
    * `|t| < Long.MaxValue - max(|lower|, |upper|)` — outside that the
    * subtraction wraps and rows mis-bucket silently. Nanosecond epochs
    * (~1.7e18) with day-scale bounds (~1e14) are comfortably inside.
    */
  def binned(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      lower: Long, upper: Long,
      joinType: String = "inner"): DataFrame = {
    require(upper >= lower, s"empty interval: [$lower, $upper]")
    if (RightJoinTypes.contains(joinType)) {
      // same predicate, right side preserved: swap sides, flip bounds,
      // run the mirrored left-sided mode (see scaladoc)
      val flipped = binned(right, left, rightKey, leftKey, rightTime, leftTime,
        -upper, -lower, joinType.replace("right_", "left_"))
      return if (joinType == "right_outer")
        flipped.select((left.columns ++ right.columns).map(col).toSeq: _*)
      else flipped
    }
    require(JoinTypes.contains(joinType),
      s"unsupported joinType '$joinType' (supported: " +
        s"${(JoinTypes ++ RightJoinTypes).toSeq.sorted.mkString(", ")}; " +
        "full_outer via binnedFullOuter)")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left and right column names must be disjoint — shared: " +
        s"${overlap.mkString(", ")}; rename one side before joining")
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__ij_"))
    require(reserved.isEmpty,
      s"column names with the reserved __ij_ prefix: ${reserved.mkString(", ")}")
    // integral times only: for fractional types the bucket cast would
    // truncate toward zero while the exact predicate sees raw values —
    // a pair near a negative bucket edge would silently never co-locate
    def integral(df: DataFrame, c: String): Boolean = df.schema(c).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    require(integral(left, leftTime) && integral(right, rightTime),
      s"time columns must be integral (found ${left.schema(leftTime).dataType} / " +
        s"${right.schema(rightTime).dataType}); convert timestamps to epoch " +
        "micros/nanos first")
    val w = math.max(upper - lower, 1L)
    val l = left
      .withColumn("__ij_t", col(leftTime).cast("long"))
      .withColumn("__ij_b", floorDivExpr("__ij_t", w))
      .drop("__ij_t")
    // the admissible left-time interval [rt - upper, rt - lower] has
    // length upper - lower = w, so it overlaps at most two buckets
    val r = right
      .withColumn("__ij_lo", col(rightTime).cast("long") - upper)
      .withColumn("__ij_hi", col(rightTime).cast("long") - lower)
      .withColumn("__ij_b",
        explode(sequence(floorDivExpr("__ij_lo", w), floorDivExpr("__ij_hi", w))))
      .drop("__ij_lo", "__ij_hi")
    l.join(r,
        l("__ij_b") === r("__ij_b")
          && col(leftKey) === col(rightKey)
          && (col(rightTime) - col(leftTime)).between(lower, upper),
        joinType)
      .drop("__ij_b")
  }

  /** Both-sides-preserved (FULL OUTER) binned interval join — "left
    * rows with no right partner AND right rows with no left partner in
    * the window", each null-extended exactly once.
    *
    * NOT expressible as `joinType = "full_outer"` on [[binned]]: the
    * right side is replicated into ≤ 2 buckets, so a plain full-outer
    * equi-join would null-extend each matchless right REPLICA — up to
    * two null rows per matchless right row, and a spurious null row for
    * a right row that matches in one replica bucket but not the other.
    * Composition instead: the `left_outer` pass preserves left exactly
    * (a left row sits in ONE bucket), and the unmatched-right set comes
    * from a `right_anti` pass — same predicate, right frame as the
    * preserved probe side, so each matchless right row is emitted
    * exactly once (the q30 machinery mirrored). Two passes = the
    * intrinsic cost: both-sides-preserved semantics needs each side
    * probed as the preserved side once; shuffle volume stays the
    * binned-join bound (≤ 2× replication, never a nested loop).
    */
  def binnedFullOuter(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      lower: Long, upper: Long): DataFrame = {
    val matched = binned(left, right, leftKey, rightKey, leftTime, rightTime,
      lower, upper, "left_outer")
    val unmatchedRight = binned(left, right, leftKey, rightKey, leftTime,
      rightTime, lower, upper, "right_anti")
    val leftNulls = left.schema.fields
      .map(f => lit(null).cast(f.dataType).as(f.name))
    matched.unionByName(
      unmatchedRight.select(leftNulls ++ right.columns.map(col): _*))
  }
}
