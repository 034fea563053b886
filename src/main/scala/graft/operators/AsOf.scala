package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with rightTime <= leftTime for the same key.
  *
  * Spark has no native as-of join; the naive formulation (range join +
  * per-left-row top-1) explodes quadratically on hot keys. This is the
  * scalable union-window formulation instead: tag both sides, union,
  * ONE window pass per key ordered by (time, side, tiebreak) carrying the
  * last-seen right row forward — a single shuffle on the key, linear in
  * rows, no range join.
  */
object AsOf {

  /** @param rightTieBreak orders right rows that share (key, time); the
    *   carried match is the greatest. Pass a unique column for
    *   deterministic results.
    */
  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: Column, rightTime: Column,
      rightTieBreak: Column = lit(0)): DataFrame = {
    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val rStruct = struct(right.columns.map(col).toSeq: _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val lp = left.select(
      col(leftKey).as("__k"), leftTime.cast("timestamp").as("__t"),
      lit(1).as("__side"), lit(0L).as("__tb"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val rp = right.select(
      col(rightKey).as("__k"), rightTime.cast("timestamp").as("__t"),
      lit(0).as("__side"), rightTieBreak.cast("long").as("__tb"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"))

    // rights sort before lefts at equal time (asof is >=), tiebreak last
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lp.unionByName(rp)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: Seq(col("__match")): _*)
  }
}
