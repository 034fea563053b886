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

  /** Last-touch marketing attribution (q53): each conversion event is
    * credited to the user's LATEST touch event at-or-before it and
    * within `lookbackNs` — the classic attribution rule, which is a
    * bounded backward as-of: the same union-window formulation as
    * [[join]] (ONE user exchange, linear in rows, never a
    * conversions × touches range join), with the lookback applied to
    * the carried match afterward — a too-old last touch yields an
    * UNATTRIBUTED conversion (touch/gap null, attributed=false),
    * never a silent drop. Ties: a touch at the conversion's exact
    * timestamp counts; touches sharing (user, ts) resolve to the
    * greatest event id. Timestamps are the long-nanos events
    * contract; outputs are micros (exact ÷1000 — the corpus generates
    * micros).
    */
  def lastTouchAttribution(events: DataFrame, touchType: String,
      convType: String, lookbackNs: Long,
      tsCol: String = "ts", userCol: String = "user_id",
      idCol: String = "event_id", typeCol: String = "event_type"): DataFrame = {
    require(lookbackNs >= 0)
    val touches = events.filter(col(typeCol) === touchType)
      .select(col(userCol).as("u"), col(tsCol).as("t"),
        col(idCol).as("id"), lit(0).as("side"))
    val convs = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("u"), col(tsCol).as("t"),
        col(idCol).as("id"), lit(1).as("side"))
    // touches sort before conversions at equal ts (at-or-before), the
    // greatest id among same-ts touches is the one carried
    val w = Window.partitionBy(col("u"))
      .orderBy(col("t"), col("side"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inWindow = col("__touch.tt") >= col("t") - lit(lookbackNs)
    touches.unionByName(convs)
      .withColumn("__touch", last(when(col("side") === 0,
        struct(col("t").as("tt"), col("id").as("tid"))),
        ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("id").as("conv_id"), col("u").as("user_id"),
        expr("t div 1000").as("conv_ts_us"),
        when(inWindow, col("__touch.tid")).as("touch_id"),
        when(inWindow, expr("(t - __touch.tt) div 1000")).as("gap_us"),
        coalesce(inWindow, lit(false)).as("attributed"))
  }
}
