package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics (quantile boundaries) WITHOUT a
  * per-key full sort.
  *
  * The classic per-key window (`row_number() over (partition by key order
  * by v)`) sorts the entire table with one task per key — at 100 TB and a
  * 3-value key that is tens of TB per task. This operator instead runs
  * the textbook distributed selection:
  *
  *  1. one aggregate pass for per-key (count, min, max);
  *  2. one aggregate pass for per-(key, range-bucket) counts — the bucket
  *     of a row is a MONOTONE function of its value, so cumulative bucket
  *     counts give every bucket's global rank offset;
  *  3. only the few buckets containing a requested index (≤ 2 per
  *     quantile per key, expected n/buckets rows each) are joined back,
  *     locally sorted, and probed for the exact boundary rows.
  *
  * Every join below broadcasts a key-cardinality-bounded side; the only
  * sort touches the selected buckets. All arithmetic on the VALUES is
  * plain comparison/selection — results are bit-identical to the full
  * sort for any input.
  */
object Quantiles {

  /** Per-(key, quantile) exact boundary rows: returns
    * `(keyCol, q, lo, hi, n)` where `lo`/`hi` are the values at global
    * 0-based indices `floor(q*(n-1))` / `ceil(q*(n-1))` in the per-key
    * value order — the two rows linear interpolation needs.
    *
    * `keyCol` is expected to be low-cardinality (a report dimension):
    * stats/bucket frames are ~`keys × buckets` rows and get broadcast.
    *
    * NULL values are excluded from ranks and counts (SQL quantile
    * semantics); a key whose values are ALL null yields no output rows.
    */
  def boundaries(df0: DataFrame, keyCol: String, valCol: String,
      qs: Seq[Double], buckets: Int = 1024): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    // NULL values carry no rank: drop them up front and count only
    // non-null rows (DuckDB/SQL quantile semantics). Without this,
    // bucketOf(null) -> least(null, ...) skips the null and lands the row
    // in the LAST bucket while __n still counts it — silently wrong
    // quantiles on any column with nulls.
    val df = df0.select(col(keyCol).as("__k"), col(valCol).as("__v"))
      .filter(col("__v").isNotNull)

    // pass 1: per-key count/min/max over non-null values
    val stats = df.groupBy(col("__k"))
      .agg(count(lit(1)).as("__n"), min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))

    // requested global indices: floor/ceil of q*(n-1) per key
    val targets = stats
      .select(col("__k"), col("__n"), explode(array(qs.map(lit): _*)).as("__q"))
      .withColumn("__pos", col("__q") * (col("__n") - 1))
    val idx = targets.select(col("__k"), col("__q"),
        floor(col("__pos")).cast("long").as("__idx"), lit("lo").as("__role"))
      .union(targets.select(col("__k"), col("__q"),
        ceil(col("__pos")).cast("long").as("__idx"), lit("hi").as("__role")))

    selectRows(df, stats, idx, buckets)
      .groupBy(col("__k"), col("__q"))
      .agg(max(when(col("__role") === "lo", col("__v"))).as("lo"),
        max(when(col("__role") === "hi", col("__v"))).as("hi"))
      .join(broadcast(stats.select(col("__k"), col("__n"))), "__k")
      .select(col("__k").as(keyCol), col("__q").as("q"),
        col("lo"), col("hi"), col("__n").as("n"))
  }

  /** SQL `percentile_disc`: the EXACT rank-based percentile — the
    * smallest value whose cumulative fraction reaches q, i.e. the
    * 0-based order statistic at max(0, ceil(q·n) − 1). No
    * interpolation, so the result is always a VALUE FROM THE DATA
    * (what "p95 latency" dashboards mean); arithmetic is one double
    * product + ceil, mirrored in the oracle. Same distributed
    * selection as [[boundaries]] — no per-key sort at any scale.
    */
  def discrete(df0: DataFrame, keyCol: String, valCol: String,
      qs: Seq[Double], buckets: Int = 1024): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    val df = df0.select(col(keyCol).as("__k"), col(valCol).as("__v"))
      .filter(col("__v").isNotNull)
    val stats = df.groupBy(col("__k"))
      .agg(count(lit(1)).as("__n"), min(col("__v")).as("__mn"),
        max(col("__v")).as("__mx"))
    val idx = stats
      .select(col("__k"), col("__n"), explode(array(qs.map(lit): _*)).as("__q"))
      .select(col("__k"), col("__q"),
        greatest(ceil(col("__q") * col("__n")).cast("long") - 1L, lit(0L))
          .as("__idx"),
        lit("v").as("__role"))
    selectRows(df, stats, idx, buckets)
      .select(col("__k").as(keyCol), col("__q").as("q"), col("__v").as("pct"))
  }

  /** Shared selection core: given per-(key, q, role) 0-based global
    * indices into the per-key value order, return the exact rows —
    * cumulative range-bucket counts locate each index's bucket, only
    * target buckets sort. Emits (__k, __q, __role, __idx, __v).
    */
  private def selectRows(df: DataFrame, stats: DataFrame, idx: DataFrame,
      buckets: Int): DataFrame = {
    // bucket index: monotone in __v given (mn, mx), so per-bucket ranges
    // are contiguous runs of the per-key value order
    def bucketOf(v: Column, mn: Column, mx: Column): Column =
      when(mx > mn,
        least(floor((v.cast("double") - mn.cast("double"))
          / (mx.cast("double") - mn.cast("double")) * buckets), lit(buckets - 1))
          .cast("int"))
        .otherwise(0)

    // pass 2: per-(key, bucket) counts + cumulative offset of each bucket
    val counts = df.join(broadcast(stats), "__k")
      .select(col("__k"), bucketOf(col("__v"), col("__mn"), col("__mx")).as("__b"))
      .groupBy(col("__k"), col("__b")).agg(count(lit(1)).as("__c"))
    val cum = counts.withColumn("__before",
      coalesce(sum(col("__c")).over(Window.partitionBy(col("__k")).orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))

    // locate the bucket holding each index (tiny × tiny range join)
    val located = idx.as("i")
      .join(cum.as("c"), col("i.__k") === col("c.__k")
        && col("i.__idx") >= col("c.__before")
        && col("i.__idx") < col("c.__before") + col("c.__c"))
      .select(col("i.__k").as("__k"), col("i.__q").as("__q"),
        col("i.__role").as("__role"), col("i.__idx").as("__idx"),
        col("c.__b").as("__b"), col("c.__before").as("__before"))

    // pass 3: sort ONLY the target buckets; global rank = offset + local rank
    val targetBuckets = located.select(col("__k"), col("__b")).distinct()
    val picked = df.join(broadcast(stats), "__k")
      .select(col("__k"), col("__v"),
        bucketOf(col("__v"), col("__mn"), col("__mx")).as("__b"))
      .join(broadcast(targetBuckets), Seq("__k", "__b"))
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("__k"), col("__b"))
          .orderBy(col("__v"))).cast("long") - 1)
    val values = picked.as("p")
      .join(broadcast(located).as("l"),
        col("p.__k") === col("l.__k") && col("p.__b") === col("l.__b")
          && col("p.__rn") + col("l.__before") === col("l.__idx"))
      .select(col("p.__k").as("__k"), col("l.__q").as("__q"),
        col("l.__role").as("__role"), col("p.__v").as("__v"))
    values
  }

  /** SQL `percentile_cont`: the linear interpolation between
    * [[boundaries]]' two exact boundary rows — `lo + (hi-lo) * frac`
    * at `frac = q*(n-1) - floor(q*(n-1))`, every op a plain double
    * (deterministic, engine-reproducible: the oracle states the SAME
    * three ops). Same distributed-selection cost as boundaries — no
    * per-key full sort ever; the interpolation is one projection.
    */
  def interpolated(df: DataFrame, keyCol: String, valCol: String,
      qs: Seq[Double], buckets: Int = 1024): DataFrame = {
    val pos = col("q") * (col("n") - lit(1))
    boundaries(df, keyCol, valCol, qs, buckets)
      .select(col(keyCol), col("q"),
        (col("lo").cast("double")
          + (col("hi").cast("double") - col("lo").cast("double"))
            * (pos - floor(pos))).as("pct"))
  }
}
