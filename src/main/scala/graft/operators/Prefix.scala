package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Scale-safe global cumulative sums — the two-pass partitioned
  * prefix-sum that replaces `Window.orderBy(...)` over an UNBOUNDED
  * frame (a single-task sort of the whole input at 100 TB; the r8
  * x15/t26 scale-killers):
  *
  *   1. `repartitionByRange` on the total order, pid PINNED by
  *      localCheckpoint (spark_partition_id is non-deterministic and
  *      range bounds are re-sampled per evaluation — both passes must
  *      see the SAME placement);
  *   2. per-partition subtotals collected to the driver (#partitions
  *      rows — metadata-scale, the adjudicated-fine collect class),
  *      running offsets computed there;
  *   3. one partition-LOCAL cumulative window (partitionBy pid) plus
  *      the broadcast offset — parallelism = #range partitions, no
  *      single-task sort anywhere.
  *
  * Exactness: sums are LONG (integer addition is order-independent),
  * so the result is bit-identical to the global window regardless of
  * where the range bounds land — the oracle SQL never changes.
  *
  * Inputs must be non-null longs under a TOTAL order (ties across a
  * partition boundary would split a tie group between two offsets);
  * every call site orders by a distinct key.
  */
object Prefix {

  /** `df` plus cumulative sums under `order`.
    *
    * @param sums  (input column, output alias) per running sum
    * @param keep  input columns carried through to the output
    * @return the output frame (keep ++ aliases) and the grand total
    *         per alias (driver-known — free from the offsets pass)
    */
  def cumSums(df: DataFrame, order: Seq[Column],
      sums: Seq[(String, String)],
      keep: Seq[String] = Nil): (DataFrame, Map[String, Long]) = {
    val spark = df.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(nParts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val partials = ranged.groupBy(col("__pid"))
      .agg(sums.map { case (c, a) => sum(col(c)).as(s"__p_$a") }.head,
        sums.map { case (c, a) => sum(col(c)).as(s"__p_$a") }.tail: _*)
      .orderBy(col("__pid"))
      .collect()
    // running offsets on the driver: #shuffle-partitions rows
    val acc = Array.fill(sums.size)(0L)
    val offRows = partials.map { r =>
      val row = Row.fromSeq(r.getInt(0) +: acc.toSeq)
      for (i <- sums.indices)
        acc(i) += (if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1))
      row
    }
    val offSchema = StructType(StructField("__pid", IntegerType, nullable = false) +:
      sums.map { case (_, a) => StructField(s"__off_$a", LongType, nullable = false) })
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows.toIndexedSeq, 1), offSchema)
    val wLoc = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = ranged.join(broadcast(offsets), Seq("__pid"))
      .select(keep.map(col) ++ sums.map { case (c, a) =>
        (sum(col(c)).over(wLoc) + col(s"__off_$a")).as(a) }: _*)
    (out, sums.map(_._2).zip(acc).toMap)
  }

  /** Global row numbers (1-based) under `order` — `row_number()` over
    * an unpartitioned window, without the single-task sort: a
    * cumulative sum of 1 through [[cumSums]].
    */
  def rowNumbers(df: DataFrame, order: Seq[Column], alias: String,
      keep: Seq[String]): DataFrame =
    cumSums(df.withColumn("__one", lit(1L)), order,
      Seq("__one" -> alias), keep)._1

  /** Per-GROUP cumulative sums for LOW-cardinality groups — the same
    * scale trap as the global window in disguise: `Window.partitionBy
    * (shape)` over 200 shapes pushes billions of rows through 200
    * tasks regardless of cluster size. Identical two-pass shape:
    * range-partition on (groups ++ order) so each group spans
    * contiguous partitions, per-(partition, group) subtotals to the
    * driver (≤ #partitions × #groups rows — the LOW-cardinality
    * premise), per-group running offsets broadcast back into a
    * (partition, group)-local window. High-cardinality groups don't
    * need this — a plain partitionBy window already parallelizes.
    * Group values must be NON-NULL (the offsets equi-join would drop
    * null-group rows); sums are non-null longs as in [[cumSums]].
    */
  def groupedCumSums(df: DataFrame, groups: Seq[String], order: Seq[Column],
      sums: Seq[(String, String)], keep: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(nParts, (groups.map(col) ++ order): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val aggs = sums.map { case (c, a) => sum(col(c)).as(s"__p_$a") }
    // Driver-size guard on the low-cardinality premise: the subtotal
    // frame is ≤ #partitions × #groups rows, and a caller violating the
    // premise (e.g. a grouping key that is really a row id) would turn
    // this into an unbounded driver collect. limit(max+1) bounds what
    // ever reaches the driver; the overflow fails loudly instead of
    // OOMing it. High-cardinality groups should use a plain
    // Window.partitionBy(groups) — that shape already parallelizes.
    val maxPartials =
      spark.conf.get("spark.graft.prefix.maxGroupPartials", "262144").toInt
    val partials = ranged.groupBy((col("__pid") +: groups.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .limit(maxPartials + 1)
      .collect()
    require(partials.length <= maxPartials,
      s"groupedCumSums: over $maxPartials (partition, group) subtotals - " +
        s"group cardinality too high for the driver-offset path; use a " +
        s"plain Window.partitionBy(${groups.mkString(",")}) instead, or " +
        s"raise spark.graft.prefix.maxGroupPartials")
    val offRows = partials
      .groupBy(r => groups.indices.map(i => r.get(i + 1)))
      .values.flatMap { rs =>
        val acc = Array.fill(sums.size)(0L)
        rs.sortBy(_.getInt(0)).map { r =>
          val row = Row.fromSeq(r.getInt(0) +:
            (groups.indices.map(i => r.get(i + 1)) ++ acc.toSeq))
          for (i <- sums.indices) {
            val v = r.get(groups.size + 1 + i)
            acc(i) += (if (v == null) 0L else v.asInstanceOf[Long])
          }
          row
        }
      }.toIndexedSeq
    val groupFields = groups.map(g => df.schema(g))
    val offSchema = StructType(
      (StructField("__pid", IntegerType, nullable = false) +: groupFields) ++
        sums.map { case (_, a) =>
          StructField(s"__off_$a", LongType, nullable = false) })
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    val wLoc = Window.partitionBy((col("__pid") +: groups.map(col)): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offsets), "__pid" +: groups)
      .select(keep.map(col) ++ sums.map { case (c, a) =>
        (sum(col(c)).over(wLoc) + col(s"__off_$a")).as(a) }: _*)
  }
}
