package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def countShuffles(p: SparkPlan): Int =
    graft.sources.Layout.flattenPlan(p).count(_.isInstanceOf[ShuffleExchangeExec])

  test("bucketed tables join with zero exchanges (bucketed scans carry the join)") {
    val tmp = java.nio.file.Files.createTempDirectory("bucketspec").toString
    try {
      val left = (0 until 1000).map(i => (i.toLong, s"p${i % 5}")).toDF("k", "prio")
      val right = (0 until 5000).map(i => ((i % 1000).toLong, i.toDouble)).toDF("k2", "qty")
      // repartition on the bucket key BEFORE the bucketed write: one
      // task per bucket -> ONE file per bucket instead of
      // tasks × buckets slivers. (The merge-join's partition-local Sort
      // still appears: since 3.0 Spark ignores bucket sortBy order on
      // read unless spark.sql.legacy.bucketedTableScan.outputOrdering
      // is set — the win under test is the absent Exchange, which is
      // the part that costs a network pass at 100 TB.)
      left.repartition(4, $"k")
        .write.format("parquet").bucketBy(4, "k").sortBy("k")
        .option("path", s"$tmp/left").saveAsTable("bspec_left")
      right.repartition(4, $"k2")
        .write.format("parquet").bucketBy(4, "k2").sortBy("k2")
        .option("path", s"$tmp/right").saveAsTable("bspec_right")
      // hint("merge"): without it the planner broadcasts the small side
      // and disables the bucketed scan — fine at spec scale, but the
      // property under test is the 100-TB shape where neither side
      // broadcasts and the buckets must carry the join
      val joined = spark.table("bspec_left").hint("merge")
        .join(spark.table("bspec_right"), $"k" === $"k2")
      assert(joined.count() === 5000L)
      // the bucketed layout IS the shuffle: the join must not add one
      assert(countShuffles(joined.queryExecution.executedPlan) === 0,
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
      // both sides must actually scan through the bucketed layout
      // (a planner fallback to a plain file scan would also show zero
      // shuffles here only by broadcasting — which the merge hint bars)
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("SelectedBucketsCount") || planStr.contains("Bucketed: true"),
        s"scan did not use bucketed layout:\n$planStr")
      info(s"bucketed join plan:\n$planStr")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_left")
      spark.sql("DROP TABLE IF EXISTS bspec_right")
      SparkEntry.rmTree(tmp)
    }
  }
}
