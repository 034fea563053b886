package graft

import org.apache.spark.sql.functions._

import graft.operators.TopK
import graft.plans.TopKPerKeyExec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  // AQE wraps the final plan: unwrap AdaptiveSparkPlanExec (and any
  // nested query-stage reuse) before hunting for the operator
  private def topKExec(df: org.apache.spark.sql.DataFrame): TopKPerKeyExec = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def find(p: SparkPlan): Seq[TopKPerKeyExec] = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case q: QueryStageExec => find(q.plan)
      case e: TopKPerKeyExec => Seq(e)
      case other => other.children.flatMap(find)
    }
    find(df.queryExecution.executedPlan).head
  }

  private val scores = Seq(
    ("a", 1L, 0.9), ("a", 2L, 0.7), ("a", 3L, 0.8), ("a", 4L, 0.1),
    ("b", 5L, 0.5), ("b", 6L, 0.6),
    ("c", 7L, 0.3)).toDF("k", "id", "score")

  test("TopK.perKey equals the window row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    val viaOperator = TopK.perKey(scores,
        keys = Seq("k"), orderBy = Seq(TopK.desc("score"), TopK.asc("id")), k = 2)
      .select($"k", $"id").as[(String, Long)].collect().toSet
    val viaWindow = scores.withColumn("rn", row_number().over(
        Window.partitionBy($"k").orderBy($"score".desc, $"id".asc)))
      .filter($"rn" <= 2)
      .select($"k", $"id").as[(String, Long)].collect().toSet
    assert(viaOperator == viaWindow)
    assert(viaOperator == Set(("a", 1L), ("a", 3L), ("b", 6L), ("b", 5L), ("c", 7L)))
  }

  test("the plan is a partial+final TopKPerKey pair, not a window sort") {
    val df = TopK.perKey(scores, Seq("k"), Seq(TopK.desc("score")), 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    // map-side partial before the key exchange: the shuffle moves at
    // most k rows per key per upstream partition, not every row
    assert(plan.contains("TopKPerKeyPartial"))
    assert(!plan.contains("Window"))
  }

  test("keys with fewer than k rows emit all rows") {
    val out = TopK.perKey(scores, Seq("k"), Seq(TopK.desc("score"), TopK.asc("id")), 10)
    assert(out.count() == scores.count())
  }

  test("sort fallback under a tiny heap budget matches the heap path") {
    import org.apache.spark.sql.expressions.Window
    // ~200k rows over 20k distinct keys on 4 partitions: far past a
    // 4 KB budget, so every partition must take the external-sort path
    val wide = spark.range(200000L).select(
      (col("id") % 20000).as("k"),
      col("id"),
      (hash(col("id")) % 1000000).cast("double").as("score"))
    val expected = wide.withColumn("rn", row_number().over(
        Window.partitionBy($"k").orderBy($"score".desc, $"id".asc)))
      .filter($"rn" <= 3).drop("rn")
      .select($"k", $"id").as[(Long, Long)].collect().toSet
    spark.conf.set(graft.plans.TopKPerKeyPlan.MaxHeapBytesConf, "4096")
    try {
      val df = TopK.perKey(wide, Seq("k"), Seq(TopK.desc("score"), TopK.asc("id")), 3)
        .select($"k", $"id")
      // collect on df itself: .as[...] would spawn a fresh QueryExecution
      // and the metrics assertions below would read an unexecuted plan
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
      val exec = topKExec(df)
      assert(exec.metrics("sortFallbacks").value > 0, "expected the sort fallback to trigger")
      assert(exec.metrics("numOutputRows").value == got.size)
    } finally spark.conf.unset(graft.plans.TopKPerKeyPlan.MaxHeapBytesConf)
  }

  test("partial phase cuts the key-exchange volume to ~keys*k per partition") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // 100k rows, 50 keys, 4 input partitions: without the partial phase
    // the key exchange moves all 100k rows; with it, <= 50*3*4 = 600
    val wide = spark.range(100000L).repartition(4).select(
      (col("id") % 50).as("k"), col("id"),
      (hash(col("id")) % 1000000).cast("double").as("score"))
    val df = TopK.perKey(wide, Seq("k"), Seq(TopK.desc("score"), TopK.asc("id")), 3)
      .select($"k", $"id")
    assert(df.collect().length == 150)
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: QueryStageExec => shuffles(q.plan)
      case s: ShuffleExchangeLike => s +: s.children.flatMap(shuffles)
      case other => other.children.flatMap(shuffles)
    }
    val written = shuffles(df.queryExecution.executedPlan)
      .flatMap(_.metrics.get("shuffleRecordsWritten").map(_.value))
    assert(written.nonEmpty)
    // the repartition(4) shuffle moves 100k rows; every shuffle ABOVE the
    // partial operator must be tiny
    assert(written.count(_ <= 600) >= 1,
      s"expected a key exchange bounded by keys*k*partitions, got $written")
    assert(!written.exists(w => w > 600 && w < 100000),
      s"an unbounded intermediate shuffle leaked through: $written")
  }

  test("default budget stays on the heap path") {
    val df = TopK.perKey(scores, Seq("k"), Seq(TopK.desc("score"), TopK.asc("id")), 2)
    df.collect()
    val exec = topKExec(df)
    assert(exec.metrics("sortFallbacks").value == 0)
    assert(exec.metrics("numOutputRows").value == 5)
  }
}
