package graft

import org.apache.spark.sql.functions._

import graft.operators.TopK
import graft.plans.TopKPerKeyExec

class TopKSpec extends SparkSpec {
  import spark.implicits._

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

  test("the plan contains TopKPerKeyExec, not a window sort") {
    val df = TopK.perKey(scores, Seq("k"), Seq(TopK.desc("score")), 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.contains("Window"))
  }

  test("keys with fewer than k rows emit all rows") {
    val out = TopK.perKey(scores, Seq("k"), Seq(TopK.desc("score"), TopK.asc("id")), 10)
    assert(out.count() == scores.count())
  }
}
