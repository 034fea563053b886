package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(0.0f, 0.0f)),
    (1L, Array(10.0f, 10.0f)),
    (2L, Array(0.5f, 0.0f)),   // near seed 0
    (3L, Array(9.0f, 10.0f)),  // near seed 1
    (4L, Array(0.0f, 1.0f))    // near seed 0
  ).toDF("vec_id", "embedding")

  test("kmeansAssign: vectors go to the nearest of k lowest-id seeds") {
    val got = Similarity.kmeansAssign(vecs, k = 2)
      .select($"vec_id", $"cluster_id").as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("kmeansAssign: seeds assign to themselves with zero distance") {
    val seeds = Similarity.kmeansAssign(vecs, k = 2)
      .filter($"vec_id" === $"cluster_id")
      .select($"vec_id", $"dist2").as[(Long, Double)].collect().toMap
    assert(seeds === Map(0L -> 0.0, 1L -> 0.0))
  }

  test("kmeansTrain: converges to the true cluster means and stops early") {
    val trained = Similarity.kmeansTrain(vecs, k = 2, maxIters = 10)
      .select($"cluster_id", $"centroid", $"n_assigned")
      .as[(Long, Seq[Double], Long)].collect()
      .map { case (c, m, n) => c -> ((m, n)) }.toMap
    // fixed point after round 1: means of {(0,0),(0.5,0),(0,1)} and {(10,10),(9,10)}
    assert(trained(0L)._1 === Seq(0.5 / 3, 1.0 / 3) && trained(0L)._2 === 3L)
    assert(trained(1L)._1 === Seq(9.5, 10.0) && trained(1L)._2 === 2L)
  }

  test("kmeansTrain: one iteration equals seed-assignment Lloyd means") {
    val oneRound = Similarity.kmeansTrain(vecs, k = 2, maxIters = 1)
      .select($"cluster_id", $"centroid").as[(Long, Seq[Double])].collect().toMap
    val manual = Similarity.lloydStep(
      Similarity.kmeansAssign(vecs, k = 2).join(vecs, "vec_id")
        .select($"cluster_id", Similarity.toDoubleVec($"embedding").as("v")))
      .select($"cluster_id", $"centroid").as[(Long, Seq[Double])].collect().toMap
    assert(oneRound === manual)
  }

  test("lloydStep: per-cluster element-wise means") {
    val assigned = Similarity.kmeansAssign(vecs, k = 2)
      .join(vecs, "vec_id")
      .select($"cluster_id", Similarity.toDoubleVec($"embedding").as("v"))
    val got = Similarity.lloydStep(assigned)
      .select($"cluster_id", $"centroid", $"n_assigned")
      .as[(Long, Seq[Double], Long)].collect()
      .map { case (c, m, n) => c -> ((m, n)) }.toMap
    // cluster 0: (0,0),(0.5,0),(0,1) -> mean (1/6, 1/3); cluster 1: (10,10),(9,10)
    assert(got(0L)._2 === 3L && got(1L)._2 === 2L)
    assert(got(0L)._1 === Seq(0.5 / 3, 1.0 / 3))
    assert(got(1L)._1 === Seq(9.5, 10.0))
  }
}
