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

  test("semDedupScaled: k grows with the corpus and equals pinned-k semDedup") {
    // 12 vectors at targetCell=3 -> k = ceil(12/3) = 4 (above the
    // minK floor); the capacity twin must be EXACTLY semDedup at that
    // k — same assignment, same survivors — so the only difference vs
    // a pinned-k deployment is the k law, never the pipeline
    val many = (0L until 12L).map { i => // all nonzero: cosine needs a norm
      (i, Array((i % 4).toFloat * 10f + (i / 4).toFloat * 0.1f + 1f,
        (i % 4).toFloat + 1f))
    }.toDF("vec_id", "embedding")
    val scaled = Similarity.semDedupScaled(many, targetCell = 3,
        threshold = 0.95, minK = 2)
      .as[(Long, Long)].collect().toSet
    val pinned = Similarity.semDedup(many, k = 4, threshold = 0.95)
      .as[(Long, Long)].collect().toSet
    assert(scaled == pinned && scaled.nonEmpty)
    // the floor holds when the corpus is smaller than one target cell
    val few = Similarity.semDedupScaled(many, targetCell = 1000,
        threshold = 0.99, minK = 2)
      .select($"cluster_id").distinct().as[Long].collect().toSet
    assert(few.subsetOf(Set(0L, 1L))) // k floored at 2 -> seeds 0 and 1
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

  test("kmeansTrain retains an emptied cluster's centroid with n_assigned=0") {
    // both seeds sit left of all the mass; after round 1 every point
    // belongs to the nearer survivor and the other cluster empties
    val clumped = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.1f, 0.0f)),
      (2L, Array(100.0f, 0.0f)), (3L, Array(100.0f, 0.1f)), (4L, Array(100.1f, 0.0f)),
      (5L, Array(100.0f, 100.0f)), (6L, Array(100.1f, 100.0f))
    ).toDF("vec_id", "embedding")
    val trained = Similarity.kmeansTrain(clumped, k = 2, maxIters = 10)
      .select($"cluster_id", $"n_assigned").as[(Long, Long)].collect().toMap
    assert(trained.size == 2, s"cluster must not vanish: $trained")
    assert(trained.values.sum == 7L)
  }

  test("kmeans++ seeding beats lowest-id seeding on an adversarial layout") {
    // three tight, well-separated clusters; the 3 lowest ids all sit in
    // the first — lowest-id seeding splits it and merges the real ones
    val pts = (0 until 10).map(i => (i.toLong, Array(i * 0.01f, 0.0f))) ++
      (10 until 20).map(i => (i.toLong, Array(100.0f + i * 0.01f, 100.0f))) ++
      (20 until 30).map(i => (i.toLong, Array(200.0f + i * 0.01f, 0.0f)))
    val df = pts.toDF("vec_id", "embedding")
    def cost(seeds: Option[Seq[(Long, Seq[Double])]]): Double = {
      val cents = Similarity.kmeansTrain(df, k = 3, maxIters = 10, seeds = seeds)
        .select($"cluster_id", $"centroid").as[(Long, Seq[Double])].collect()
      val v = df.select($"vec_id", Similarity.toDoubleVec($"embedding").as("v"))
      Similarity.assignTo(v, cents.sortBy(_._1).toSeq)
        .agg(sum($"dist2")).head.getDouble(0)
    }
    val ppSeeds = Similarity.seedsPP(df, 3)
    assert(ppSeeds.size == 3)
    val costPP = cost(Some(ppSeeds))
    val costLowest = cost(None)
    assert(costPP < costLowest,
      s"expected D² seeding to win: pp=$costPP lowest=$costLowest")
    // D² must have picked one seed per real cluster
    assert(ppSeeds.map(_._1 / 10).toSet == Set(0L, 1L, 2L))
  }

  test("multi-probe IVF: recall@k rises with nprobe; nprobe=k is exact") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val k = 8
    val cents = Similarity.seeds(emb, k)
    val assigned = Similarity.kmeansAssign(emb, k).select($"vec_id", $"cluster_id")
    val trained = emb.join(assigned, "vec_id")
      .select($"vec_id", $"cluster_id".as("label"), $"embedding")
    val queries = broadcast(emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), Similarity.toDoubleVec($"embedding").as("qv")))
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    def found(nprobe: Int): Set[(Long, Long)] =
      Similarity.multiProbeTopK(trained, queries, cents, nprobe, 5)
        .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val recalls = Seq(1, 2, 4, 8).map(np =>
      (found(np) intersect exact).size.toDouble / exact.size)
    // monotone non-decreasing, and probing every cell IS brute force
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)), s"recall not monotone: $recalls")
    assert(recalls.last == 1.0, s"nprobe=k must be exact: $recalls")
    assert(found(8) == exact)
  }

  test("pq: codebooks slice seed vectors; encode picks nearest code per subspace") {
    // m=2 subspaces of 1 dim, k=2 seed codebooks from vecs 0 (0,0), 1 (10,10)
    val cb = Similarity.pqCodebooks(vecs, m = 2, k = 2)
    assert(cb == Seq(Seq(Seq(0.0), Seq(10.0)), Seq(Seq(0.0), Seq(10.0))))
    val codes = Similarity.pqEncode(vecs, cb)
      .as[(Long, Seq[Long])].collect().toMap
    assert(codes(0L) == Seq(0L, 0L)) // seeds encode to themselves
    assert(codes(1L) == Seq(1L, 1L))
    assert(codes(2L) == Seq(0L, 0L)) // (0.5, 0) nearest 0 in both subspaces
    assert(codes(3L) == Seq(1L, 1L)) // (9, 10)
    assert(codes(4L) == Seq(0L, 0L)) // (0, 1)
  }

  test("pq ADC: approx distance is the sum of per-subspace code distances") {
    val queries = vecs.filter($"vec_id" < 2)
      .select($"vec_id".as("qid"), Similarity.toDoubleVec($"embedding").as("qv"))
    val got = Similarity.pqAdcTopK(vecs, queries, m = 2, k = 2, topK = 5)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(r => (r._3, r._2)).map(r => (r._2, r._3)).toSeq
      }
    // q0 = (0,0): vecs 0,2,4 carry codes [0,0] -> approx 0; 1,3 -> 100+100
    assert(got(0L) == Seq((0L, 0.0), (2L, 0.0), (4L, 0.0), (1L, 200.0), (3L, 200.0)))
    // q1 = (10,10): mirrored
    assert(got(1L) == Seq((1L, 0.0), (3L, 0.0), (0L, 200.0), (2L, 200.0), (4L, 200.0)))
  }

  test("ivfPqTopK: rerank emits exact cosine, restricted to the query's cell") {
    // cells from seeds 0/1: {0,2,4} and {1,3}; each query proves the
    // candidate restriction (no cross-cell vec) and exact cosine values.
    // zero-norm vec 0 is not a query: ANSI division throws on it — the
    // same (documented) degenerate-input contract as s1's cosine.
    val got = Similarity.ivfPqTopK(vecs,
        col("vec_id") === 1 || col("vec_id") === 3,
        nCells = 2, m = 2, k = 2, r = 3, topK = 3)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(r => (r._3, r._4)).toSeq }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
      def n(v: Seq[Double]) = math.sqrt(v.map(x => x * x).foldLeft(0.0)(_ + _))
      d / (n(a) * n(b))
    }
    val c13 = cos(Seq(10.0, 10.0), Seq(9.0, 10.0))
    // q1 = (10,10), cell {1,3}: only cell-mate 3 = (9,10), exact cosine;
    // q3 mirrors — candidate restriction excludes all of cell {0,2,4}
    assert(got(1L) == Seq((3L, c13)))
    assert(got(3L) == Seq((1L, c13)))
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

  // ring of 9 overlapping clusters: adjacent centers are close, so a
  // boundary point's true neighbors straddle two IVF cells — the regime
  // where nprobe=1 hits its recall ceiling and a graph index pays off
  private def ringCorpus(perCluster: Int, noise: Double, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (for {
      c <- 0 until 9
      i <- 0 until perCluster
    } yield {
      val v = Array.tabulate(16) { d =>
        (math.cos(2 * math.Pi * c / 9.0 + d * 0.7) +
          noise * rnd.nextGaussian()).toFloat
      }
      ((c * perCluster + i).toLong, v, c.toLong)
    }).toDF("vec_id", "embedding", "label")
  }

  test("graph ANN: expansion search beats nprobe=1 IVF at equal probe cost") {
    val corpus = ringCorpus(perCluster = 40, noise = 0.5, seed = 42)
    val queries = broadcast(corpus.filter($"vec_id" % 12 === 0)
      .select($"vec_id".as("qid"), Similarity.toDoubleVec($"embedding").as("qv")))
    val qLabeled = broadcast(corpus.filter($"vec_id" % 12 === 0)
      .select($"vec_id".as("qid"), $"label".as("qlabel"),
        Similarity.toDoubleVec($"embedding").as("qv")))
    val k = 6
    val exact = Similarity.bruteForceTopK(corpus, queries, k)
      .select($"qid", $"vec_id").localCheckpoint()
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(approx.select($"qid", $"vec_id"), exact)
        .agg(avg($"recall")).as[Double].head
    // IVF nprobe=1: probes its own 40-vector cell
    val ivf = meanRecall(Similarity.partitionedTopK(corpus, qLabeled, k))
    // graph expansion at g=6, 2 hops: ≤ 6 + 36 = 42 candidates — the
    // same probe budget as one cell
    val graph = Similarity.knnGraph(corpus, g = 6, rounds = 3)
    val exp = meanRecall(Similarity.graphExpandTopK(corpus, queries, graph,
      hops = 2, k = k))
    assert(exp > ivf,
      s"graph expansion ($exp) must beat nprobe=1 IVF ($ivf) on boundary queries")
    assert(exp >= 0.85, s"graph expansion recall too low: $exp")
    // the greedy serving twin: beam over the same graph, per-cell entries
    val entries = corpus.groupBy($"label").agg(min($"vec_id").as("vec_id"))
    val beam = Similarity.beamSearchTopK(corpus, queries, graph,
      beamWidth = 24, hops = 4, k = k, entryPoints = Some(entries))
    assert(beam.groupBy($"qid").count().select(max($"count")).as[Long].head <= k)
    val beamRecall = meanRecall(beam)
    assert(beamRecall > ivf,
      s"beam search ($beamRecall) must beat nprobe=1 IVF ($ivf)")
  }

  test("MMR rerank: diversity beats a redundant shortlist; lambda=1 is plain top-k") {
    // query ~ e1; candidates: two near-identical e1-ish vectors (10, 11),
    // one diverse e2-ish (12), one weak (13)
    val vecs = Seq(
      (10L, Array(1.0f, 0.01f, 0f, 0f)),
      (11L, Array(1.0f, 0.012f, 0f, 0f)),
      (12L, Array(0.5f, 0.86f, 0f, 0f)),
      (13L, Array(0.4f, 0.2f, 0.89f, 0f))
    ).toDF("vec_id", "embedding")
    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      def d(x: Seq[Double], y: Seq[Double]) =
        x.zip(y).map(p => p._1 * p._2).foldLeft(0.0)(_ + _)
      d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val emb = Map(10L -> Seq(1.0, 0.01, 0, 0.0), 11L -> Seq(1.0, 0.012, 0, 0.0),
      12L -> Seq(0.5, 0.86, 0, 0.0), 13L -> Seq(0.4, 0.2, 0.89, 0.0))
    val shortlist = emb.toSeq.map { case (id, v) => (1L, id, cosine(q, v)) }
      .toDF("qid", "vec_id", "cosine")
    val diverse = Similarity.mmrRerank(shortlist, vecs, k = 3, lambda = 0.3)
      .orderBy($"rank").select($"vec_id").as[Long].collect().toSeq
    // rank 1 = most relevant (10); the near-clone 11 is then dominated
    // by BOTH diverse candidates and drops out of the top-3 entirely
    assert(diverse === Seq(10L, 13L, 12L))
    assert(!diverse.contains(11L))
    // λ=1 degenerates to plain relevance order
    val plain = Similarity.mmrRerank(shortlist, vecs, k = 3, lambda = 1.0)
      .orderBy($"rank").select($"vec_id").as[Long].collect().toSeq
    val topk = shortlist.orderBy($"cosine".desc, $"vec_id")
      .select($"vec_id").as[Long].collect().take(3).toSeq
    assert(plain === topk)
    // deterministic on rerun
    val again = Similarity.mmrRerank(shortlist, vecs, k = 3, lambda = 0.3)
      .orderBy($"rank").select($"vec_id").as[Long].collect().toSeq
    assert(again === diverse)
  }

  test("graph expansion search: neighborhood closure is exactly the ≤2-hop set") {
    // a tiny graph with KNOWN reachability: 0→{1,2}, 1→{3}, 2→{4}, 3→{5}
    // — from query node 0, 2 hops reach {1,2,3,4}; 5 is 3 hops away
    val vecs = (0L to 5L).map(i =>
      (i, Array.tabulate(4)(d => (i * 4 + d).toFloat + 1f), 0L))
      .toDF("vec_id", "embedding", "label")
    val graph = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 4L), (3L, 5L))
      .toDF("src", "dst")
    val queries = vecs.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), Similarity.toDoubleVec($"embedding").as("qv"))
    val got = Similarity.graphExpandTopK(vecs, queries, graph, hops = 2, k = 10)
      .select($"vec_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L, 4L))
  }
}
