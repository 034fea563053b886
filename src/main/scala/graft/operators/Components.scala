package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the step that turns
  * near-duplicate PAIRS (Dedup.minHashLsh / ngramJaccard output) into
  * dedup CLUSTERS, so one canonical document per component survives.
  *
  * Two regimes, chosen by measured edge count:
  *
  *  - **Driver union-find** when the pair graph is small (default
  *    ≤ 2^22 edges ≈ 64 MB of longs). After LSH + verification the pair
  *    graph is orders of magnitude smaller than the corpus — even a
  *    100 TB corpus with a 1% duplicate rate yields tens of millions of
  *    pairs, which union-find with path compression solves in
  *    milliseconds. This is NOT a driver-side loop over corpus data;
  *    it is the same bounded-small-side reasoning as a broadcast join,
  *    with the bound explicit.
  *  - **Distributed: local contraction, then min-label propagation with
  *    pointer jumping** beyond the bound: a per-partition union-find
  *    pass first contracts each partition's edges to their spanning
  *    star (the two-phase recipe of Kiveris et al.), so the iterated
  *    edge set shrinks from |E| to ≈|V| before any round runs; then
  *    each round fuses the 1-hop neighborhood min AND the pointer jump
  *    (label := label's label, path doubling) into one join+aggregate
  *    over a request-edge frame, so convergence is O(log diameter)
  *    rounds at ~3 exchanges per round — the standard MapReduce-CC
  *    recipe (Kiveris et al., "Connected
  *    Components in MapReduce and Beyond"). Per-round frames are
  *    localCheckpoint'ed: iterative lineage otherwise grows a plan per
  *    round and re-plans the whole history each action — the classic
  *    iterative-Spark trap. Labels only ever decrease, so Σ labels
  *    strictly decreases on any change; convergence is one cheap
  *    aggregate per round, no row-level diff join. Each round shuffles
  *    on vertex id only, against the persisted symmetric edge list.
  */
object Components {

  /** Per-vertex `(v, component)` where `component` is the minimum
    * vertex id reachable from `v`. Vertices are the union of edge
    * endpoints (isolated documents are not rows — they are their own
    * trivial cluster by definition).
    */
  def connected(edges0: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25, driverSolveMaxEdges: Long = 1L << 22): DataFrame = {
    val spark = edges0.sparkSession
    val edges = edges0.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // neither regime needs pre-symmetrized edges: union-find treats
    // (a,b) and (b,a) identically, and the distributed path symmetrizes
    // AFTER local contraction when the edge set has already shrunk to
    // ≈|V| stars. Forced-distributed (bound ≤ 0) skips the sizing
    // count entirely — the expensive pair pipeline then feeds exactly
    // one pass (the contraction scan), no persist round-trip.
    if (driverSolveMaxEdges <= 0L) return propagate(edges, maxIter)
    val e = edges.persist()
    val edgeCount = e.count()
    val result =
      if (edgeCount <= driverSolveMaxEdges) driverUnionFind(spark, e)
      else propagate(e, maxIter)
    e.unpersist()
    result
  }

  /** Union-find with path compression; union-by-min keeps the component
    * minimum as the root (the minimum can never become a child), so
    * `find` directly yields the canonical label.
    */
  private def driverUnionFind(spark: org.apache.spark.sql.SparkSession,
      edges: DataFrame): DataFrame = {
    val parent = new java.util.HashMap[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    // raw (un-symmetrized) edges: union is commutative, self-loops only
    // pin their vertex into the output
    val it = edges.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      val (a, b) = (row.getLong(0), row.getLong(1))
      parent.putIfAbsent(a, a)
      parent.putIfAbsent(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
    }
    val out = new Array[(Long, Long)](parent.size)
    val keys = parent.keySet().iterator()
    var i = 0
    while (keys.hasNext) { val v = keys.next(); out(i) = (v, find(v)); i += 1 }
    import spark.implicits._
    spark.sparkContext.parallelize(out.toIndexedSeq,
      math.max(1, math.min(spark.sparkContext.defaultParallelism, out.length)))
      .toDF("v", "component")
  }

  /** Per-partition union-find contraction (phase 1 of the two-phase
    * recipe in Kiveris et al.): each partition solves its OWN edge set
    * locally and is replaced by its spanning star (v → partition-local
    * min root). The union of stars preserves global connectivity — two
    * partitions chain through any shared vertex — while shrinking the
    * iterated edge set from |E| to ≈|V|, and after the LSH band shuffle
    * most edges are intra-partition, so labels start nearly converged.
    * Per-task memory is one long→long map over the partition's vertices,
    * the same bound as a shuffle-side hash aggregate.
    */
  private def contractLocal(sym: DataFrame): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    sym.select(col("src"), col("dst")).as[(Long, Long)]
      .mapPartitions { it =>
        val parent = new java.util.HashMap[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x
          while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
          r
        }
        it.foreach { case (a, b) =>
          parent.putIfAbsent(a, a)
          parent.putIfAbsent(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
        }
        val out = new Array[(Long, Long)](parent.size)
        val keys = parent.keySet().iterator()
        var i = 0
        while (keys.hasNext) { val v = keys.next(); out(i) = (v, find(v)); i += 1 }
        out.iterator
      }.toDF("src", "dst")
  }

  private def propagate(edges: DataFrame, maxIter: Int): DataFrame = {
    // contract locally TWICE, then pointer-jump over the star edges only
    // (symmetrized AFTER contraction — the explode then doubles ≈|V|
    // star rows, not |E| raw pairs; min-label needs both directions).
    // Pass 1 runs on the pipeline's arrival partitioning; pass 2
    // repartitions the ≈|V| star edges by src so a vertex that landed
    // in several partitions (the only way pass 1 leaves two roots for
    // one component) has all its star edges co-located — the chains
    // pass 1 leaves behind collapse here instead of costing a
    // propagation round each. One extra tiny exchange, measured to
    // remove 3-4 rounds on the corpus' chain-structured near-dup graph.
    val sym = contractLocal(contractLocal(edges).repartition(col("src")))
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist()
    // round-0 labels straight off the star frame: label(v) = min over
    // {v} ∪ neighbors — one aggregate instead of a distinct() PLUS the
    // first 1-hop round (against identity labels the neighbor-min join
    // IS this aggregate)
    var labels = sym.groupBy(col("src"))
      .agg(min(col("dst")).as("m"))
      .select(col("src").as("v"), least(col("m"), col("src")).as("label"))
      .localCheckpoint()
    var prevSum = labels.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
    // empty edge frame: sum over zero rows is a NULL decimal — return
    // the (empty) label frame instead of NPE-ing on compareTo below
    if (prevSum == null) {
      sym.unpersist()
      return labels.select(col("v"), col("label").as("component"))
    }

    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      // FUSED round — 1-hop min and pointer jump as one join+aggregate:
      //   label'(v) = min( label(v),              — self request (v→v)
      //                    min_{n∈N(v)} label(n), — sym edges (n→v)
      //                    label(label(v)) )      — jump request (label(v)→v)
      // A request edge (src→dst) delivers label(src) to dst, so one
      // join against `labels` on src + one min-aggregate by dst does
      // what the previous formulation spread over three joins and six
      // exchanges — on the tiny contracted frame each exchange is a
      // whole AQE stage, so halving them halves the per-round cost.
      // The jump reads the PREVIOUS round's labels (not the post-hop
      // frame), a half-step-weaker doubling that can cost one extra
      // round on deep chains but keeps the round a single aggregate.
      // Self requests keep every vertex present and labels monotone
      // non-increasing; at the fixpoint all labels in a component are
      // equal, and since labels only ever hold component vertex ids,
      // equal means the component minimum.
      val reqs = sym
        .unionAll(labels.select(col("label").as("src"), col("v").as("dst")))
        .unionAll(labels.select(col("v").as("src"), col("v").as("dst")))
      val next = reqs.join(labels.withColumnRenamed("v", "src"), "src")
        .groupBy(col("dst").as("v"))
        .agg(min(col("label")).as("label"))
        .localCheckpoint()
      val s = next.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      i += 1
    }
    sym.unpersist() // labels are checkpointed; the star frame can go
    labels.select(col("v"), col("label").as("component"))
  }

  /** PageRank over an undirected pair list (da, db) — centrality inside
    * the near-dup graph: the highest-ranked member of a dup cluster is
    * its best canonical candidate, and rank mass concentrating on one
    * template exposes boilerplate hubs. Fixed `iterations` of the
    * classic damped update; each round is one join + one hash
    * aggregate over the (tiny, pair-list-sized) edge frame, with
    * `localCheckpoint` per round so iterative lineage never stacks
    * (the Components lesson). ENGINE-EXACT by construction: each
    * node's contribution sum is a left fold over its SORTED
    * contribution list (equal doubles are interchangeable under +, so
    * the multiset order is total), making ranks bit-identical across
    * engines after any number of rounds — no tolerance compare needed.
    */
  /** Triangle census + global clustering coefficient over an
    * undirected pair list (src < dst, each edge once) — the structural
    * audit beside the cluster-purity one: triangles ≈ wedges means the
    * near-dup graph is cliquey (true duplicate groups), a low
    * coefficient means chains (transitive-merge disease). Triangles
    * via the ordered 2-path join — (a,b)⋈(b,c) then probe (a,c), so
    * a<b<c counts each triangle exactly once; wedges = Σ d(d−1)/2 over
    * the degree frame. Two explicit-key joins over the edge list
    * (LSH/block-bounded upstream), never the corpus; the edge frame
    * should be pinned by the caller if it comes from an expensive
    * pair pipeline. One-row output; `global_clustering` = 3T/W is the
    * single double division.
    */
  def triangleCensus(pairs: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = pairs.select(col(srcCol).as("da"), col(dstCol).as("db"))
    val tri = e.as("x").join(e.as("y"), col("x.db") === col("y.da"))
      .select(col("x.da").as("ta"), col("y.db").as("tc"))
      .join(e.as("z"), col("ta") === col("z.da") && col("tc") === col("z.db"))
    val degs = e.select(explode(array(col("da"), col("db"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    degs.agg(count(lit(1)).as("n_nodes"),
        sum(expr("(d * (d - 1)) div 2")).as("n_wedges"))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        ((lit(3L) * col("n_triangles")).cast("double")
          / col("n_wedges").cast("double")).as("global_clustering"))
  }

  def pageRank(pairs: DataFrame, iterations: Int,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    // symmetrize via one explode pass (a self-union would plan the
    // upstream pair pipeline twice)
    val edges = pairs.select(explode(array(
        struct(col("da").as("src"), col("db").as("dst")),
        struct(col("db").as("src"), col("da").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
      .localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var ranks = deg.select(col("src").as("v"), lit(1.0d).as("rank"))
    for (_ <- 1 to iterations) {
      val contribs = edges
        .join(deg, "src")
        .join(ranks.withColumnRenamed("v", "src"), "src")
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
      ranks = contribs.groupBy(col("dst"))
        .agg(aggregate(sort_array(collect_list(col("c"))), lit(0.0d),
          (a, x) => a + x).as("s"))
        .select(col("dst").as("v"),
          ((lit(1.0d) - lit(damping)) + lit(damping) * col("s")).as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
