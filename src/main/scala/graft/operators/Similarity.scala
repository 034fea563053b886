package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Cosine is computed as an explicit sequential left fold (`aggregate`
  * over `zip_with`) in double precision — deterministic IEEE, identical
  * in any engine that folds left-to-right, and fully codegen'd (no UDF).
  */
object Similarity {

  /** array<float> → array<double>, exact element-wise widening. */
  def toDoubleVec(c: Column): Column = transform(c, _.cast("double"))

  /** Codegen'd loop (graft.functions.VectorDot) — bit-identical to the
    * sequential `aggregate(zip_with(...))` fold it replaces.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorDot(a, b)

  def norm(a: Column): Column = sqrt(graft.functions.VectorDot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Johnson–Lindenstrauss sign random projection: embed `inDims`
    * dimensions into `outDims` via a FIXED ±1 matrix (Achlioptas 2001
    * — the database-friendly JL construction), preserving pairwise
    * distances to within 1±ε with outDims = O(ln N / ε²). The
    * dimensionality lever MRL truncation (s11) needs trained models
    * for, available on ANY embedding: retrieval runs inDims/outDims×
    * cheaper per pair, with recall measured by the s10 harness.
    *
    * The matrix is derived, not stored: sign(j,i) = +1 iff the first
    * hex char of md5("seed:j:i") < '8' — the one hash both engines
    * share — materialized ONCE on the driver into literal arrays (as a
    * real deployment materializes its projection matrix) and applied
    * as `outDims` codegen'd [[dot]] folds per row. Norm scaling
    * (1/√outDims) is deliberately omitted: cosine is scale-invariant,
    * which is what retrieval compares.
    *
    * Determinism: each projected coordinate is the same 0.0-init left
    * fold of exact ±x_i terms in i order on both engines (float→double
    * widening exact, ±1 products exact) — bit-identical, no rounding
    * anywhere. Scale: a pure projection — no shuffle, no state; at
    * 100 TB this runs inside the scan stage and SHRINKS everything
    * downstream by inDims/outDims.
    */
  def jlProject(vectors: DataFrame, inDims: Int, outDims: Int,
      seed: String = "jl", embCol: String = "embedding",
      projCol: String = "proj"): DataFrame = {
    require(inDims >= 1 && outDims >= 1 && outDims <= 256,
      s"bad JL dims: $inDims -> $outDims")
    val mdInst = java.security.MessageDigest.getInstance("MD5")
    def signOf(j: Int, i: Int): Double = {
      val h = mdInst.digest(s"$seed:$j:$i".getBytes("UTF-8"))
      // first hex char < '8' <=> high nibble of byte 0 < 8
      if (((h(0) >> 4) & 0xf) < 8) 1.0 else -1.0
    }
    val signs = Array.tabulate(outDims, inDims)((j, i) => signOf(j, i))
    val v = toDoubleVec(col(embCol))
    vectors.withColumn(projCol,
      array((0 until outDims).map(j => dot(v, lit(signs(j)))): _*))
  }

  /** Brute-force top-k: every query vector against the full corpus.
    * The query set is broadcast (small); the corpus side streams — one
    * pass, no shuffle until the per-query top-k window.
    */
  /** All (query, vector) cosine pairs — the scored set behind top-k. */
  def scoredPairs(vectors: DataFrame, queries: DataFrame): DataFrame = {
    // norms computed once per vector/query, not once per pair
    val v = vectors.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("vn", norm(col("v")))
    val q = queries.select(col("qid"), col("qv")).withColumn("qn", norm(col("qv")))
    q.as("q").join(v.as("v"), col("q.qid") =!= col("v.vec_id"))
      .select(col("q.qid"), col("v.vec_id"),
        (dot(col("q.qv"), col("v.v")) / (col("q.qn") * col("v.vn"))).as("cosine"))
  }

  def bruteForceTopK(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = scoredPairs(vectors, queries)
    joined.withColumn("rank",
        row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
  }

  /** Brute-force top-k through the custom TopKPerKey whole-stage
    * operator (bounded per-key heaps instead of a full window sort) —
    * same results as [[bruteForceTopK]] minus the rank column.
    */
  def bruteForceTopKOperator(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame =
    TopK.perKey(scoredPairs(vectors, queries),
      keys = Seq("qid"),
      orderBy = Seq(TopK.desc("cosine"), TopK.asc("vec_id")), k = k)

  /** FILTERED vector search — top-k under a metadata predicate, the
    * first-class vector-database operation ("nearest English documents
    * published this year"). Semantics are PRE-filtering: the predicate
    * restricts the candidate set BEFORE ranking, so every query gets k
    * results whenever k matching vectors exist — post-filtering (rank
    * first, filter the top-k after) silently returns < k rows whenever
    * the true neighbors fail the predicate, which is exactly the
    * recall bug the published engines (e.g. the IVF filtered-search
    * literature) warn about; the spec pins the two apart.
    *
    * Scale: the predicate lands IN the corpus scan (Catalyst pushes it
    * into the file source — `PushedFilters` for source-backed columns),
    * so a selective filter shrinks every downstream pair; ranking is
    * the custom TopKPerKey bounded-heap operator — ≤ k rows per query
    * per partition cross the exchange, never a window sort over the
    * scored pairs.
    */
  def filteredTopK(vectors: DataFrame, queries: DataFrame, pred: Column,
      k: Int): DataFrame =
    TopK.perKey(scoredPairs(vectors.filter(pred), queries),
      keys = Seq("qid"),
      orderBy = Seq(TopK.desc("cosine"), TopK.asc("vec_id")), k = k)

  /** IVF index MAINTENANCE with a cell-load capacity law (S19) — the
    * retrieval-side analog of D38's banding auto-sizing: a served IVF
    * degrades as ingest concentrates vectors into hot cells (scan cost
    * per probe ∝ cell size), so cells over `targetLoad` SPLIT — local
    * 2-means over the hot cell's own members, children replacing the
    * parent in the centroid list — until every cell fits or
    * `maxRounds` passes; cells that cannot split (duplicate-heavy
    * content where 2-means cannot separate) come back in `saturated`,
    * the D38 honesty contract: a degenerate index is REPORTED, never
    * silent.
    *
    * Scale shape: the initial assignment is the caller's (this
    * operator never rescans cool cells — their ids and members are
    * untouched, the incremental claim); per split round, ALL hot
    * cells split together in ONE pass — per-cell child seeds from one
    * min/max-id aggregate, `splitIters` Lloyd rounds where each
    * member chooses between ITS OWN cell's two children via codegen'd
    * VectorDot distance algebra (|v−c|² = v·v − 2 v·c + c·c), child
    * means from one (cell, child, position) aggregate. Driver state =
    * the centroid list (cells × dim — the broadcast-join bound);
    * per-round cost ∝ Σ hot-cell sizes, never the corpus.
    *
    * Returns (new centroid list, reassignment of hot-cell members
    * (vec_id, cluster_id), saturated cell ids). New child ids are
    * allocated above the current max id — cool-cell ids never change.
    */
  def ivfMaintain(centroids: Seq[(Long, Seq[Double])], assigned0: DataFrame,
      targetLoad: Long, maxRounds: Int = 4, splitIters: Int = 3)
      : (Seq[(Long, Seq[Double])], DataFrame, Seq[Long]) = {
    require(targetLoad >= 1, s"targetLoad must be >= 1: $targetLoad")
    require(maxRounds >= 1 && splitIters >= 1,
      s"bad rounds: $maxRounds/$splitIters")
    val spark = assigned0.sparkSession
    import spark.implicits._
    var cents = scala.collection.mutable.LinkedHashMap(centroids: _*)
    var nextId = (centroids.map(_._1) :+ 0L).max + 1L
    var assigned = assigned0
      .select(col("vec_id").cast("long").as("vec_id"),
        col("cluster_id").cast("long").as("cluster_id"),
        toDoubleVec(col("v")).as("v"))
      .localCheckpoint() // iterated self-consumption — pin lineage
    var round = 0
    var hot: Seq[Long] = Nil
    def loads(): Map[Long, Long] = assigned
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    var done = false
    while (round < maxRounds && !done) {
      hot = loads().filter(_._2 > targetLoad).keys.toSeq.sorted
      if (hot.isEmpty) done = true
      else {
        val hotSet = hot.toSet
        val members = assigned.filter(col("cluster_id").isin(hot: _*))
          .localCheckpoint() // iterated by the Lloyd loop below
        // child seeds: each hot cell's min-id and max-id members (two
        // distinct rows whenever the cell has >= 2 distinct ids)
        val seedRows = members.groupBy(col("cluster_id"))
          .agg(min_by(col("v"), col("vec_id")).as("c0"),
            max_by(col("v"), col("vec_id")).as("c1"))
          .as[(Long, Seq[Double], Seq[Double])].collect()
        var children: Map[Long, (Seq[Double], Seq[Double])] =
          seedRows.map(r => r._1 -> (r._2, r._3)).toMap
        var it = 0
        while (it < splitIters) {
          // children embed as a literal map (cells × 2 × dim — the
          // broadcast-join bound); element_at never misses: members
          // are pre-filtered to hot cells, all present as keys
          val cellMap = typedLit(children.map { case (c, (a, b)) =>
            c -> Seq(a, b) })
          val chosen = members
            .withColumn("__cs", element_at(cellMap, col("cluster_id")))
            .withColumn("__c0", col("__cs").getItem(0))
            .withColumn("__c1", col("__cs").getItem(1))
            .withColumn("__child",
              when(dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), col("__c0"))
                + dot(col("__c0"), col("__c0"))
                <= dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), col("__c1"))
                + dot(col("__c1"), col("__c1")), lit(0)).otherwise(lit(1)))
          val means = chosen
            .select(col("cluster_id"), col("__child"),
              posexplode(col("v")).as(Seq("pos", "x")))
            .groupBy(col("cluster_id"), col("__child"), col("pos"))
            .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
            .groupBy(col("cluster_id"), col("__child"))
            .agg(map_from_entries(sort_array(collect_list(
              struct(col("pos"), col("sx") / col("cnt").cast("double")))))
              .as("m"))
            .as[(Long, Int, Map[Int, Double])].collect()
          val byCell = means.groupBy(_._1)
          children = children.map { case (c, (a, b)) =>
            val m = byCell.getOrElse(c, Array.empty).map(x => x._2 -> x._3).toMap
            def vecOf(side: Int, prev: Seq[Double]): Seq[Double] =
              m.get(side).map(mm => prev.indices.map(i => mm(i)).toSeq)
                .getOrElse(prev)
            c -> (vecOf(0, a), vecOf(1, b))
          }
          it += 1
        }
        // relabel hot-cell members; allocate child ids deterministically
        val idOf: Map[Long, (Long, Long)] = hot.map { c =>
          val ids = (nextId, nextId + 1L); nextId += 2L; c -> ids
        }.toMap
        val cellMap = typedLit(children.map { case (c, (a, b)) =>
          c -> Seq(a, b) })
        val idMap = typedLit(idOf.map { case (c, (i0, i1)) => c -> Seq(i0, i1) })
        val relabeled = assigned.filter(col("cluster_id").isin(hot: _*))
          .withColumn("__cs", element_at(cellMap, col("cluster_id")))
          .withColumn("__c0", col("__cs").getItem(0))
          .withColumn("__c1", col("__cs").getItem(1))
          .withColumn("__child",
            when(dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), col("__c0"))
              + dot(col("__c0"), col("__c0"))
              <= dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), col("__c1"))
              + dot(col("__c1"), col("__c1")), lit(0)).otherwise(lit(1)))
          .select(col("vec_id"),
            element_at(idMap, col("cluster_id"))
              .getItem(col("__child")).as("cluster_id"), col("v"))
        assigned = assigned.filter(!col("cluster_id").isin(hot: _*))
          .unionByName(relabeled)
          .localCheckpoint() // next round's loads/members re-consume it
        cents = cents.filterNot(kv => hotSet(kv._1))
        idOf.toSeq.sortBy(_._1).foreach { case (c, (i0, i1)) =>
          val (a, b) = children(c)
          cents += (i0 -> a); cents += (i1 -> b)
        }
        round += 1
      }
    }
    val saturated =
      if (done) Nil else loads().filter(_._2 > targetLoad).keys.toSeq.sorted
    (cents.toSeq, assigned.select(col("vec_id"), col("cluster_id")), saturated)
  }

  /** IVF-style partitioned top-k: candidates restricted to the query's
    * coarse partition (here: a precomputed cluster/label column). At
    * scale this is the "probe one inverted list" path — the join key is
    * the partition id, so each task only scans its own bucket.
    */
  def partitionedTopK(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val v = vectors.select(col("vec_id"), col("label"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("vn", norm(col("v")))
    val q = queries.select(col("qid"), col("qlabel"), col("qv"))
      .withColumn("qn", norm(col("qv")))
    val joined = q.as("q").join(v.as("v"),
        col("q.qlabel") === col("v.label") && col("q.qid") =!= col("v.vec_id"))
      .select(col("q.qid"), col("v.vec_id"),
        (dot(col("q.qv"), col("v.v")) / (col("q.qn") * col("v.vn"))).as("cosine"))
    joined.withColumn("rank",
        row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
  }

  /** Multi-probe IVF top-k: each query probes its `nprobe` NEAREST
    * inverted lists instead of only the owning cell — the standard fix
    * for nprobe=1's recall ceiling (a query near a cell boundary has
    * true neighbors in the adjacent cell). Probe assignment is the
    * [[graft.functions.NearestCentroids]] per-row expression over
    * driver-embedded centroids — scan-bound, works at ANY query
    * cardinality (no crossJoin, no window over q×k rows) — exploded to
    * (query, probe-label) pairs; candidates come from ONE join on the
    * label, and the global top-k ranks the union of all probed lists.
    * `nprobe = centroids.size` degrades gracefully to exact brute force.
    *
    * `vectors` carries (vec_id, label, embedding); `queries` carries
    * (qid, qv) with qv already double-widened.
    */
  def multiProbeTopK(vectors: DataFrame, queries: DataFrame,
      centroids: Seq[(Long, Seq[Double])], nprobe: Int, k: Int): DataFrame = {
    val sorted = centroids.sortBy(_._1)
    val probes = queries.select(col("qid"), col("qv"))
      .withColumn("qn", norm(col("qv")))
      .select(col("qid"), col("qv"), col("qn"),
        explode(graft.functions.NearestCentroids(
          col("qv"), sorted.map(_._1), sorted.map(_._2), nprobe)).as("p"))
      .select(col("qid"), col("qv"), col("qn"), col("p.cluster_id").as("probe_label"))
    val v = vectors.select(col("vec_id"), col("label"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("vn", norm(col("v")))
    val joined = probes.as("q").join(v.as("v"),
        col("q.probe_label") === col("v.label") && col("q.qid") =!= col("v.vec_id"))
      .select(col("q.qid"), col("v.vec_id"),
        (dot(col("q.qv"), col("v.v")) / (col("q.qn") * col("v.vn"))).as("cosine"))
    joined.withColumn("rank",
        row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
  }

  /** Symmetric int8 quantization of an embedding column: per-vector
    * scale = max|x|, q_i = floor(x_i / scale * 127 + 0.5). Cuts vector
    * storage 4× — at 100 TB the embeddings table is usually the widest
    * thing on disk. All ops are per-row IEEE arithmetic, so quantized
    * values are engine-reproducible.
    */
  def quantizeInt8(vectors: DataFrame, embCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val v = toDoubleVec(col(embCol))
    val scale = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    vectors.select(col(idCol), v.as("v"), scale.as("scale"))
      .select(col(idCol), col("scale"),
        transform(col("v"),
          x => when(col("scale") > 0,
            floor(x / col("scale") * 127.0 + 0.5).cast("int")).otherwise(0))
          .as("q"))
  }

  /** Two-stage SQ8 retrieval — the FAISS-SQ serving pattern: a COARSE
    * scan over int8-quantized vectors (4× less memory traffic, exact
    * integer dot products) nominates `candidates` per query through the
    * TopKPerKey bounded-heap operator, then ONLY those re-rank with
    * exact float cosine. The int8 coarse score needs no dequantization:
    * per-vector scales cancel in the cosine ratio, so
    * score = int_dot / (√q_selfdot · √v_selfdot) ranks quantized cosine
    * directly — one division and two IEEE sqrts per pair, every product
    * an exact long.
    *
    * Determinism: quantization is per-row IEEE (floor(x/s·127+0.5)),
    * integer dots exact, coarse/final ties break on vec_id, the exact
    * re-rank is s1's formula verbatim — hash-exact, no rounding.
    * All-zero vectors (scale 0 ⇒ self-dot 0) are filtered on both
    * sides, never a 0/0 NaN whose ordering engines disagree on.
    *
    * Scale: the corpus streams ONCE in int8; the candidate list
    * (queries × candidates) broadcasts back into the float scan for
    * re-ranking, so full-precision vectors are touched only for
    * ~candidates rows per query — the memory-bandwidth story that makes
    * SQ8 the default first stage at 100 TB.
    */
  def sq8RerankTopK(vectors: DataFrame, queries: DataFrame, k: Int,
      candidates: Int, embCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    require(k >= 1 && candidates >= k, s"bad k/candidates: $k/$candidates")
    // exact integer self/pair dots via the codegen'd VectorDotLong —
    // the coarse stage evaluates one dot per (query × vector) PAIR and
    // the interpreted aggregate(zip_with(...)) fold was the whole scan
    // CPU (measured: a 1.1 s single-task job at the bench anchor);
    // sums of int×int products are exact in long, so the values are
    // bit-identical. widen() fans the 1-split bench input out before
    // that CPU-dense per-pair scan (no-op at real scale). Fence on the
    // self-dots: `filter(vdot > 0)` pushdown INLINED the whole quant
    // chain (transform∘transform + the scale fold — which the inlined
    // form re-evaluates PER ELEMENT, dim² interpreted ops per row)
    // into a Filter below the projections — the documented e7/d2
    // duplication class, measured as a second ~1.3 s stage here.
    def selfDotInt(q: Column) =
      graft.functions.Fence(graft.functions.VectorDotLong(q, q))
    def quant(v: Column): Column = {
      val scale = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))
      transform(v, x => when(scale > 0,
        floor(x / scale * 127.0 + 0.5).cast("int")).otherwise(0))
    }
    val corpus8 = quantizeInt8(Dedup.widen(vectors), embCol, idCol)
      .withColumn("vdot", selfDotInt(col("q")))
      .filter(col("vdot") > 0L)
    val q8 = queries.select(col("qid"), col("qv"))
      .withColumn("qq", quant(col("qv")))
      .withColumn("qdot", selfDotInt(col("qq")))
      .filter(col("qdot") > 0L)
      .select(col("qid"), col("qq"), col("qdot"))
    val coarse = broadcast(q8).as("q")
      .join(corpus8.as("v"), col("q.qid") =!= col(s"v.$idCol"))
      .select(col("q.qid"), col(s"v.$idCol").as("vec_id"),
        (graft.functions.VectorDotLong(col("q.qq"), col("v.q"))
          .cast("double")
          / (sqrt(col("q.qdot").cast("double")) * sqrt(col("vdot").cast("double"))))
          .as("approx"))
    val cand = TopK.perKey(coarse, keys = Seq("qid"),
      orderBy = Seq(TopK.desc("approx"), TopK.asc("vec_id")), k = candidates)
    val v = vectors.select(col(idCol).as("vec_id"), toDoubleVec(col(embCol)).as("v"))
      .withColumn("vn", norm(col("v")))
    val qv = queries.select(col("qid"), col("qv")).withColumn("qn", norm(col("qv")))
    val exact = broadcast(cand.select(col("qid"), col("vec_id")))
      .join(v, Seq("vec_id"))
      .join(broadcast(qv), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("vn"))).as("cosine"))
    exact.withColumn("rank",
        row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
  }

  /** Dequantize back to doubles: q_i * scale / 127. */
  def dequantize(quantized: DataFrame): DataFrame =
    quantized.withColumn("deq",
      transform(col("q"), q => q.cast("double") * col("scale") / 127.0))

  /** Nearest-centroid assignment — the IVF coarse-quantizer training
    * primitive. Seeds are the `k` lowest-id vectors (deterministic, no
    * RNG state to reproduce across engines); the centroid set is
    * BROADCAST and the corpus streams once, so the only shuffle is the
    * caller's. Squared L2 via `‖v‖² + ‖c‖² − 2·v·c` — three codegen'd
    * VectorDot folds per pair, with the vector's own norm computed once
    * per row, not once per centroid.
    */
  def kmeansAssign(vectors: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val v = vectors.select(col(idCol).as("vec_id"), toDoubleVec(col(embCol)).as("v"))
    assignTo(v, seedCentroids(v, k)).select(col("vec_id"), col("cluster_id"), col("dist2"))
  }

  /** The k lowest-id seed centroids of a raw embeddings frame, as
    * driver-side values — the shared coarse-quantizer seeding for
    * kmeansAssign / multiProbeTopK callers that need the centroid set
    * itself.
    */
  def seeds(vectors: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): Seq[(Long, Seq[Double])] =
    seedCentroids(
      vectors.select(col(idCol).as("vec_id"), toDoubleVec(col(embCol)).as("v")), k)

  /** The k lowest-id vectors as driver-side centroid values (deterministic
    * seeding, no RNG state). Bounded-driver-state by construction —
    * k × dim doubles, the same reasoning as a broadcast join side.
    */
  private def seedCentroids(v: DataFrame, k: Int): Seq[(Long, Seq[Double])] =
    v.orderBy(col("vec_id")).limit(k).select(col("vec_id").cast("long"), col("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq

  /** Deterministic k-means++ (D²) seeding: first seed = lowest id, each
    * next seed drawn ∝ dist² to the nearest chosen seed via
    * Efraimidis–Spiridakis hash-weighted sampling (priority
    * −ln(u)/dist², u an md5-hash uniform of the id — no RNG state, same
    * derivation as Pipeline.weightedSample). Fixes lowest-id seeding's
    * degenerate case: when the k lowest-id vectors happen to sit in one
    * tight region, Lloyd splits that region and merges real clusters;
    * D² seeding spreads the seeds. One TakeOrdered job per seed (k−1
    * rounds, k = coarse-quantizer cells — small), driver state stays
    * k × dim. Stops early (fewer seeds) if the corpus has fewer than k
    * distinct positions.
    */
  def seedsPP(vectors: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): Seq[(Long, Seq[Double])] = {
    val v = vectors.select(col(idCol).as("vec_id"), toDoubleVec(col(embCol)).as("v"))
      .persist()
    try {
      var chosen = seedCentroids(v, 1).toList
      var exhausted = false
      while (chosen.size < k && !exhausted) {
        val u = (conv(substring(md5(concat(lit("graftpp:"), col("vec_id").cast("string"))),
          1, 8), 16, 10).cast("double") + 1.0) / 4294967297.0
        val next = assignTo(v, chosen)
          .filter(col("dist2") > 0)
          .select(col("vec_id").cast("long").as("vec_id"), col("v"),
            (-log(u) / col("dist2")).as("priority"))
          .orderBy(col("priority"), col("vec_id"))
          .limit(1)
          .collect()
        if (next.isEmpty) exhausted = true
        else chosen = (next.head.getLong(0), next.head.getSeq[Double](1)) :: chosen
      }
      chosen.sortBy(_._1)
    } finally { v.unpersist(); () }
  }

  /** Nearest-centroid assignment via the [[graft.functions.NearestCentroid]]
    * per-row expression over driver-embedded centroids: the assignment
    * stage is scan-bound — no crossJoin row amplification, no aggregate,
    * no shuffle (min_by/window formulations either sort-aggregate — a
    * struct buffer disqualifies HashAggregate — or shuffle k×N rows).
    */
  private[graft] def assignTo(v: DataFrame,
      centroids: Seq[(Long, Seq[Double])]): DataFrame = {
    val sorted = centroids.sortBy(_._1)
    v.select(col("vec_id"), col("v"),
        graft.functions.NearestCentroid(col("v"), sorted.map(_._1), sorted.map(_._2)).as("m"))
      .select(col("vec_id"), col("m.cluster_id").as("cluster_id"),
        col("m.dist2").as("dist2"), col("v"))
  }

  /** Full Lloyd training: assign → recompute means, up to `maxIters`
    * rounds, stopping early at a fixed point (new centroids == old, an
    * exact driver-side comparison of k × dim doubles). Per round exactly
    * ONE Spark job: the per-row assignment expression feeds lloydStep's
    * (cluster, position) partial aggregation and the k-row result is
    * collected — centroid state lives on the driver (bounded, the
    * broadcast-join reasoning), so there is no iterative lineage to
    * checkpoint at all. The corpus projection is persisted once and
    * re-scanned per round. Returns `(cluster_id, centroid, n_assigned)`
    * of the final round.
    *
    * A cluster that empties in some round RETAINS its previous centroid
    * (and surfaces n_assigned = 0) instead of silently vanishing — the
    * model always trains with exactly the seeded k. `seeds` overrides
    * the default lowest-id seeding (pass [[seedsPP]] for D² seeding).
    */
  def kmeansTrain(vectors: DataFrame, k: Int, maxIters: Int = 10,
      idCol: String = "vec_id", embCol: String = "embedding",
      seeds: Option[Seq[(Long, Seq[Double])]] = None): DataFrame = {
    require(maxIters >= 1, s"maxIters must be >= 1: $maxIters")
    val spark = vectors.sparkSession
    val v = vectors.select(col(idCol).as("vec_id"), toDoubleVec(col(embCol)).as("v"))
      .persist()
    try {
      var centroids = seeds.map(_.sortBy(_._1)).getOrElse(seedCentroids(v, k))
      var i = 0
      var stop = false
      while (i < maxIters && !stop) {
        val updated = lloydStep(assignTo(v, centroids))
          .select(col("cluster_id").cast("long"), col("centroid"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1)))
          .toMap
        // empty clusters keep their previous centroid
        val next = centroids.map { case (cid, c) => (cid, updated.getOrElse(cid, c)) }
        stop = next == centroids
        centroids = next
        i += 1
      }
      import spark.implicits._
      val counts = assignTo(v, centroids)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_assigned"))
      centroids.toDF("cluster_id", "centroid")
        .join(counts, Seq("cluster_id"), "left")
        .select(col("cluster_id"), col("centroid"),
          coalesce(col("n_assigned"), lit(0L)).as("n_assigned"))
    } finally { v.unpersist(); () }
  }

  /** One Lloyd update over an assignment: element-wise mean of each
    * cluster's vectors via posexplode + per-(cluster, position) hash
    * aggregation — map-side partial sums, one shuffle on (cluster, pos),
    * never a whole-vector reduce on a single task.
    */
  def lloydStep(assigned: DataFrame, clusterCol: String = "cluster_id",
      vecCol: String = "v"): DataFrame =
    assigned.select(col(clusterCol).as("cluster_id"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("cluster_id"), col("pos"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .groupBy(col("cluster_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), (col("sx") / col("n")).as("m")))),
        e => e("m")).as("centroid"), max(col("n")).as("n_assigned"))

  /** Product-quantization codebooks: the embedding dimension splits into
    * `m` contiguous subspaces, each with `k` centroids seeded from the k
    * lowest-id vectors' subvectors (the deterministic [[seedCentroids]]
    * contract — swap in per-subspace [[kmeansTrain]] for trained
    * codebooks; the seeding keeps the oracle bit-exact). Driver state =
    * m × k × (dim/m) = k × dim doubles — the broadcast-join bound.
    * Returns, per subspace, the centroid list indexed by code 0..k−1
    * (code order = ascending seed vec_id).
    */
  def pqCodebooks(vectors: DataFrame, m: Int, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): Seq[Seq[Seq[Double]]] = {
    val v = vectors.select(col(idCol).as("vec_id"), toDoubleVec(col(embCol)).as("v"))
    val seeds = seedCentroids(v, k)
    val dim = seeds.head._2.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    (0 until m).map(s => seeds.map(_._2.slice(s * sub, (s + 1) * sub)))
  }

  /** PQ encode: each vector becomes its `m` per-subspace nearest-centroid
    * codes — `m` [[graft.functions.NearestCentroid]] argmin expressions
    * over driver-embedded codebooks, so encoding is scan-bound with NO
    * shuffle and no join. At 100 TB this is the whole point: the encoded
    * table is m small ints per vector (m·log₂k bits of information)
    * instead of dim floats — a 256-byte embedding compresses to a
    * 4-code row the ADC scan reads instead of the vector.
    */
  def pqEncode(vectors: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val m = codebooks.length
    val k = codebooks.head.length
    val sub = codebooks.head.head.length
    val v = vectors.select(col(idCol).as("vec_id"), toDoubleVec(col(embCol)).as("v"))
    val codeCols = (0 until m).map { s =>
      graft.functions.NearestCentroid(slice(col("v"), s * sub + 1, sub),
        (0L until k.toLong), codebooks(s)).getField("cluster_id")
    }
    v.select(col("vec_id"), array(codeCols: _*).as("codes"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: each query
    * precomputes its m × k distance table dist²(q_s, c) — ONE flattened
    * s-major array column on the (tiny, broadcast) query side — and
    * scoring a candidate is a pure in-row lookup-and-fold over its m
    * codes: O(m) adds per pair instead of O(dim) multiplies, reading
    * 4 codes instead of the vector. approx_d2 = Σ_s table[s][code_s],
    * folded in fixed subspace order (left fold ⇒ bit-exact in any
    * engine). Top-k per query through the bounded-heap TopKPerKey
    * operator — never a global sort. This full-corpus ADC scan is the
    * IVFADC building block: compose with the IVF label join (s2/s5) to
    * restrict candidates to probed cells at scale.
    */
  def pqAdcTopK(vectors: DataFrame, queries: DataFrame, m: Int, k: Int,
      topK: Int): DataFrame = {
    val cb = pqCodebooks(vectors, m, k)
    val sub = cb.head.head.length
    val encoded = pqEncode(vectors, cb)
    val dCols: Seq[Column] = for (s <- 0 until m; c <- 0 until k) yield {
      val qs = slice(col("qv"), s * sub + 1, sub)
      // ‖c‖² as the same driver-side left fold VectorDot performs
      val cc = cb(s)(c).foldLeft(0.0)((a, x) => a + x * x)
      dot(qs, qs) + lit(cc) - lit(2.0) * dot(qs, typedLit(cb(s)(c)))
    }
    val q = queries.select(col("qid"), array(dCols: _*).as("darr"))
    val scored = encoded.crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, s) => acc + element_at(col("darr"),
            (s * k).cast("int") + element_at(col("codes"), s + 1).cast("int") + lit(1)))
          .as("approx_d2"))
    TopK.perKey(scored, keys = Seq("qid"),
      orderBy = Seq(TopK.asc("approx_d2"), TopK.asc("vec_id")), k = topK)
  }

  /** The full IVF-PQ serving pipeline — coarse quantizer restricts
    * candidates to the query's cell, ADC over codes shortlists `r`, and
    * only the shortlist is reranked with exact cosine against the raw
    * vectors. This is THE production ANN read path at 100 TB: the scan
    * touches one inverted list's worth of m-byte codes, and the
    * expensive exact arithmetic runs on q × r rows, never the corpus.
    * Composition of [[kmeansAssign]] (labels), [[pqEncode]] (codes) and
    * [[pqAdcTopK]]'s distance-table trick; the rerank join sends the
    * tiny shortlist INTO the corpus scan as a broadcast, so the raw
    * embedding column is read but never shuffled.
    *
    * Exact like the other oracle queries: seed centroids/codebooks, left
    * folds, (dist², vec_id) and (cosine desc, vec_id) tie-breaks.
    */
  def ivfPqTopK(vectors: DataFrame, queryFilter: Column, nCells: Int,
      m: Int, k: Int, r: Int, topK: Int): DataFrame = {
    val labels = kmeansAssign(vectors, k = nCells)
      .select(col("vec_id"), col("cluster_id").as("label"))
    val cb = pqCodebooks(vectors, m, k)
    val sub = cb.head.head.length
    val encoded = pqEncode(vectors, cb).join(labels, "vec_id")
    val dCols: Seq[Column] = for (s <- 0 until m; c <- 0 until k) yield {
      val qs = slice(col("qv"), s * sub + 1, sub)
      val cc = cb(s)(c).foldLeft(0.0)((a, x) => a + x * x)
      dot(qs, qs) + lit(cc) - lit(2.0) * dot(qs, typedLit(cb(s)(c)))
    }
    val q = vectors.filter(queryFilter)
      .select(col("vec_id").as("qid"), toDoubleVec(col("embedding")).as("qv"))
      .join(labels.withColumnRenamed("vec_id", "qid"), "qid")
      .select(col("qid"), col("qv"), col("label").as("qlabel"),
        array(dCols: _*).as("darr"))
    // the shortlist exchange carries only (qid, vec_id, approx_d2) — the
    // query vector rejoins at rerank time from the tiny broadcast side
    val scored = encoded.join(broadcast(q),
        col("label") === col("qlabel") && col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, s) => acc + element_at(col("darr"),
            (s * k).cast("int") + element_at(col("codes"), s + 1).cast("int") + lit(1)))
          .as("approx_d2"))
    val shortlist = TopK.perKey(scored, keys = Seq("qid"),
      orderBy = Seq(TopK.asc("approx_d2"), TopK.asc("vec_id")), k = r)
    // exact rerank: shortlist broadcasts into the corpus scan
    val v = vectors.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("vn", norm(col("v")))
    val reranked = v.join(broadcast(shortlist.select(col("qid"), col("vec_id"))), "vec_id")
      .join(broadcast(q.select(col("qid"), col("qv"), norm(col("qv")).as("qn"))), "qid")
      .select(col("qid"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("vn"))).as("cosine"))
    reranked.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("vec_id").asc)).cast("int"))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank"), col("vec_id"), col("cosine"))
  }

  /** Embedding near-duplicate pairs: same-partition blocking + cosine
    * threshold. Quadratic only within a block.
    */
  /** SemDeDup (semantic deduplication, Abbas et al. 2023's recipe
    * re-expressed relationally): cluster the embedding space with the
    * coarse quantizer, then search near-duplicate pairs ONLY within a
    * cluster — the cell-bounded pair search that makes semantic dedup
    * tractable: the quadratic term is Σ|cell|², controlled by `k`, never
    * corpus². Representative choice is deterministic keep-earliest-id
    * (the paper keeps the vector closest to the centroid; earliest-id is
    * the engine-reproducible variant and matches the d10 text-dedup
    * contract). Assignment is the scan-bound seeded [[kmeansAssign]] —
    * swap in [[kmeansTrain]] centroids (and a larger k) at real scale;
    * the pair join shuffles once on cluster_id.
    *
    * Returns the SURVIVORS as (vec_id, cluster_id).
    */
  def semDedup(vectors: DataFrame, k: Int = -1, threshold: Double): DataFrame = {
    // Default path derives k from the corpus count via the D37 law
    // (k = max(4, ceil(N/250)) — [[semDedupScaled]]'s measured-linear
    // sizing, VERDICT r13 task 2): a caller who does not pin k CANNOT
    // instantiate the d16-style saturated clustering where Σ|cell|² =
    // N²/k goes quadratic once the corpus outgrows k·targetCell.
    // Explicit k stays available for labeled baselines (the d16
    // registry row).
    if (k < 0) return semDedupScaled(vectors, targetCell = 250, threshold)
    val assigned = kmeansAssign(vectors, k).select(col("vec_id"), col("cluster_id"))
    val clustered = vectors.join(assigned, "vec_id")
    val removed = nearDupPairs(clustered, "cluster_id", threshold)
      .select(col("vb").as("vec_id")).distinct()
    clustered.select(col("vec_id"), col("cluster_id"))
      .join(removed, Seq("vec_id"), "left_anti")
  }

  /** [[semDedup]] with the cell count GROWN to the corpus — the d16
    * capacity twin (the D36 recipe applied to SemDeDup, VERDICT r12):
    * a k pinned at any constant makes the within-cell pair term
    * Σ|cell|² = N²/k quadratic once the corpus outgrows k·targetCell;
    * k = ⌈N / targetCell⌉ bounds the EXPECTED cell at `targetCell`, so
    * the pair term is N·targetCell — linear in the corpus. The count
    * is one driver-side scan (the same bounded-action reasoning as the
    * Prefix offset collect); seeding/assignment stay the deterministic
    * lowest-id [[kmeansAssign]] so the oracle restates the identical
    * pipeline with k from a scalar subquery. The flat nearest-centroid
    * scan is N·k·dim — subdominant at the measured SFs (k centroids
    * broadcast; 2⁹ × 64 doubles at sf10); past that a deployment
    * two-levels the assignment itself (IVF over the centroid set, the
    * s5/s6 machinery) — the pair-search law this twin measures is
    * unchanged by how the assignment is accelerated.
    */
  def semDedupScaled(vectors: DataFrame, targetCell: Int, threshold: Double,
      minK: Int = 4): DataFrame = {
    require(targetCell >= 1, s"targetCell must be >= 1: $targetCell")
    val n = vectors.count()
    val k = math.max(minK, math.ceil(n.toDouble / targetCell).toInt)
    semDedup(vectors, k, threshold)
  }

  /** Sign-bit binary signature of an embedding: bit i is set iff
    * element i+1 is strictly positive. `bits` ≤ 63 keeps the sign bit
    * clear (the m6 precedent — BIGINT shifts stay in range on every
    * engine). Built as a static OR-chain of per-bit conditionals —
    * fully codegen'd, no interpreted higher-order fold.
    */
  def binarySignature(vec: Column, bits: Int = 63): Column = {
    require(bits >= 1 && bits <= 63, s"bits must be in [1, 63]: $bits")
    // NaN elements map to bit 0 EXPLICITLY: engines disagree on NaN>0
    // (Spark's total order ranks NaN above all values, IEEE says false),
    // so signatures must not depend on comparison semantics.
    (0 until bits).map { i =>
      val e = element_at(vec, i + 1)
      when(!isnan(e) && e > lit(0d), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Global cosine RANGE search — all pairs with cosine ≥ `threshold`
    * among sign-LSH-similar vectors: the stated predicate is
    * hamming(sig_a, sig_b) ≤ maxHamming AND cosine ≥ threshold over
    * the 63-sign-bit signatures, and the pigeonhole banding finds ALL
    * such pairs (hamming < bands ⇒ one band slice equal), so the
    * result is EXACT for the declared semantics — not a recall-lossy
    * approximation of pure cosine-τ (which is quadratic by necessity
    * with no blocking key; the sign prefilter IS the blocking). This
    * is the range-query complement of top-k retrieval (s1/s12): "find
    * EVERYTHING similar to everything", the shape an unblocked
    * semantic-dedup or link-discovery pass runs. Scale: band keys
    * shuffle (8-byte longs), vectors never ride the banding; only
    * candidates — bounded by Σ|bucket|² with the generic oversize
    * guard — touch the 64-multiply dot product.
    */
  def rangeSearchLsh(vectors: DataFrame, threshold: Double,
      maxHamming: Int = 7, bands: Int = 8,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val v = vectors
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("sig", binarySignature(col("v"), 63))
      .localCheckpoint() // feeds both banding sides + two verify joins
    // maxBucket defaults UNBOUNDED here, unlike the dedup callers: the
    // EXACT-predicate contract (and the s15 oracle's caveat-free
    // quadratic statement) cannot survive a silent bucket prune. A
    // caller that opts into a finite cap on a sign-degenerate corpus
    // accepts recall loss and should monitor it via the
    // oversizedHammingBuckets pattern.
    val cand = Dedup.hammingNearDup(v.select(col("vec_id"), col("sig")),
      nBits = 64, bands = bands, maxHamming = maxHamming,
      idCol = "vec_id", sigCol = "sig", maxBucket = maxBucket)
    cand
      .join(v.select(col("vec_id").as("da"), col("v").as("__va")), "da")
      .join(v.select(col("vec_id").as("db"), col("v").as("__vb")), "db")
      .select(col("da").as("va"), col("db").as("vb"), col("hamming"),
        (dot(col("__va"), col("__vb"))
          / (norm(col("__va")) * norm(col("__vb")))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Binary-embedding retrieval: Hamming-distance shortlist over
    * [[binarySignature]] sign bits, exact-cosine rerank of the
    * shortlist only — the s11 two-stage shape with the cheapest
    * possible coarse metric. The shortlist pass reads 8-byte
    * signatures instead of 64 floats (32× less I/O when the signature
    * is stored as its own column) and replaces 64 multiply-adds per
    * pair with one XOR + popcount; candidates stream through the
    * TopKPerKey bounded heaps as (qid, vec_id, hamming) triples —
    * vectors never ride the heaps. Ties are total on (hamming,
    * vec_id), so the shortlist is deterministic and engine-exact; the
    * rerank joins q × shortlist ids back to full vectors.
    */
  def binaryTopK(vectors: DataFrame, queries: DataFrame, bits: Int,
      shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k && k >= 1,
      s"bad retrieval parameters: shortlist=$shortlist k=$k")
    val v = vectors.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val vs = v.select(col("vec_id"), binarySignature(col("v"), bits).as("sig"))
    val q = queries.select(col("qid"), col("qv"),
        binarySignature(col("qv"), bits).as("qsig"), norm(col("qv")).as("qn"))
    val scored = vs.join(broadcast(q.select(col("qid"), col("qsig"))),
        col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        bit_count(col("qsig").bitwiseXOR(col("sig"))).cast("long").as("hamming"))
    val short = TopK.perKey(scored, Seq("qid"),
      Seq(TopK.asc("hamming"), TopK.asc("vec_id")), shortlist)
    // exact rerank: shortlist ids back to full vectors — raw vectors
    // are read in this scan, never carried through the heaps
    val rer = short.select(col("qid"), col("vec_id"), col("hamming"))
      .join(v, "vec_id")
      .join(broadcast(q.select(col("qid"), col("qv"), col("qn"))), "qid")
      .select(col("qid"), col("vec_id"), col("hamming"),
        (dot(col("qv"), col("v")) / (col("qn") * norm(col("v")))).as("cosine"))
    rer.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
  }

  /** Matryoshka-style truncated-dimension retrieval: shortlist by
    * cosine over the PREFIX of each embedding (MRL-trained embeddings
    * front-load information by dimension), then exact-rerank ONLY the
    * shortlist with full vectors — the s9 two-stage shape with
    * dimension truncation as the cheap metric. The shortlist pass does
    * dPrefix/dim of the FLOPs (store the prefix as its own narrow
    * column at scale and the scan reads dPrefix of dim values); the
    * rerank touches q × shortlist rows. Shortlisting runs through the
    * TopKPerKey operator (bounded heaps), the final top-k is a window
    * over q × shortlist rows only.
    */
  def truncatedTopK(vectors: DataFrame, queries: DataFrame, dPrefix: Int,
      shortlist: Int, k: Int): DataFrame = {
    require(dPrefix >= 1 && shortlist >= k && k >= 1,
      s"bad truncation parameters: dPrefix=$dPrefix shortlist=$shortlist k=$k")
    val v = vectors.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val vp = v.select(col("vec_id"), slice(col("v"), 1, dPrefix).as("vp"))
      .withColumn("vpn", norm(col("vp")))
    val q = queries.select(col("qid"), col("qv"),
        slice(col("qv"), 1, dPrefix).as("qp"))
      .withColumn("qpn", norm(col("qp")))
      .withColumn("qn", norm(col("qv")))
    val scored = vp.join(broadcast(q.select(col("qid"), col("qp"), col("qpn"))),
        col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        (dot(col("qp"), col("vp")) / (col("qpn") * col("vpn"))).as("approx_cos"))
    val short = TopK.perKey(scored, Seq("qid"),
      Seq(TopK.desc("approx_cos"), TopK.asc("vec_id")), shortlist)
    // exact rerank: join the shortlist ids back to full vectors — raw
    // vectors are read in this scan, never carried through the heaps
    val rer = short.select(col("qid"), col("vec_id"))
      .join(v, "vec_id")
      .join(broadcast(q.select(col("qid"), col("qv"), col("qn"))), "qid")
      .select(col("qid"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qn") * norm(col("v")))).as("cosine"))
    rer.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
  }

  /** ANN quality evaluation: per-query recall@k of an approximate
    * result list against exact ground truth — the harness that justifies
    * every IVF/PQ knob (nprobe, k, codebook size) with a number. Both
    * inputs are (qid, vec_id) lists of ≤ q×k rows, so the left-semi hit
    * join and the two aggregates never touch a vector — at 100 TB the
    * evaluation costs what the two retrieval runs cost, nothing more.
    * Queries the approximate run missed entirely surface as recall 0.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val hits = exact.select(col("qid"), col("vec_id"))
      .join(approx.select(col("qid"), col("vec_id")), Seq("qid", "vec_id"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
    exact.groupBy(col("qid")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("qid"), "left_outer")
      .select(col("qid"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_exact").cast("double")).as("recall"))
  }

  /** k-NN GRAPH construction with NN-Descent refinement — the
    * build side of graph-based ANN (the HNSW/DiskANN essence, Spark
    * batch shape). Initial edges come from the IVF structure the
    * corpus already has (within-cell exact top-`g` — bounded by
    * Σ|cell|², the SemDeDup/D16 argument); each refinement round then
    * proposes NEIGHBOR-OF-NEIGHBOR candidates over the symmetrized
    * edge set (Dong et al.'s NN-Descent observation: a neighbor of my
    * neighbor is likely my neighbor), scores exactly, and keeps the
    * best `g` per vertex — cross-cell edges appear here, which is
    * what lifts graph search past the nprobe=1 recall ceiling.
    *
    * Scale shape: the vector frame is pinned once (id-keyed joins
    * fetch embeddings; vectors never ride the candidate shuffles —
    * only (src, dst) id pairs do); per round ONE edge self-join
    * bounded by Σ deg² = n·(2g)², one distinct, one scoring join,
    * one bounded-heap TopKPerKey; every round localCheckpoints (the
    * iterative-loop discipline — a self-join over unpinned lineage
    * stacks recomputation multiplicatively). Fixed `rounds`, no
    * convergence join.
    *
    * Returns (src, dst, cosine): each vertex's `g` best neighbors.
    */
  def knnGraph(vectors: DataFrame, g: Int, rounds: Int,
      labelCol: String = "label", bridges: Int = 2): DataFrame = {
    require(g >= 1 && rounds >= 0 && bridges >= 0)
    val v = pinVectors(vectors, labelCol)
    val withinTopG = TopK.perKey(scoreSameCell(v, v), Seq("src"),
      Seq(TopK.desc("cosine"), TopK.asc("dst")), g)
    refineKnnGraph(v, withinTopG, g, rounds, bridges)
  }

  /** Pin a vector frame to the (vec_id, lbl, v, vn) shape every
    * knn-graph stage keys on — shared with the streaming maintenance
    * (ST32) so batch and maintained builds score IDENTICAL doubles.
    */
  private[graft] def pinVectors(vectors: DataFrame, labelCol: String): DataFrame =
    vectors.select(col("vec_id"), col(labelCol).as("lbl"),
        toDoubleVec(col("embedding")).as("v"))
      .withColumn("vn", norm(col("v"))).localCheckpoint()

  /** All ordered same-cell pairs (src from `srcs`, dst from `dsts`,
    * src ≠ dst) with exact cosine — the knn-graph init candidates.
    * Batch passes (v, v); the streaming maintenance passes
    * (allV, newV) ∪ (newV, priorV) so only NEW-touching pairs are ever
    * re-scored.
    */
  private[graft] def scoreSameCell(srcs: DataFrame, dsts: DataFrame): DataFrame =
    srcs.as("a").join(dsts.as("b"),
        col("a.lbl") === col("b.lbl") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        (dot(col("a.v"), col("b.v")) / (col("a.vn") * col("b.vn"))).as("cosine"))

  /** Bridge edges + NN-Descent refinement over a pinned vector frame
    * `v` and the within-cell top-`g` edge set — the part of [[knnGraph]]
    * that is LINEAR in the corpus (n·(2g)² proposals, n·bridges bridge
    * scorings) and therefore re-derived per trigger by the streaming
    * maintenance, while the quadratic within-cell init is maintained
    * incrementally (see StreamAggState.maintainKnnGraph).
    */
  private[graft] def refineKnnGraph(v: DataFrame, withinTopG: DataFrame,
      g: Int, rounds: Int, bridges: Int): DataFrame = {
    require(g >= 1 && rounds >= 0 && bridges >= 0)
    val bySrc = v.select(col("vec_id").as("src"), col("v").as("sv"),
      col("vn").as("sn"))
    val byDst = v.select(col("vec_id").as("dst"), col("v").as("dv"),
      col("vn").as("dn"))
    def scorePairs(pairs: DataFrame): DataFrame =
      pairs.join(bySrc, "src").join(byDst, "dst")
        .select(col("src"), col("dst"),
          (dot(col("sv"), col("dv")) / (col("sn") * col("dn"))).as("cosine"))
    // Cross-cell BRIDGE edges: label-blocked init alone yields one
    // island per cell (NN-Descent proposes neighbors OF neighbors, so
    // it can never connect components with no initial edge between
    // them — expansion search would degenerate to exactly the IVF
    // cell). Each node gets `bridges` deterministic md5-chosen cell
    // representatives (min vec_id per cell — a #cells-sized frame);
    // refinement rounds then REPLACE these arbitrary bridges with
    // genuinely near cross-cell neighbors found through them.
    // reps is #cells rows and was already driver-collected by the
    // broadcast join below — collect it ONCE (pick = lbl-ascending
    // index, the same numbering the old row_number window produced)
    // instead of paying a count() action PLUS a broadcast-build job
    // that re-plans the aggregate (the s13 micro-job tax: the query is
    // job-count-bound, not compute-bound)
    val repAgg = v.groupBy(col("lbl")).agg(min(col("vec_id")).as("rep"))
    val repRows = repAgg.orderBy(col("lbl")).select(col("rep")).collect()
    val nCells = repRows.length.toLong
    val reps = v.sparkSession.createDataFrame(
      java.util.Arrays.asList(repRows.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(i.toLong, r.get(0)) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pick",
          org.apache.spark.sql.types.LongType, nullable = false),
        repAgg.schema("rep"))))
    val bridgePairs = v.select(col("vec_id").as("src"),
        explode(array((1 to bridges).map(j => lit(j)): _*)).as("j"))
      .select(col("src"),
        pmod(conv(substring(md5(concat(col("src").cast("string"),
          lit(":"), col("j"))), 1, 8), 16, 10).cast("long"),
          lit(nCells)).as("pick"))
      .join(broadcast(reps), "pick")
      .select(col("src"), col("rep").as("dst"))
      .filter(col("src") =!= col("dst"))
    // bridges ride BESIDE the within-cell top-g (not through it — an
    // arbitrary bridge never out-scores a genuine cell neighbor and
    // would be cut immediately, resurrecting the islands); the first
    // refinement round's top-g then keeps only edges that earn their
    // place. max() is pure dedup: cosine is deterministic per pair.
    val init = withinTopG
      .union(scorePairs(bridgePairs))
      .groupBy(col("src"), col("dst")).agg(max(col("cosine")).as("cosine"))
    var graph = init.localCheckpoint()
    for (_ <- 1 to rounds) {
      // symmetrize, but CAP each vertex's adjacency at 2g best rows —
      // without the cap every bridge target is a hub with ~n·bridges/
      // #cells reverse edges and the proposal join squares that (the
      // NN-Descent reverse-neighbor-sampling issue); with it the round
      // is bounded by n·(2g)² proposals whatever the degree skew
      val sym = TopK.perKey(
        graph.select(col("src").as("a"), col("dst").as("b"), col("cosine"))
          .union(graph.select(col("dst").as("a"), col("src").as("b"),
            col("cosine"))),
        Seq("a"), Seq(TopK.desc("cosine"), TopK.asc("b")), 2 * g)
        .select(col("a"), col("b"))
      val proposals = sym.as("x").join(sym.as("y"), col("x.b") === col("y.a"))
        .select(col("x.a").as("src"), col("y.b").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      // cosine is deterministic per (src, dst), so max() is pure dedup
      // between the kept edges and freshly scored proposals
      val merged = graph.select(col("src"), col("dst"), col("cosine"))
        .union(scorePairs(proposals))
        .groupBy(col("src"), col("dst")).agg(max(col("cosine")).as("cosine"))
      graph = TopK.perKey(merged, Seq("src"),
        Seq(TopK.desc("cosine"), TopK.asc("dst")), g).localCheckpoint()
    }
    graph
  }

  /** Beam search over a [[knnGraph]] — the serve side of graph ANN:
    * each query starts from the `entries` lowest-id vectors, and each
    * hop expands the current beam's out-edges, scores the newly
    * reachable vectors exactly, and keeps the best `beamWidth` per
    * query (bounded heaps, never a window sort). All frames carry
    * (qid, vec_id) ids — vectors are fetched by an id join at scoring
    * time and never ride the frontier shuffles; each hop
    * localCheckpoints. With a beam wide enough for the graph's
    * connectivity the search CONVERGES to the exact top-k (what the
    * s13 oracle pins on this corpus); tighter beams trade recall for
    * probe cost, measured by [[recallAtK]].
    *
    * Entry points default to the lowest `entries` ids; pass
    * `entryPoints` (a vec_id frame — e.g. one per IVF cell, the
    * coarse-layer idea) when the graph may be disconnected across
    * well-separated clusters: NN-Descent proposes neighbors OF
    * neighbors, so it never bridges clusters with no initial edge
    * between them, and a beam seeded inside one island stays there.
    *
    * `queries` carries (qid, qv) double-widened; output mirrors
    * [[bruteForceTopK]]: (qid, rank, vec_id, cosine).
    */
  def beamSearchTopK(vectors: DataFrame, queries: DataFrame, graph: DataFrame,
      beamWidth: Int, hops: Int, k: Int, entries: Int = 4,
      entryPoints: Option[DataFrame] = None): DataFrame = {
    require(beamWidth >= k && hops >= 0 && entries >= 1)
    val v = vectors.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("vn", norm(col("v"))).localCheckpoint()
    val q = queries.select(col("qid"), col("qv"))
      .withColumn("qn", norm(col("qv")))
    def score(cand: DataFrame): DataFrame =
      cand.join(v, "vec_id").join(broadcast(q), "qid")
        .filter(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"),
          (dot(col("qv"), col("v")) / (col("qn") * col("vn"))).as("cosine"))
    val edges = graph.select(col("src"), col("dst")).localCheckpoint()
    val entryIds = entryPoints.map(_.select(col("vec_id")))
      .getOrElse(v.orderBy(col("vec_id")).limit(entries).select(col("vec_id")))
    var beam = TopK.perKey(
      score(q.select(col("qid")).crossJoin(broadcast(entryIds))),
      Seq("qid"), Seq(TopK.desc("cosine"), TopK.asc("vec_id")), beamWidth)
      .localCheckpoint()
    for (_ <- 1 to hops) {
      val frontier = beam.select(col("qid"), col("vec_id"))
        .join(edges, col("vec_id") === col("src"))
        .select(col("qid"), col("dst").as("vec_id"))
        .union(beam.select(col("qid"), col("vec_id")))
        .distinct()
      beam = TopK.perKey(score(frontier), Seq("qid"),
        Seq(TopK.desc("cosine"), TopK.asc("vec_id")), beamWidth)
        .localCheckpoint()
    }
    TopK.perKey(beam, Seq("qid"),
        Seq(TopK.desc("cosine"), TopK.asc("vec_id")), k)
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("cosine").desc, col("vec_id").asc)))
  }

  /** Graph-EXPANSION search over a [[knnGraph]] — the provably-bounded
    * serving path for corpus-member queries (the KGraph/NN-expansion
    * idea): candidates are exactly the query node's ≤`hops`-step
    * out-neighborhood (g + g² + … vectors — the probe-cost budget a
    * graph index exists to enforce), ranked by EXACT cosine. Unlike
    * [[beamSearchTopK]] there is no per-hop pruning, so the candidate
    * set is a pure reachability closure — deterministic, and fully
    * restatable in SQL, which is what lets the s13 oracle pin the
    * whole build+search pipeline end to end. Frontier frames carry
    * (qid, vec_id) ids only; each hop localCheckpoints.
    *
    * Output mirrors [[bruteForceTopK]]: (qid, rank, vec_id, cosine).
    */
  def graphExpandTopK(vectors: DataFrame, queries: DataFrame,
      graph: DataFrame, hops: Int, k: Int): DataFrame = {
    require(hops >= 1 && k >= 1)
    // No checkpoints here (the s13 job-count lesson): `v` is consumed
    // exactly ONCE (the scoring join) so pinning it materialized the
    // whole vector frame for nothing; `graph` arrives already pinned
    // from knnGraph (and the hop count is a small constant, so even
    // unpinned the re-planned frontier subtrees are `hops` shallow
    // broadcast joins of q×g^hop-bounded id frames, not multiplying
    // lineage) — the whole expansion now runs as ONE action instead
    // of 1 (v pin) + 1 (edges pin) + hops (frontier pins).
    val v = vectors.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("vn", norm(col("v")))
    val q = queries.select(col("qid"), col("qv"))
      .withColumn("qn", norm(col("qv")))
    val edges = graph.select(col("src"), col("dst"))
    var frontier = q.select(col("qid"), col("qid").as("vec_id"))
    var reached = frontier
    for (_ <- 1 to hops) {
      frontier = frontier.join(edges, frontier("vec_id") === edges("src"))
        .select(col("qid"), col("dst").as("vec_id")).distinct()
      reached = reached.union(frontier)
    }
    val cand = reached.distinct().filter(col("qid") =!= col("vec_id"))
    val scored = cand.join(v, "vec_id").join(broadcast(q), "qid")
      .select(col("qid"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("vn"))).as("cosine"))
    TopK.perKey(scored, Seq("qid"),
        Seq(TopK.desc("cosine"), TopK.asc("vec_id")), k)
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("cosine").desc, col("vec_id").asc)))
  }

  final case class MmrPick(qid: Long, rank: Int, vec_id: Long,
      relevance: Double, mmr_score: Double)

  /** Maximal Marginal Relevance re-ranking (S14) — the diversity pass
    * between retrieval and the consumer: from a per-query SHORTLIST
    * (any retrieval path's output: (qid, vec_id, cosine)), select k
    * items greedily by argmax of λ·relevance − (1−λ)·max-similarity-to-
    * already-selected (Carbonell & Goldstein '98) — near-duplicate
    * hits stop crowding out coverage. λ=1 degenerates to plain top-k.
    *
    * Scale shape: the quadratic term is per-QUERY (≤ shortlist² sims,
    * shortlist is a bounded constant), run inside one mapGroups task
    * per query — queries distribute, vectors join on by id before the
    * group (the shortlist never carries more than its own rows'
    * embeddings). Deterministic: ties break (score desc, vec_id asc);
    * all arithmetic is the same left-fold dot/norm as VectorDot.
    */
  def mmrRerank(shortlist: DataFrame, vectors: DataFrame, k: Int,
      lambda: Double): DataFrame = {
    require(k >= 1 && lambda >= 0 && lambda <= 1)
    val spark = shortlist.sparkSession
    import spark.implicits._
    val withVec = shortlist.select(col("qid").cast("long"),
        col("vec_id").cast("long"), col("cosine").cast("double"))
      .join(vectors.select(col("vec_id").cast("long"),
        toDoubleVec(col("embedding")).as("v")), "vec_id")
      .select(col("qid"), col("vec_id"), col("cosine"), col("v"))
      .as[(Long, Long, Double, Seq[Double])]
    withVec.groupByKey(_._1).flatMapGroups { (qid, it) =>
      val cand = it.map { case (_, id, rel, v) => (id, rel, v.toArray) }
        .toArray.sortBy(c => (-c._2, c._1))
      def dotN(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }
        s
      }
      def cos(a: Array[Double], b: Array[Double]): Double =
        dotN(a, b) / (math.sqrt(dotN(a, a)) * math.sqrt(dotN(b, b)))
      val selected = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
      val chosen = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      val used = scala.collection.mutable.BitSet.empty
      var rank = 1
      while (rank <= k && used.size < cand.length) {
        var bestIdx = -1
        var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < cand.length) {
          if (!used(i)) {
            val maxSim = if (chosen.isEmpty) 0.0
              else chosen.map(s => cos(cand(i)._3, s)).max
            val score = lambda * cand(i)._2 - (1.0 - lambda) * maxSim
            // strict > with candidates pre-sorted (rel desc, id asc)
            // makes ties deterministic
            if (score > bestScore) { bestScore = score; bestIdx = i }
          }
          i += 1
        }
        used += bestIdx
        chosen += cand(bestIdx)._3
        selected += MmrPick(qid, rank, cand(bestIdx)._1, cand(bestIdx)._2,
          bestScore)
        rank += 1
      }
      selected.iterator
    }.toDF()
  }

  def nearDupPairs(vectors: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    val e = vectors.select(col("vec_id"), col(blockCol).as("blk"),
      toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    e.as("a").join(e.as("b"),
        col("a.blk") === col("b.blk") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
