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
      .withColumn("vv", dot(col("v"), col("v")))
    val seeds = v.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    assignTo(v, seeds).select(col("vec_id"), col("cluster_id"), col("dist2"))
  }

  /** Nearest-centroid argmin against a broadcast centroid frame
    * `(cid, c)`. The argmin is a `min_by` HASH aggregate keyed on the
    * vector id — partial aggregation does the per-vector argmin map-side,
    * so the shuffle carries N rows (one per vector), not k×N, and there
    * is no per-key window sort. Ties break on (dist2, cid) — identical
    * to `row_number() ... ORDER BY dist2, cid`.
    */
  private[operators] def assignTo(v: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids.withColumn("cc", dot(col("c"), col("c")))
    v.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cid"),
        (col("vv") + col("cc") - lit(2.0) * dot(col("v"), col("c"))).as("dist2"))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cid"), col("dist2"), col("v")),
        struct(col("dist2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cluster_id"),
        col("m.dist2").as("dist2"), col("m.v").as("v"))
  }

  /** Full Lloyd training: assign → recompute means, up to `maxIters`
    * rounds, stopping early at a fixed point (Σ‖c_new − c_old‖² = 0 over
    * the k-row centroid frame — a cheap driver-side signal, no second
    * pass over the corpus). The iterative-Spark discipline: the corpus
    * projection is persisted ONCE and re-scanned per round; only the
    * k-row centroid frame is localCheckpoint'ed per round (cutting
    * lineage that would otherwise re-plan every previous round each
    * action). Returns `(cluster_id, centroid, n_assigned)` of the final
    * round.
    */
  def kmeansTrain(vectors: DataFrame, k: Int, maxIters: Int = 10,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(maxIters >= 1, s"maxIters must be >= 1: $maxIters")
    val v = vectors.select(col(idCol).as("vec_id"), toDoubleVec(col(embCol)).as("v"))
      .withColumn("vv", dot(col("v"), col("v")))
      .persist()
    try {
      var centroids = v.orderBy(col("vec_id")).limit(k)
        .select(col("vec_id").cast("long").as("cid"), col("v").as("c"))
        .localCheckpoint()
      var i = 0
      var stop = false
      while (i < maxIters && !stop) {
        val assigned = assignTo(v, centroids)
        val next = lloydStep(assigned)
          .select(col("cluster_id").cast("long").as("cid"), col("centroid").as("c"))
          .localCheckpoint() // one action materializes this round's k rows
        val delta = next.as("n").join(centroids.as("o"), col("n.cid") === col("o.cid"))
          .agg(coalesce(sum(graft.functions.VectorDot(
            expr("zip_with(n.c, o.c, (a, b) -> a - b)"),
            expr("zip_with(n.c, o.c, (a, b) -> a - b)"))), lit(0.0)))
          .head.getDouble(0)
        centroids = next
        stop = delta == 0.0 || delta.isNaN
        i += 1
      }
      val counts = assignTo(v, centroids)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_assigned"))
      centroids.select(col("cid").as("cluster_id"), col("c").as("centroid"))
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

  /** Embedding near-duplicate pairs: same-partition blocking + cosine
    * threshold. Quadratic only within a block.
    */
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
