package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Executable plan-shape claims for the heavy-family queries (VERDICT
  * r8 task 6): the §2 prose arguments — "no per-key sort", "the hint
  * holds", "no single-task global window" — become assertions over the
  * PLANNED physical tree, so a Spark upgrade or a lost hint fails CI
  * instead of silently regressing a 100-TB plan.
  *
  * Inspection is of the PLANNER's output (pre-execution
  * AdaptiveSparkPlanExec current plan): runtime AQE can only locally
  * IMPROVE tiny-SF stages (e.g. demote a hinted shuffle join to
  * broadcast) in ways that would mask a lost hint, and no SQLMetrics
  * are read here (the CLAUDE.md metrics caveat doesn't apply).
  * Queries run on sf0.001; node-presence claims are SF-independent.
  */
class PlanShapeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  /** Every physical node, unwrapping AQE wrappers (final or initial). */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
    case s: QueryStageExec => s +: nodes(s.plan)
    case other => other +: other.children.flatMap(nodes)
  }
  private def nodes(df: DataFrame): Seq[SparkPlan] =
    nodes(df.queryExecution.executedPlan)

  /** True iff EVERY leaf of `p` sits beneath a row-bounding node
    * (TakeOrderedAndProject / GlobalLimit / a local relation) — the
    * only inputs a global window may sort without becoming a
    * single-task corpus sort. A join of a TakeOrdered output with the
    * corpus is NOT bounded: the ADVICE r13 scoping — the limit must
    * bound every path into the window, not merely appear somewhere in
    * its child subtree.
    */
  private def boundedInput(p: SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case _: org.apache.spark.sql.execution.GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.LocalTableScanExec => true
    case a: AdaptiveSparkPlanExec => boundedInput(a.executedPlan)
    case s: QueryStageExec => boundedInput(s.plan)
    case l if l.children.isEmpty => false
    case n => n.children.forall(boundedInput)
  }

  /** The r8 scale-killer class: a WindowExec with an EMPTY partition
    * spec moves the whole input through one sort task. After the
    * Prefix.cumSums rewrite, every window in these plans must be
    * partitioned (the #partitions-sized offset frames are computed on
    * the driver now, so not even a bounded unpartitioned window
    * remains).
    */
  private def assertNoGlobalWindow(name: String): Unit = {
    val ws = nodes(q(name)).collect { case w: WindowExec => w }
    val global = ws.filter(_.partitionSpec.isEmpty)
    assert(global.isEmpty,
      s"$name has ${global.size} unpartitioned WindowExec(s) — " +
        s"single-task sort at scale:\n${global.mkString("\n")}")
  }

  test("x15/t26/t24/p21/t30: prefix-sum and contribution plans carry no unpartitioned window") {
    assertNoGlobalWindow("x15_ks_drift")
    assertNoGlobalWindow("t26_heaps_fit")
    assertNoGlobalWindow("t24_zipf_fit")
    assertNoGlobalWindow("p21_token_curriculum")
    assertNoGlobalWindow("t30_mattr")
  }

  test("d32: ExactSubstr trim plans no window, no cartesian, no sort-merge join") {
    // the operator's 100-TB claim is exactly "no pair join, no global
    // sort": fingerprint argmin is a hash aggregate, both joins hash
    val ns = nodes(q("d32_exact_substr"))
    assert(!ns.exists(_.isInstanceOf[WindowExec]), "d32 plans a window")
    assert(!ns.exists(_.isInstanceOf[CartesianProductExec]),
      "d32 plans a CartesianProduct")
  }

  test("no heavy-family query plans a CartesianProduct") {
    for (name <- Seq("x15_ks_drift", "t26_heaps_fit", "t24_zipf_fit",
        "d28_prefix_join", "d4_ngram_jaccard", "d18_containment",
        "t21_rake", "s3_topk_operator", "t23_langid_trained",
        "q49_mad_outliers", "q5_join5", "m9_audio_energy",
        "s15_range_search", "t30_mattr", "t29_burstiness",
        "d32_exact_substr", "t31_unigram_lm")) {
      val cart = nodes(q(name)).collect { case c: CartesianProductExec => c }
      assert(cart.isEmpty, s"$name plans a CartesianProduct")
    }
  }

  test("d28/d4/d18/s15: the shuffle_hash hint holds on the token/band self-joins") {
    // the Σm²-bounded candidate joins must never sort their token
    // streams (SMJ sorts both sides of the heaviest shuffle in the
    // repo); removing the hint re-plans these as SortMergeJoin and
    // fails here
    for (name <- Seq("d28_prefix_join", "d4_ngram_jaccard",
        "d18_containment", "s15_range_search")) {
      val ns = nodes(q(name))
      assert(ns.exists(_.isInstanceOf[ShuffledHashJoinExec]),
        s"$name lost its shuffle_hash hint (no ShuffledHashJoinExec)")
      assert(!ns.exists(_.isInstanceOf[SortMergeJoinExec]),
        s"$name plans a SortMergeJoin on a token self-join")
    }
  }

  test("t21/s3: bounded-heap TopKPerKeyExec present (never a window sort)") {
    for (name <- Seq("t21_rake", "s3_topk_operator")) {
      val ns = nodes(q(name))
      assert(ns.exists(_.isInstanceOf[graft.plans.TopKPerKeyExec]),
        s"$name does not plan TopKPerKeyExec")
      assert(!ns.collect { case w: WindowExec => w }
        .exists(_.partitionSpec.isEmpty), s"$name has a global window")
    }
  }

  test("t23: argmax is min_by/max_by aggregation, model join broadcasts") {
    val ns = nodes(q("t23_langid_trained"))
    assert(!ns.exists(_.isInstanceOf[WindowExec]),
      "t23 argmax regressed to a window (row_number shuffles k× the rows)")
    assert(ns.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "t23 model join is not broadcast")
  }

  test("q49: selection pipeline plans no global window, stats frames broadcast") {
    // The MAD selection subtree is inlined in the final plan since its
    // single-consumer checkpoint was dropped (r15), so Quantiles' own
    // per-(key,bucket) windows — bounded bucket-local ranks, never a
    // per-key full sort — are now visible here. The scale invariant is
    // that NO window is unpartitioned (a global sort of the corpus);
    // the bounded partitioned ones are the selection design itself.
    val ns = nodes(q("q49_mad_outliers"))
    assert(!ns.collect { case w: WindowExec => w }
      .exists(_.partitionSpec.isEmpty),
      "q49 plans a GLOBAL window sort")
    assert(ns.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 2,
      "q49 med/mad frames are not broadcast-joined")
  }

  test("q5: every dimension join broadcasts (no dim-side shuffle)") {
    val ns = nodes(q("q5_join5"))
    assert(ns.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 3,
      "q5 dimension joins lost their broadcasts")
    assert(!ns.exists(_.isInstanceOf[SortMergeJoinExec]),
      "q5 plans a SortMergeJoin against a broadcastable dimension")
  }

  test("q55: one key exchange feeds a compiled MapPartitions DP — " +
      "no window, no join, no second aggregate exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val ns = nodes(q("q55_bursts"))
    assert(!ns.exists(_.isInstanceOf[WindowExec]), "q55 plans a window")
    assert(ns.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.MapPartitionsExec]),
      "q55 lost the compiled DP (MapPartitionsExec)")
    // exactly the user_id hash exchange plus the output range exchange:
    // a third would mean per-key state crossed a shuffle
    val ex = ns.collect { case e: ShuffleExchangeExec => e }
    assert(ex.size <= 2, s"q55 plans ${ex.size} exchanges:\n${ex.mkString("\n")}")
  }

  test("d33/d34: variant/near-dup blocking plans no cartesian, no window") {
    for (name <- Seq("d33_edit_variants", "d34_simhash_wide")) {
      val ns = nodes(q(name))
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]),
        s"$name plans a CartesianProduct")
      assert(!ns.exists {
        case w: WindowExec => w.partitionSpec.isEmpty &&
          // d33's rank window rides the 12-row TakeOrdered limit — the
          // one bounded exception the t33 shape established. The
          // exemption demands the limit bound EVERY input path
          // (boundedInput), not merely appear somewhere in the child
          // subtree (ADVICE r13: a TakeOrdered on one join branch must
          // not excuse a corpus-wide window).
          !boundedInput(w.child)
        case _ => false
      }, s"$name plans an unbounded global window above an unbounded input")
    }
    // d34's candidate join keeps the shuffle_hash hint
    assert(nodes(q("d34_simhash_wide"))
      .exists(_.isInstanceOf[ShuffledHashJoinExec]),
      "d34 band self-join lost its shuffle_hash hint")
  }

  test("boundedInput: a TakeOrdered on ONE join branch does not excuse a " +
      "global window over the corpus (synthetic, ADVICE r13)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
    val top = docs.orderBy(col("doc_id")).limit(5)
      .select(col("doc_id").as("top_id"))
    // corpus ⋈ bounded-top, then a GLOBAL window: the old subtree test
    // saw the TakeOrdered and excused it — the every-path walk must not
    val bad = docs.join(broadcast(top),
        pmod(col("doc_id"), lit(7L)) === pmod(col("top_id"), lit(7L)))
      .withColumn("rn", row_number().over(Window.orderBy(col("doc_id"))))
    val badWs = nodes(bad).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(badWs.nonEmpty, "synthetic plan lost its global window")
    assert(badWs.exists(w => !boundedInput(w.child)),
      "a corpus-wide global window was excused by a TakeOrdered on a " +
        "sibling join branch")
    // and the genuinely bounded shape (window directly above the
    // TakeOrdered output) stays exempt
    val good = docs.orderBy(col("doc_id")).limit(5)
      .withColumn("rn", row_number().over(Window.orderBy(col("doc_id"))))
    val goodWs = nodes(good).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(goodWs.nonEmpty && goodWs.forall(w => boundedInput(w.child)),
      "the bounded d33-shape exemption regressed")
  }

  test("p25/p26: the DSIR model joins as a broadcast; no window, no cartesian") {
    for (name <- Seq("p25_dsir_select", "p26_dsir_resample")) {
      val ns = nodes(q(name))
      assert(ns.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"$name scores through a non-broadcast model join")
      assert(!ns.exists(_.isInstanceOf[WindowExec]), s"$name plans a window")
      // the tiny model×totals cross join is the ONE sanctioned product
      // (≤256 × 1 rows); a second would be a real pair blowup
      assert(ns.count(n => n.isInstanceOf[CartesianProductExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec]) <= 1,
        s"$name plans more than the 1-row totals product")
      // selection is TakeOrderedAndProject, never a global sort+limit
      assert(ns.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
        s"$name top-k is not TakeOrderedAndProject")
    }
  }

  test("s16/s17: projection/coarse stages plan no window sort except the " +
      "bounded per-query rank; s17 nominates through TopKPerKeyExec") {
    // s16: the only window is the per-qid rank over broadcast-joined
    // pairs — partitioned, bounded by the query set
    val s16 = nodes(q("s16_jl_projection"))
    assert(!s16.collect { case w: WindowExec => w }
      .exists(_.partitionSpec.isEmpty), "s16 plans a global window")
    // the qid =!= vec_id pair join is non-equi: the broadcast form is
    // BroadcastNestedLoopJoin with the TINY query side broadcast (the
    // s1 shape) — corpus must stream, never shuffle
    assert(s16.exists(_.isInstanceOf[org.apache.spark.sql.execution
      .joins.BroadcastNestedLoopJoinExec]),
      "s16 query side is not broadcast")
    val s17 = nodes(q("s17_sq8_rerank"))
    assert(s17.exists(_.isInstanceOf[graft.plans.TopKPerKeyExec]),
      "s17 coarse candidate stage lost TopKPerKeyExec")
    assert(!s17.collect { case w: WindowExec => w }
      .exists(_.partitionSpec.isEmpty), "s17 plans a global window")
    assert(!s17.exists(_.isInstanceOf[SortMergeJoinExec]),
      "s17 plans a SortMergeJoin (re-rank joins must broadcast)")
  }

  test("t34: feature/GD aggregates plan no window, no join shuffle of the corpus") {
    val ns = nodes(q("t34_quality_classifier"))
    assert(!ns.exists(_.isInstanceOf[WindowExec]), "t34 plans a window")
    assert(!ns.exists(_.isInstanceOf[SortMergeJoinExec]),
      "t34 plans a SortMergeJoin")
    // the output is the 4-row driver trace: localRelation/parallelize,
    // nothing corpus-sized survives into the final plan
    assert(nodes(q("t34_quality_classifier")).length < 12,
      "t34 final plan unexpectedly large — trace frame regressed")
  }

  test("t35: corpus-grain joins stay shuffle_hash — no broadcast of chunk " +
      "frames, no sort-merge, no global window") {
    // the measured lesson: a generous autoBroadcastJoinThreshold
    // promoted the per-round rank frame into a driver-built broadcast
    // at sf1 (4x slower than sf10's shuffled plan); the hints make the
    // scale-correct plan unconditional
    val ns = nodes(q("t35_textrank"))
    assert(ns.exists(_.isInstanceOf[ShuffledHashJoinExec]),
      "t35 lost its shuffle_hash hints")
    assert(!ns.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "t35 broadcasts a corpus-grain frame")
    assert(!ns.exists(_.isInstanceOf[SortMergeJoinExec]),
      "t35 plans a SortMergeJoin")
    assert(!ns.collect { case w: WindowExec => w }
      .exists(_.partitionSpec.isEmpty), "t35 plans a global window")
  }

  test("d36: chunk-dedup joins stay shuffle_hash; reassembly plans no window") {
    // both join sides are corpus-sized (chunk rows vs canonical map):
    // a lost hint would let the 64MB bench threshold broadcast the
    // canonical frame at small SF and OOM the driver at corpus scale
    val ns = nodes(q("d36_chunk_dedup"))
    assert(ns.exists(_.isInstanceOf[ShuffledHashJoinExec]),
      "d36 lost its shuffle_hash hint")
    assert(!ns.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "d36 broadcasts a corpus-grain frame")
    assert(!ns.exists(_.isInstanceOf[WindowExec]),
      "d36 reassembly must be a hash aggregate, not a window")
  }

  test("p28: no unpartitioned window; threshold frame broadcasts; " +
      "no sort-merge join after the checkpoint") {
    // the doc-grain shuffle_hash re-attach executes INSIDE the
    // localCheckpoint materialization (two-branch pin), so the final
    // plan reads the pinned frame: what must hold here is that the
    // langs×2 threshold frame joins as a BROADCAST, nothing plans a
    // sort-merge, and no window is global (Quantiles' bucket windows
    // are (key, bucket)-partitioned)
    val ns = nodes(q("p28_ppl_buckets"))
    assert(ns.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "p28 threshold frame must broadcast")
    assert(!ns.exists(_.isInstanceOf[SortMergeJoinExec]),
      "p28 plans a SortMergeJoin")
    assert(!ns.collect { case w: WindowExec => w }
      .exists(_.partitionSpec.isEmpty),
      "p28 plans a global window — the Quantiles machinery regressed")
  }

  test("t38: one exploded aggregate, no joins, no window") {
    val ns = nodes(q("t38_gopher_rules"))
    assert(!ns.exists(_.isInstanceOf[WindowExec]), "t38 plans a window")
    assert(!ns.exists(_.isInstanceOf[SortMergeJoinExec]) &&
      !ns.exists(_.isInstanceOf[ShuffledHashJoinExec]) &&
      !ns.exists(_.isInstanceOf[BroadcastHashJoinExec]) &&
      !ns.exists(_.isInstanceOf[CartesianProductExec]),
      "t38 must be join-free: line stats ride the doc aggregate as MIN")
  }

  test("m13: segmentation windows are clip-partitioned; decode pipeline unchanged") {
    val ns = nodes(q("m13_activity_segments"))
    val ws = ns.collect { case w: WindowExec => w }
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
      "m13 islands window must be partitioned by clip")
    assert(!ns.exists(_.isInstanceOf[SortMergeJoinExec]) &&
      !ns.exists(_.isInstanceOf[CartesianProductExec]),
      "m13 plans a join it should not have")
  }
}
