package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Kleinberg burst detection (Kleinberg, "Bursty and Hierarchical
  * Structure in Streams", KDD 2002) — the standard trend/burst miner
  * over an event stream, here the 2-state automaton: a base state
  * emitting gaps at the sequence's own mean rate λ0 = (n−1)/span and a
  * burst state at λ1 = s·λ0, with cost γ·ln(n−1) to enter the burst
  * state and 0 to leave it. The optimal (min-cost) state sequence over
  * the inter-arrival gaps is a Viterbi DP; maximal runs of the burst
  * state are the reported episodes.
  *
  * Scale shape: ONE shuffle keyed by `keyCol`, then a per-key
  * sequential fold. The key is the unit whose history is bounded —
  * per-user activity here (corpora grow by adding USERS, not by making
  * one user's history unbounded; the same reason the q26 sessionizer
  * keys by user). The DP runs COMPILED inside mapPartitions (the
  * m11/d32 idiom): a Catalyst `aggregate` HOF states the same fold but
  * interprets every step — measured 13.9 s at sf1 vs ~1 s compiled for
  * the identical arithmetic. Never a global sort, never a window over
  * the corpus.
  *
  * Determinism (the t31/t33 toolkit): gaps and spans are exact longs
  * (nanos); λ0 is ONE division; each ln is round(9)ed (BigDecimal
  * HALF_UP — what both Spark's `round` and DuckDB's `round` compute)
  * BEFORE entering the DP sums; every DP step is the same IEEE ops in
  * the same sequential order both engines (`math.log` IS the
  * `java.lang.Math.log` Catalyst's `log` calls), ties prefer the base
  * state via `<=`; the OUTPUT is integer-only (gap positions), so the
  * oracle restates the identical fold with DuckDB's list_reduce
  * (list-of-lists accumulator — the p24/t31 idiom) and hashes exactly.
  */
object Bursts {

  private def round9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The Viterbi DP over one key's sorted timestamps: maximal burst
    * runs as (start, end) 1-based gap positions — gap `i` sits between
    * the i-th and (i+1)-th event. Sequences with fewer than 2 events
    * or zero span carry no rate and yield nothing.
    */
  private[graft] def episodes(tss: Seq[Long], s: Double,
      gamma: Double): Seq[(Long, Long)] = {
    val n = tss.length
    if (n < 2) return Nil
    val span = tss.last - tss.head
    if (span <= 0) return Nil
    val lam0 = (n - 1).toDouble / span.toDouble
    val lam1 = lam0 * s
    val ln0 = round9(math.log(lam0))
    val ln1 = round9(math.log(lam1))
    val trans = round9(math.log((n - 1).toDouble)) * gamma
    var c0 = 0.0; var c1 = 1.0e18
    // backpointers, rebuilt once at the end — O(n) per key, not the
    // O(n²) path-copy fold the declarative HOF is stuck with
    val from1 = new Array[Boolean](n - 1) // state1 at i reached from 0?
    val from0 = new Array[Boolean](n - 1)
    var i = 0
    while (i < n - 1) {
      val gd = (tss(i + 1) - tss(i)).toDouble
      val stay0 = c0 <= c1 // ties prefer the base state
      val up = c0 + trans
      val enter0 = up <= c1
      val n0 = ((lam0 * gd) - ln0) + (if (stay0) c0 else c1)
      val n1 = ((lam1 * gd) - ln1) + (if (enter0) up else c1)
      from0(i) = stay0; from1(i) = enter0
      c0 = n0; c1 = n1
      i += 1
    }
    val st = new Array[Int](n - 1)
    var cur = if (c0 <= c1) 0 else 1
    i = n - 2
    while (i >= 0) {
      st(i) = cur
      cur = if (cur == 0) { if (from0(i)) 0 else 1 }
      else { if (from1(i)) 0 else 1 }
      i -= 1
    }
    val runs = scala.collection.mutable.Buffer.empty[(Long, Long)]
    var start = -1
    i = 0
    while (i < st.length) {
      if (st(i) == 1 && start < 0) start = i + 1
      if (st(i) == 0 && start > 0) { runs += ((start.toLong, i.toLong)); start = -1 }
      i += 1
    }
    if (start > 0) runs += ((start.toLong, st.length.toLong))
    runs.toSeq
  }

  /** Burst episodes per key. Output: (keyCol, burst_start, burst_end,
    * n_gaps, n_events) with 1-based gap positions.
    */
  def kleinberg(events: DataFrame, s: Double = 2.0, gamma: Double = 0.5,
      keyCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(s > 1.0, s"burst rate multiplier must exceed 1: $s")
    require(gamma > 0.0, s"transition cost factor must be positive: $gamma")
    val grouped = events
      .groupBy(col(keyCol).as("__key"))
      .agg(sort_array(collect_list(col(tsCol).cast("long"))).as("__tss"))
    val keyType = grouped.schema("__key").dataType
    val outSchema = StructType(Seq(
      StructField(keyCol, keyType),
      StructField("burst_start", LongType),
      StructField("burst_end", LongType),
      StructField("n_gaps", LongType),
      StructField("n_events", LongType)))
    val (sv, gv) = (s, gamma)
    grouped.mapPartitions { it =>
      it.flatMap { r =>
        val key = r.get(0)
        val tss = r.getSeq[Long](1)
        episodes(tss, sv, gv).iterator.map { case (s0, e0) =>
          Row(key, s0, e0, e0 - s0 + 1L, e0 - s0 + 2L)
        }
      }
    }(Encoders.row(outSchema))
  }
}
